from pq3d_tpu.config.config import Config, load_config, default_config_dir

__all__ = ["Config", "load_config", "default_config_dir"]

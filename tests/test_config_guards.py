"""Guards against silently-misconfigured perf levers (round-2 review)."""
import numpy as np
import pytest


def _rung(top):
    """Full-length (NUM_LEVELS) rung descending from ``top``."""
    from pq3d_tpu.ops import kernel_maps
    return [max(top >> i, 4) for i in range(kernel_maps.NUM_LEVELS)]


def test_level_cap_ladder_rejects_descending():
    from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig
    with pytest.raises(ValueError, match="non-decreasing"):
        InstSegPipelineConfig(level_cap_ladder=[_rung(64), _rung(32)])
    # ascending is fine
    InstSegPipelineConfig(level_cap_ladder=[_rung(32), _rung(64)])


def test_level_cap_ladder_rejects_short_rung():
    from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig
    with pytest.raises(ValueError, match="one per level"):
        InstSegPipelineConfig(level_cap_ladder=[[64, 32]])


def test_level_cap_ladder_rejects_flat_pack():
    from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig
    with pytest.raises(ValueError, match="flat_pack"):
        InstSegPipelineConfig(flat_pack=True,
                              level_cap_ladder=[_rung(32), _rung(64)])


def test_ball_query_impl_rejects_unknown():
    from pq3d_tpu.ops import sampling
    with pytest.raises(ValueError, match="unknown ball_query impl"):
        sampling.set_ball_query_impl("topK")
    sampling.set_ball_query_impl("topk")  # restore default


def test_flat_slot_requires_pointnet_backbone():
    import jax
    from pq3d_tpu.models.encoders import ObjectEncoder
    enc = ObjectEncoder(hidden_size=8, input_feat_size=6, backbone="none")
    pts = np.zeros((3, 4, 6), np.float32)
    slot = np.zeros((2, 2), np.int32)
    with pytest.raises(ValueError, match="pointnet"):
        enc.init(jax.random.key(0), pts, flat_slot=slot)


def test_flat_obj_shape_count_bounded():
    """F rungs scale with batch capacity: across any real-object totals the
    number of distinct F values stays <= 9."""
    from pq3d_tpu.data.unified_pipeline import (UnifiedPipelineConfig,
                                                flat_obj_rows)

    cfg = UnifiedPipelineConfig(flat_obj=True, flat_obj_bucket=64)
    b, O = 128, 80
    shapes = {flat_obj_rows(t, b, O, cfg.flat_obj_bucket)
              for t in range(1, b * O + 1)}
    assert len(shapes) <= 9
    assert max(shapes) == b * O

"""Experiment runner (CLI).

Mirrors the reference's Hydra entry point (reference: run.py:12-57):

  python -m pq3d_tpu.run --config-name instseg_synthetic.yaml \
      solver.epochs=5 dataloader.batchsize=4

Loads the YAML config (packaged or by path), applies dotted overrides,
names the experiment dir, snapshots the resolved config, builds the
trainer, runs train or test.
"""
from __future__ import annotations

import argparse
import os
import time




def _mesh_cfg_from(cfg):
    """Build a MeshConfig from the optional ``parallel:`` config node.

    YAML surface (all optional):
        parallel: {data: -1, fsdp: 1, tp: 1, fsdp_min_size: 65536}
    data=-1 means "all remaining devices" (pure DP — reference parity,
    its only parallelism is Accelerate DDP, ref trainer/build.py:123-129).
    fsdp/tp opt into ZeRO-3-style param sharding / Megatron tensor
    parallelism over the same mesh (pq3d_tpu/parallel/mesh.py).
    """
    from pq3d_tpu.parallel.mesh import MeshConfig
    node = cfg.get("parallel") or {}
    return MeshConfig(
        data=int(node.get("data", -1)),
        fsdp=int(node.get("fsdp", 1)),
        tp=int(node.get("tp", 1)),
        fsdp_min_size=int(node.get("fsdp_min_size", 2 ** 16)))


def _optimizer_total_steps(cfg, steps_per_epoch: int) -> int:
    """Schedule horizon in OPTIMIZER steps: divide the micro-step count by
    gradient accumulation like the reference (ref trainer/build.py:102)."""
    accum = max(int(cfg.solver.get("gradient_accumulation_steps", 1) or 1), 1)
    return steps_per_epoch * int(cfg.solver.epochs) // accum


def build_instseg_trainer(cfg):
    from pq3d_tpu.data.datasets import InstSegLoader
    from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig
    from pq3d_tpu.models.query3d import build_model
    from pq3d_tpu.optim.losses import InstSegLossConfig, instseg_set_loss
    from pq3d_tpu.registry import DATASET_REGISTRY, TRAINER_REGISTRY
    import pq3d_tpu.train.trainer  # registers trainers
    import pq3d_tpu.models  # registers model modules

    iopt = cfg.data.instseg_options
    level_caps = iopt.get("level_caps")
    ladder = iopt.get("level_cap_ladder")
    pipe_cfg = InstSegPipelineConfig(
        voxel_size=float(iopt.voxel_size),
        num_queries=int(iopt.num_queries),
        query_sample_strategy=iopt.get("query_sample_strategy", "fps"),
        max_segments=int(iopt.get("max_segments", 512)),
        max_instances=int(iopt.get("max_instances", 120)),
        voxel_bucket=int(iopt.get("voxel_bucket", 4096)),
        conv0_kernel=int(iopt.get("conv0_kernel", 5)),
        level_caps=[int(x) for x in level_caps] if level_caps else None,
        level_cap_ladder=[[int(x) for x in rung] for rung in ladder]
        if ladder else None,
        offline_mask_source=iopt.get("offline_mask_source"),
        filter_out_classes=tuple(iopt.get("filter_out_classes", (0, 2))),
        ignore_label=int(iopt.get("ignore_label", -100)),
        stem_mode=iopt.get("stem_mode", "gather"),
        stem_block_cap=(int(iopt["stem_block_cap"])
                        if iopt.get("stem_block_cap") else None),
        swin_window=int(iopt.get("swin_window", 0) or 0),
        flat_pack=bool(iopt.get("flat_pack", False)),
        compact_conv=bool(iopt.get("compact_conv", False)),
        ztriple_conv=bool(iopt.get("ztriple_conv", False)))
    if pipe_cfg.flat_pack:
        import jax as _jax
        if len(_jax.devices()) > 1:
            # flat voxel arrays have no batch dim — the dp shard-by-batch
            # rule cannot split them; serving layout is single-device
            if not bool(cfg.dataloader.get("allow_single_device", False)):
                raise ValueError(
                    "data.instseg_options.flat_pack is a single-device "
                    "serving layout; unset it or set "
                    "dataloader.allow_single_device")
            # make the opt-in stick even when batchsize divides the device
            # count (the trainer would otherwise build a mesh and shard the
            # flat arrays along their non-batch leading dim)
            cfg.set_dotted("dataloader.force_single_device", True)

    def make_loader(split, train):
        ds_name = cfg.data.get(split)[0]
        ds = DATASET_REGISTRY.get(ds_name)(cfg, split)
        bs = int(cfg.dataloader.batchsize if train
                 else cfg.dataloader.get("batchsize_eval",
                                         cfg.dataloader.batchsize))
        return InstSegLoader(ds, pipe_cfg, bs, train,
                             seed=int(cfg.get("rng_seed", 42)),
                             num_workers=int(cfg.dataloader.get(
                                 "num_workers", 0))), len(ds) // bs

    train_loader, steps_per_epoch = make_loader("train", True)
    val_loader, _ = make_loader("val", False)

    model = build_model(cfg)
    from pq3d_tpu.models.encoders import check_swin_window
    check_swin_window(model, pipe_cfg)
    m_loss = cfg.model.get("InstSegLoss", {}) or {}
    matcher = m_loss.get("matcher", {}) or {}
    loss_cfg = InstSegLossConfig(
        cost_class=float(matcher.get("cost_class", 2.0)),
        cost_mask=float(matcher.get("cost_mask", 5.0)),
        cost_dice=float(matcher.get("cost_dice", 2.0)),
        num_classes=int(cfg.data.instseg_options.num_labels),
        ignore_label=int(iopt.get("ignore_label", -100)))

    if str(m_loss.get("criterion_type", "set")) == "direct":
        # GT-matched criterion, no Hungarian (ref instseg_loss.py:88-133,
        # instseg_sceneverse_gt.yaml criterion_type: 'direct')
        from pq3d_tpu.optim.losses import instseg_direct_loss

        def loss_fn(out, batch):
            return instseg_direct_loss(out["predictions_class"],
                                       out["predictions_mask"], batch,
                                       ignore_label=loss_cfg.ignore_label)
    else:
        def loss_fn(out, batch):
            return instseg_set_loss(out["predictions_class"],
                                    out["predictions_mask"], batch, loss_cfg)

    evaluator = None
    if cfg.get("eval") and cfg.eval.get("name") == "InstSegEval":
        from pq3d_tpu.eval.instseg_eval import InstSegEval
        save_dir = None
        if cfg.eval.get("save"):
            save_dir = os.path.join(cfg.exp_dir, "eval_results", "InstSegEval")
        evaluator = InstSegEval(
            save_dir=save_dir,
            use_dbscan=bool(cfg.eval.get("use_dbscan", False)),
            topk_per_scene=int(cfg.eval.get("topk_per_scene", 100)),
            num_classes=int(cfg.data.instseg_options.num_labels),
            # full-res reconstruction + the official benchmark protocol by
            # default; per-scene maps missing from a batch degrade gracefully
            full_resolution=bool(cfg.eval.get("full_resolution", True)),
            official_protocol=bool(cfg.eval.get("official_protocol", True)),
            min_region_size=float(cfg.eval.get("min_region_size", 100.0)))

    trainer_cls = TRAINER_REGISTRY.get(cfg.get("trainer", "Query3DTrainer"))
    total_steps = _optimizer_total_steps(cfg, steps_per_epoch)
    return trainer_cls(cfg, model, loss_fn, train_loader, val_loader,
                       evaluator, total_steps=total_steps,
                       mesh_cfg=_mesh_cfg_from(cfg))


def build_multitask_trainer(cfg):
    from pq3d_tpu.data.tokenizers import build_tokenizers
    from pq3d_tpu.data.unified_loader import (MixedTaskLoader,
                                              UnifiedTaskLoader)
    from pq3d_tpu.data.unified_pipeline import UnifiedPipelineConfig
    from pq3d_tpu.models.query3d import build_model
    
    from pq3d_tpu.registry import (DATASET_REGISTRY, EVALUATOR_REGISTRY,
                                   TRAINER_REGISTRY)
    import pq3d_tpu.train.trainer  # registers trainers
    import pq3d_tpu.models  # registers model modules
    import pq3d_tpu.data.unified_datasets  # registers synthetic task datasets
    import pq3d_tpu.data.sceneverse  # registers SceneVerse task datasets
    import pq3d_tpu.eval.grounding_eval  # registers evaluators
    import pq3d_tpu.eval.qa_eval
    import pq3d_tpu.eval.caption_eval

    uo = cfg.data.get("unified_options", {}) or {}
    pipe_cfg = UnifiedPipelineConfig(
        max_obj_len=int(uo.get("max_obj_len", 80)),
        num_points=int(uo.get("num_points", 1024)),
        prompt_len=int(uo.get("prompt_len", 32)),
        response_len=int(uo.get("response_len", 32)),
        dim_loc=int(cfg.model.obj_loc.dim_loc),
        flat_obj=bool(uo.get("flat_obj", False)),
        flat_obj_bucket=int(uo.get("flat_obj_bucket", 64)))
    if pipe_cfg.flat_obj:
        import jax as _jax
        if len(_jax.devices()) > 1:
            # pc_obj_flat has no batch dim — the dp shard-by-batch rule
            # cannot split it; serving layout is single-device
            if not bool(cfg.dataloader.get("allow_single_device", False)):
                raise ValueError(
                    "data.unified_options.flat_obj is a single-device "
                    "serving layout; unset it or set "
                    "dataloader.allow_single_device")
            # make the opt-in stick even when batchsize divides the device
            # count (the trainer would otherwise build a mesh and shard
            # pc_obj_flat along its non-batch leading dim)
            cfg.set_dotted("dataloader.force_single_device", True)

    seed = int(cfg.get("rng_seed", 42))
    bs = int(cfg.dataloader.batchsize)
    bs_eval = int(cfg.dataloader.get("batchsize_eval", bs))
    toks = build_tokenizers(cfg)  # HF CLIP/T5 when available

    def make_ds(ds_cls, split):
        try:  # SceneVerse tasks take tokenizers; synthetic ones don't
            return ds_cls(cfg, split, tokenizer=toks.tokenize,
                          gen_tokenizer=toks.gen_tokenize)
        except TypeError:
            return ds_cls(cfg, split)

    train_loaders, val_sets = [], []
    steps_per_epoch = 0
    for ds_name in cfg.data.train:
        ds_cls = DATASET_REGISTRY.get(ds_name)
        train_ds = make_ds(ds_cls, "train")
        nw = int(cfg.dataloader.get("num_workers", 0))
        train_loaders.append(UnifiedTaskLoader(train_ds, pipe_cfg, bs, True,
                                               seed=seed, num_workers=nw))
        steps_per_epoch += len(train_ds) // bs
        val_ds = make_ds(ds_cls, "val")
        val_loader = UnifiedTaskLoader(val_ds, pipe_cfg, bs_eval, False,
                                       seed=seed)
        ev_name = getattr(train_ds, "evaluator", "ScanReferEval")
        save_dir = None
        if cfg.get("eval") and cfg.eval.get("save"):
            save_dir = os.path.join(cfg.exp_dir, "eval_results", ev_name)
        evaluator = EVALUATOR_REGISTRY.get(ev_name)(save_dir=save_dir)
        val_sets.append((ds_name, val_loader, evaluator))
    train_loader = MixedTaskLoader(train_loaders, seed=seed)

    model = build_model(cfg)
    # registry-driven weighted aggregation (ref optim/loss/loss.py:113-152)
    from pq3d_tpu.optim.loss_aggregator import Loss
    loss_list = list(cfg.model.get("loss_list",
                                   ["ground_loss", "generation_loss"]))
    if "qa" in tuple(cfg.model.get("heads", ())) \
            and "answer_loss" not in loss_list:
        loss_list.append("answer_loss")   # ref unifiedtask_wrapper.py:34-35
    loss_fn = Loss(loss_list, cfg.model.get("loss_weights", {}) or {})

    trainer_cls = TRAINER_REGISTRY.get(cfg.get("trainer", "MultitaskTrainer"))
    total_steps = _optimizer_total_steps(cfg, steps_per_epoch)
    return trainer_cls(cfg, model, loss_fn, train_loader, val_sets=val_sets,
                       detokenize=toks.detokenize, total_steps=total_steps,
                       mesh_cfg=_mesh_cfg_from(cfg))


def _rget(cfg, dotted, default=None):
    node = cfg
    for part in str(dotted).split("."):
        if not hasattr(node, "get"):
            return default
        node = node.get(part)
        if node is None:
            return default
    return node


def experiment_name(cfg) -> str:
    """Exp name from ``naming_keywords`` (ref run.py:25-46): the base name
    plus task/dataset names, effective global batch ``b<N>``, and any other
    dotted config values; ``Debug_test`` under debug.flag."""
    if _rget(cfg, "debug.flag", False):
        return "Debug_test"
    keys = [str(cfg.get("name", "exp"))]
    for kw in cfg.get("naming_keywords", []) or []:
        kw = str(kw)
        if kw == "time":
            continue
        if kw == "task":
            keys.append(str(cfg.get("task", "")))
            note = _rget(cfg, "data.note")
            if note is not None:
                keys.append(str(note))
            else:
                ds = _rget(cfg, "data.train") or []
                keys.append("+".join(str(x) for x in ds))
        elif kw == "dataloader.batchsize":
            import jax
            keys.append(f"b{int(_rget(cfg, kw, 0)) * len(jax.devices())}")
        else:
            v = _rget(cfg, kw, "")
            if str(v) != "":
                keys.append(str(v))
    return "_".join(k for k in keys if k)


def main(argv=None):
    # PQ3D_PLATFORM=cpu forces the backend BEFORE any jax init.  Needed
    # because this image's sitecustomize force-registers the TPU plugin and
    # ignores the JAX_PLATFORMS env var (see .claude/skills/verify); the
    # dress-rehearsal / CI paths use it to run the full recipe on CPU.
    plat = os.environ.get("PQ3D_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    parser = argparse.ArgumentParser("pq3d_tpu.run")
    parser.add_argument("--config-name", required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from pq3d_tpu.config import load_config
    cfg = load_config(args.config_name, overrides=args.overrides)

    # resume re-loads the snapshot saved in the experiment dir so the run
    # continues under the exact original config (ref run.py:14-18)
    if cfg.get("resume") and cfg.get("exp_dir"):
        snap = os.path.join(str(cfg.exp_dir), "config.yaml")
        if not os.path.exists(snap):
            raise FileNotFoundError(
                f"Resuming failed: {snap} does not exist")
        print(f"Resuming from {cfg.exp_dir}")
        cfg = load_config(snap, overrides=args.overrides)
        cfg.resume = True

    # experiment dir naming (ref run.py:25-53)
    if not cfg.get("exp_dir"):
        stamp = time.strftime("%Y-%m-%d-%H%M%S")
        cfg.exp_dir = os.path.join(cfg.get("base_dir", "outputs"),
                                   experiment_name(cfg), stamp)
    os.makedirs(cfg.exp_dir, exist_ok=True)
    with open(os.path.join(cfg.exp_dir, "config.yaml"), "w") as f:
        f.write(cfg.to_yaml())

    task = cfg.get("task", "InstSeg")
    if task == "InstSeg":
        trainer = build_instseg_trainer(cfg)
    elif task == "Query3D":
        trainer = build_multitask_trainer(cfg)
    else:
        raise NotImplementedError(f"unknown task {task}")

    if cfg.get("mode", "train") == "train":
        trainer.run()
    else:
        trainer.eval_epoch(0)


if __name__ == "__main__":
    main()

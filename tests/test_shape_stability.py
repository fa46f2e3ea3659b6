"""Recompilation discipline: different scenes -> identical batch shapes ->
one compiled executable (the north-star constraint, SURVEY.md §7.1)."""
import jax
import jax.numpy as jnp
import numpy as np

from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig, make_batch
from pq3d_tpu.data.unified_datasets import SyntheticRefer
from pq3d_tpu.data.unified_loader import UnifiedTaskLoader
from pq3d_tpu.data.unified_pipeline import UnifiedPipelineConfig
from pq3d_tpu.config import Config


def _shapes(batch):
    return jax.tree.map(lambda x: (getattr(x, "shape", None),
                                   getattr(x, "dtype", None)), batch)


def test_instseg_batches_shape_stable():
    cfg = InstSegPipelineConfig(voxel_size=0.1, num_queries=16,
                                max_segments=64, max_instances=16,
                                voxel_bucket=1024,
                                level_caps=[1024, 512, 256, 128, 64])
    rng = np.random.default_rng(0)
    shapes = []
    for seed in range(3):
        srng = np.random.default_rng(seed)
        scenes = [synthetic.make_scene(srng, n_points=800 + 200 * seed,
                                       n_instances=3 + seed, n_segments=24)
                  for _ in range(2)]
        batch = make_batch(scenes, cfg, rng, train=True)
        batch = {k: v for k, v in batch.items() if not k.startswith("_")}
        shapes.append(str(_shapes(batch)))
    assert shapes[0] == shapes[1] == shapes[2], \
        "instseg batches must have identical shapes across scenes"


def test_instseg_dense_stem_shape_stable_under_level_caps():
    """With level_caps set, the dense-block stem pack is pinned to
    stem_block_cap (default level_caps[0]/16) so stem_dense/stem_c2v/
    stem_nbrblk keep one shape across batches (ADVICE round-2 item); an
    overflowing batch falls back to a bucketed pad with a warning."""
    import pytest
    cfg = InstSegPipelineConfig(voxel_size=0.1, num_queries=16,
                                max_segments=64, max_instances=16,
                                voxel_bucket=1024, stem_mode="dense_block",
                                level_caps=[4096, 2048, 512, 128, 64])
    rng = np.random.default_rng(0)
    shapes = []
    for seed in range(3):
        srng = np.random.default_rng(seed)
        scenes = [synthetic.make_scene(srng, n_points=600 + 400 * seed,
                                       n_instances=3 + seed, n_segments=24)
                  for _ in range(2)]
        batch = make_batch(scenes, cfg, rng, train=True)
        shapes.append(tuple(batch["maps"][k].shape for k in
                            ("stem_dense", "stem_c2v", "stem_slot",
                             "stem_nbrblk")))
        assert batch["maps"]["stem_nbrblk"].shape[1] == 4096 // 16
    assert shapes[0] == shapes[1] == shapes[2]

    tight = InstSegPipelineConfig(
        voxel_size=0.1, num_queries=16, max_segments=64, max_instances=16,
        voxel_bucket=1024, stem_mode="dense_block",
        level_caps=[4096, 2048, 512, 128, 64], stem_block_cap=8)
    scenes = [synthetic.make_scene(np.random.default_rng(9), n_points=2000,
                                   n_instances=4, n_segments=24)
              for _ in range(2)]
    with pytest.warns(UserWarning, match="stem_block_cap"):
        batch = make_batch(scenes, tight, rng, train=True)
    assert batch["maps"]["stem_nbrblk"].shape[1] > 8


def test_instseg_level_cap_ladder():
    """The bucket ladder picks the smallest rung that fits the batch and
    errors when nothing fits (tighter-voxel-buckets lever, PERF.md)."""
    import pytest
    ladder = [[256, 128, 96, 48, 24], [1024, 512, 256, 128, 64]]
    cfg = InstSegPipelineConfig(voxel_size=0.1, num_queries=16,
                                max_segments=64, max_instances=16,
                                voxel_bucket=64, level_cap_ladder=ladder)
    rng = np.random.default_rng(0)
    small = [synthetic.make_scene(np.random.default_rng(1), n_points=150,
                                  n_instances=3, n_segments=12)
             for _ in range(2)]
    big = [synthetic.make_scene(np.random.default_rng(2), n_points=1200,
                                n_instances=4, n_segments=24)
           for _ in range(2)]
    b_small = make_batch(small, cfg, rng, train=True)
    b_big = make_batch(big, cfg, rng, train=True)
    assert b_small["maps"]["valid_0"].shape[1] == 256
    assert b_big["maps"]["valid_0"].shape[1] == 1024
    # both rungs carry a complete, usable hierarchy
    for b in (b_small, b_big):
        nv0 = b["maps"]["valid_0"].sum()
        assert nv0 > 0
        assert (b["maps"]["nbr3_0"] < b["maps"]["valid_0"].shape[1]).all()

    huge = [synthetic.make_scene(np.random.default_rng(3), n_points=5000,
                                 n_instances=4, n_segments=24)
            for _ in range(2)]
    with pytest.raises(ValueError, match="ladder"):
        make_batch(huge, cfg, rng, train=True)


def test_unified_batches_shape_stable_and_jit_cache():
    cfg = Config({"data": {"synthetic": {"num_train": 6, "n_points": 400,
                                         "n_instances": 4}},
                  "debug": {"flag": False}})
    pipe = UnifiedPipelineConfig(max_obj_len=5, num_points=32, prompt_len=8,
                                 response_len=6)
    loader = UnifiedTaskLoader(SyntheticRefer(cfg, "train"), pipe,
                               batch_size=2, train=True)

    # count TRACES, not jit cache entries: _cache_size() reads the
    # process-global PjitFunctionCache LRU (capacity 8192, shared by every
    # jitted function), which a long full-suite process can evict —
    # observed live in round 5 as cache_size()==0 with IDENTICAL batch
    # signatures after 2h of suite (the round-4 "order-dependent flake").
    # A trace counter measures the actual contract: same avals -> the
    # tracer runs once.
    traces = []

    def _f(b):
        traces.append(1)
        return sum(jnp.sum(v) for v in jax.tree.leaves(b)
                   if jnp.issubdtype(v.dtype, jnp.floating))
    f = jax.jit(_f)

    n_batches = 0
    sigs = []
    for batch in loader(0):
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if not k.startswith("_")}
        f(batch)
        sigs.append({k: (tuple(v.shape), str(v.dtype))
                     for k, v in batch.items()})
        n_batches += 1
    assert n_batches >= 2
    # diagnose BEFORE the opaque cache-size assert: if a leaf drifted
    # shape/dtype across batches (the suspected mechanism of the round-4
    # order-dependent flake, NEXTSTEPS), name it precisely
    for i, s in enumerate(sigs[1:], 1):
        drift = {k: (sigs[0].get(k), s.get(k))
                 for k in set(sigs[0]) | set(s)
                 if sigs[0].get(k) != s.get(k)}
        assert not drift, f"batch {i} drifted vs batch 0: {drift}"
    assert len(traces) == 1, \
        f"expected a single trace, got {len(traces)} " \
        f"(signatures identical across {n_batches} batches — the retrace " \
        f"came from ambient jit context, not batch shapes)"

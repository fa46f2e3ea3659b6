"""Multi-worker batch loading (InstSegLoader num_workers > 0): batches are
deterministic and identical for any worker count (per-batch seeded rng),
mirroring the reference's torch DataLoader worker semantics
(ref data/build.py:70-80) without its worker-seed coupling."""
import numpy as np

from pq3d_tpu.config import Config
from pq3d_tpu.data.datasets import (InstSegLoader, SyntheticInstSeg,
                                    _assemble_instseg_batch,
                                    _init_instseg_worker,
                                    _instseg_worker_batch)
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig


def _loader(num_workers, flat=False):
    cfg = Config({"data": {"synthetic": {"num_train": 6, "n_points": 500,
                                         "n_instances": 3,
                                         "n_segments": 12}},
                  "debug": {"flag": False}})
    pipe = InstSegPipelineConfig(voxel_size=0.15, num_queries=8,
                                 max_segments=32, max_instances=8,
                                 voxel_bucket=128, use_aug=True,
                                 flat_pack=flat)
    ds = SyntheticInstSeg(cfg, "train")
    return InstSegLoader(ds, pipe, batch_size=2, train=True, seed=3,
                         extra_features={"mv": 8},
                         num_workers=num_workers)


def _assert_batches_equal(a, b):
    assert set(a) == set(b)
    for k in a:
        if k == "_meta":
            continue
        if isinstance(a[k], dict):
            _assert_batches_equal(a[k], b[k])
        else:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_worker_batches_match_in_process_worker_path():
    """The worker function with per-batch seeds reproduces exactly what the
    pool would compute, for every batch, without spawning (1-core box)."""
    lo = _loader(num_workers=0)
    batches, _nr, _ = lo._batch_indices(epoch=1)
    _init_instseg_worker(lo.dataset, lo.pipe_cfg, lo.extra_features)
    for b, idxs in enumerate(batches):
        got = _instseg_worker_batch(idxs, [lo.seed, 1, b], True)
        rng = np.random.default_rng(np.random.SeedSequence([lo.seed, 1, b]))
        ref = _assemble_instseg_batch(lo.dataset, lo.pipe_cfg,
                                      lo.extra_features, idxs, rng, True)
        _assert_batches_equal(got, ref)


def test_pool_loader_yields_deterministic_batches():
    """A real 2-worker spawn pool yields the same batches as the worker
    function run in-process (order preserved)."""
    lo0 = _loader(num_workers=0)
    batches, _nr, _ = lo0._batch_indices(epoch=0)
    _init_instseg_worker(lo0.dataset, lo0.pipe_cfg, lo0.extra_features)
    refs = [_instseg_worker_batch(idxs, [lo0.seed, 0, b], True)
            for b, idxs in enumerate(batches)]

    lo2 = _loader(num_workers=2)
    got = list(lo2(0))
    assert len(got) == len(refs)
    for g, r in zip(got, refs):
        _assert_batches_equal(g, r)


def test_flat_pack_flows_through_loader():
    """InstSegLoader dispatches to the flat-packed collate when the pipeline
    config asks for it (maps arrive 1-D, no batch dim)."""
    lo = _loader(num_workers=0, flat=True)
    batch = next(iter(lo(0)))
    assert batch["maps"]["valid_0"].ndim == 1
    assert batch["mv_seg_fts"].shape[0] == 2


def test_tokenizers_pickle_roundtrip():
    """All tokenizer callables (synthetic + HF wrappers + the bundle) must
    round-trip through pickle so spawn-pool workers can receive datasets
    that hold them (ref: torch DataLoader pickles the dataset per worker)."""
    import pickle

    from pq3d_tpu.config import Config
    from pq3d_tpu.data.tokenizers import (HFDetokenize, HFTokenize,
                                          SyntheticTokenize, build_tokenizers)

    syn = SyntheticTokenize(16)
    assert pickle.loads(pickle.dumps(syn))("abc") == syn("abc")

    hf = HFTokenize("no-such-model", 32)
    hf2 = pickle.loads(pickle.dumps(hf))
    assert (hf2.name, hf2.max_length, hf2._t) == ("no-such-model", 32, None)
    de = pickle.loads(pickle.dumps(HFDetokenize("no-such-model")))
    assert de._t is None

    bundle = build_tokenizers(Config({"data_wrapper": {}}))
    b2 = pickle.loads(pickle.dumps(bundle))
    assert b2.tokenize("hello") == bundle.tokenize("hello")
    assert b2.detokenize(np.array([3, 5, 0])) == \
        bundle.detokenize(np.array([3, 5, 0]))


def test_unified_pool_loader_matches_worker_path():
    """UnifiedTaskLoader with a 2-worker spawn pool yields the same batches
    as the worker function run in-process with per-batch seeds (datasets
    carry the default synthetic tokenizer, which must now be picklable)."""
    from pq3d_tpu.data.unified_datasets import SyntheticRefer
    from pq3d_tpu.data.unified_loader import (UnifiedTaskLoader,
                                              _init_unified_worker,
                                              _unified_worker_batch)
    from pq3d_tpu.data.unified_pipeline import UnifiedPipelineConfig

    cfg = Config({"data": {"synthetic": {"num_train": 6, "num_val": 2,
                                         "n_points": 400, "n_instances": 3}},
                  "debug": {"flag": False}})
    pipe = UnifiedPipelineConfig(max_obj_len=5, num_points=32, prompt_len=8,
                                 response_len=6)
    mk = lambda nw: UnifiedTaskLoader(SyntheticRefer(cfg, "train"), pipe,
                                      batch_size=2, train=True, seed=7,
                                      num_workers=nw)
    lo0 = mk(0)
    order = np.random.default_rng(lo0.seed + 0).permutation(len(lo0.dataset))
    batches = [order[s:s + 2] for s in range(0, len(order) - 1, 2)]
    _init_unified_worker(lo0.dataset, lo0.cfg, lo0.feature_dims)
    refs = [_unified_worker_batch(idxs, [lo0.seed, 0, b], True)
            for b, idxs in enumerate(batches)]

    got = list(mk(2)(0))
    assert len(got) == len(refs) > 0
    for g, r in zip(got, refs):
        _assert_batches_equal(g, r)

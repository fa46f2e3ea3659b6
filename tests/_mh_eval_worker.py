"""Worker for the 2-process evaluator test — NOT a pytest module.

Two JAX processes evaluate a REAL evaluator (ScanReferEval) over a
deliberately non-divisible eval set (5 items, global batch 2): every
process iterates the same global batch list (deterministic loader), each
scores only its OWN contiguous rows of every batch (the per-process share
of a data-sharded batch), wrap-padding rows are dropped via n_real, and
``record()`` merges the per-process accumulators with
parallel/multihost.merge_eval_dicts.  The merged metrics must equal the
single-process run bit-for-bit (same (value, count) pairs, merged in
process order).

Usage: python tests/_mh_eval_worker.py <pid> <coordinator|single>
Prints ``RESULT og_acc=<repr> count=<n>``.
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("JAX_CACHE_DIR", "/tmp/jaxcache_cpu")

import numpy as np  # noqa: E402


def main():
    pid = int(sys.argv[1])
    coord = sys.argv[2]
    single = coord == "single"
    import jax
    jax.config.update("jax_platforms", "cpu")
    if not single:
        from pq3d_tpu.launch import init_distributed
        init_distributed("jax", coord, 2, pid)
        assert jax.process_count() == 2

    from pq3d_tpu.config import Config
    from pq3d_tpu.data.unified_datasets import SyntheticRefer
    from pq3d_tpu.data.unified_loader import UnifiedTaskLoader
    from pq3d_tpu.data.unified_pipeline import UnifiedPipelineConfig
    from pq3d_tpu.eval.grounding_eval import ScanReferEval

    cfg = Config({"data": {"synthetic": {"num_train": 5, "n_points": 300,
                                         "n_instances": 4}},
                  "debug": {"flag": False}})
    pipe = UnifiedPipelineConfig(max_obj_len=5, num_points=16,
                                 prompt_len=8, response_len=4)
    loader = UnifiedTaskLoader(SyntheticRefer(cfg, "train"), pipe,
                               batch_size=2, train=False)

    ev = ScanReferEval()
    row0 = 0
    for batch in loader(0):
        nr = batch["_meta"]["n_real"]
        rows = batch["query_locs"].shape[0]
        ids = [(row0 + i) % 5 for i in range(rows)]
        tgt = np.asarray(batch["tgt_object_id"])
        logits = np.full(tgt.shape, -10.0, np.float32)
        for i in range(rows):
            true_obj = int(tgt[i].argmax())
            hit = ids[i] % 2 == 0
            logits[i, true_obj if hit else (true_obj + 1) % tgt.shape[1]] \
                = 10.0
        out = {"og3d_logits": logits}
        eval_batch = {k: np.asarray(v) for k, v in batch.items()
                      if not k.startswith("_")}
        if single:
            lo, hi = 0, nr
        else:
            # contiguous per-process rows of the global batch (the same
            # convention _put/make_array_from_process_local_data uses)
            per = rows // 2
            lo, hi = pid * per, min((pid + 1) * per, nr)
        if hi > lo:
            ev.update({"og3d_logits": logits[lo:hi]},
                      {k: v[lo:hi] for k, v in eval_batch.items()})
        row0 += nr
    res = ev.record()   # merges across processes when process_count == 2
    print(f"RESULT og_acc={float(res['og_acc'])!r} count={ev.total_count}",
          flush=True)


if __name__ == "__main__":
    main()

"""Does BN+ReLU between z-run convs cost extra HBM round-trips, or does
XLA already fuse it into the conv epilogue?  (VERDICT r04 item 4a asks
for a fused pallas BN+ReLU-into-conv kernel OR a measured answer.)

Times an L1-shaped residual-block chain (the parity-topology hot shape:
~40k rows, C=96, z-run plans) three ways on the chip:
  conv_only   — 2 convs per block, no BN/ReLU
  conv_bnrelu — 2 convs + eval-mode BN (scale+shift) + ReLU, as shipped
  conv_synth  — 2 convs + the SAME flop count of elementwise work fused
                by construction (x * a + b then max 0 inline)
If conv_bnrelu ~= conv_only (+epsilon), XLA fuses the elementwise chain
into the conv epilogue and the pallas lever is vacuous; a large delta
means 2 HBM round-trips of the (rows, 96) activations per block survive
and a fused kernel has headroom.

Usage: python tools/bench_bnrelu_fusion.py  (BENCH_SMOKE=1 for CPU)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import time

import numpy as np

SMOKE = os.environ.get("BENCH_SMOKE") == "1"
import jax
import jax.numpy as jnp

if SMOKE:
    jax.config.update("jax_platforms", "cpu")
from pq3d_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache(jax)

from pq3d_tpu.data import synthetic
from pq3d_tpu.data.instseg_pipeline import InstSegPipelineConfig, process_scene
from pq3d_tpu.ops import kernel_maps
from pq3d_tpu.ops.sparse import sparse_conv_ztriple

C = 16 if SMOKE else 96
N_BLOCKS = 2 if SMOKE else 6     # repeat the 2-conv block to amortize


def main():
    rng = np.random.default_rng(0)
    cfg = InstSegPipelineConfig(
        voxel_size=0.15 if SMOKE else 0.02,
        num_queries=16, max_segments=64, max_instances=16,
        voxel_bucket=256 if SMOKE else 8192, use_aug=False,
        stem_mode="none")
    scene = synthetic.make_scene(rng, n_points=800 if SMOKE else 80_000,
                                 n_instances=6, n_segments=24)
    scene["inst_labels"] = np.minimum(scene["inst_labels"], 199)
    p = process_scene(scene, cfg, rng, train=False)
    h = p["hierarchy"]
    lvl = 1
    n = h.num_voxels[lvl]
    pad = h.pad_sizes[lvl]
    nbr = np.full((pad, 27), -1, np.int32)
    nbr[:n] = h.nbr3[lvl][:n]
    zb, zc = kernel_maps.build_ztriple_plan(nbr, n_pad=pad)
    print(f"# L{lvl}: {n} rows (pad {pad}), C={C}, {N_BLOCKS} blocks")

    valid = (np.arange(pad) < n)
    x = (rng.standard_normal((pad, C)) * valid[:, None]).astype(np.float32)
    w = rng.standard_normal((N_BLOCKS, 2, 27, C, C)).astype(np.float32) * .05
    scale = rng.standard_normal((N_BLOCKS, 2, C)).astype(np.float32)
    shift = rng.standard_normal((N_BLOCKS, 2, C)).astype(np.float32)
    zbj, zcj = jnp.asarray(zb), jnp.asarray(zc)
    vj = jnp.asarray(valid)
    vf = jnp.asarray(valid.astype(np.float32))

    def conv(x, wi):
        return sparse_conv_ztriple(x, zbj, zcj, wi)

    def chain(x, w, scale, shift, mode):
        for b in range(N_BLOCKS):
            res = x
            for i in range(2):
                x = conv(x, w[b, i])
                if mode == "bnrelu":
                    # eval-mode MaskedBatchNorm == scale+shift on valid rows
                    x = jnp.where(vj[:, None],
                                  jax.nn.relu(x * scale[b, i] + shift[b, i]),
                                  0.0)
                elif mode == "mulmask":
                    # same masking, float multiply instead of select
                    x = jax.nn.relu(x * scale[b, i] + shift[b, i]) \
                        * vf[:, None]
                elif mode == "shiftmask":
                    # mask only the shift: pad rows see x*a (bounded),
                    # valid rows exact — cheapest mask that keeps pads 0
                    # when x is 0 there
                    x = jax.nn.relu(x * scale[b, i]
                                    + shift[b, i] * vf[:, None])
                elif mode == "synth":
                    x = jnp.maximum(x * scale[b, i] + shift[b, i], 0.0)
            x = x + res
        return jnp.sum(x)

    fns = {m: jax.jit(lambda x, w, s, h, m=m: chain(x, w, s, h, m))
           for m in ("none", "bnrelu", "mulmask", "shiftmask", "synth")}

    for name, fn in fns.items():
        def run(k):
            t0 = time.time()
            for _ in range(k):
                o = fn(x, w, scale, shift)
            _ = float(np.asarray(o))
            return time.time() - t0
        run(1); run(2)
        t1, t2 = run(3), run(10)
        dt = max((t2 - t1) / 7, 1e-9)
        per_block = dt / N_BLOCKS * 1e3
        print(f"{name:8s}: {dt * 1e3:7.2f} ms chain  "
              f"{per_block:6.2f} ms/block", flush=True)


if __name__ == "__main__":
    main()

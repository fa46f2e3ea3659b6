"""Worker for tests/test_multihost_2proc.py — NOT a pytest module.

Runs ONE full instseg training step with the batch sharded across a
2-process JAX "cluster" (2 virtual CPU devices per process, DCN analog:
gloo), exercising launch.init_distributed, cross-process batch
construction, the SPMD train step, and the host-side object gather
(parallel/multihost.py).

Usage: python tests/_mh_worker.py <pid> <coordinator|single>
Prints one line ``RESULT loss=<repr> gather=<pids>``.
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
    if single:
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    if not single:
        from pq3d_tpu.launch import init_distributed
        init_distributed("jax", coord, 2, pid)
        assert jax.process_count() == 2
    assert len(jax.devices()) == 4

    import jax.numpy as jnp  # noqa: F401
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import __graft_entry__ as ge
    from pq3d_tpu.optim.losses import InstSegLossConfig, instseg_set_loss
    from pq3d_tpu.optim.optimizers import build_optimizer
    from pq3d_tpu.train.state import TrainState, make_train_step

    # identical on every process (seeded); 4 scenes over a data=4 mesh
    model, batch = ge._tiny_setup(batch_size=4)
    batch = jax.tree.map(np.asarray, batch)   # host leaves (incl. maps dict)
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == 4:   # batch-led: shard over 'data'
            local = x if single else x[pid * 2:(pid + 1) * 2]
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P("data")), local, x.shape)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), x, x.shape)

    gbatch = jax.tree.map(put, batch)

    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    optimizer, _ = build_optimizer(variables["params"], name="AdamW",
                                   lr=1e-4, total_steps=100, grad_norm=80.0)
    state = TrainState.create(variables, optimizer, jax.random.key(2))
    loss_cfg = InstSegLossConfig(num_classes=20)

    def loss_fn(out, b):
        return instseg_set_loss(out["predictions_class"],
                                out["predictions_mask"], b, loss_cfg)

    step = make_train_step(model, optimizer, loss_fn, donate=False)
    _new_state, metrics = step(state, gbatch)
    jax.block_until_ready(metrics)
    loss = float(metrics["loss"])

    if single:
        pids = [0]
    else:
        from pq3d_tpu.parallel.multihost import all_gather_object
        pids = sorted(o["pid"] for o in
                      all_gather_object({"pid": jax.process_index()}))
    print(f"RESULT loss={loss!r} gather={pids}", flush=True)


if __name__ == "__main__":
    main()

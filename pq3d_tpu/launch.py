"""Multi-host launcher.

Replaces the reference's submitit/accelerate launch stack (reference:
launch.py:6-64, common/launch_utils.py:15-121) with the JAX single-controller
model: one Python process per host, connected with
``jax.distributed.initialize`` over DCN; XLA owns all collectives.

Modes:
  python  — single-host debug (no distributed init)
  jax     — multi-host: coordinator/rank from flags or TPU env metadata
  slurm   — derive coordinator + rank from SLURM_* env vars

  python -m pq3d_tpu.launch --mode slurm -- --config-name <cfg.yaml> k=v...
"""
from __future__ import annotations

import argparse
import os


def init_distributed(mode: str, coordinator: str | None, num_processes: int | None,
                     process_id: int | None) -> None:
    import jax
    if mode == "python":
        return
    if mode == "slurm":
        # (ref launch_utils.py:16-47 derives rank/ip from SLURM; jax has
        # native cluster detection for SLURM + TPU pods)
        jax.distributed.initialize()
        return
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def main(argv=None):
    parser = argparse.ArgumentParser("pq3d_tpu.launch")
    parser.add_argument("--mode", default="python",
                        choices=["python", "jax", "slurm"])
    parser.add_argument("--coordinator", default=None,
                        help="coordinator ip:port (jax mode)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("run_args", nargs=argparse.REMAINDER,
                        help="arguments forwarded to pq3d_tpu.run (prefix --)")
    args = parser.parse_args(argv)

    init_distributed(args.mode, args.coordinator, args.num_processes,
                     args.process_id)

    run_args = args.run_args
    if run_args and run_args[0] == "--":
        run_args = run_args[1:]
    from pq3d_tpu.run import main as run_main
    run_main(run_args)


if __name__ == "__main__":
    main()

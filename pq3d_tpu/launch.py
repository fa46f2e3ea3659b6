"""Multi-host launcher.

Replaces the reference's submitit/accelerate launch stack (reference:
launch.py:6-64, common/launch_utils.py:15-121) with the JAX single-controller
model: one Python process per host, connected with
``jax.distributed.initialize`` over DCN; XLA owns all collectives.

Modes:
  python  — single-host debug (no distributed init)
  jax     — multi-host: coordinator/rank from flags or TPU env metadata
  slurm   — derive coordinator + rank from SLURM_* env vars
  submit  — write + sbatch a requeueing SLURM job (parity with the
            reference's submitit path: requeue on timeout/preemption with a
            120 s warning signal, ref common/launch_utils.py:60-74; the
            trainer checkpoints on that signal and run.py resume=True
            restarts from the snapshot)

  python -m pq3d_tpu.launch --mode slurm -- --config-name <cfg.yaml> k=v...
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys


def submit_slurm(args, run_args) -> None:
    """Generate + submit a requeueing sbatch script."""
    lines = [
        "#!/bin/bash",
        f"#SBATCH --job-name={args.job_name}",
        f"#SBATCH --nodes={args.nodes}",
        "#SBATCH --ntasks-per-node=1",
        "#SBATCH --requeue",
        "#SBATCH --open-mode=append",
        # 120 s warning before SLURM kills us (ref slurm_signal_delay_s)
        f"#SBATCH --signal=USR1@{args.signal_delay_s}",
    ]
    if args.partition:
        lines.append(f"#SBATCH --partition={args.partition}")
    if args.time:
        lines.append(f"#SBATCH --time={args.time}")
    fwd = " ".join(run_args)
    lines += [
        "",
        # resume=True on requeue restarts from the exp-dir snapshot
        f"srun {sys.executable} -m pq3d_tpu.launch --mode slurm -- "
        f"{fwd} resume=True",
        "",
    ]
    path = args.sbatch_file or "launch.sbatch"
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"[launch] wrote {path}")
    subprocess.run(["sbatch", path], check=True)


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
                        choices=["python", "jax", "slurm", "submit"])
    parser.add_argument("--coordinator", default=None,
                        help="coordinator ip:port (jax mode)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--nodes", type=int, default=1)
    parser.add_argument("--partition", default=None)
    parser.add_argument("--time", default=None)
    parser.add_argument("--job-name", default="pq3d_tpu")
    parser.add_argument("--signal-delay-s", type=int, default=120)
    parser.add_argument("--sbatch-file", default=None)
    parser.add_argument("run_args", nargs=argparse.REMAINDER,
                        help="arguments forwarded to pq3d_tpu.run (prefix --)")
    args = parser.parse_args(argv)

    run_args = args.run_args
    if run_args and run_args[0] == "--":
        run_args = run_args[1:]

    if args.mode == "submit":
        submit_slurm(args, run_args)
        return

    init_distributed(args.mode, args.coordinator, args.num_processes,
                     args.process_id)
    from pq3d_tpu.run import main as run_main
    run_main(run_args)


if __name__ == "__main__":
    main()

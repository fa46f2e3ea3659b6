"""Summarize a chip_runs/<stamp>/ playbook directory into one table.

Parses the per-step logs the measurement playbooks write
(tools/chip_playbook.sh / chip_playbook2.sh) and prints:
  - instseg forward ladder (ms/step + scenes/s per variant)
  - training-step ladder (s/step per lever combo)
  - unified train A/B (base vs flat-object layout)
  - ball-query / gather microbenches
  - the final bench.py JSON line, if present

Usage: python tools/fold_chip_results.py [chip_runs/<stamp>]
       (default: chip_runs/latest)
"""
import glob
import json
import os
import re
import sys


def _read(path):
    try:
        with open(path) as f:
            return f.read()
    except OSError:
        return ""


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "chip_runs/latest"
    if not os.path.isdir(d):
        sys.exit(f"no such run dir: {d}")
    logs = sorted(glob.glob(os.path.join(d, "*.log")))
    rows = []
    bench_json = None
    for path in logs:
        name = os.path.basename(path)
        if name == "playbook.log":
            continue
        text = _read(path)
        # bench_instseg_fwd: "<variant> : 123.4 ms/step  1.23 scenes/s"
        for m in re.finditer(
                r"^(\w+)\s*:\s*([\d.]+) ms/step\s+([\d.]+) scenes/s",
                text, re.M):
            rows.append((name, f"fwd/{m.group(1)}",
                         f"{float(m.group(2)):9.1f} ms",
                         f"{m.group(3)} sc/s"))
        # bench_train_step: "train step [none/scatter_free/base]: 2290 ms
        # -> 1.75 scenes/s training"
        for m in re.finditer(
                r"^train step \[([\w,/+-]+)\]: ([\d.]+) ms -> "
                r"([\d.]+) scenes/s", text, re.M):
            rows.append((name, f"train/{m.group(1)}",
                         f"{float(m.group(2)):9.0f} ms",
                         f"{m.group(3)} sc/s"))
        # bench_unified_train: "unified_train[flat] B=128: 950.5 ms/step ..."
        for m in re.finditer(
                r"unified_train\[(\w+)\] B=(\d+): ([\d.]+) ms/step\s+"
                r"([\d.]+) scenes/s", text):
            rows.append((name, f"unitrain/{m.group(1)}@B{m.group(2)}",
                         f"{float(m.group(3)):9.1f} ms",
                         f"{m.group(4)} sc/s"))
        # ball query: "topk: 3.59 ms for 2 groups"
        for m in re.finditer(r"^(\w+): ([\d.]+) ms for", text, re.M):
            rows.append((name, f"ballq/{m.group(1)}",
                         f"{float(m.group(2)):9.2f} ms", ""))
        # bench_serve: "serve_instseg: 12.34 scenes/s p50=55.1 ms
        # p99=80.2 ms steps=8 compiles=1 wall=2.60 s" (chip_playbook3)
        for m in re.finditer(
                r"^serve_(\w+): ([\d.]+) scenes/s p50=([\d.]+) ms "
                r"p99=([\d.]+) ms", text, re.M):
            rows.append((name, f"serve/{m.group(1)}",
                         f"{float(m.group(2)):9.2f} sc/s",
                         f"p50={m.group(3)} p99={m.group(4)} ms"))
        # overfit sanity: "final loss 3.21" ... "AP PIPELINE OK"
        m = re.search(r"^final loss ([\d.]+)", text, re.M)
        if m:
            ok = "OK" if "AP PIPELINE OK" in text else "INCOMPLETE"
            rows.append((name, "overfit/final_loss",
                         f"{float(m.group(1)):9.2f}", ok))
        # bench.py final JSON
        for line in text.splitlines():
            if line.startswith("{") and '"metric"' in line:
                try:
                    bench_json = json.loads(line)
                except json.JSONDecodeError:
                    pass

    if not rows and bench_json is None:
        print(f"{d}: no parsable results yet")
        summary = _read(os.path.join(d, "playbook.log"))
        if summary:
            print(summary.strip().splitlines()[-1])
        return

    width = max((len(r[1]) for r in rows), default=12)
    last_file = None
    for fname, key, val, extra in rows:
        tag = fname if fname != last_file else ""
        last_file = fname
        print(f"{tag:24s} {key:{width}s} {val} {extra}")

    if bench_json is not None:
        print("\nbench.py:", json.dumps(bench_json))
        det = bench_json.get("detail", {})
        for k in ("unified_variants_ms", "instseg_variants_ms"):
            if k in det:
                best = min(det[k], key=det[k].get)
                print(f"  best {k.split('_')[0]} variant: {best} "
                      f"({det[k][best]} ms)")


if __name__ == "__main__":
    main()

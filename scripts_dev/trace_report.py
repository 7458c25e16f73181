"""Aggregate op durations from a jax profiler trace.json.gz (perfetto-style).

Usage: python scripts_dev/trace_report.py /tmp/jax_trace [n_top]
Groups TPU-track slices by op name prefix, prints total ms over the traced
window and per-step (assumes 3 steps traced unless STEPS env set).
"""
import gzip
import json
import os
import re
import sys
from collections import defaultdict
from pathlib import Path


def main():
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace")
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    steps = int(os.environ.get("STEPS", "3"))
    files = sorted(root.glob("plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise SystemExit(f"no trace.json.gz under {root}")
    data = json.loads(gzip.open(files[-1]).read())
    events = data["traceEvents"]
    # find TPU device track pids (process names containing 'TPU' or 'device')
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if re.search(r"TPU|Device|/device", n, re.I)}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "step" in tname.lower():
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1000.0  # us -> ms
        agg[name] += dur
        cnt[name] += 1
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"file: {files[-1]}")
    print(f"device tracks: {[pid_names[p] for p in dev_pids]}")
    print(f"total device time: {total:.1f} ms over {steps} steps "
          f"= {total/steps:.1f} ms/step")
    print(f"{'ms/step':>9} {'count':>6}  name")
    for name, ms in rows[:n_top]:
        print(f"{ms/steps:9.3f} {cnt[name]//steps:6d}  {name[:110]}")


if __name__ == "__main__":
    main()

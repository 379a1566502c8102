"""Shared helpers for on-chip profiling tools: run a jax.profiler trace and
aggregate device-op durations from the Chrome trace JSON."""
import glob
import gzip
import json
import os
from collections import defaultdict


def aggregate_trace(trace_dir: str, iters: int, top: int = 40):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    paths.sort(key=os.path.getmtime)
    if not paths:
        print("no trace found")
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        key = name.split(".")[0]
        agg[key] += dur
        cnt[key] += 1
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    print(f"-- top ops by total time ({iters} iters), total {total:.1f} ms --")
    for name, ms in rows:
        print(f"{ms/iters:9.3f} ms/iter  x{cnt[name]:5d}  {name[:90]}")

"""Parse a jax.profiler trace (trace.json.gz) and attribute device time to
leaf XLA ops ("XLA Ops" thread only — parent rollup threads like
"TensorFlow Name Scope"/module rows double-count).

Usage: python scripts/parse_trace.py [trace_dir]
"""
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nshmc_trace_energy"
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files under", trace_dir)
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)

    pid_name = {}
    tid_name = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev["args"].get("name", "")
        elif ev.get("name") == "thread_name":
            tid_name[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")

    # collect leaf events per thread, then compute SELF time (event
    # duration minus nested children on the same thread) so parent rows
    # like `while` don't double-count their bodies
    by_thread = defaultdict(list)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        tname = tid_name.get((ev.get("pid"), ev.get("tid")), "")
        if "XLA Ops" not in tname:
            continue
        by_thread[(ev["pid"], ev["tid"])].append(
            (ev.get("ts", 0), ev.get("dur", 0), ev.get("name", "")))

    op_time = defaultdict(float)
    op_count = defaultdict(int)
    total = 0.0
    span_min, span_max = float("inf"), 0.0
    for evs in by_thread.values():
        for ts, dur, _ in evs:
            span_min = min(span_min, ts / 1e6)
            span_max = max(span_max, (ts + dur) / 1e6)
    for evs in by_thread.values():
        evs.sort(key=lambda e: (e[0], -e[1]))
        # stack entries: [end_ts, key, dur_s, child_s]
        stack = []

        def pop_one():
            nonlocal total
            end, key, dur_s, child_s = stack.pop()
            self_s = dur_s - child_s
            op_time[key] += self_s
            op_count[key] += 1
            total += self_s
            if stack:
                stack[-1][3] += dur_s

        for ts, dur, name in evs:
            while stack and ts >= stack[-1][0]:
                pop_one()
            stack.append(
                [ts + dur, re.sub(r"[.\d]+$", "", name), dur / 1e6, 0.0])
        while stack:
            pop_one()

    cat_time = defaultdict(float)
    for k, v in op_time.items():
        if "convolution" in k:
            cat_time["convolution"] += v
        elif "attention" in k or "custom-call" in k:
            cat_time["custom_call"] += v
        elif "fusion" in k:
            cat_time["fusion"] += v
        elif "copy" in k or "bitcast" in k:
            cat_time["copy"] += v
        elif "dot" in k:
            cat_time["dot"] += v
        else:
            cat_time["other"] += v

    print(json.dumps({
        "trace_file": sorted(files)[-1],
        "busy_device_s": round(total, 4),
        "wall_span_s": round(span_max - span_min, 4),
        "by_category_s": {k: round(v, 4) for k, v in
                          sorted(cat_time.items(), key=lambda kv: -kv[1])},
        "top_ops": [
            {"op": k, "s": round(v, 4), "n": op_count[k]}
            for k, v in sorted(op_time.items(), key=lambda kv: -kv[1])[:30]
        ],
    }, indent=1))


if __name__ == "__main__":
    main()

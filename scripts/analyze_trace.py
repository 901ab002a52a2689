#!/usr/bin/env python
"""Parse a jax.profiler chrome-trace (trace.json.gz) and report per-track
busy time, duty cycle, and the top ops — the measured counterpart to
bench.py's model-FLOP MFU (VERDICT r2: "profile, don't model").

Usage: python scripts/analyze_trace.py <trace_dir> [--top 12]
Scans <trace_dir> recursively for *.trace.json(.gz); prints one JSON
summary per file.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def load_events(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def analyze(path, top_n):
    events = load_events(path)
    # process/thread name metadata
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    tracks = collections.defaultdict(lambda: {"busy": 0.0, "t0": None,
                                              "t1": None,
                                              "ops": collections.Counter()})
    for e in events:
        if e.get("ph") != "X":
            continue
        pid, tid = e.get("pid"), e.get("tid")
        key = f"{pnames.get(pid, pid)}/{tnames.get((pid, tid), tid)}"
        tr = tracks[key]
        ts, dur = e.get("ts", 0.0), e.get("dur", 0.0)
        tr["busy"] += dur
        tr["t0"] = ts if tr["t0"] is None else min(tr["t0"], ts)
        tr["t1"] = (ts + dur if tr["t1"] is None
                    else max(tr["t1"], ts + dur))
        tr["ops"][e.get("name", "?")] += dur

    out = {"file": os.path.relpath(path), "tracks": {}}
    for key, tr in sorted(tracks.items(),
                          key=lambda kv: -kv[1]["busy"])[:8]:
        span = (tr["t1"] - tr["t0"]) if tr["t1"] else 0.0
        out["tracks"][key] = {
            "busy_ms": round(tr["busy"] / 1e3, 1),
            "span_ms": round(span / 1e3, 1),
            "duty_pct": round(100.0 * tr["busy"] / span, 1) if span else 0,
            "top_ops_ms": {k: round(v / 1e3, 1)
                           for k, v in tr["ops"].most_common(top_n)},
        }
    return out


def category_self_time(path):
    """Self-time (nested-event-corrected) by hlo_category on the device
    "XLA Ops" track — the measured matmul-vs-everything-else split.

    Events on that track nest (a while contains its body ops); plain
    duration sums double-count 3×.  A sweep subtracts each event's
    duration from its innermost enclosing parent, leaving true
    self-time, then groups by the trace's own ``hlo_category`` tag."""
    events = load_events(path)
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    lst = []
    for e in events:
        if e.get("ph") != "X":
            continue
        if ("TPU" in pnames.get(e["pid"], "")
                and "XLA Ops" in tnames.get((e["pid"], e.get("tid")), "")):
            lst.append((e["ts"], e.get("dur", 0.0),
                        e.get("args", {}).get("hlo_category", "?")))
    # Sort longer events first at equal start so a child sharing its
    # parent's start timestamp nests UNDER the parent rather than before
    # it (ADVICE r3: bare (ts, dur) ascending mis-attributed the parent's
    # duration to the child's self-time).
    lst.sort(key=lambda e: (e[0], -e[1]))
    self_time = [0.0] * len(lst)
    stack = []
    for i, (ts, dur, _cat) in enumerate(lst):
        while stack and ts >= lst[stack[-1]][0] + lst[stack[-1]][1]:
            stack.pop()
        if stack:
            self_time[stack[-1]] -= dur
        self_time[i] += dur
        stack.append(i)
    agg = collections.Counter()
    for i, (_ts, _dur, cat) in enumerate(lst):
        if self_time[i] > 0:
            agg[cat] += self_time[i]
    total = sum(agg.values())
    return {
        "total_s": round(total / 1e6, 2),
        "by_category_pct": {c: round(100.0 * t / total, 1)
                            for c, t in agg.most_common(12)},
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=12)
    p.add_argument("--categories", action="store_true",
                   help="also print the device self-time split by "
                        "hlo_category")
    ns = p.parse_args()
    paths = sorted(glob.glob(os.path.join(ns.trace_dir, "**",
                                          "*.trace.json*"),
                             recursive=True))
    if not paths:
        print(f"no trace.json files under {ns.trace_dir}", file=sys.stderr)
        sys.exit(1)
    for path in paths:
        out = analyze(path, ns.top)
        if ns.categories:
            out["device_self_time"] = category_self_time(path)
        print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

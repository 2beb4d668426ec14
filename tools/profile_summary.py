#!/usr/bin/env python
"""Summarize a jax.profiler trace (as written by ``train.py
--profile_steps N --profile_dir D``) into a per-op device-time table.

The TensorBoard profile plugin renders these traces interactively; on a
headless TPU host this gives the same attribution as a CLI one-liner:

    python tools/profile_summary.py runs/profile

Reads the newest ``plugins/profile/<run>/*.trace.json.gz`` (the perfetto
JSON the profiler always emits alongside the xplane.pb), sums durations of
device-lane events, and buckets them into MXU (convolution/dot fusions),
vector/elementwise, data movement (copy/transpose/reshape/dynamic-slice),
collectives, and infeed/outfeed — the categories that matter when pushing
MFU (VERDICT round-1 item #6: attribute the non-MXU time).
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(log_dir: str) -> str:
    pats = [os.path.join(log_dir, "plugins", "profile", "*", "*.trace.json.gz"),
            os.path.join(log_dir, "**", "*.trace.json.gz")]
    hits: list[str] = []
    for p in pats:
        hits.extend(glob.glob(p, recursive=True))
    if not hits:
        raise SystemExit(f"no *.trace.json.gz under {log_dir}")
    return max(hits, key=os.path.getmtime)


_BUCKETS = (
    # order matters: first match wins
    ("mxu", re.compile(r"convolution|conv[_.]|%dot|^dot|cumsum|einsum")),
    ("collective", re.compile(r"all-reduce|all-gather|reduce-scatter|"
                              r"collective|psum")),
    ("data-movement", re.compile(r"copy|transpose|reshape|slice|pad|"
                                 r"concatenate|gather|scatter|bitcast|"
                                 r"reverse|broadcast")),
    ("infeed/outfeed", re.compile(r"infeed|outfeed|send|recv|transfer")),
    ("reduce/norm", re.compile(r"reduce|norm")),
    ("elementwise", re.compile(r"fusion|add|multiply|subtract|divide|"
                               r"maximum|minimum|exp|log|rsqrt|sqrt|"
                               r"select|compare|convert|tanh|logistic")),
)


def bucket_of(name: str) -> str:
    low = name.lower()
    for bucket, pat in _BUCKETS:
        if pat.search(low):
            return bucket
    return "other"


def summarize(trace_path: str, top: int = 25):
    with gzip.open(trace_path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # process-id -> name from metadata events; device lanes contain "TPU"
    # ("/device:TPU:0 ..." pids) or "XLA Op"-style thread names on CPU.
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    device_pids = {pid for pid, name in pid_names.items()
                   if "TPU" in name or "GPU" in name or "device" in name.lower()}
    if not device_pids:  # CPU traces: everything is host; take all pids
        device_pids = set(pid_names)

    # skip enclosing spans (whole-module "jit_*" events and bare step
    # numbers) — only leaf XLA ops count, or busy time double-counts
    skip = re.compile(r"^\d+$|^jit_|^XLA Modules|^Steps$")
    per_op = collections.Counter()
    per_bucket = collections.Counter()
    t0, t1 = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if skip.match(name):
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        per_op[name] += dur
        per_bucket[bucket_of(name)] += dur
        ts = float(e.get("ts", 0.0))
        t0, t1 = min(t0, ts), max(t1, ts + dur)

    total = sum(per_op.values())
    span = (t1 - t0) if t1 > t0 else 0.0
    print(f"trace: {trace_path}")
    print(f"device busy: {total / 1e3:.2f} ms over a {span / 1e3:.2f} ms "
          f"span ({100 * total / span if span else 0:.0f}% occupancy)\n")
    print(f"{'bucket':<16}{'ms':>10}{'share':>8}")
    for bucket, dur in per_bucket.most_common():
        print(f"{bucket:<16}{dur / 1e3:>10.2f}{100 * dur / total:>7.1f}%")
    print(f"\ntop {top} ops:")
    print(f"{'ms':>9}  {'share':>6}  op")
    for name, dur in per_op.most_common(top):
        print(f"{dur / 1e3:>9.2f}  {100 * dur / total:>5.1f}%  {name[:90]}")
    return per_bucket, per_op


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("log_dir", nargs="?", default="runs/profile")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    summarize(find_trace(args.log_dir), args.top)

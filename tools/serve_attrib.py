#!/usr/bin/env python
"""Attribute serving throughput per stage for one model (VERDICT r4 #5).

Round 4 left RRDB serving at "29 req/s under 32-way concurrency" with no
breakdown against its 1,166 img/s batch-256 inference capacity. This tool
produces the committed attribution: it launches serve.py with
``--instrument`` (per-batch execute-vs-D2H split + decode/encode timers),
drives it with tools/serve_loadtest.py, snapshots ``/statz`` before and
after the measured run, and emits per-request millisecond shares for
  window-collect | H2D | device execute | D2H | decode | encode
plus the coalescing stats (batches_per_item, rows/batch). Optionally
repeats the run over several ``--batch_window_ms`` values (the one cheap
knob: a window matched to the model's forward) and records each.

Run (owns the chip for the duration):
    python tools/serve_attrib.py --architecture auto \
        --checkpoint weights/winner_rrdb_best --windows 3,12,48 \
        --out runs/serve_attrib_rrdb.json
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch_json(url, timeout=10):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read())


def wait_healthy(port, deadline_s=2400):
    # --warmup precompiles ~8 (bucket x occupancy) programs before the
    # socket opens; cold through the axon tunnel that can exceed 15 min
    t0 = time.time()
    while time.time() - t0 < deadline_s:
        try:
            return fetch_json(f"http://127.0.0.1:{port}/healthz", timeout=5)
        except Exception:
            time.sleep(3)
    raise TimeoutError("server never became healthy")


def run_leg(args, window_ms: float) -> dict:
    port = args.port
    cmd = [sys.executable, os.path.join(ROOT, "serve.py"),
           "--architecture", args.architecture,
           "--port", str(port), "--warmup", "--instrument",
           "--batch_window_ms", str(window_ms),
           "--max_batch", str(args.max_batch)]
    # explicit either way: the server's default is adaptive ON, but the
    # A/B legs must pin the mode they claim to measure
    cmd += ["--adaptive_window"] if args.adaptive else ["--no_adaptive_window"]
    if args.checkpoint:
        cmd += ["--checkpoint", args.checkpoint]
    if args.quantize:
        cmd += ["--quantize", args.quantize]
    log(f"[window {window_ms}ms] starting server ...")
    with open(f"/tmp/serve_attrib_{window_ms}.log", "w") as logf:
        proc = subprocess.Popen(cmd, cwd=ROOT, stdout=logf, stderr=logf)
    try:
        wait_healthy(port)
        # warm the HTTP/loadtest path (also absorbs any leftover compiles)
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "serve_loadtest.py"),
             "--port", str(port), "--concurrency", str(args.concurrency),
             "--requests", str(max(args.concurrency * 2, 32)),
             "--warmup", "8", "--width", str(args.width),
             "--height", str(args.height)],
            cwd=ROOT, capture_output=True, text=True, timeout=900)
        before = fetch_json(f"http://127.0.0.1:{port}/statz")
        lt = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "serve_loadtest.py"),
             "--port", str(port), "--concurrency", str(args.concurrency),
             "--requests", str(args.requests), "--warmup", "0",
             "--width", str(args.width), "--height", str(args.height)],
            cwd=ROOT, capture_output=True, text=True, timeout=1800)
        after = fetch_json(f"http://127.0.0.1:{port}/statz")
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()

    # loadtest prints a one-line JSON tail (req/s, latency percentiles)
    lt_line = None
    for ln in (lt.stdout or "").splitlines()[::-1]:
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                lt_line = json.loads(ln)
                break
            except ValueError:
                continue
    d = {k: (after.get(k, 0) or 0) - (before.get(k, 0) or 0)
         for k in ("served", "device_batches", "batched_items",
                   "rows_fetched", "t_collect_s", "t_h2d_s",
                   "t_exec_fetch_s", "t_exec_s", "t_d2h_s",
                   "t_decode_s", "t_encode_s")}
    n = max(d["served"], 1)
    leg = {
        "window_ms": window_ms,
        "max_batch": args.max_batch,
        "adaptive": args.adaptive,
        "loadtest": lt_line,
        "served": d["served"],
        "batches_per_item": round(d["device_batches"]
                                  / max(d["batched_items"], 1), 4),
        "items_per_batch": round(d["batched_items"]
                                 / max(d["device_batches"], 1), 2),
        "rows_fetched_per_batch": round(d["rows_fetched"]
                                        / max(d["device_batches"], 1), 2),
        "per_request_ms": {
            "collect_window": round(d["t_collect_s"] / n * 1e3, 2),
            "h2d": round(d["t_h2d_s"] / n * 1e3, 2),
            "device_exec": round(d["t_exec_s"] / n * 1e3, 2),
            "d2h": round(d["t_d2h_s"] / n * 1e3, 2),
            "decode": round(d["t_decode_s"] / n * 1e3, 2),
            "encode": round(d["t_encode_s"] / n * 1e3, 2),
        },
    }
    log(f"[window {window_ms}ms] {leg}")
    return leg


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--architecture", default="auto")
    ap.add_argument("--checkpoint", default="weights/winner_rrdb_best")
    ap.add_argument("--quantize", default="")
    ap.add_argument("--port", type=int, default=8731)
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--adaptive", action="store_true",
                    help="pass --adaptive_window to the server under test")
    ap.add_argument("--concurrency", type=int, default=32)
    ap.add_argument("--requests", type=int, default=192)
    ap.add_argument("--width", type=int, default=56)
    ap.add_argument("--height", type=int, default=40)
    ap.add_argument("--windows", default="3",
                    help="comma list of batch_window_ms values to A/B")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    legs = [run_leg(args, float(w)) for w in args.windows.split(",")]
    doc = {"architecture": args.architecture, "checkpoint": args.checkpoint,
           "concurrency": args.concurrency, "requests": args.requests,
           "lr_size": [args.height, args.width],
           "date": time.strftime("%Y-%m-%d"), "legs": legs}
    text = json.dumps(doc, indent=1)
    print(text)
    if args.out:
        with open(os.path.join(ROOT, args.out), "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()

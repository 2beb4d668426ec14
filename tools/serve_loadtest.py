#!/usr/bin/env python
"""Concurrency load test for serve.py.

POSTs one image repeatedly from N concurrent workers and prints a single
JSON line with throughput and latency percentiles:

    python serve.py --architecture SRCNN --port 8701 &
    python tools/serve_loadtest.py --port 8701 --concurrency 32 --requests 256

(The reference project has no serving path at all — its closest analogue is
the offline per-image timing table in reference visualize.py:114-122.)
"""
from __future__ import annotations

import argparse
import http.client
import io
import json
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image


def make_image(w: int, h: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8700)
    p.add_argument("--concurrency", type=int, default=32)
    p.add_argument("--requests", type=int, default=256)
    p.add_argument("--width", type=int, default=56)
    p.add_argument("--height", type=int, default=40)
    p.add_argument("--warmup", type=int, default=8,
                   help="untimed requests first (compile + cache warm)")
    p.add_argument("--model", action="append", default=[],
                   help="route via /sr?model=NAME; repeat to round-robin "
                        "across models (exercises serve.py --model "
                        "multi-model routing under load)")
    p.add_argument("--format", default="png", choices=["png", "jpeg"],
                   help="response encoding (?format=jpeg exercises the "
                        "native JPEG encoder — the cheaper host path when "
                        "encode is the bottleneck)")
    a = p.parse_args()

    body = make_image(a.width, a.height)
    local = threading.local()  # one keep-alive connection per worker

    magic = b"\x89PNG" if a.format == "png" else b"\xff\xd8"

    def one(i):
        qs = []
        if a.model:
            qs.append(f"model={a.model[i % len(a.model)]}")
        if a.format != "png":
            qs.append(f"format={a.format}")
        path = "/sr" + ("?" + "&".join(qs) if qs else "")
        t0 = time.perf_counter()
        for attempt in (0, 1):  # reconnect once on a dropped keep-alive
            conn = getattr(local, "conn", None)
            if conn is None:
                conn = http.client.HTTPConnection(a.host, a.port, timeout=600)
                local.conn = conn
            try:
                conn.request("POST", path, body=body)
                out = conn.getresponse().read()
                break
            except (http.client.HTTPException, OSError):
                conn.close()
                local.conn = None
                if attempt:
                    raise
        assert out[: len(magic)] == magic, "bad response"
        return time.perf_counter() - t0

    with ThreadPoolExecutor(max_workers=a.concurrency) as pool:
        list(pool.map(one, range(a.warmup)))  # warm: compile + PIL caches
        t0 = time.perf_counter()
        lat = sorted(pool.map(one, range(a.requests)))
        wall = time.perf_counter() - t0

    def pct(q):
        return lat[min(len(lat) - 1, int(q * len(lat)))] * 1e3

    line = {
        "requests": a.requests, "concurrency": a.concurrency,
        "req_per_s": round(a.requests / wall, 2),
        "p50_ms": round(pct(0.50), 1), "p95_ms": round(pct(0.95), 1),
        "max_ms": round(pct(1.0), 1),
        "image": f"{a.width}x{a.height}", "format": a.format,
    }
    if a.model:
        line["models"] = a.model
    print(json.dumps(line))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Offline bulk super-resolution CLI — directory in, directory out.

The reference exposes trained models only through its report tool
(reference visualize.py) or ad-hoc scripts; production deployments also
need plain batch inference. This drives the same engine as serve.py
(SRServer: checkpoint/auto-architecture loading, uint8 jit boundary,
micro-batched device dispatch, exact halo tiling for arbitrary sizes,
optional x8 self-ensemble TTA) without the HTTP layer: a submitter thread
pool keeps the micro-batcher full, so same-bucket images coalesce into
single padded device batches exactly as concurrent HTTP requests would.

    python predict.py photos/ --out_dir sr_out \
        --architecture AttentionSR --checkpoint weights/model_best
    python predict.py "shots/*.png" --out_dir out --tta --format jpeg

Prints one JSON summary line (n_images, wall_s, images_per_s, failures).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import jax.numpy as jnp
import numpy as np
from PIL import Image

from food101_sr_tpu.native import encode_jpeg_rgb8, encode_png_rgb8

EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}


def collect_inputs(patterns):
    """(paths, empty_patterns): every input that matched nothing is
    reported — silently dropping a typoed directory while other inputs
    match would let a run claim success on a fraction of the request."""
    paths, empty = [], []
    for pat in patterns:
        if os.path.isdir(pat):
            hits = []
            for root, _, files in os.walk(pat):
                hits.extend(os.path.join(root, f) for f in files
                            if os.path.splitext(f)[1].lower() in EXTS)
        else:
            hits = glob.glob(pat)
            if not hits and os.path.splitext(pat)[1].lower() in EXTS:
                hits = [pat]  # let the open() below report the miss
        if not hits:
            empty.append(pat)
        paths.extend(hits)
    return sorted(dict.fromkeys(paths)), empty  # stable order, deduped


def output_names(paths, suffix, ext):
    """Collision-free output filename per input. Recursive walks can yield
    duplicate stems (a/cat.png, b/cat.png) — last-writer-wins overwrites
    would silently drop results, so duplicates get _2, _3, ... in input
    order."""
    names, used = {}, set()
    for path in paths:
        stem = os.path.splitext(os.path.basename(path))[0]
        name, n = stem + suffix + ext, 2
        while name in used:
            name = f"{stem}_{n}{suffix}{ext}"
            n += 1
        used.add(name)
        names[path] = name
    return names


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("inputs", nargs="+",
                   help="image files, directories (recursed), or globs")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--architecture", default="AttentionSR",
                   help="registry name, or 'auto' to infer from --checkpoint")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--tile", type=int, default=64)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--concurrency", type=int, default=8,
                   help="submitter threads (same-bucket images coalesce "
                        "into one device batch, as in serve.py)")
    p.add_argument("--tta", action="store_true",
                   help="x8 geometric self-ensemble (quality mode)")
    p.add_argument("--format", default="png", choices=["png", "jpeg"])
    p.add_argument("--jpeg_quality", type=int, default=92)
    p.add_argument("--suffix", default="_x{scale}",
                   help="appended to each stem; {scale} is substituted")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--quantize", default="", choices=["", "int8", "int8_dot"],
                   help="dynamic-int8 body convs (see serve.py --quantize)")
    p.add_argument("--warmup", action="store_true",
                   help="precompile shape buckets before timing")
    p.add_argument("--strict", action="store_true",
                   help="exit 1 if ANY image fails (default: per-file "
                        "failure isolation — exit 0 with a nonzero "
                        "'failed' count in the JSON summary unless every "
                        "image failed)")
    args = p.parse_args()

    paths, empty = collect_inputs(args.inputs)
    if empty:
        p.error(f"these inputs matched no images: {empty!r}")
    if not paths:
        p.error(f"no images found under {args.inputs!r}")
    os.makedirs(args.out_dir, exist_ok=True)

    from serve import SRServer  # engine shared with the HTTP server

    server = SRServer(args.architecture, args.checkpoint, scale=args.scale,
                      tile=args.tile, max_batch=args.max_batch,
                      dtype=jnp.bfloat16 if args.dtype == "bfloat16"
                      else jnp.float32, tta=args.tta,
                      quantize=args.quantize)
    if args.warmup:
        server.warmup()

    suffix = args.suffix.format(scale=server.scale)
    ext = ".png" if args.format == "png" else ".jpg"
    names = output_names(paths, suffix, ext)

    def run_one(path):
        try:
            img = Image.open(path)
            out = np.asarray(server.upscale(img))
            dst = os.path.join(args.out_dir, names[path])
            payload = (encode_png_rgb8(out, level=1)
                       if args.format == "png"
                       else encode_jpeg_rgb8(out, quality=args.jpeg_quality))
            with open(dst, "wb") as f:
                f.write(payload)
            return path, None
        except Exception as e:  # one bad file must not sink the batch
            return path, f"{type(e).__name__}: {e}"

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=max(1, args.concurrency)) as pool:
        results = list(pool.map(run_one, paths))
    wall = time.perf_counter() - t0  # batcher thread is a daemon: no join

    failures = [(p_, err) for p_, err in results if err]
    for path, err in failures:
        print(f"FAILED {path}: {err}", file=sys.stderr)
    n_ok = len(results) - len(failures)
    print(json.dumps({
        "n_images": n_ok,
        "failed": len(failures),
        "wall_s": round(wall, 3),
        "images_per_s": round(n_ok / wall, 2) if wall > 0 else None,
        "out_dir": args.out_dir,
        "architecture": server.arch,
        "scale": server.scale,
        "tta": bool(args.tta),
    }))
    if failures and (args.strict or not n_ok):
        sys.exit(1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""AOT-export the serving forward as self-contained StableHLO artifacts.

The reference deploys nothing — its trained models exist only as `.pth`
state_dicts consumed by its own scripts (reference visualize.py:17-22).
A TPU-native production story wants a deployment artifact that needs no
model code, no checkpoint loading, and no Python framework at serve time
beyond a thin `jax.export` loader: this tool serializes the EXACT serving
program (`serve.py`'s uint8->uint8 jit boundary `_sr_u8` — ToTensor,
forward with the fused phase tail, clip + 255-quantization all inside) per
shape bucket, with the checkpoint's parameters baked in as constants.

    python tools/export_serving.py --architecture SRCNN --out /tmp/aot \
        --shapes 64x64,128x128 --batch 8 --check
    python tools/export_serving.py --architecture auto \
        --checkpoint weights/winner_attentionsr_best --out /tmp/aot --check

Artifact layout:
    <out>/manifest.json                 arch/scale/dtype/buckets/hashes
    <out>/sr_<h>x<w>_b<batch>.jaxexport jax.export serialized bytes

Deploying is three lines:
    from jax import export
    exp = export.deserialize(open(path, 'rb').read())
    sr_u8 = exp.call(batch_u8)          # (B,H,W,3) uint8 -> (B,sH,sW,3)

--check deserializes every blob and asserts byte-exact agreement with the
live serving forward on random uint8 input. Params are embedded per
bucket (a self-contained blob is the point; AttentionSR@96ch costs ~23 MB
per bucket — export fewer, larger buckets for big fleets).
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_shapes(text: str):
    out = []
    for part in text.split(","):
        part = part.strip().lower()
        if not part:
            continue
        try:
            h, w = (int(v) for v in part.split("x"))
        except ValueError:
            raise SystemExit(f"bad --shapes entry {part!r}: want HxW, e.g. 64x64")
        if h <= 0 or w <= 0:
            raise SystemExit(f"bad --shapes entry {part!r}: dims must be positive")
        out.append((h, w))
    if not out:
        raise SystemExit("--shapes parsed to nothing")
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--architecture", default="AttentionSR",
                   help="registry name, or 'auto' to infer from --checkpoint")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--shapes", default="64x64",
                   help="comma-separated LR bucket shapes, e.g. 64x64,128x128")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--quantize", default="", choices=["", "int8", "int8_dot"])
    p.add_argument("--tta", action="store_true",
                   help="bake the x8 self-ensemble into the program")
    p.add_argument("--no_phase_tail", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="pin the CPU backend (hermetic tests; the artifact "
                        "records its lowering platform either way)")
    p.add_argument("--check", action="store_true",
                   help="deserialize every blob and assert byte-exact "
                        "agreement with the live serving forward")
    args = p.parse_args(argv)

    if args.cpu:
        import food101_sr_tpu

        food101_sr_tpu.use_cpu_backend()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from serve import SRServer  # the engine whose program we serialize

    shapes = parse_shapes(args.shapes)
    server = SRServer(args.architecture, args.checkpoint, scale=args.scale,
                      dtype=jnp.bfloat16 if args.dtype == "bfloat16"
                      else jnp.float32, tta=args.tta, quantize=args.quantize,
                      phase_tail=not args.no_phase_tail)

    os.makedirs(args.out, exist_ok=True)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(server.variables))
    buckets = []
    for h, w in shapes:
        spec = jax.ShapeDtypeStruct((args.batch, h, w, 3), jnp.uint8)
        exp = jexport.export(server._fwd)(spec)
        blob = exp.serialize()
        name = f"sr_{h}x{w}_b{args.batch}.jaxexport"
        with open(os.path.join(args.out, name), "wb") as f:
            f.write(blob)
        buckets.append({
            "file": name,
            "lr_shape": [args.batch, h, w, 3],
            "sr_shape": [args.batch, h * server.scale, w * server.scale, 3],
            "bytes": len(blob),
            "sha256": hashlib.sha256(blob).hexdigest(),
            "platforms": list(exp.platforms),
        })
        print(f"exported {name}: {len(blob)/1e6:.2f} MB, "
              f"platforms {list(exp.platforms)}", file=sys.stderr)

    manifest = {
        "kind": "food101-sr-tpu serving AOT artifact",
        "architecture": server.arch,
        "scale": server.scale,
        "dtype": args.dtype,
        "quantize": args.quantize,
        "tta": bool(args.tta),
        "phase_tail": not args.no_phase_tail,
        "checkpoint": args.checkpoint,
        "n_params": n_params,
        "jax_version": jax.__version__,
        "io": "uint8 NHWC in [B,H,W,3] -> uint8 NHWC [B,H*s,W*s,3]",
        "buckets": buckets,
    }
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)

    checked = 0
    if args.check:
        rng = np.random.default_rng(0)
        for spec_info in buckets:
            path = os.path.join(args.out, spec_info["file"])
            with open(path, "rb") as f:
                blob = f.read()
            assert hashlib.sha256(blob).hexdigest() == spec_info["sha256"]
            exp = jexport.deserialize(blob)
            x = rng.integers(0, 256, spec_info["lr_shape"], dtype=np.uint8)
            got = np.asarray(exp.call(x))
            want = np.asarray(server._fwd(x))
            if not np.array_equal(got, want):
                raise SystemExit(
                    f"CHECK FAILED for {spec_info['file']}: deserialized "
                    f"program disagrees with the live serving forward "
                    f"(max abs diff {np.abs(got.astype(int) - want.astype(int)).max()})")
            assert list(got.shape) == spec_info["sr_shape"]
            checked += 1
        print(f"check: {checked}/{len(buckets)} buckets byte-exact vs the "
              f"live serving forward", file=sys.stderr)

    print(json.dumps({"out": args.out, "architecture": server.arch,
                      "scale": server.scale, "buckets": len(buckets),
                      "checked": checked,
                      "total_mb": round(sum(b["bytes"] for b in buckets) / 1e6, 2)}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Reproducible f32-vs-quantized quality table for SR checkpoints.

Measures the PSNR/SSIM cost of the int8 serving path (DESIGN.md §2) per
checkpoint: center-crop test images to a fixed HR size, synthesize LR by
PIL bicubic downsample (the reference's eval degradation,
reference visualize.py:88-90), run the jitted forward once per quantize
mode on fixed-shape device batches, and report per-mode means + deltas.

This is the committed producer of ``runs/quant_quality.json`` (the table
quoted in DESIGN.md §2) and the measurement half of the QAT workflow:
fine-tune with ``train.py --quantize qat``, then compare the fine-tuned
checkpoint's int8 PSNR here against the post-training-quantized original.

Example:
    python tools/quant_quality.py \
        --weights winner_resnet_best=weights/winner_resnet_best \
        --weights winner_resnet_qat=weights/winner_resnet_qat_best \
        --data_root /tmp/fakefood --num_examples 64 \
        --modes f32,int8 --out runs/quant_quality.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from food101_sr_tpu.data import Food101Source, SyntheticSource
from food101_sr_tpu.metrics import psnr, ssim
from food101_sr_tpu.models import model_for_params
from food101_sr_tpu.training import load_checkpoint

_SUM = jax.jit(jnp.sum)


def load_eval_batches(source, num_examples: int, crop: int, scale: int,
                      batch: int, seed: int):
    """[N,h,w,3] LR / [N,H,W,3] HR float32 [0,1] batches of a fixed shape.

    Images smaller than the crop are upsized on the shorter side first
    (the dataset contract, reference src/dataset.py:30-32).
    """
    rng = np.random.default_rng(seed)
    indices = rng.choice(len(source), size=min(num_examples, len(source)),
                         replace=False)
    lrs, hrs = [], []
    for idx in indices:
        img = source[int(idx)]
        w, h = img.size
        if min(w, h) < crop:
            s = crop / min(w, h)
            img = img.resize((max(crop, round(w * s)),
                              max(crop, round(h * s))),
                             resample=Image.BICUBIC)
            w, h = img.size
        ox, oy = (w - crop) // 2, (h - crop) // 2
        hr = img.crop((ox, oy, ox + crop, oy + crop))
        lr = hr.resize((crop // scale, crop // scale),
                       resample=Image.BICUBIC)
        hrs.append(np.asarray(hr, np.float32) / 255.0)
        lrs.append(np.asarray(lr, np.float32) / 255.0)
    lr_all = np.stack(lrs)
    hr_all = np.stack(hrs)
    n_full = (len(lr_all) // batch) * batch
    if n_full == 0:
        raise SystemExit(f"need at least --batch={batch} images, "
                         f"got {len(lr_all)}")
    if n_full < len(lr_all):
        print(f"note: dropping {len(lr_all) - n_full} tail images to keep "
              f"a single batch shape ({n_full} evaluated)")
    return (lr_all[:n_full].reshape(-1, batch, crop // scale,
                                    crop // scale, 3),
            hr_all[:n_full].reshape(-1, batch, crop, crop, 3))


def eval_mode(params, extra, lr_b, hr_b, scale: int, mode: str):
    """Mean PSNR/SSIM of one checkpoint under one quantize mode."""
    model = model_for_params(params, scale_factor=scale,
                             quantize="" if mode == "f32" else mode)

    @jax.jit
    def fwd_metrics(v, lr, hr):
        sr = jnp.clip(model.apply(v, lr, train=False), 0.0, 1.0)
        # serving emits uint8 — measure what the user receives
        sr = jnp.round(sr * 255.0) / 255.0
        return psnr(sr, hr), ssim(sr, hr)

    variables = {"params": params, **extra}
    ps, ss = [], []
    for lr, hr in zip(lr_b, hr_b):
        p, s = fwd_metrics(variables, jnp.asarray(lr), jnp.asarray(hr))
        ps.append(float(p))
        ss.append(float(s))
    return float(np.mean(ps)), float(np.mean(ss))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", action="append", required=True,
                    metavar="NAME=CKPT",
                    help="checkpoint to evaluate (repeatable)")
    ap.add_argument("--dataset", default="food101",
                    choices=["food101", "synthetic"])
    ap.add_argument("--data_root", default="./data")
    ap.add_argument("--num_examples", type=int, default=64)
    ap.add_argument("--crop", type=int, default=192,
                    help="HR center-crop size (multiple of scale)")
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--modes", default="f32,int8",
                    help="comma list of f32/int8/int8_dot")
    ap.add_argument("--out", default="",
                    help="merge results into this JSON file")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin "
                         "ignores JAX_PLATFORMS)")
    args = ap.parse_args()

    if args.cpu:
        import food101_sr_tpu

        food101_sr_tpu.use_cpu_backend()

    if args.crop % args.scale:
        ap.error("--crop must be a multiple of --scale")
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    for m in modes:
        if m not in ("f32", "int8", "int8_dot"):
            ap.error(f"unknown mode {m!r} (QAT checkpoints are still "
                     f"evaluated via f32/int8 — qat is a training mode)")

    if args.dataset == "synthetic":
        source = SyntheticSource(n=max(args.num_examples, args.batch),
                                 seed=args.seed)
    else:
        source = Food101Source(args.data_root, "test")
    lr_b, hr_b = load_eval_batches(source, args.num_examples, args.crop,
                                   args.scale, args.batch, args.seed)
    print(f"{lr_b.shape[0]}x{args.batch} batches on "
          f"{jax.devices()[0].platform}")

    results = {}
    for spec in args.weights:
        name, sep, path = spec.partition("=")
        if not sep:
            ap.error(f"--weights expects NAME=CKPT, got {spec!r}")
        raw = load_checkpoint(path)
        params = raw["params"] if "params" in raw else raw
        extra = raw.get("extra", {}) if "params" in raw else {}
        row = {}
        for mode in modes:
            p, s = eval_mode(params, extra, lr_b, hr_b, args.scale, mode)
            row[mode] = round(p, 4)
            row[f"{mode}_ssim"] = round(s, 4)
            print(f"{name:28} {mode:8} PSNR {p:.4f}  SSIM {s:.4f}")
        if "f32" in row:
            for mode in modes:
                if mode != "f32":
                    row[f"delta_db_{mode}"] = round(row["f32"] - row[mode], 4)
        results[name] = row

    if args.out:
        merged = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                merged = json.load(f)
        merged.update(results)
        merged["_method"] = (f"tools/quant_quality.py crop={args.crop} "
                             f"n={lr_b.shape[0] * args.batch} seed={args.seed} "
                             f"uint8-quantized outputs, PIL-bicubic LR")
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(merged, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Offline model comparison / visualization / latency bench.

TPU-native rebuild of the reference's comparison tool (reference
visualize.py:63-124): samples test images, writes the same PNG report
layout (``report/images/image_{idx}/{ground_truth,input_lr_resized,bicubic,
<model>.png}``), prints per-image 255-range PSNR, and a latency summary
table (avg/std/min/max ms per model).

Deliberate fixes over the reference (SURVEY §7 quirk list):
  * each model is built and its weights loaded ONCE (the reference reloads
    every checkpoint for every image — 4x1000 weight loads);
  * inference is jitted; repeated shapes hit the compile cache. With
    ``--bucket`` LR inputs are edge-padded up to a multiple of 32 so the
    whole run compiles a handful of programs instead of one per image size
    (output is cropped back, PSNR unaffected away from a few border px);
  * timing uses ``block_until_ready`` fences after a warmup call (the
    honest XLA analogue of the reference's cuda-synchronize timing).
"""
import argparse
import math
import os
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from food101_sr_tpu.data import Food101Source, SyntheticSource
from food101_sr_tpu.models import get_model
from food101_sr_tpu.ops import self_ensemble
from food101_sr_tpu.training import load_checkpoint

SCALE_FACTOR = 4
NUM_EXAMPLES = 1000
OUTPUT_DIR = "report/images"

# Checkpoint directories produced by train.py --save_name (orbax format),
# mirroring the reference's WEIGHTS mapping (reference visualize.py:17-22)
# but pointing at the sweep-winner checkpoints committed in this repo
# (README §Quality pipeline) so the tool works out of the box; override
# any row with --weights NAME=CKPT.
WEIGHTS = {
    "SRCNN": "weights/winner_srcnn_best",
    "RESNET": "weights/winner_resnet_best",
    "AttentionSR": "weights/winner_attentionsr_best",
    "AttentionSR_GAN": "weights/winner_attentionsr_gan_best",
    # beyond-parity family (no reference counterpart): ESRGAN-scale RRDB,
    # supervised + GAN-fine-tuned (the ESRGAN recipe)
    "RRDB": "weights/winner_rrdb_best",
    "RRDB_GAN": "weights/winner_rrdb_gan_best",
}


_SUM = jax.jit(jnp.sum)


def calculate_psnr(img1, img2):
    """255-range PSNR on uint8 images (reference visualize.py:24-29)."""
    a = np.asarray(img1).astype(np.float32)
    b = np.asarray(img2).astype(np.float32)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return 100.0
    return 20 * math.log10(255.0 / math.sqrt(mse))


class ModelRunner:
    """A model + checkpoint loaded once, with a jitted forward."""

    def __init__(self, display_name: str, ckpt_path: str,
                 quantize: str = ""):
        # display names may carry a suffix (AttentionSR_GAN, RRDB_GAN —
        # same net, GAN-fine-tuned checkpoint)
        arch = display_name
        for base in ("AttentionSR", "RRDB"):
            if display_name.startswith(base):
                arch = base
        self.name = display_name
        # quantize applies to every arch with a body stack (registry
        # rejects it for SRCNN, whose 3 HR convs are all quality-critical)
        q = quantize if arch in ("RESNET", "AttentionSR", "RRDB") else ""
        self.model = get_model(arch, scale_factor=SCALE_FACTOR, quantize=q)
        dummy = jnp.zeros((1, 16, 16, 3), jnp.float32)
        variables = self.model.init({"params": jax.random.PRNGKey(0)}, dummy,
                                    train=False)
        try:
            tree = {"params": variables["params"],
                    "extra": {k: v for k, v in variables.items() if k != "params"}}
            loaded = load_checkpoint(ckpt_path, tree)
            self.variables = {"params": loaded["params"], **loaded["extra"]}
        except (FileNotFoundError, ValueError) as e:
            print(f"Warning: could not load weights for {display_name} at "
                  f"{ckpt_path}: {e}")
            self.variables = None
            return
        self._fwd = jax.jit(
            lambda v, x: jnp.clip(self.model.apply(v, x, train=False), 0.0, 1.0)
        )
        # uint8 quantization on device: the PNG save and the metric crop
        # both consume uint8 anyway, and fetching f32 costs 4x the D2H
        # wire time (26 MB/image for a 512px SR output through a ~40 MB/s
        # tunnel — it dominated the round-5 N=64 report's wall clock)
        self._to_u8 = jax.jit(
            lambda y: (y * 255.0 + 0.5).astype(jnp.uint8))
        # x8 geometric self-ensemble (ops/tta.py): two 4N-batched forwards
        # + averaging, all inside one jit
        self._fwd_tta = jax.jit(
            lambda v, x: jnp.clip(self_ensemble(
                lambda b: self.model.apply(v, b, train=False), x), 0.0, 1.0)
        )
        self._warm_shapes = set()

    def predict(self, lr_np: np.ndarray, bucket: bool, tta: bool = False):
        """lr_np: [H,W,3] float32 in [0,1]. Returns (sr uint8 HWC, seconds)."""
        h, w = lr_np.shape[:2]
        if bucket:
            ph = (-h) % 32
            pw = (-w) % 32
            x = np.pad(lr_np, ((0, ph), (0, pw), (0, 0)), mode="edge")
        else:
            x = lr_np
        fwd = self._fwd_tta if tta else self._fwd
        xb = jnp.asarray(x[None])
        if (xb.shape, tta) not in self._warm_shapes:  # exclude compile
            float(_SUM(fwd(self.variables, xb)))
            self._warm_shapes.add((xb.shape, tta))
        t0 = time.perf_counter()
        out = fwd(self.variables, xb)
        # scalar fetch genuinely waits for the device; block_until_ready can
        # ack early through remote-TPU tunnels (see bench.py)
        float(_SUM(out))
        dt = time.perf_counter() - t0
        sr = np.asarray(self._to_u8(out)[0])[: h * SCALE_FACTOR,
                                             : w * SCALE_FACTOR]
        return sr, dt


def parse_weight_specs(specs):
    """``["NAME=CKPT", ...]`` -> checkpoint mapping, or None to use the
    default WEIGHTS table. Raises ValueError on a spec without '='."""
    if not specs:
        return None
    out = {}
    for spec in specs:
        name, sep, path = spec.partition("=")
        if not sep or not name or not path:
            raise ValueError(f"--weights expects NAME=CKPT, got {spec!r}")
        out[name] = path
    return out


def run_comparison(dataset="food101", data_root="./data",
                   num_examples=NUM_EXAMPLES, out_dir=OUTPUT_DIR,
                   bucket=True, seed=0, weights=None, tta=False,
                   full_metrics=False, quantize=""):
    if dataset == "synthetic":
        source = SyntheticSource(n=max(num_examples, 16), seed=seed)
    else:
        source = Food101Source(data_root, "test")
    print(f"Processing images on {jax.devices()[0].platform} ...")

    rng = np.random.default_rng(seed)
    indices = rng.choice(len(source), size=min(num_examples, len(source)),
                         replace=False)
    os.makedirs(out_dir, exist_ok=True)

    runners = [ModelRunner(name, path, quantize=quantize)
               for name, path in (weights or WEIGHTS).items()]
    runners = [r for r in runners if r.variables is not None]

    metrics_calc = None
    if full_metrics:  # the reference report prints PSNR only
        from food101_sr_tpu.metrics import MetricsCalculator

        metrics_calc = MetricsCalculator()
    all_metrics = defaultdict(lambda: defaultdict(list))
    inference_times = defaultdict(list)
    for i, idx in enumerate(indices):
        print(f"\n--- Processing Image {i + 1}/{len(indices)} (Index: {idx}) ---")
        save_path = os.path.join(out_dir, f"image_{idx}")
        os.makedirs(save_path, exist_ok=True)

        hr_img = source[int(idx)]
        w, h = hr_img.size
        w, h = (w // SCALE_FACTOR) * SCALE_FACTOR, (h // SCALE_FACTOR) * SCALE_FACTOR
        hr_img = hr_img.crop((0, 0, w, h))

        lr_img = hr_img.resize((w // SCALE_FACTOR, h // SCALE_FACTOR),
                               resample=Image.BICUBIC)
        hr_img.save(os.path.join(save_path, "ground_truth.png"))
        lr_img.resize(hr_img.size, resample=Image.NEAREST).save(
            os.path.join(save_path, "input_lr_resized.png"))

        bicubic_img = lr_img.resize((w, h), resample=Image.BICUBIC)
        bicubic_img.save(os.path.join(save_path, "bicubic.png"))
        print(f"Saved Baseline | Bicubic PSNR: "
              f"{calculate_psnr(bicubic_img, hr_img):.2f} dB")

        lr_np = np.asarray(lr_img, dtype=np.float32) / 255.0
        for runner in runners:
            sr, dt = runner.predict(lr_np, bucket, tta=tta)
            inference_times[runner.name].append(dt)
            Image.fromarray(sr).save(
                os.path.join(save_path, f"{runner.name.lower()}.png"))
            line = (f"Saved {runner.name} | PSNR: "
                    f"{calculate_psnr(sr, hr_img):.2f} dB | "
                    f"Inference: {dt * 1000:.2f} ms")
            if metrics_calc is not None:
                # center-crop both to ONE fixed metric window (256px, or
                # the largest 32-multiple that fits a smaller image):
                # with Food-101's per-image sizes, "multiples of 32" still
                # meant a distinct metric-program compile per image x model
                # — through the tunnel that made an N=64 report
                # compile-bound (~10 min/image, round 5). A fixed center
                # crop is standard SR eval practice and compiles ONCE.
                hh = ww = min(256, (sr.shape[0] // 32) * 32,
                              (sr.shape[1] // 32) * 32)
                if hh == 0:  # tiny image: accept its own compile
                    hh, ww = sr.shape[0], sr.shape[1]
                oy, ox = (sr.shape[0] - hh) // 2, (sr.shape[1] - ww) // 2
                hr_np = np.asarray(hr_img)
                m = metrics_calc.compute(
                    jnp.asarray(sr[oy:oy + hh, ox:ox + ww],
                                jnp.float32)[None] / 255.0,
                    jnp.asarray(hr_np[oy:oy + hh, ox:ox + ww],
                                jnp.float32)[None] / 255.0)
                for k, v in m.items():
                    all_metrics[runner.name][k].append(v)
                line += (f" | SSIM {m['ssim']:.4f} | LPIPS {m['lpips']:.4f}"
                         f" | NLPD {m['nlpd']:.4f}")
            print(line)

    print(f"\n{'=' * 50}\nINFERENCE TIME SUMMARY\n{'=' * 50}")
    for name, times in inference_times.items():
        ms = np.asarray(times) * 1000
        print(f"{name:15} | Avg: {ms.mean():7.2f} ms | Std: {ms.std():6.2f} ms "
              f"| Min: {ms.min():7.2f} ms | Max: {ms.max():7.2f} ms")
    if all_metrics:
        print(f"\n{'=' * 50}\nQUALITY METRICS (mean over "
              f"{len(indices)} images)\n{'=' * 50}")
        for name, md in all_metrics.items():
            print(f"{name:15} | " + " | ".join(
                f"{k} {np.mean(v):.4f}" for k, v in md.items()))
    print(f"\nDone! Check the '{out_dir}' folder.")
    if full_metrics:  # arity follows the FLAG, not whether anything ran
        return inference_times, {n: {k: float(np.mean(v))
                                     for k, v in md.items()}
                                 for n, md in all_metrics.items()}
    return inference_times


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="food101", choices=["food101", "synthetic"])
    p.add_argument("--data_root", default="./data")
    p.add_argument("--num_examples", type=int, default=NUM_EXAMPLES)
    p.add_argument("--out_dir", default=OUTPUT_DIR)
    p.add_argument("--no_bucket", action="store_true",
                   help="disable shape bucketing (compile per image size)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--self_ensemble", action="store_true",
                   help="x8 geometric TTA (dihedral transforms averaged; "
                        "~0.1-0.2 dB PSNR for 8x the forward FLOPs)")
    p.add_argument("--metrics", action="store_true",
                   help="also compute SSIM/LPIPS/NLPD per image + summary "
                        "(the reference report prints PSNR only)")
    p.add_argument("--weights", action="append", default=None,
                   metavar="NAME=CKPT",
                   help="override the checkpoint mapping (repeatable), e.g. "
                        "--weights RESNET=weights/winner_resnet_best; the "
                        "architecture is inferred from NAME as in the "
                        "default table")
    p.add_argument("--quantize", default="", choices=["", "int8", "int8_dot"],
                   help="dynamic-int8 body convs for the RESNET/AttentionSR/"
                        "RRDB rows (SRCNN has no body; its rows stay f32) — "
                        "report quality/latency of the quantized serving "
                        "path (DESIGN.md)")
    a = p.parse_args()
    run_comparison(a.dataset, a.data_root, a.num_examples, a.out_dir,
                   bucket=not a.no_bucket, seed=a.seed,
                   weights=parse_weight_specs(a.weights),
                   tta=a.self_ensemble, full_metrics=a.metrics,
                   quantize=a.quantize)

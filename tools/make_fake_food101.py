#!/usr/bin/env python
"""Generate a Food-101-layout JPEG tree of procedural photo-like images.

Real Food-101 (10 GB) cannot be downloaded in hermetic TPU images
(reference src/dataset.py:10 auto-downloads it); this produces the same
on-disk structure (``root/food-101/images/<class>/<id>.jpg`` +
``meta/{train,test}.txt``) at any size, so every real-data code path —
Food101Source, the native fused JPEG region decode, meta parsing,
train/test splits — runs end-to-end, and sweep-winner configs can be
trained to convergence on-chip (VERDICT round-1 item #7).

Images are multi-scale value-noise composites with hard edges and smooth
regions — enough spatial structure that x4 super-resolution has signal to
learn (pure white noise would not).

    python tools/make_fake_food101.py /tmp/fakefood --train 2000 --test 200
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

CLASSES = ("pizza", "sushi", "ramen", "tacos", "waffles",
           "paella", "donuts", "gyoza", "bibimbap", "falafel")


def _value_noise(rng, h, w, cells):
    """Bilinear-upsampled random grid — smooth structure at one scale."""
    grid = rng.uniform(0, 1, (cells + 1, cells + 1, 3))
    img = Image.fromarray((grid * 255).astype(np.uint8))
    return np.asarray(img.resize((w, h), Image.BILINEAR), np.float32) / 255.0


def make_image(rng, h, w):
    x = (0.55 * _value_noise(rng, h, w, 4)
         + 0.3 * _value_noise(rng, h, w, 16)
         + 0.15 * _value_noise(rng, h, w, 64))
    # hard-edged shapes: SR models must learn edge reconstruction
    for _ in range(rng.integers(3, 9)):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        r = rng.uniform(0.05, 0.25) * min(h, w)
        yy, xx = np.mgrid[0:h, 0:w]
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        x[mask] = x[mask] * 0.35 + rng.uniform(0, 1, 3) * 0.65
    return np.clip(x * 255, 0, 255).astype(np.uint8)


def build(root: str, n_train: int, n_test: int, seed: int = 0,
          quality: int = 92):
    base = os.path.join(root, "food-101")
    os.makedirs(os.path.join(base, "meta"), exist_ok=True)
    rng = np.random.default_rng(seed)
    splits = {"train": n_train, "test": n_test}
    counter = 0
    for split, n in splits.items():
        rel = []
        for i in range(n):
            cls = CLASSES[i % len(CLASSES)]
            d = os.path.join(base, "images", cls)
            os.makedirs(d, exist_ok=True)
            h = int(rng.integers(280, 512))
            w = int(rng.integers(280, 512))
            img = make_image(rng, h, w)
            name = f"{1000000 + counter}"
            counter += 1
            Image.fromarray(img).save(os.path.join(d, name + ".jpg"),
                                      quality=quality)
            rel.append(f"{cls}/{name}")
        with open(os.path.join(base, "meta", f"{split}.txt"), "w") as f:
            f.write("\n".join(rel) + "\n")
        print(f"{split}: {n} images")
    return root


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root")
    p.add_argument("--train", type=int, default=2000)
    p.add_argument("--test", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quality", type=int, default=92)
    a = p.parse_args()
    build(a.root, a.train, a.test, a.seed, a.quality)

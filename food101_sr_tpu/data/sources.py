"""Image sources for the SR pipeline.

``Food101Source`` reads the standard Food-101 on-disk layout that the
reference's torchvision ``datasets.Food101`` manages (reference
src/dataset.py:10): ``root/food-101/images/<class>/<id>.jpg`` with split
lists in ``meta/train.txt`` / ``meta/test.txt`` (or the torchvision-written
``.json`` variants). Download is a deployment concern (DVC/GCS bucket), not
a library concern — this source never touches the network.

``SyntheticSource`` generates deterministic procedural images for tests,
benchmarks, and smoke runs (the reference's de-facto fast check is training
on a data subset; we keep that too, but synthetic data makes CI hermetic).
"""
from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np
from PIL import Image


class Food101Source:
    def __init__(self, root: str = "./data", split: str = "train"):
        base = os.path.join(root, "food-101")
        meta_txt = os.path.join(base, "meta", f"{split}.txt")
        meta_json = os.path.join(base, "meta", f"{split}.json")
        images = os.path.join(base, "images")
        if os.path.exists(meta_txt):
            with open(meta_txt) as f:
                rel = [line.strip() for line in f if line.strip()]
        elif os.path.exists(meta_json):
            with open(meta_json) as f:
                payload = json.load(f)
            rel = [p for paths in payload.values() for p in paths]
        else:
            raise FileNotFoundError(
                f"Food-101 metadata not found under {base}/meta — provision "
                f"the dataset (e.g. `dvc pull` / bucket sync) first."
            )
        self.paths = [os.path.join(images, r + ".jpg") for r in sorted(rel)]

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i: int) -> Image.Image:
        return Image.open(self.paths[i]).convert("RGB")

    def bytes_at(self, i: int) -> bytes:
        """Raw JPEG bytes — lets the loader use the native fused
        decode-crop path (native/fast_jpeg.cpp) instead of a full PIL
        decode per sample."""
        with open(self.paths[i], "rb") as f:
            return f.read()

    def fingerprint(self) -> str:
        """Stable identity for cache keying (data/canvas_cache.py): the
        split's file list. Content changes under the same paths are the
        user's cache-invalidation problem, as with any materialized
        dataset format."""
        import hashlib

        h = hashlib.sha1()
        for p in self.paths:
            h.update(p.encode())
        return f"food101:{len(self.paths)}:{h.hexdigest()[:16]}"


class SyntheticSource:
    """Deterministic procedural RGB images with SR-relevant structure
    (smooth gradients + hard edges + texture) in a range of sizes."""

    def __init__(
        self,
        n: int = 256,
        sizes: Sequence[tuple[int, int]] = ((240, 320), (512, 384), (160, 200), (256, 256)),
        seed: int = 0,
    ):
        self.n = n
        self.sizes = sizes
        self.seed = seed

    def __len__(self):
        return self.n

    def fingerprint(self) -> str:
        return f"synthetic:{self.n}:{self.seed}:{tuple(self.sizes)}"

    def __getitem__(self, i: int) -> Image.Image:
        rng = np.random.default_rng(self.seed * 1_000_003 + i)
        h, w = self.sizes[i % len(self.sizes)]
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.zeros((h, w, 3), np.float32)
        # smooth gradient base
        fx, fy = rng.uniform(0.5, 3.0, 2)
        ph = rng.uniform(0, 2 * np.pi, 3)
        for c in range(3):
            img[..., c] = 0.5 + 0.3 * np.sin(
                2 * np.pi * (fx * xx / w + fy * yy / h) + ph[c]
            )
        # hard-edged rectangles (SR cares about edges)
        for _ in range(6):
            y0, x0 = rng.integers(0, h - 8), rng.integers(0, w - 8)
            dy, dx = rng.integers(8, h // 3), rng.integers(8, w // 3)
            img[y0 : y0 + dy, x0 : x0 + dx] = rng.uniform(0, 1, 3)
        # fine texture
        img += rng.normal(0, 0.03, img.shape)
        arr = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        return Image.fromarray(arr)

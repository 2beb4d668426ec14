"""Device-resident dataset cache: HBM-cached uint8 canvases + on-device
crop/flip augmentation.

Why this exists (SURVEY §7 hard part 7 — "input-bound training at TPU
speeds"): the host JPEG pipeline feeds ~459 img/s/core (bench.py --input,
native fused region decode) while one v5e chip trains AttentionSR at ~1234
img/s — on a small host the chip starves.  The reference's primary workflow
is exactly the case where the dataset is small: W&B sweeps at ``subset``
0.025–0.1 (reference configs/sweep_srcnn.yaml:15-16, train.py:29-33).  For
those, the whole training set fits in HBM as uint8:

    subset 0.025 of Food-101 ≈ 1 900 images x 256x256x3 u8 ≈ 0.35 GB
    subset 0.1              ≈ 6 800 images                 ≈ 1.3  GB

So: decode every image ONCE on the host into a fixed-size uint8 "canvas"
(shorter side resized up to the canvas if needed, then center-cropped —
``load_hr_crop(train=False)`` semantics at canvas size), park the stack in
device memory, and draw each training batch entirely on device: gather the
epoch-permuted canvases, ``dynamic_slice`` a random crop per sample, random
horizontal flip — one tiny jitted program per batch, zero host work in the
hot loop, no H2D traffic after the one-time upload.

Augmentation contract vs the host loader (documented tradeoff, NOT
bit-parity for train batches): the reference random-crops the FULL image
(reference src/dataset.py:15-20) while this path random-crops the central
``canvas x canvas`` square — crops near the borders of non-square images
are never drawn, and the RNG stream differs.  Determinism properties are
preserved exactly: batches are a pure function of (seed, epoch, position),
so ``--resume`` replays the same data order and the same crops/flips.

Eval batches (``train=False``) ARE byte-identical to ``SRDataLoader``'s:
with canvas == crop the host-side canvas build is precisely the eval
transform (resize-if-small -> center crop), and the device side is a pure
gather (tests/test_device_cache.py pins this).

Multi-host is out of scope here (a pod's per-host loaders already shard the
batch; a replicated multi-gigabyte cache per host would fight the real
input solution on pods — more host cores); a process_count > 1 run refuses
loudly.
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline import load_hr_crop

_DEFAULT_BUDGET_GB = 4.0


def build_canvas_cache(source, indices: np.ndarray, canvas: int,
                       num_workers: Optional[int] = None) -> np.ndarray:
    """Decode ``source[i]`` for every i in ``indices`` into uint8
    ``canvas x canvas`` center crops (resize-if-small first), in parallel.

    Uses the same host transform as the eval loader (`load_hr_crop` with
    train=False), so a canvas at crop size is bit-identical to what
    ``SRDataLoader(train=False)`` would ship for that sample.
    """
    if num_workers is None:
        num_workers = min(16, os.cpu_count() or 1)
    rng = np.random.default_rng(0)  # unused by the center-crop path

    def one(i):
        return load_hr_crop(source[int(i)], canvas, train=False, rng=rng)

    with ThreadPoolExecutor(max_workers=max(1, int(num_workers))) as pool:
        crops = list(pool.map(one, indices))
    return np.stack(crops) if crops else np.zeros(
        (0, canvas, canvas, 3), np.uint8)


def _augment(imgs: jnp.ndarray, key: jax.Array, crop: int,
             train: bool) -> jnp.ndarray:
    """(train only) random crop/flip of a canvas batch, entirely on device.

    imgs: [B, S, S, 3] u8 -> [B, crop, crop, 3] u8.  Shared by the HBM
    cache (below) and the disk-streaming canvas loader
    (canvas_cache.py) — one augmentation contract for both device paths.
    """
    b = imgs.shape[0]
    canvas = imgs.shape[1]
    if not train or canvas == crop:
        top = jnp.full((b,), (canvas - crop) // 2, jnp.int32)
        left = top
        if canvas != crop:
            imgs = jax.vmap(
                lambda im, t, l: jax.lax.dynamic_slice(
                    im, (t, l, 0), (crop, crop, 3)))(imgs, top, left)
        if not train:
            return imgs
        crops = imgs
    else:
        k_top, k_left, key = jax.random.split(key, 3)
        tops = jax.random.randint(k_top, (b,), 0, canvas - crop + 1)
        lefts = jax.random.randint(k_left, (b,), 0, canvas - crop + 1)
        crops = jax.vmap(
            lambda im, t, l: jax.lax.dynamic_slice(
                im, (t, l, 0), (crop, crop, 3)))(imgs, tops, lefts)
    k_flip, _ = jax.random.split(key)
    flips = jax.random.bernoulli(k_flip, 0.5, (b,))
    return jnp.where(flips[:, None, None, None],
                     jnp.flip(crops, axis=2), crops)


def _sample_batch(cache: jnp.ndarray, pos: jnp.ndarray, key: jax.Array,
                  crop: int, train: bool) -> jnp.ndarray:
    """Gather + augment, entirely on device.

    cache: [N, S, S, 3] u8 (replicated) -> [B, crop, crop, 3] u8.
    """
    return _augment(jnp.take(cache, pos, axis=0), key, crop, train)


class DeviceCacheLoader:
    """Drop-in replacement for ``SRDataLoader`` backed by an HBM cache.

    Same iteration protocol (``__len__``, ``set_epoch``, iterate uint8 NHWC
    batches placed on ``sharding``), same drop-remainder semantics, same
    per-(seed, epoch) shuffle scheme.  The hot loop costs the host one
    ~B*4-byte index upload and one dispatch per batch.

    ``canvas``: side of the cached square (train loaders; >= crop_size).
    Defaults to ``max(256, crop_size)`` — for Food-101's 512-max images
    that keeps a 28%-margin crop field at the reference crop 200.  Eval
    loaders ignore it and cache at exactly ``crop_size`` (byte-identical
    batches to the host loader).
    """

    def __init__(
        self,
        source,
        indices: Optional[Sequence[int]] = None,
        crop_size: int = 200,
        batch_size: int = 16,
        train: bool = True,
        shuffle: Optional[bool] = None,
        seed: int = 0,
        sharding=None,
        canvas: Optional[int] = None,
        max_cache_gb: float = _DEFAULT_BUDGET_GB,
        num_workers: Optional[int] = None,
    ):
        if jax.process_count() > 1:
            raise ValueError(
                "--cache_device is single-process only: on a multi-host pod "
                "each host would replicate the full cache; use the host "
                "loader there (its per-process batch slicing already scales "
                "with host count)")
        self.indices = np.asarray(
            indices if indices is not None else np.arange(len(source)))
        self.crop_size = int(crop_size)
        self.batch_size = int(batch_size)
        self.train = bool(train)
        self.shuffle = self.train if shuffle is None else bool(shuffle)
        self.seed = int(seed)
        self.sharding = sharding
        if canvas is None:
            canvas = max(256, self.crop_size) if self.train else self.crop_size
        canvas = max(int(canvas), self.crop_size)
        if not self.train:
            canvas = self.crop_size  # eval: exact host-loader parity
        self.canvas = canvas

        need = len(self.indices) * canvas * canvas * 3
        budget = float(max_cache_gb) * (1 << 30)
        if need > budget:
            raise ValueError(
                f"device cache would need {need / (1 << 30):.2f} GiB "
                f"({len(self.indices)} images x {canvas}px canvas) — over "
                f"the {max_cache_gb:.1f} GiB budget. Lower --subset, shrink "
                f"--cache_canvas, raise the budget, or drop --cache_device "
                f"(the host loader streams any size).")

        host_cache = build_canvas_cache(source, self.indices, canvas,
                                        num_workers)
        # Replicate the cache over the mesh (every device needs every image
        # for an arbitrary epoch permutation). Batches come out sharded.
        if sharding is not None:
            mesh = sharding.mesh
            rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            self._cache = jax.device_put(host_cache, rep)
        else:
            self._cache = jnp.asarray(host_cache)
        # One compiled sampler per loader; out_shardings places the batch
        # straight onto the data mesh so every device computes only its
        # shard's gather/crop (the cache is replicated, the batch is not).
        self._fn = jax.jit(
            partial(_sample_batch, crop=self.crop_size, train=self.train),
            out_shardings=self.sharding,
        )
        self._key = jax.random.PRNGKey(self.seed)
        self._epoch = 0
        self._start_batch = 0

    def __len__(self):
        return len(self.indices) // self.batch_size

    def set_epoch(self, epoch: int, start_batch: int = 0):
        """``start_batch`` fast-forwards the next iteration to that batch
        (mid-epoch preemption resume): crops/flips are keyed by
        (seed, epoch, batch), so the tail matches the uninterrupted epoch
        exactly and the skipped batches cost nothing."""
        self._epoch = int(epoch)
        self._start_batch = int(start_batch)

    def _sample(self, pos: np.ndarray, key: jax.Array):
        return self._fn(self._cache, jnp.asarray(pos, jnp.int32), key)

    def __iter__(self):
        n = len(self.indices)
        if self.shuffle:
            # identical shuffle scheme to SRDataLoader: (seed, epoch, 7)
            order = np.random.default_rng(
                (self.seed, self._epoch, 7)).permutation(n)
        else:
            order = np.arange(n)
        epoch = self._epoch
        start_batch = self._start_batch
        self._epoch += 1
        self._start_batch = 0
        for b in range(start_batch, len(self)):
            pos = order[b * self.batch_size:(b + 1) * self.batch_size]
            # crops/flips are a pure function of (seed, epoch, batch) — the
            # same keying discipline as the host loader, so --resume replay
            # and cross-run determinism hold
            key = jax.random.fold_in(
                jax.random.fold_in(self._key, epoch), b)
            yield self._sample(pos, key)

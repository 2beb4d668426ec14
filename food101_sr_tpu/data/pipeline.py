"""Host->device input pipeline.

Reproduces the reference dataset contract (reference src/dataset.py:27-41)
with a TPU-first split of work:

  host (cheap, uint8):  decode -> resize-if-small (PIL bicubic, shorter side
                        to crop) -> random/center crop -> random hflip
  device (inside jit):  uint8 -> float/255 ('ToTensor') -> antialiased
                        bicubic x1/scale degradation (resize-as-matmul)

Shipping uint8 HR crops instead of float LR+HR pairs cuts H2D traffic ~17x
vs. the reference's DataLoader (which moves two float32 tensors per sample,
reference train.py:84) and puts the degradation on the MXU. A background
thread assembles batches ahead of the consumer (the reference runs
num_workers=0, fully synchronous); JAX's async dispatch double-buffers the
device side.

Split semantics: the reference uses *unseeded* ``random_split`` for both the
subset proxy mode and the 90/10 train/val split (reference train.py:29-37) —
we keep the same shapes but seed them (SURVEY §7 quirk list).
"""
from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..ops.resize import degrade_bicubic


# ---------------------------------------------------------------------------
# Per-sample host transform
# ---------------------------------------------------------------------------

def load_hr_crop(
    img: Image.Image,
    crop_size: int,
    train: bool,
    rng: np.random.Generator,
) -> np.ndarray:
    """PIL image -> uint8 HWC HR crop, matching reference semantics."""
    w, h = img.size
    if w < crop_size or h < crop_size:
        # torchvision Resize(int): shorter side -> crop_size, keep aspect.
        if w <= h:
            nw, nh = crop_size, max(crop_size, int(crop_size * h / w))
        else:
            nw, nh = max(crop_size, int(crop_size * w / h)), crop_size
        img = img.resize((nw, nh), resample=Image.BICUBIC)
        w, h = img.size

    if train:
        top = int(rng.integers(0, h - crop_size + 1))
        left = int(rng.integers(0, w - crop_size + 1))
    else:
        top = (h - crop_size) // 2
        left = (w - crop_size) // 2

    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    crop = arr[top : top + crop_size, left : left + crop_size, :3]

    if train and rng.random() < 0.5:
        crop = crop[:, ::-1, :]
    return np.ascontiguousarray(crop)


def load_sample(source, i: int, crop_size: int, train: bool,
                rng: np.random.Generator) -> np.ndarray:
    """One HR crop from ``source[i]``, via the fastest available path.

    When the source exposes raw JPEG bytes (``bytes_at``) and the image is
    at least crop-sized, only the crop region is decoded (libjpeg
    jpeg_crop_scanline/jpeg_skip_scanlines via native/fast_jpeg.cpp) —
    ~3x cheaper per sample than the reference's full PIL decode
    (reference src/dataset.py:28) for 512px Food-101 images at crop 200.

    Every path consumes the augmentation RNG in the same order and the
    native region decode is pixel-identical to full-decode-then-crop, so
    batches are byte-identical whether or not the native library exists.
    """
    data = source.bytes_at(i) if hasattr(source, "bytes_at") else None
    if data is not None:
        from ..native import decode_jpeg_crop_rgb8, jpeg_dims

        dims = jpeg_dims(data)
        if dims is not None and dims[0] >= crop_size and dims[1] >= crop_size:
            w, h = dims
            if train:
                top = int(rng.integers(0, h - crop_size + 1))
                left = int(rng.integers(0, w - crop_size + 1))
            else:
                top = (h - crop_size) // 2
                left = (w - crop_size) // 2
            crop = decode_jpeg_crop_rgb8(data, left, top, crop_size, crop_size)
            if crop is None:  # exotic stream (e.g. CMYK): decode fully
                import io

                arr = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"),
                                 np.uint8)
                crop = arr[top:top + crop_size, left:left + crop_size, :3]
            if train and rng.random() < 0.5:
                crop = crop[:, ::-1, :]
            return np.ascontiguousarray(crop)
        # resize-if-small (PIL semantics), or no native decoder: decode the
        # bytes we already read instead of re-reading the file via source[i]
        import io

        return load_hr_crop(Image.open(io.BytesIO(data)).convert("RGB"),
                            crop_size, train, rng)
    return load_hr_crop(source[i], crop_size, train, rng)


# ---------------------------------------------------------------------------
# Device-side batch preparation (call inside jit)
# ---------------------------------------------------------------------------

def prepare_batch(hr_u8: jnp.ndarray, scale_factor: int):
    """uint8 NHWC HR batch -> (lr, hr) float32 in [0,1], degradation fused
    into the surrounding jit graph."""
    hr = hr_u8.astype(jnp.float32) / 255.0
    lr = degrade_bicubic(hr, scale_factor)
    return lr, hr


# ---------------------------------------------------------------------------
# Split helpers (seeded versions of the reference's random_split usage)
# ---------------------------------------------------------------------------

def subset_indices(n: int, fraction: float, seed: int = 0) -> np.ndarray:
    """Proxy mode: keep a random ``fraction`` of the dataset
    (reference train.py:29-33), seeded."""
    if fraction >= 1.0:
        return np.arange(n)
    keep = int(n * fraction)
    return np.random.default_rng(seed).permutation(n)[:keep]


def train_val_split(indices: np.ndarray, val_fraction: float = 0.1, seed: int = 1):
    """90/10 split (reference train.py:35-37), seeded."""
    perm = np.random.default_rng(seed).permutation(len(indices))
    n_train = int(len(indices) * (1.0 - val_fraction))
    return indices[perm[:n_train]], indices[perm[n_train:]]


def process_local_slice(items, process_index: int, process_count: int):
    """The interleaved share of one global batch owned by ``process_index``
    (torch DistributedSampler-style). Every global position appears on
    exactly one host; with process_count=1 it is the identity."""
    return items[process_index::process_count]


# ---------------------------------------------------------------------------
# Batched loader with background prefetch
# ---------------------------------------------------------------------------

class SRDataLoader:
    """Iterates uint8 NHWC HR-crop batches with a producer thread.

    ``sharding``: optional jax.sharding.Sharding to place batches directly
    onto a device mesh (data-parallel). Batches are dropped-remainder so
    every step sees a full, shardable batch (static shapes for jit).
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
        prefetch: int = 4,
        sharding=None,
        num_workers: Optional[int] = None,  # None -> one per CPU core (<=16)
    ):
        self.source = source
        self.indices = np.asarray(
            indices if indices is not None else np.arange(len(source))
        )
        self.crop_size = crop_size
        self.batch_size = batch_size
        self.train = train
        self.shuffle = train if shuffle is None else shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.sharding = sharding
        if num_workers is None:
            num_workers = min(16, os.cpu_count() or 1)
        self.num_workers = max(1, int(num_workers))
        self._epoch = 0
        self._start_batch = 0
        self._process_index = jax.process_index()
        self._process_count = jax.process_count()
        if self.batch_size % self._process_count:
            raise ValueError(
                f"global batch_size={self.batch_size} must divide evenly "
                f"across {self._process_count} processes")

    def __len__(self):
        return len(self.indices) // self.batch_size

    def set_epoch(self, epoch: int, start_batch: int = 0):
        """Pin the shuffle/augment seed epoch (torch DistributedSampler
        convention). The training loop calls this each epoch so a resumed
        run replays the exact data order of the original. ``start_batch``
        fast-forwards the NEXT iteration to that batch index (mid-epoch
        preemption resume): augment RNG is keyed by global sample position,
        so the skipped batches are never decoded and the yielded tail is
        byte-identical to the uninterrupted epoch's."""
        self._epoch = int(epoch)
        self._start_batch = int(start_batch)

    def _produce(self, order: np.ndarray, out: queue.Queue, epoch: int,
                 start_batch: int = 0):
        """Assemble batches with a thread pool: PIL decode/resize release the
        GIL, so parallel workers multiply host throughput (the reference runs
        num_workers=0, fully serial — SURVEY §7 quirk list). Augmentation RNG
        is derived per (seed, epoch, GLOBAL position), so results are
        deterministic regardless of worker scheduling, stable across resume,
        and identical for any process topology.

        Multi-host: ``batch_size`` is the GLOBAL batch; each host loads only
        its interleaved slice of every batch (process_local_slice) and the
        consumer assembles the global array from per-process shards."""

        def one(pos_and_idx):
            pos, i = pos_and_idx
            rng = np.random.default_rng((self.seed, epoch, int(pos)))
            return load_sample(self.source, int(i), self.crop_size,
                               self.train, rng)

        pi, pc = self._process_index, self._process_count
        try:
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for start in range(start_batch * self.batch_size,
                                   len(order) - self.batch_size + 1,
                                   self.batch_size):
                    idx = order[start : start + self.batch_size]
                    work = process_local_slice(
                        list(enumerate(idx, start=start)), pi, pc)
                    # place on device from the producer (prefetch-to-device):
                    # the H2D copy overlaps the consumer's step dispatch
                    # instead of serializing with it at next() time
                    out.put(self._to_global(
                        np.stack(list(pool.map(one, work)))))
        except BaseException as e:  # propagate: a worker error (corrupt
            # file, OOM) must fail the epoch loudly, not truncate it
            out.put(e)
        finally:
            out.put(None)

    def __iter__(self) -> Iterator[jnp.ndarray]:
        order = self.indices
        if self.shuffle:
            order = np.random.default_rng((self.seed, self._epoch, 7)).permutation(
                self.indices
            )
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        start_batch = getattr(self, "_start_batch", 0)
        t = threading.Thread(
            target=self._produce, args=(order, q, self._epoch, start_batch),
            daemon=True
        )
        t.start()
        self._epoch += 1
        self._start_batch = 0  # one-shot: only the resumed epoch skips
        while True:
            batch = q.get()
            if batch is None:
                break
            if isinstance(batch, BaseException):
                raise RuntimeError(
                    "data loader worker failed; epoch aborted") from batch
            yield batch

    def _to_global(self, local_np: np.ndarray):
        """Host-local shard -> global device array. Single-process: a plain
        device_put. Multi-host: every process holds 1/process_count of the
        global batch and the runtime assembles the sharded global array
        (jax.make_array_from_process_local_data) — no cross-host copies."""
        if self._process_count > 1:
            if self.sharding is None:
                raise ValueError("multi-process loading requires a sharding")
            return jax.make_array_from_process_local_data(
                self.sharding, local_np)
        if self.sharding is not None:
            return jax.device_put(local_np, self.sharding)
        return jnp.asarray(local_np)

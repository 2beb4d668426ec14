"""Disk-staged canvas cache: decode the dataset ONCE into a memory-mapped
uint8 store, then train decode-free.

The missing middle of the input-path spectrum:

    SRDataLoader          streams JPEGs            any size, host decode
                                                   every epoch (459
                                                   img/s/core, bench.py
                                                   --input)
    HostCanvasLoader      decode once -> mmap      any size that fits on
    (this module)         store; canvases stream   disk; per-step host work
                          to HBM, crop/flip on     is a block memcpy +
                          device                   one async H2D
    DeviceCacheLoader     decode once -> HBM,      subset-scale only
    (device_cache.py)     batches drawn on device  (~GiBs of HBM)

The reference re-decodes every image every epoch (reference
src/dataset.py:27-41, via torchvision's lazy PIL loading); at TPU training
rates (~1 234 img/s/chip) that JPEG decode is the binding cost on small
hosts. Materializing the decoded pixels once — the TFRecord/ArrayRecord
move, done here as a plain memmapped ``.npy`` so numpy slicing IS the
reader — removes the decode from every subsequent epoch and run: full
Food-101 (75 750 train images) builds a ~14 GiB store in one pass, after
which a single host core can assemble batches at memcpy speed and the
residual per-step cost is a canvas-sized uint8 H2D copy, issued from the
producer thread so it overlaps the previous step's compute.

Canvas semantics are shared with ``device_cache.py``: each image is stored
as a fixed ``canvas x canvas`` uint8 center square (``load_hr_crop`` with
``train=False`` — resize-if-small then center crop), so

- eval loaders (``canvas == crop``) produce batches BYTE-IDENTICAL to
  ``SRDataLoader``'s (tested), and
- train loaders ship whole canvases to the device and draw random
  crops/flips THERE (``device_cache._augment``, one tiny jit per batch) —
  the same documented contract tradeoff as the device cache (border crops
  of non-square images are never drawn; the augmentation RNG stream
  differs from the streaming loader's), with the same determinism: every
  batch is a pure function of (seed, epoch, batch index), so ``--resume``
  replays exactly. Doing the crop on device is deliberate: the host's
  per-step job collapses to block memcpys + one H2D, which is what keeps
  a 1-core host from becoming the training bottleneck (the VPU does the
  crop/flip in ~no time next to the train step).

Stores are content-keyed (source fingerprint + indices + canvas) inside a
cache directory and reused across runs; builds are atomic (tmp + rename),
so concurrent processes on a shared filesystem at worst duplicate work,
never corrupt or double-build into a live store.
"""
from __future__ import annotations

import hashlib
import json
import os
import queue
import tempfile
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

from functools import partial

import jax
import numpy as np

from .device_cache import _augment, _sample_batch
from .pipeline import load_hr_crop, process_local_slice

_FORMAT_VERSION = 1


def _source_fingerprint(source) -> str:
    fp = getattr(source, "fingerprint", None)
    if callable(fp):
        return fp()
    return f"{type(source).__name__}:{len(source)}"


class CanvasStore:
    """A memmapped stack of uint8 canvases plus its metadata.

    Layout (one directory): ``canvases.npy`` ([n, S, S, 3] uint8, written
    with ``np.lib.format.open_memmap`` so it opens zero-copy), ``rows.npy``
    (int64 source index per row), ``meta.json``.
    """

    def __init__(self, path: str):
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        if self.meta.get("version") != _FORMAT_VERSION:
            raise ValueError(
                f"canvas store {path} has format version "
                f"{self.meta.get('version')}; this build reads "
                f"{_FORMAT_VERSION} — rebuild the store")
        self.path = path
        self.canvas = int(self.meta["canvas"])
        self.canvases = np.load(os.path.join(path, "canvases.npy"),
                                mmap_mode="r")
        self.rows = np.load(os.path.join(path, "rows.npy"))
        self._row_of = {int(src): r for r, src in enumerate(self.rows)}

    def __len__(self):
        return self.canvases.shape[0]

    def row_for(self, source_index: int) -> int:
        return self._row_of[int(source_index)]

    @staticmethod
    def key(source, indices: np.ndarray, canvas: int) -> str:
        h = hashlib.sha1()
        h.update(_source_fingerprint(source).encode())
        h.update(np.asarray(indices, np.int64).tobytes())
        h.update(str(int(canvas)).encode())
        return h.hexdigest()[:16]

    @classmethod
    def build(cls, source, indices: np.ndarray, canvas: int, path: str,
              num_workers: Optional[int] = None,
              chunk: int = 512) -> "CanvasStore":
        """Decode ``source[i]`` for every i into the store at ``path``,
        streaming in chunks (peak host RAM = one chunk, not the dataset).
        Atomic: assembled in a sibling tmp dir, renamed into place."""
        indices = np.asarray(indices, np.int64)
        canvas = int(canvas)
        if num_workers is None:
            num_workers = min(16, os.cpu_count() or 1)
        parent = os.path.dirname(os.path.abspath(path)) or "."
        os.makedirs(parent, exist_ok=True)
        tmp = tempfile.mkdtemp(prefix=".canvas_build_", dir=parent)
        try:
            arr = np.lib.format.open_memmap(
                os.path.join(tmp, "canvases.npy"), mode="w+", dtype=np.uint8,
                shape=(len(indices), canvas, canvas, 3))
            rng = np.random.default_rng(0)  # unused by the center-crop path

            def one(i):
                return load_hr_crop(source[int(i)], canvas, train=False,
                                    rng=rng)

            with ThreadPoolExecutor(max_workers=max(1, int(num_workers))) \
                    as pool:
                for start in range(0, len(indices), chunk):
                    part = indices[start:start + chunk]
                    arr[start:start + len(part)] = np.stack(
                        list(pool.map(one, part)))
            arr.flush()
            del arr
            np.save(os.path.join(tmp, "rows.npy"), indices)
            with open(os.path.join(tmp, "meta.json"), "w") as f:
                json.dump({"version": _FORMAT_VERSION, "canvas": canvas,
                           "n": int(len(indices)),
                           "fingerprint": _source_fingerprint(source)}, f)
            try:
                os.rename(tmp, path)
            except OSError:
                # a concurrent builder won the rename; use theirs
                import shutil
                shutil.rmtree(tmp, ignore_errors=True)
        finally:
            if os.path.isdir(tmp):
                import shutil
                shutil.rmtree(tmp, ignore_errors=True)
        return cls(path)

    @classmethod
    def open_or_build(cls, source, indices: np.ndarray, canvas: int,
                      cache_dir: str, num_workers: Optional[int] = None,
                      max_store_gb: float = 64.0) -> "CanvasStore":
        """The loader-facing entry: content-keyed store under ``cache_dir``,
        built on first use, reused (zero decode work) afterwards."""
        indices = np.asarray(indices, np.int64)
        need = len(indices) * int(canvas) ** 2 * 3
        if need > float(max_store_gb) * (1 << 30):
            raise ValueError(
                f"canvas store would need {need / (1 << 30):.1f} GiB "
                f"({len(indices)} images x {canvas}px) — over the "
                f"{max_store_gb:.1f} GiB budget; shrink --cache_canvas or "
                f"raise --cache_host_budget_gb if that's intended.")
        path = os.path.join(cache_dir,
                            f"canvas_{cls.key(source, indices, canvas)}")
        if os.path.isdir(path):
            return cls(path)
        return cls.build(source, indices, canvas, path,
                         num_workers=num_workers)


class HostCanvasLoader:
    """``SRDataLoader``-protocol loader reading a :class:`CanvasStore`.

    Same iteration contract (``__len__``, ``set_epoch``, iterate uint8 NHWC
    batches placed on ``sharding``), same drop-remainder and per-(seed,
    epoch) shuffle scheme, multi-host process slicing included. The
    producer thread's work is block memcpys out of the memmap plus the
    device placement itself (prefetch-to-device) — no decode, no PIL, and
    nothing left to do at ``next()`` but hand over a ready device array.
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
        cache_dir: str = "canvas_cache",
        canvas: Optional[int] = None,
        max_store_gb: float = 64.0,
        num_workers: Optional[int] = None,
    ):
        self.indices = np.asarray(
            indices if indices is not None else np.arange(len(source)),
            np.int64)
        self.crop_size = int(crop_size)
        self.batch_size = int(batch_size)
        self.train = bool(train)
        self.shuffle = self.train if shuffle is None else bool(shuffle)
        self.seed = int(seed)
        self.prefetch = int(prefetch)
        self.sharding = sharding
        if canvas is None:
            canvas = max(256, self.crop_size) if self.train else self.crop_size
        canvas = max(int(canvas), self.crop_size)
        if not self.train:
            canvas = self.crop_size  # eval: exact host-loader parity
        self.store = CanvasStore.open_or_build(
            source, self.indices, canvas, cache_dir,
            num_workers=num_workers, max_store_gb=max_store_gb)
        self.canvas = canvas
        # one compiled augmenter per loader; out_shardings places the crop
        # batch straight onto the data mesh (the crop/flip is elementwise
        # per sample, so it runs shard-local — no collectives)
        self._aug = jax.jit(
            partial(_augment, crop=self.crop_size, train=self.train),
            out_shardings=self.sharding)
        self._key = jax.random.PRNGKey(self.seed)
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
        """``start_batch`` fast-forwards the next iteration to that batch
        (mid-epoch preemption resume): crops/flips are keyed by
        (seed, epoch, batch), so the yielded tail is identical to the
        uninterrupted epoch's and skipped batches are never assembled."""
        self._epoch = int(epoch)
        self._start_batch = int(start_batch)

    def _assemble(self, work) -> np.ndarray:
        """Gather this process's canvases for one batch: a block memcpy per
        sample out of the memmap — the ONLY per-step host work. No
        per-sample RNG, no strided flip copies, no PIL: on a busy host the
        jit-dispatch/runtime client competes for the same cores, and
        interpreter-heavy per-sample work degrades several-fold under that
        contention while plain slice copies don't (measured: the host-side
        crop/flip variant produced at 3 627 img/s quiet but ~800 img/s
        next to a dispatching main thread on a 1-core host)."""
        canv = self.store.canvases
        s = self.canvas
        out = np.empty((len(work), s, s, 3), np.uint8)
        for k, (_, i) in enumerate(work):
            out[k] = canv[self.store.row_for(i)]
        return out

    def _produce(self, order: np.ndarray, out: queue.Queue, epoch: int,
                 start_batch: int = 0):
        """Producer thread: gather canvases AND place them on device, so
        the H2D copy overlaps the main thread's step dispatch instead of
        serializing with it at ``next()`` time (prefetch-to-device)."""
        pi, pc = self._process_index, self._process_count
        try:
            for start in range(start_batch * self.batch_size,
                               len(order) - self.batch_size + 1,
                               self.batch_size):
                idx = order[start:start + self.batch_size]
                work = process_local_slice(
                    list(enumerate(idx, start=start)), pi, pc)
                out.put((self._to_global(self._assemble(work)),
                         start // self.batch_size))
        except BaseException as e:
            out.put(e)
        finally:
            out.put(None)

    def __iter__(self) -> Iterator:
        order = self.indices
        if self.shuffle:
            order = np.random.default_rng(
                (self.seed, self._epoch, 7)).permutation(self.indices)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        epoch = self._epoch
        start_batch = self._start_batch
        t = threading.Thread(target=self._produce,
                             args=(order, q, epoch, start_batch), daemon=True)
        t.start()
        self._epoch += 1
        self._start_batch = 0
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise RuntimeError(
                    "canvas-cache loader worker failed; epoch aborted"
                ) from item
            canvases, b = item
            if not self.train:
                yield canvases  # canvas == crop: byte-identical to the
                # streaming loader, nothing to augment
                continue
            # crops/flips are a pure function of (seed, epoch, batch) —
            # the DeviceCacheLoader keying discipline, so --resume replay
            # and cross-run determinism hold
            key = jax.random.fold_in(
                jax.random.fold_in(self._key, epoch), b)
            yield self._aug(canvases, key)

    def _to_global(self, local_np: np.ndarray):
        if self._process_count > 1:
            if self.sharding is None:
                raise ValueError("multi-process loading requires a sharding")
            return jax.make_array_from_process_local_data(
                self.sharding, local_np)
        if self.sharding is not None:
            return jax.device_put(local_np, self.sharding)
        import jax.numpy as jnp

        return jnp.asarray(local_np)


class DeviceWindowLoader:
    """Full-dataset training at chip rate on hosts with a weak H2D link:
    an HBM-resident shuffle window over the disk canvas store.

    The plain streaming path (:class:`HostCanvasLoader`) ships one canvas
    per drawn sample, so a step costs ``batch * canvas_bytes / wire_rate``
    of host->device traffic — measured ~55 MB/s through this dev tunnel
    (tools/h2d_probe.py), i.e. ~420 ms/step at batch 128/canvas 256 versus
    a 104 ms compute step. The same wall exists in production whenever many
    chips share one host NIC/PCIe complex. This loader breaks the
    proportionality: a ring window of ``window`` canvases lives in HBM;
    every step draws the whole batch ON DEVICE from the window (uniform
    with replacement — ``device_cache._sample_batch``) and refreshes only
    ``batch / reuse`` ring slots with fresh canvases from the epoch
    stream. Wire bytes per step drop by ``reuse``x; with reuse 8 at batch
    128 that is 6.3 MB/step — under the compute time even at tunnel rates.

    Sampling semantics (documented tradeoff, opt-in via
    ``--cache_host_reuse``): this is tf.data-style ``shuffle(buffer)`` over
    the repeated epoch stream, NOT exactly-once-per-epoch. Each canvas is
    uploaded exactly once every ``reuse`` epochs and is drawn ``reuse``
    times in expectation while resident; batches may contain duplicates
    (probability ~B/window per pair). Every other loader contract is kept:
    ``__len__`` = N // batch (an epoch still means N samples drawn),
    ``set_epoch``, batches land on ``sharding``, and every batch is a pure
    function of (seed, epoch, step) — on ``--resume`` the window state is
    reconstructed deterministically from the stream position, so replay is
    exact.

    Single-process only (like ``DeviceCacheLoader``: a replicated
    multi-GiB window per host fights the real multi-host input solution —
    per-host loaders already shard the batch).
    """

    def __init__(
        self,
        source,
        indices: Optional[Sequence[int]] = None,
        crop_size: int = 200,
        batch_size: int = 16,
        train: bool = True,
        seed: int = 0,
        prefetch: int = 4,
        sharding=None,
        cache_dir: str = "canvas_cache",
        canvas: Optional[int] = None,
        max_store_gb: float = 64.0,
        num_workers: Optional[int] = None,
        reuse: int = 8,
        window: Optional[int] = None,
        window_budget_gb: float = 1.0,
    ):
        if not train:
            raise ValueError(
                "DeviceWindowLoader is train-only (its with-replacement "
                "window sampling is an augmentation-time tradeoff); eval "
                "uses HostCanvasLoader, whose batches are byte-identical "
                "to the streaming loader")
        if jax.process_count() > 1:
            raise ValueError(
                "--cache_host_reuse is single-process only; multi-host "
                "runs shard the batch across per-host loaders already")
        self.indices = np.asarray(
            indices if indices is not None else np.arange(len(source)),
            np.int64)
        self.crop_size = int(crop_size)
        self.batch_size = int(batch_size)
        self.train = True
        self.seed = int(seed)
        self.prefetch = int(prefetch)
        self.sharding = sharding
        self.reuse = max(1, int(reuse))
        if canvas is None:
            canvas = max(256, self.crop_size)
        self.canvas = max(int(canvas), self.crop_size)
        self.store = CanvasStore.open_or_build(
            source, self.indices, self.canvas, cache_dir,
            num_workers=num_workers, max_store_gb=max_store_gb)

        # refresh quantum: R ring slots per step, window a multiple of R so
        # the ring pointer never wraps mid-chunk (one static update shape)
        self._refresh = max(1, -(-self.batch_size // self.reuse))
        n = len(self.indices)
        canvas_bytes = self.canvas * self.canvas * 3
        cap = int(float(window_budget_gb) * (1 << 30) // canvas_bytes)
        w = int(window) if window else min(max(4 * self.batch_size, 512), cap)
        w = min(w, n)
        w = max(self._refresh, w - w % self._refresh)
        if w * canvas_bytes > float(window_budget_gb) * (1 << 30):
            raise ValueError(
                f"window of {w} canvases x {self.canvas}px needs "
                f"{w * canvas_bytes / (1 << 30):.2f} GiB HBM — over the "
                f"{window_budget_gb:.1f} GiB budget; shrink --cache_window "
                f"or --cache_canvas")
        self.window = w

        if self.sharding is not None:
            mesh = self.sharding.mesh
            self._rep = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec())
        else:
            self._rep = None
        # window update: donated ring write of one refresh chunk
        self._update = jax.jit(
            lambda win, chunk, ptr: jax.lax.dynamic_update_slice(
                win, chunk, (ptr, 0, 0, 0)),
            donate_argnums=0,
            out_shardings=self._rep)
        # draw a batch: positions + crop/flip in ONE jitted program
        def _draw(win, key):
            k_pos, k_aug = jax.random.split(key)
            pos = jax.random.randint(
                k_pos, (self.batch_size,), 0, self.window)
            return _sample_batch(win, pos, k_aug, crop=self.crop_size,
                                 train=True)
        self._draw = jax.jit(_draw, out_shardings=self.sharding)
        self._key = jax.random.PRNGKey(self.seed)
        self._window_dev = None
        self._pos = None  # stream position AFTER the prefill, in canvases
        self._perm_cache = None
        self._epoch = 0
        self._start_batch = 0

    def __len__(self):
        return len(self.indices) // self.batch_size

    def set_epoch(self, epoch: int, start_batch: int = 0):
        """``start_batch`` fast-forwards the next iteration to that step
        (mid-epoch preemption resume): the window is a pure function of
        stream position, so ``_rebuild_window`` reconstructs the exact
        window the uninterrupted run held at that step, and draw keys are
        (seed, epoch, step)-addressed — the yielded tail matches exactly."""
        self._epoch = int(epoch)
        self._start_batch = int(start_batch)

    # -- the epoch stream: indices in epoch-permuted order, concatenated --

    def _perm(self, perm_epoch: int) -> np.ndarray:
        """Epoch-``perm_epoch`` shuffle of the indices — the SRDataLoader
        scheme, (seed, epoch, 7) — memoized (a chunk spans at most two
        perm epochs, so one live entry suffices)."""
        cached = self._perm_cache
        if cached is None or cached[0] != perm_epoch:
            cached = (perm_epoch, np.random.default_rng(
                (self.seed, perm_epoch, 7)).permutation(self.indices))
            self._perm_cache = cached
        return cached[1]

    def _stream_chunk(self, start: int, count: int) -> np.ndarray:
        """Canvases (stacked uint8) for stream positions [start, start+count).
        Position p maps to perm epoch p // n, offset p % n."""
        n = len(self.indices)
        out = np.empty((count, self.canvas, self.canvas, 3), np.uint8)
        canv = self.store.canvases
        for k in range(count):
            p = start + k
            src = self._perm(p // n)[p % n]
            out[k] = canv[self.store.row_for(int(src))]
        return out

    def _epoch_start_pos(self, epoch: int) -> int:
        return self.window + epoch * len(self) * self._refresh

    def _rebuild_window(self, pos: int):
        """Deterministically reconstruct the window for stream position
        ``pos`` (= upload the W canvases at [pos - W, pos)) — runs on the
        first epoch and after a --resume jump; sequential epochs carry the
        window over and never pay this.

        Ring invariant: sequential running always writes position p at row
        p % W (prefill fills [0, W) at rows 0..W-1; refreshes land at
        ptr = pos % W), and draws index rows directly — so the rebuild
        must place each position at ITS ring row, not in stream order.
        ``np.roll`` by pos % W does exactly that; without it any jump to a
        pos not a multiple of W (every mid-epoch preemption resume, and
        epoch jumps whenever steps*refresh % W != 0) would draw the right
        canvas SET through the wrong row permutation
        (tests/test_preempt.py::test_window_loader_start_batch)."""
        chunk = self._stream_chunk(pos - self.window, self.window)
        chunk = np.roll(chunk, pos % self.window, axis=0)
        if self._rep is not None:
            self._window_dev = jax.device_put(chunk, self._rep)
        else:
            import jax.numpy as jnp

            self._window_dev = jnp.asarray(chunk)
        self._pos = pos

    def _produce(self, out: queue.Queue, pos: int, steps: int):
        """Producer thread: assemble + device_put each refresh chunk ahead
        of the consumer (prefetch-to-device, R canvases per step)."""
        try:
            for t in range(steps):
                chunk = self._stream_chunk(pos + t * self._refresh,
                                           self._refresh)
                if self._rep is not None:
                    out.put(jax.device_put(chunk, self._rep))
                else:
                    import jax.numpy as jnp

                    out.put(jnp.asarray(chunk))
        except BaseException as e:
            out.put(e)
        finally:
            out.put(None)

    def __iter__(self) -> Iterator:
        epoch = self._epoch
        start_batch = self._start_batch
        start = self._epoch_start_pos(epoch) + start_batch * self._refresh
        if self._pos != start:
            self._rebuild_window(start)
        steps = len(self) - start_batch
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce,
                             args=(q, start, steps), daemon=True)
        t.start()
        self._epoch += 1
        self._start_batch = 0
        produced = start_batch
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise RuntimeError(
                    "window loader worker failed; epoch aborted") from item
            # draw from the CURRENT window, then retire the oldest ring
            # slots with the fresh chunk — a batch at step t never sees
            # canvases arriving at step t
            key = jax.random.fold_in(
                jax.random.fold_in(self._key, epoch), produced)
            batch = self._draw(self._window_dev, key)
            ptr = (self._pos % self.window)
            self._window_dev = self._update(self._window_dev, item,
                                            np.int32(ptr))
            self._pos += self._refresh
            produced += 1
            yield batch

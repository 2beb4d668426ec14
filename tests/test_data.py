"""Data pipeline tests: transform semantics, degradation contract, splits,
loader behavior, and end-to-end (lr, hr) pair parity with a torch-built
reference of the dataset contract."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

import jax.numpy as jnp

from food101_sr_tpu.data import (
    SRDataLoader,
    SyntheticSource,
    load_hr_crop,
    prepare_batch,
    subset_indices,
    train_val_split,
)


def test_synthetic_source_deterministic():
    s1, s2 = SyntheticSource(n=4, seed=7), SyntheticSource(n=4, seed=7)
    a, b = np.asarray(s1[2]), np.asarray(s2[2])
    np.testing.assert_array_equal(a, b)
    assert np.asarray(s1[0]).shape != np.asarray(s1[1]).shape


def test_load_hr_crop_eval_centercrop():
    img = Image.fromarray(
        np.arange(300 * 400 * 3, dtype=np.uint8).reshape(300, 400, 3) % 255
    )
    rng = np.random.default_rng(0)
    crop = load_hr_crop(img, 200, train=False, rng=rng)
    assert crop.shape == (200, 200, 3)
    # center crop: top=(300-200)//2=50, left=(400-200)//2=100
    want = np.asarray(img)[50:250, 100:300]
    np.testing.assert_array_equal(crop, want)


def test_load_hr_crop_small_image_resizes_shorter_side():
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (120, 180, 3), dtype=np.uint8),
        "RGB",
    )
    crop = load_hr_crop(img, 200, train=False, rng=np.random.default_rng(0))
    assert crop.shape == (200, 200, 3)


def test_train_crop_is_flip_and_crop_of_source():
    img = Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (256, 256, 3), dtype=np.uint8),
        "RGB",
    )
    src = np.asarray(img)
    crop = load_hr_crop(img, 200, train=True, rng=np.random.default_rng(2))
    # crop must appear in the source either directly or h-flipped
    found = False
    for cand in (crop, crop[:, ::-1]):
        for top in range(57):
            for left in range(57):
                if np.array_equal(src[top : top + 200, left : left + 200], cand):
                    found = True
                    break
            if found:
                break
        if found:
            break
    assert found


def test_prepare_batch_matches_reference_contract():
    """(lr, hr) must match: ToTensor (u8/255) then antialiased torch bicubic
    downsample of the HR tensor (reference src/dataset.py:36-41)."""
    hr_u8 = np.random.default_rng(0).integers(0, 256, (2, 200, 200, 3), dtype=np.uint8)
    lr, hr = prepare_batch(jnp.asarray(hr_u8), 4)
    assert lr.shape == (2, 50, 50, 3) and hr.shape == (2, 200, 200, 3)

    t_hr = torch.from_numpy(hr_u8.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
    t_lr = F.interpolate(t_hr, size=(50, 50), mode="bicubic",
                         align_corners=False, antialias=True)
    np.testing.assert_allclose(np.asarray(hr), t_hr.permute(0, 2, 3, 1).numpy(),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(lr), t_lr.permute(0, 2, 3, 1).numpy(),
                               atol=2e-5, rtol=1e-5)


def test_subset_and_split_shapes():
    idx = subset_indices(1000, 0.1, seed=0)
    assert len(idx) == 100
    tr, va = train_val_split(idx, 0.1, seed=1)
    assert len(tr) == 90 and len(va) == 10
    assert set(tr).isdisjoint(va)
    # seeded => reproducible
    tr2, va2 = train_val_split(subset_indices(1000, 0.1, seed=0), 0.1, seed=1)
    np.testing.assert_array_equal(tr, tr2)


def test_loader_batches_and_determinism():
    src = SyntheticSource(n=20, seed=3)
    dl = SRDataLoader(src, crop_size=64, batch_size=4, train=True, seed=5)
    batches = list(dl)
    assert len(batches) == 5
    assert all(b.shape == (4, 64, 64, 3) and b.dtype == jnp.uint8 for b in batches)
    # fresh loader, same seed -> same first epoch
    dl2 = SRDataLoader(src, crop_size=64, batch_size=4, train=True, seed=5)
    batches2 = list(dl2)
    np.testing.assert_array_equal(np.asarray(batches[0]), np.asarray(batches2[0]))
    # second epoch shuffles differently
    batches3 = list(dl2)
    assert not np.array_equal(np.asarray(batches2[0]), np.asarray(batches3[0]))


def test_loader_eval_drops_remainder_and_is_ordered():
    src = SyntheticSource(n=10, seed=3)
    dl = SRDataLoader(src, crop_size=32, batch_size=4, train=False, seed=0)
    batches = list(dl)
    assert len(batches) == 2
    # eval is unshuffled: first batch is sources 0..3 center crops
    rng = np.random.default_rng(0)
    want0 = load_hr_crop(src[0], 32, train=False, rng=rng)
    np.testing.assert_array_equal(np.asarray(batches[0][0]), want0)


def test_loader_deterministic_across_worker_counts():
    """Parallel batch assembly must not change the data: per-sample RNG is
    derived from (seed, epoch, position), not worker scheduling."""
    import numpy as np
    from food101_sr_tpu.data import SRDataLoader, SyntheticSource

    src = SyntheticSource(n=24, seed=0)
    a = SRDataLoader(src, crop_size=32, batch_size=8, train=True, seed=5,
                     num_workers=1)
    b = SRDataLoader(src, crop_size=32, batch_size=8, train=True, seed=5,
                     num_workers=8)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ba), np.asarray(bb))


def test_process_local_slice_partitions_batch():
    """Multi-host slicing: every global position lands on exactly one host,
    union reconstructs the batch, per-host shares are equal."""
    from food101_sr_tpu.data.pipeline import process_local_slice

    items = list(enumerate(range(100, 116)))  # one global batch of 16
    for pc in (1, 2, 4, 8):
        shards = [process_local_slice(items, pi, pc) for pi in range(pc)]
        assert all(len(s) == 16 // pc for s in shards)
        flat = sorted(x for s in shards for x in s)
        assert flat == items


# ---------------------------------------------------------------------------
# Food101Source + native fused decode-crop path
# ---------------------------------------------------------------------------

@pytest.fixture()
def food101_tree(tmp_path):
    """Minimal on-disk Food-101 layout (the torchvision-managed structure the
    reference downloads, reference src/dataset.py:10) with photo-like JPEGs,
    including one smaller than the crop to exercise resize-if-small."""
    base = tmp_path / "food-101"
    (base / "meta").mkdir(parents=True)
    (base / "images" / "pizza").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rel, sizes = [], [(300, 400), (240, 320), (64, 80), (333, 211)]
    for k, (h, w) in enumerate(sizes):
        x = rng.integers(0, 255, (h, w, 3)).astype(np.float32)
        for _ in range(2):
            x = (x + np.roll(x, 1, 0) + np.roll(x, 1, 1)) / 3
        img = Image.fromarray(np.clip(x, 0, 255).astype(np.uint8))
        img.save(base / "images" / "pizza" / f"im{k}.jpg", quality=90)
        rel.append(f"pizza/im{k}")
    (base / "meta" / "train.txt").write_text("\n".join(rel) + "\n")
    return tmp_path


def test_food101_source_reads_tree(food101_tree):
    from food101_sr_tpu.data import Food101Source

    src = Food101Source(root=str(food101_tree), split="train")
    assert len(src) == 4
    assert np.asarray(src[0]).ndim == 3
    assert isinstance(src.bytes_at(1), bytes)


def test_load_sample_native_path_matches_pil_path(food101_tree):
    """Batches must be byte-identical with and without the native JPEG
    library (same RNG consumption, pixel-equal decode), across the
    region-decode, resize-if-small, and eval-center-crop paths."""
    from food101_sr_tpu import native
    from food101_sr_tpu.data import Food101Source, load_sample

    src = Food101Source(root=str(food101_tree), split="train")
    assert native.jpeg_available()

    for train in (True, False):
        for i in range(len(src)):
            a = load_sample(src, i, 128, train, np.random.default_rng((5, i)))
            # force the pure-PIL fallback: no bytes_at on the source view
            class _NoBytes:
                def __init__(self, s):
                    self._s = s

                def __getitem__(self, j):
                    return self._s[j]

            b = load_sample(_NoBytes(src), i, 128, train,
                            np.random.default_rng((5, i)))
            np.testing.assert_array_equal(a, b)
            assert a.shape == (128, 128, 3) and a.dtype == np.uint8


def test_loader_over_food101_source(food101_tree):
    from food101_sr_tpu.data import Food101Source

    src = Food101Source(root=str(food101_tree), split="train")
    loader = SRDataLoader(src, crop_size=96, batch_size=2, train=True, seed=3)
    batches = [np.asarray(b) for b in loader]
    assert len(batches) == 2
    assert batches[0].shape == (2, 96, 96, 3)
    loader2 = SRDataLoader(src, crop_size=96, batch_size=2, train=True, seed=3)
    loader2.set_epoch(0)
    for x, y in zip(batches, loader2):
        np.testing.assert_array_equal(x, np.asarray(y))


def test_loader_propagates_worker_errors():
    """A failing sample (corrupt file, OOM) must abort the epoch loudly —
    not silently truncate it (the producer thread previously swallowed the
    exception and just ended the queue)."""

    class Flaky:
        def __init__(self, n=8):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            if i == 5:
                raise OSError("simulated corrupt image")
            arr = np.full((64, 64, 3), i, np.uint8)
            return Image.fromarray(arr)

    loader = SRDataLoader(Flaky(), crop_size=32, batch_size=4, train=False,
                          shuffle=False, seed=0)
    with pytest.raises(RuntimeError, match="worker failed"):
        for _ in loader:
            pass

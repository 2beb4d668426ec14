"""Device-resident dataset cache (data/device_cache.py).

The feature's contract (module docstring): eval batches byte-identical to
the host loader; train batches deterministic in (seed, epoch, position) so
--resume replay holds; batches land sharded on the data mesh; the HBM
budget guard refuses oversized caches; train() runs end-to-end on it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from food101_sr_tpu.data import (
    DeviceCacheLoader,
    SRDataLoader,
    SyntheticSource,
)
from food101_sr_tpu.parallel import data_sharding, make_mesh


def _batches(loader, epoch=0):
    loader.set_epoch(epoch)
    return [np.asarray(b) for b in loader]


def test_eval_batches_byte_identical_to_host_loader():
    src = SyntheticSource(n=24, seed=3)
    idx = np.arange(20)
    kw = dict(indices=idx, crop_size=64, batch_size=8, train=False, seed=5)
    host = SRDataLoader(src, **kw)
    dev = DeviceCacheLoader(src, **kw)
    hb, db = _batches(host), _batches(dev)
    assert len(hb) == len(db) == 2
    for a, b in zip(hb, db):
        assert a.dtype == b.dtype == np.uint8
        np.testing.assert_array_equal(a, b)


def test_train_batches_shape_and_determinism():
    src = SyntheticSource(n=32, seed=1)
    kw = dict(indices=np.arange(32), crop_size=48, batch_size=8, train=True,
              seed=9, canvas=96)
    a = DeviceCacheLoader(src, **kw)
    b = DeviceCacheLoader(src, **kw)
    ba, bb = _batches(a, epoch=2), _batches(b, epoch=2)
    assert len(ba) == 4 and ba[0].shape == (8, 48, 48, 3)
    for x, y in zip(ba, bb):
        np.testing.assert_array_equal(x, y)  # resume-replay determinism
    # different epoch -> different order/augment
    bc = _batches(b, epoch=3)
    assert any(not np.array_equal(x, y) for x, y in zip(ba, bc))


def test_train_crops_and_flips_are_really_drawn():
    """Crops must vary within a batch of the same image, and flips must
    occur (a mirrored landmark shows up flipped about half the time)."""
    src = SyntheticSource(n=2, seed=0)
    # 64 samples of the same 2 images
    idx = np.zeros(64, np.int64)
    loader = DeviceCacheLoader(src, indices=idx, crop_size=32, batch_size=64,
                               train=True, seed=0, canvas=128, shuffle=False)
    (batch,) = _batches(loader)
    uniq = {batch[i].tobytes() for i in range(64)}
    # same source image everywhere; variation can only come from crop/flip
    assert len(uniq) > 16


def test_epoch_iteration_advances_like_host_loader():
    src = SyntheticSource(n=16, seed=0)
    kw = dict(indices=np.arange(16), crop_size=32, batch_size=8, train=True)
    dev = DeviceCacheLoader(src, canvas=64, **kw)
    first = [x.copy() for x in _batches(dev, epoch=0)]
    second = [np.asarray(b) for b in dev]  # no set_epoch: auto-advances to 1
    assert any(not np.array_equal(a, b) for a, b in zip(first, second))


def test_budget_guard_refuses_oversized_cache():
    src = SyntheticSource(n=64, seed=0)
    with pytest.raises(ValueError, match="GiB"):
        DeviceCacheLoader(src, indices=np.arange(64), crop_size=200,
                          batch_size=8, train=True, canvas=512,
                          max_cache_gb=0.01)


def test_batches_shard_over_the_mesh():
    mesh = make_mesh()
    shard = data_sharding(mesh)
    n_dev = len(mesh.devices.flat)
    assert n_dev == 8  # conftest virtual devices
    src = SyntheticSource(n=16, seed=2)
    loader = DeviceCacheLoader(src, indices=np.arange(16), crop_size=32,
                               batch_size=16, train=True, sharding=shard,
                               canvas=64)
    batch = next(iter(loader))
    assert batch.sharding.is_equivalent_to(shard, batch.ndim)
    assert len(batch.addressable_shards) == n_dev


def test_train_end_to_end_with_cache_device(tmp_path):
    from food101_sr_tpu.training import train

    out = train(dict(
        architecture="SRCNN", epochs=1, batch_size=8, subset=1.0,
        dataset="synthetic", synthetic_size=96, crop_size=32,
        scale_factor=4, weights_dir=str(tmp_path), save_name="cache_smoke",
        cache_device=True, cache_canvas=48, log_every=1, use_wandb=False,
    ))
    assert np.isfinite(out["psnr"]) and out["psnr"] > 0

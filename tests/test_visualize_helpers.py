"""Unit tests for visualize.py helpers (255-range PSNR, shape bucketing)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def vis():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import visualize
    return visualize


def test_calculate_psnr_identical_images(vis):
    img = np.random.default_rng(0).integers(0, 256, (32, 32, 3), np.uint8)
    assert vis.calculate_psnr(img, img) == 100.0


def test_calculate_psnr_known_value(vis):
    """Uniform +1 offset: MSE=1 -> PSNR = 20*log10(255) = 48.1308 dB
    (reference visualize.py:24-29 semantics)."""
    a = np.full((16, 16, 3), 100, np.uint8)
    b = np.full((16, 16, 3), 101, np.uint8)
    np.testing.assert_allclose(vis.calculate_psnr(a, b), 48.1308, atol=1e-3)


def test_model_runner_bucket_pads_and_crops(vis):
    """Bucketing pads LR to a multiple of 32 and crops the SR output back:
    output must be exactly (H*4, W*4) for a non-multiple input."""
    r = vis.ModelRunner("SRCNN", "/nonexistent")  # weights missing -> skip
    assert r.variables is None

    # build a loadable runner from a fresh init (no checkpoint)
    import jax
    import jax.numpy as jnp
    from food101_sr_tpu.models import get_model

    r = vis.ModelRunner.__new__(vis.ModelRunner)
    r.name = "SRCNN"
    r.model = get_model("SRCNN", scale_factor=4)
    r.variables = r.model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((1, 16, 16, 3), jnp.float32),
                               train=False)
    r._fwd = jax.jit(lambda v, x: jnp.clip(
        r.model.apply(v, x, train=False), 0.0, 1.0))
    r._to_u8 = jax.jit(lambda y: (y * 255.0 + 0.5).astype(jnp.uint8))
    r._warm_shapes = set()

    lr = np.random.default_rng(1).uniform(0, 1, (30, 45, 3)).astype(np.float32)
    sr, dt = r.predict(lr, bucket=True)
    assert sr.shape == (120, 180, 3)
    assert sr.dtype == np.uint8
    assert dt > 0


def test_parse_weight_specs(vis):
    assert vis.parse_weight_specs(None) is None
    assert vis.parse_weight_specs([]) is None
    assert vis.parse_weight_specs(
        ["RESNET=weights/winner_resnet_best", "SRCNN=w/s"]
    ) == {"RESNET": "weights/winner_resnet_best", "SRCNN": "w/s"}
    for bad in ["RESNET", "=path", "NAME="]:
        with pytest.raises(ValueError):
            vis.parse_weight_specs([bad])

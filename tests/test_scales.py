"""Arbitrary integer upscale factors (beyond parity: the reference builds
log2(scale) x2 stages and therefore supports powers of two only, reference
src/models.py:116-123). Our tail factorizes the scale into prime stages
(`models/layers.scale_stages`), and PixelShuffle/ICNR/the phase machinery
are generic in the stage factor — so x3/x6/x12 work end to end."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from food101_sr_tpu.models import get_model
from food101_sr_tpu.models.attention_sr import AttentionSR
from food101_sr_tpu.models.layers import icnr_kaiming_normal, scale_stages
from food101_sr_tpu.models.resnet_sr import ResNetSR
from food101_sr_tpu.ops.pixel_shuffle import pixel_shuffle


def _slim(arch, scale, **kw):
    if arch == "SRCNN":
        return get_model("SRCNN", scale_factor=scale)
    cls = ResNetSR if arch == "RESNET" else AttentionSR
    # 16 channels: AttentionSR's SE squeeze divides by its reduction of 16
    return cls(scale_factor=scale, num_residuals=1, num_channels=16, **kw)


def test_scale_stages_factorization():
    assert scale_stages(2) == (2,)
    assert scale_stages(3) == (3,)
    assert scale_stages(4) == (2, 2)   # the reference's layout at x4
    assert scale_stages(6) == (2, 3)
    assert scale_stages(8) == (2, 2, 2)
    assert scale_stages(9) == (3, 3)
    assert scale_stages(12) == (2, 2, 3)
    for bad in (0, 1, -2):
        with pytest.raises(ValueError):
            scale_stages(bad)


@pytest.mark.parametrize("arch", ["SRCNN", "RESNET", "AttentionSR"])
def test_forward_shapes_x3(arch):
    model = _slim(arch, 3)
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (2, 12, 12, 3)).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y = model.apply(v, x, train=False)
    assert y.shape == (2, 36, 36, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_icnr_is_nn_upsample_at_r3():
    """ICNR's defining property must hold for non-power-of-two stages:
    conv(x, icnr_kernel) -> PixelShuffle(3) equals a nearest-neighbor x3
    upsample of conv(x, sub_kernel)."""
    r, cin, cout_sub = 3, 4, 5
    kern = icnr_kaiming_normal(r)(jax.random.PRNGKey(0),
                                  (3, 3, cin, cout_sub * r * r))
    x = jnp.asarray(np.random.default_rng(1)
                    .uniform(-1, 1, (1, 6, 6, cin)).astype(np.float32))

    def conv(k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)

    up = pixel_shuffle(conv(kern), r)
    sub = conv(kern[..., ::r * r])  # each sibling group repeats one filter
    nn_up = jnp.repeat(jnp.repeat(sub, r, axis=1), r, axis=2)
    np.testing.assert_allclose(np.asarray(up), np.asarray(nn_up),
                               rtol=1e-6, atol=1e-6)


def test_tiled_apply_exact_at_x3():
    """The serving halo-tiling path must stay exact at non-power-of-two
    scales (stitch geometry is scale*tile; nothing may assume scale=4)."""
    from food101_sr_tpu.parallel import tiled_apply

    model = ResNetSR(scale_factor=3, num_residuals=2, num_channels=16)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 8, 8, 3), jnp.float32), train=False)
    fwd = lambda x: model.apply(v, x, train=False)
    x = jnp.asarray(np.random.default_rng(6)
                    .uniform(0, 1, (1, 48, 48, 3)).astype(np.float32))
    full = fwd(x)
    tiled = tiled_apply(fwd, x, scale=3, tile=16, halo=16)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                               atol=2e-5, rtol=1e-5)


def test_train_step_runs_at_x3():
    """One production train step at scale 3 (crop divisible by 3):
    uint8 -> on-device degrade -> forward -> NLPD -> Adam update."""
    from food101_sr_tpu.losses import nlpd_loss
    from food101_sr_tpu.training import SRTrainState, make_adam, make_train_step

    scale, crop = 3, 24
    model = _slim("AttentionSR", scale, phase_tail=True)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, crop // scale, crop // scale, 3),
                             jnp.float32), train=False)
    state = SRTrainState.create(dict(v), make_adam(1e-4))
    hr_u8 = jnp.asarray(np.random.default_rng(2).integers(
        0, 256, (4, crop, crop, 3), dtype=np.uint8))
    step = jax.jit(make_train_step(model, nlpd_loss, scale,
                                   "input_conv", "output_conv"))
    state, metrics = step(state, hr_u8)
    assert np.isfinite(float(metrics["train_loss"]))

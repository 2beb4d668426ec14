"""Fused phase-space upsample tail (ops/subpixel_conv.phase_conv2d,
models' ``phase_tail=True``): every tail conv runs at LR resolution in
pixel-shuffle phase space, one shuffle at the very end. The claim under
test is EXACTNESS — same params, same math as the materialized tail
(conv -> PixelShuffle -> PReLU stages -> conv9, reference
src/models.py:116-124,160-168) — plus the static-layout bookkeeping
(merge_phase_perm) that keeps the accumulated phase canonical between x2
stages."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from food101_sr_tpu.models.attention_sr import AttentionSR
from food101_sr_tpu.models.layers import UpsampleBlock
from food101_sr_tpu.models.resnet_sr import ResNetSR
from food101_sr_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from food101_sr_tpu.ops.subpixel_conv import (grouped_out_map, phase_conv2d,
                                              phase_conv2d_grouped,
                                              phase_major_shuffle)


def _rng(seed=0):
    return np.random.default_rng(seed)


def test_pixel_unshuffle_is_exact_inverse():
    for r in (2, 3, 4):
        z = jnp.asarray(_rng(r).normal(size=(2, 5, 7, 3 * r * r)),
                        jnp.float32)
        assert jnp.array_equal(pixel_unshuffle(pixel_shuffle(z, r), r), z)
        img = jnp.asarray(_rng(r + 9).normal(size=(2, 6 * r, 4 * r, 5)),
                          jnp.float32)
        assert jnp.array_equal(pixel_shuffle(pixel_unshuffle(img, r), r), img)
    with pytest.raises(ValueError):
        pixel_unshuffle(jnp.zeros((1, 5, 4, 3)), 2)


@pytest.mark.parametrize("r,k", [(2, 3), (2, 9), (4, 3), (4, 9)])
def test_phase_conv_matches_materialized_conv(r, k):
    """phase_conv2d(z) == conv(pixel_shuffle(z)) in fp32, including the
    SAME-padding boundary and bias."""
    cin, cout = 6, 5
    z = jnp.asarray(_rng(1).normal(size=(2, 5, 4, r * r * cin)), jnp.float32)
    kern = jnp.asarray(_rng(2).normal(size=(k, k, cin, cout)), jnp.float32)
    bias = jnp.asarray(_rng(3).normal(size=(cout,)), jnp.float32)

    img = pixel_shuffle(z, r)
    p = (k - 1) // 2
    ref = jax.lax.conv_general_dilated(
        img, kern, (1, 1), padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) + bias

    got = phase_conv2d(z, kern, bias, r, shuffle_out=True)
    # accumulation-order-only difference: k=9 sums 81*cin fp32 terms, so a
    # few ulps of relative noise on O(10) magnitudes is expected
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=5e-5)
    # phase-space output + manual shuffle is the same thing
    got2 = pixel_shuffle(phase_conv2d(z, kern, bias, r), r)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got), atol=0)


def test_grouped_phase_conv_matches_dense():
    """The polyphase-split form == the dense K' form == the materialized
    conv, and its grouped (phase-major) output layout is what
    phase_major_shuffle expects."""
    for r, k in ((2, 3), (4, 3), (4, 9)):
        cin, cout = 5, 4
        z = jnp.asarray(_rng(11).normal(size=(2, 5, 4, r * r * cin)),
                        jnp.float32)
        kern = jnp.asarray(_rng(12).normal(size=(k, k, cin, cout)),
                           jnp.float32)
        bias = jnp.asarray(_rng(13).normal(size=(cout,)), jnp.float32)
        dense = phase_conv2d(z, kern, bias, r, shuffle_out=True)
        grouped = phase_major_shuffle(
            phase_conv2d_grouped(z, kern, bias, r), r)
        np.testing.assert_allclose(np.asarray(grouped), np.asarray(dense),
                                   rtol=1e-5, atol=5e-5)


def test_upsample_block_phase_stage_matches_materialized():
    """One x2 stage consuming r_in-phase input must produce exactly the
    materialized stage's output — the stage emits GROUPED layout, whose
    canonical index per channel is grouped_out_map (the bookkeeping the
    next kernel's gather absorbs)."""
    for r_in in (2, 4):
        img = jnp.asarray(_rng(5).normal(size=(2, 6 * r_in, 4 * r_in, 16)),
                          jnp.float32)
        std = UpsampleBlock(out_channels=8, scale=2, dtype=jnp.float32)
        v = std.init(jax.random.PRNGKey(0), img)
        ref = std.apply(v, img)

        ph = UpsampleBlock(out_channels=8, scale=2, dtype=jnp.float32,
                           phase_in=r_in)
        got = ph.apply(v, pixel_unshuffle(img, r_in))
        # reorder grouped -> canonical ps, then materialize
        m = np.asarray(grouped_out_map(8 * 4, r_in))
        canon = np.empty_like(np.asarray(got))
        canon[..., m] = np.asarray(got)
        got_img = pixel_shuffle(jnp.asarray(canon), 2 * r_in)
        np.testing.assert_allclose(np.asarray(got_img), np.asarray(ref),
                                   atol=2e-5)


@pytest.mark.parametrize("cls,kw", [
    (AttentionSR, dict(num_residuals=2, num_channels=16)),
    (ResNetSR, dict(num_residuals=2, num_channels=16)),
])
@pytest.mark.parametrize("scale", [2, 3, 4, 6, 8])
def test_model_phase_tail_exact_and_same_params(cls, kw, scale):
    """The full model with phase_tail=True: identical param tree (same
    checkpoints load) and fp32 outputs equal to float noise."""
    m0 = cls(scale_factor=scale, dtype=jnp.float32, **kw)
    m1 = cls(scale_factor=scale, dtype=jnp.float32, phase_tail=True, **kw)
    x = jnp.asarray(_rng(7).uniform(size=(2, 12, 12, 3)), jnp.float32)
    v = m0.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    v1 = m1.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v1))
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree_util.tree_leaves(v),
                   jax.tree_util.tree_leaves(v1)))
    y0 = m0.apply(v, x, train=False)
    y1 = m1.apply(v, x, train=False)
    assert y1.shape == y0.shape == (2, 12 * scale, 12 * scale, 3)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-5)


def test_phase_tail_gradients_match_standard():
    """train.py --phase_tail claims gradient equality to float noise: the
    phase form is a linear re-indexing of the same kernel, so d(loss)/d
    (params) must match the standard tail leaf-by-leaf (fp32, same batch,
    same params)."""
    m0 = AttentionSR(scale_factor=4, num_residuals=2, num_channels=16,
                     dtype=jnp.float32)
    m1 = AttentionSR(scale_factor=4, num_residuals=2, num_channels=16,
                     dtype=jnp.float32, phase_tail=True)
    lr = jnp.asarray(_rng(21).uniform(size=(2, 10, 10, 3)), jnp.float32)
    hr = jnp.asarray(_rng(22).uniform(size=(2, 40, 40, 3)), jnp.float32)
    v = m0.init({"params": jax.random.PRNGKey(0)}, lr, train=False)

    def loss(m):
        def f(params):
            y = m.apply({**v, "params": params}, lr, train=True)
            return jnp.mean((y - hr) ** 2)
        return jax.grad(f)(v["params"])

    g0, g1 = loss(m0), loss(m1)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    assert len(flat0) == len(flat1)
    for (p0, a), (p1, b) in zip(flat0, flat1):
        assert p0 == p1
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6,
            err_msg=jax.tree_util.keystr(p0))


def test_phase_tail_any_input_size():
    """Phase space lives at LR resolution, so unlike the HR subpixel_r
    gate there is NO divisibility constraint on the input (serving tiles
    are arbitrary sizes)."""
    m = AttentionSR(scale_factor=4, num_residuals=1, num_channels=16,
                    dtype=jnp.float32, phase_tail=True)
    x = jnp.zeros((1, 7, 13, 3), jnp.float32)  # odd, non-multiple
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert m.apply(v, x, train=False).shape == (1, 28, 52, 3)

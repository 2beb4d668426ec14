"""Subpixel phase-decomposed conv vs the direct conv — exactness across
kernel sizes, phase factors, and shapes, plus gradient equivalence and the
Conv-module fallback on non-divisible shapes."""
import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
import pytest

from food101_sr_tpu.ops.subpixel_conv import subpixel_conv2d


def _direct(x, kernel, bias):
    k = kernel.shape[0]
    p = (k - 1) // 2
    y = lax.conv_general_dilated(x, kernel, (1, 1), padding=((p, p), (p, p)),
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


@pytest.mark.parametrize("k,r,cin,cout,h,w", [
    (9, 4, 64, 3, 16, 24),
    (9, 2, 8, 3, 12, 12),
    (5, 4, 16, 3, 8, 8),
    (3, 2, 6, 4, 10, 14),
    (9, 8, 8, 2, 16, 16),
])
def test_subpixel_matches_direct(k, r, cin, cout, h, w):
    rng = np.random.default_rng(k * 100 + r)
    x = jnp.asarray(rng.normal(0, 1, (2, h, w, cin)).astype(np.float32))
    kern = jnp.asarray(rng.normal(0, 0.1, (k, k, cin, cout)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, cout).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(subpixel_conv2d(x, kern, b, r)),
        np.asarray(_direct(x, kern, b)), atol=5e-5, rtol=1e-5)


def test_subpixel_gradients_match_direct():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 16)).astype(np.float32))
    kern = jnp.asarray(rng.normal(0, 0.1, (9, 9, 16, 3)).astype(np.float32))
    b = jnp.zeros(3, jnp.float32)
    g = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 3)).astype(np.float32))

    gk_fast = jax.grad(lambda kk: jnp.vdot(subpixel_conv2d(x, kk, b, 4), g))(kern)
    gk_dir = jax.grad(lambda kk: jnp.vdot(_direct(x, kk, b), g))(kern)
    np.testing.assert_allclose(np.asarray(gk_fast), np.asarray(gk_dir),
                               atol=5e-5, rtol=1e-4)


def test_conv_module_falls_back_on_nondivisible_shapes():
    """Same Conv params must produce the same result whether the (static)
    shape triggers the subpixel path (divisible) or the direct path."""
    from food101_sr_tpu.models.layers import Conv

    m = Conv(3, 9, subpixel_r=4)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 8, 8, 16)))
    rng = np.random.default_rng(1)
    x_div = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 16)).astype(np.float32))
    x_odd = jnp.asarray(np.asarray(x_div)[:, :15, :14, :])
    out_div = m.apply(v, x_div)   # subpixel path
    out_odd = m.apply(v, x_odd)   # fallback direct path
    # cross-check: direct conv on the divisible input equals the fast path
    m_plain = Conv(3, 9, subpixel_r=0)
    np.testing.assert_allclose(np.asarray(out_div),
                               np.asarray(m_plain.apply(v, x_div)),
                               atol=5e-5, rtol=1e-5)
    assert out_odd.shape == (1, 15, 14, 3)

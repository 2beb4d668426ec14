"""Pallas separable blur kernel vs. the XLA depthwise conv reference
(interpreter mode on CPU; the same kernel compiles on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from food101_sr_tpu.ops.gaussian import depthwise_blur
from food101_sr_tpu.ops.pallas_blur import _gaussian_taps, blur_pallas


def test_taps_factorize_kernel():
    from food101_sr_tpu.ops.gaussian import gaussian_kernel_2d
    k2d = gaussian_kernel_2d(5, 1.0)
    g = np.asarray(_gaussian_taps(5, 1.0))
    np.testing.assert_allclose(np.outer(g, g), k2d, atol=1e-7)
    np.testing.assert_allclose(g.sum(), 1.0, atol=1e-6)


def test_blur_matches_xla_conv():
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 24, 40, 3)).astype(np.float32)
    )
    want = depthwise_blur(x, 5, 1.0)
    got = blur_pallas(x, 5, 1.0, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_blur_zero_padding_borders():
    """A constant image must NOT stay constant at the borders (zero padding
    leaks in), exactly as in torch F.conv2d(padding=2)."""
    x = jnp.ones((1, 16, 16, 1), jnp.float32)
    want = depthwise_blur(x, 5, 1.0)
    got = blur_pallas(x, 5, 1.0, True)
    assert float(got[0, 0, 0, 0]) < 1.0  # corner attenuated
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_blur_vjp_is_self_adjoint():
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, 12, 20, 2)).astype(np.float32)
    )
    g = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (1, 12, 20, 2)).astype(np.float32)
    )

    def f_pallas(x):
        return jnp.vdot(blur_pallas(x, 5, 1.0, True), g)

    def f_xla(x):
        return jnp.vdot(depthwise_blur(x, 5, 1.0), g)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_pallas)(x)), np.asarray(jax.grad(f_xla)(x)),
        atol=1e-5, rtol=1e-5)

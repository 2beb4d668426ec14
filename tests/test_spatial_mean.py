"""Pallas SE-squeeze spatial mean (ops/spatial_mean.py) vs jnp.mean
(interpreter mode on CPU; the same kernel compiles on TPU). The claim is
EXACT semantics of ``x.mean(dim=(2, 3))`` (reference src/models.py:33)
with f32 accumulation, plus the linear-op VJP."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from food101_sr_tpu.ops.spatial_mean import (_BLOCK_BUDGET_BYTES,
                                             _block_shape, spatial_mean,
                                             spatial_mean_pallas)


def _x(n, h=13, w=9, c=5, seed=0, dtype=np.float32):
    return jnp.asarray(np.random.default_rng(seed)
                       .uniform(-2, 2, (n, h, w, c)).astype(dtype))


@pytest.mark.parametrize("n", [1, 2, 3, 8])  # covers every _block_n branch
def test_matches_jnp_mean(n):
    x = _x(n)
    want = jnp.mean(x, axis=(1, 2))
    got = spatial_mean_pallas(x, True)  # interpret mode
    assert got.dtype == x.dtype and got.shape == (n, x.shape[-1])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_block_shape_divides_and_fits_budget():
    for n, h, w, c, isz in [(1, 5, 7, 3, 4), (3, 13, 9, 5, 4),
                            (512, 50, 50, 96, 2), (2, 256, 256, 96, 2),
                            (1, 512, 512, 64, 4), (7, 11, 3, 2, 4),
                            (128, 50, 50, 96, 2), (16, 256, 256, 96, 2)]:
        blocks = _block_shape(n, h, w, c, isz)
        assert blocks is not None
        bn, bh = blocks
        assert n % bn == 0 and h % bh == 0
        # the pallas TPU output-block constraint: sublane dim a multiple
        # of 8 or the whole batch
        assert bn % 8 == 0 or bn == n
        assert bn * bh * w * c * isz <= 3 * _BLOCK_BUDGET_BYTES
    # neither small nor 8-divisible batch on a huge image -> XLA fallback
    assert _block_shape(1001, 512, 512, 96, 4) is None


@pytest.mark.parametrize("n,h", [(2, 12), (1, 36)])
def test_row_chunk_accumulation(n, h):
    """Shapes whose row chunk is smaller than H exercise the revisited
    output block (grid dim 1 accumulation)."""
    import sys

    import food101_sr_tpu.ops.spatial_mean  # noqa: F401 (function shadows)
    sm = sys.modules["food101_sr_tpu.ops.spatial_mean"]
    x = _x(n, h, 8, 3, seed=7)
    orig = sm._BLOCK_BUDGET_BYTES
    sm._BLOCK_BUDGET_BYTES = x.shape[2] * x.shape[3] * 4 * (h // 4)
    try:
        bn, bh = sm._block_shape(n, h, 8, 3, 4)
        assert bh < h  # chunked
        got = spatial_mean_pallas(x, True)
    finally:
        sm._BLOCK_BUDGET_BYTES = orig
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.mean(x, axis=(1, 2))),
                               atol=1e-6, rtol=1e-6)


def test_bf16_input_accumulates_f32():
    """2500 bf16 terms summed in bf16 lose ~3 decimal digits; the kernel
    must accumulate in f32 like the XLA convert_reduce it replaces."""
    x = _x(2, 50, 50, 4, dtype=np.float32).astype(jnp.bfloat16)
    want = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    got = spatial_mean_pallas(x, True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-2)  # bf16 output rounding only


def test_vjp_is_broadcast():
    x = _x(2, 6, 4, 3, seed=3)
    ct = jnp.asarray(np.random.default_rng(4)
                     .uniform(-1, 1, (2, 3)).astype(np.float32))
    _, vjp = jax.vjp(lambda v: spatial_mean_pallas(v, True), x)
    (gx,) = vjp(ct)
    want = np.broadcast_to(np.asarray(ct)[:, None, None, :] / (6 * 4),
                           x.shape)
    np.testing.assert_allclose(np.asarray(gx), want, atol=1e-7)


def test_dispatch_cpu_path_matches():
    """The production entry point (used by SEBlock) on this backend."""
    x = _x(4, 7, 11, 6, seed=5)
    np.testing.assert_allclose(
        np.asarray(spatial_mean(x)),
        np.asarray(jnp.mean(x, axis=(1, 2))), atol=1e-6, rtol=1e-6)

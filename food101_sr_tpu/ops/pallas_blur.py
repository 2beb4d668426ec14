"""Pallas TPU kernel: depthwise separable Gaussian blur (zero-padded).

The NLPD loss (the reference's default training loss, reference
train.py:208 / src/loss.py:31-79) applies a depthwise 5x5 Gaussian to every
pyramid level of both pred and target — 8+ blurs per train step. XLA lowers
``conv_general_dilated(feature_group_count=C)`` through the MXU, wasting a
128x128 systolic array on a 5-tap stencil. This kernel does the
mathematically identical separable blur on the VPU with shifted adds.

Layout: the (N, H, W, C) image is viewed as a grid of (H, W) planes, one
per (image, channel); rows are sublanes, columns are lanes. Row/column
shifts with zero borders implement torch's ``F.conv2d(padding=k//2,
groups=C)`` semantics exactly (the kernel is symmetric, so correlation ==
convolution).

The op is linear and self-adjoint (symmetric kernel + zero padding), so
its VJP is the blur itself — registered via ``jax.custom_vjp`` to keep the
backward pass on the same kernel.

Falls back to the XLA conv implementation off-TPU (CPU tests run the
kernel in interpreter mode for parity, production CPU paths use XLA).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gaussian import depthwise_blur, gaussian_kernel_2d


@functools.lru_cache(maxsize=8)
def _gaussian_taps(size: int, sigma: float) -> tuple[float, ...]:
    """1-D taps of the separable kernel (outer(g, g) == 2-D kernel)."""
    k2d = gaussian_kernel_2d(size, sigma)
    # k2d = outer(g, g) with sum(g) == 1; recover g from the center column.
    c = (size - 1) // 2
    g = k2d[:, c] / np.sqrt(k2d[c, c])
    return tuple(float(t) for t in g)


def _shift_rows(x, d):
    """x shifted by d rows with zero fill (d>0: pulls from later rows)."""
    h = x.shape[0]
    if d == 0:
        return x
    if d > 0:
        return jnp.concatenate([x[d:], jnp.zeros((d, x.shape[1]), x.dtype)], 0)
    return jnp.concatenate([jnp.zeros((-d, x.shape[1]), x.dtype), x[:d]], 0)


def _shift_cols(x, d):
    w = x.shape[1]
    if d == 0:
        return x
    if d > 0:
        return jnp.concatenate([x[:, d:], jnp.zeros((x.shape[0], d), x.dtype)], 1)
    return jnp.concatenate([jnp.zeros((x.shape[0], -d), x.dtype), x[:, :d]], 1)


def _blur_kernel(taps, x_ref, o_ref):
    x = x_ref[0]
    r = len(taps) // 2
    # rows (sublane axis)
    acc = jnp.zeros_like(x)
    for i, t in enumerate(taps):
        acc = acc + t * _shift_rows(x, i - r)
    # columns (lane axis)
    out = jnp.zeros_like(x)
    for i, t in enumerate(taps):
        out = out + t * _shift_cols(acc, i - r)
    o_ref[0] = out


def _blur_pallas_raw(x: jnp.ndarray, size: int, sigma: float,
                     interpret: bool = False) -> jnp.ndarray:
    n, h, w, c = x.shape
    taps = _gaussian_taps(size, sigma)
    planes = jnp.transpose(x, (0, 3, 1, 2)).reshape(n * c, h, w)
    out = pl.pallas_call(
        functools.partial(_blur_kernel, taps),
        out_shape=jax.ShapeDtypeStruct((n * c, h, w), x.dtype),
        grid=(n * c,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes)
    return jnp.transpose(out.reshape(n, c, h, w), (0, 2, 3, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def blur_pallas(x: jnp.ndarray, size: int = 5, sigma: float = 1.0,
                interpret: bool = False) -> jnp.ndarray:
    """Depthwise zero-padded Gaussian blur, Pallas TPU kernel."""
    return _blur_pallas_raw(x, size, sigma, interpret)


def _blur_fwd(x, size, sigma, interpret):
    return _blur_pallas_raw(x, size, sigma, interpret), None


def _blur_bwd(size, sigma, interpret, _, g):
    # linear + self-adjoint (symmetric kernel, zero padding)
    return (_blur_pallas_raw(g, size, sigma, interpret),)


blur_pallas.defvjp(_blur_fwd, _blur_bwd)


def depthwise_blur_fast(x: jnp.ndarray, size: int = 5,
                        sigma: float = 1.0) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU, XLA conv elsewhere. Same semantics
    as :func:`food101_sr_tpu.ops.gaussian.depthwise_blur`.

    Uses ``lax.platform_dependent`` so the branch is picked at *lowering*
    time per backend — ``jax.default_backend()`` is unreliable here (the
    remote-TPU plugin registers itself even under JAX_PLATFORMS=cpu)."""

    def _tpu(x):
        orig = x.dtype
        return blur_pallas(x.astype(jnp.float32), size, sigma).astype(orig)

    def _xla(x):
        return depthwise_blur(x, size, sigma)

    return jax.lax.platform_dependent(x, tpu=_tpu, default=_xla)

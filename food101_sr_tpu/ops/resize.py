"""Separable image resampling as weight-matrix contractions (TPU/MXU-friendly).

This is the parity-critical op of the framework: the reference degrades HR
crops to LR with torchvision's antialiased tensor bicubic
(reference src/dataset.py:36-39), upsamples inside SRCNN with
``F.interpolate(mode='bicubic', align_corners=False)`` (reference
src/models.py:98), resizes too-small PIL images bicubically (reference
src/dataset.py:30-32), and uses bilinear upsampling inside the NLPD pyramid
(reference src/loss.py:63). All of those are *separable* resamplers that
differ only in (kernel, cubic ``a`` coefficient, antialias flag).

Rather than translating gather-based CPU/GPU resize loops, we build the 1-D
resampling operator as a dense ``[out, in]`` weight matrix at trace time
(static shapes => compile-time constant) and apply it to H and W with two
tensordots. On TPU these land on the MXU as small matmuls that XLA fuses with
surrounding elementwise work — no scalar gathers, no dynamic shapes.

Kernel/weight semantics match PyTorch/PIL exactly:
  * half-pixel sampling grid: ``center = (o + 0.5) * in/out - 0.5``
  * antialias: kernel stretched by ``max(scale, 1)``
  * out-of-range taps are clamped to the edge (contributions accumulate at
    index 0 / n-1, as in PIL's and torch's implementations)
  * each row of weights is normalized to sum to 1

``a=-0.75`` reproduces torch's bicubic (tensor path), ``a=-0.5`` reproduces
PIL's BICUBIC (used by the reference on PIL images and in visualize.py).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "resample_matrix",
    "resize2d",
    "resize_bicubic_torch",
    "resize_bicubic_pil",
    "resize_bilinear_torch",
    "degrade_bicubic",
    "upsample_bicubic",
]


def _cubic_kernel(x: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic convolution kernel with free parameter ``a`` (support 2)."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    inner = (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0
    outer = a * (ax3 - 5.0 * ax2 + 8.0 * ax - 4.0)
    return np.where(ax <= 1.0, inner, np.where(ax < 2.0, outer, 0.0))


def _linear_kernel(x: np.ndarray) -> np.ndarray:
    """Triangle kernel (support 1) — bilinear."""
    ax = np.abs(x)
    return np.maximum(0.0, 1.0 - ax)


@functools.lru_cache(maxsize=256)
def resample_matrix(
    in_size: int,
    out_size: int,
    kernel: str = "cubic",
    a: float = -0.75,
    antialias: bool = True,
) -> np.ndarray:
    """Dense ``[out_size, in_size]`` float32 1-D resampling matrix.

    Built once per (shape, kernel) in float64 numpy at trace time and cached;
    under jit it becomes a compile-time constant fed to the MXU.
    """
    if kernel == "cubic":
        kfn, support = lambda t: _cubic_kernel(t, a), 2.0
    elif kernel == "linear":
        kfn, support = _linear_kernel, 1.0
    else:
        raise ValueError(f"Unknown kernel: {kernel}")

    scale = in_size / out_size
    # Antialias only matters when minifying; kernel is stretched by the scale.
    fscale = max(scale, 1.0) if antialias else 1.0
    sup = support * fscale

    out = np.arange(out_size, dtype=np.float64)
    centers = (out + 0.5) * scale - 0.5  # half-pixel / align_corners=False

    lo = np.floor(centers - sup + 1.0)  # first tap index per output
    n_taps = int(np.ceil(sup) * 2 + 1)
    taps = lo[:, None] + np.arange(n_taps)[None, :]  # [out, taps]
    weights = kfn((taps - centers[:, None]) / fscale)

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.repeat(np.arange(out_size), n_taps)
    if antialias:
        # PIL / torch-antialias edge rule: drop out-of-range taps, then
        # renormalize the surviving weights.
        valid = (taps >= 0) & (taps <= in_size - 1)
        weights = np.where(valid, weights, 0.0)
        weights /= weights.sum(axis=1, keepdims=True)
        idx = np.clip(taps, 0, in_size - 1).astype(np.int64)
        np.add.at(mat, (rows, idx.reshape(-1)), weights.reshape(-1))
    else:
        # torch non-antialiased edge rule: clamp tap indices to the edge and
        # keep the analytic weights (which sum to 1), accumulating at 0/n-1.
        idx = np.clip(taps, 0, in_size - 1).astype(np.int64)
        np.add.at(mat, (rows, idx.reshape(-1)), weights.reshape(-1))
    return mat.astype(np.float32)


def resize2d(
    x: jnp.ndarray,
    out_h: int,
    out_w: int,
    kernel: str = "cubic",
    a: float = -0.75,
    antialias: bool = True,
    precision: str = "highest",
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Resize NHWC (or HWC) images via two 1-D matmul contractions.

    By default computation runs in float32 at HIGHEST precision
    (resampling weights can be negative for cubic; bf16 accumulation would
    cost ~0.3 dB) and is cast back to the input dtype — every MEASUREMENT
    path (dataset degradation, metrics, SRCNN pre-upsample) must keep
    these defaults (CLAUDE.md numerics rules). ``precision``/
    ``compute_dtype`` exist for training-grade loss internals only, where
    the result feeds a batch-mean loss rather than a reported number
    (see losses/nlpd.py ``nlpd_loss_train``).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    orig_dtype = x.dtype
    xf = x.astype(compute_dtype)

    if h != out_h:
        mh = jnp.asarray(resample_matrix(h, out_h, kernel, a, antialias),
                         dtype=compute_dtype)
        # [N,H,W,C] x [OH,H] -> [N,OH,W,C]
        xf = jnp.einsum("nhwc,oh->nowc", xf, mh, precision=precision)
    if w != out_w:
        mw = jnp.asarray(resample_matrix(w, out_w, kernel, a, antialias),
                         dtype=compute_dtype)
        xf = jnp.einsum("nhwc,ow->nhoc", xf, mw, precision=precision)

    out = xf.astype(orig_dtype)
    return out[0] if squeeze else out


def resize_bicubic_torch(x, out_h, out_w, antialias=True):
    """torch ``F.interpolate(mode='bicubic', align_corners=False)`` semantics,
    with/without antialias. This is the degradation resize used by the
    reference's dataset (src/dataset.py:38 via torchvision tensor Resize).

    Note torch's two bicubic paths use different Keys coefficients: the
    antialiased path is PIL-compatible (a=-0.5, drop-and-renormalize edges),
    the plain path uses a=-0.75 with clamped 4-tap stencils (verified
    empirically against torch 2.13 basis responses)."""
    a = -0.5 if antialias else -0.75
    return resize2d(x, out_h, out_w, kernel="cubic", a=a, antialias=antialias)


def resize_bicubic_pil(x, out_h, out_w):
    """PIL ``Image.resize(..., BICUBIC)`` semantics (a=-0.5, always
    antialiased) — the reference's resize-if-small path (src/dataset.py:30-32)
    and visualize.py's LR generation (visualize.py:88-90)."""
    return resize2d(x, out_h, out_w, kernel="cubic", a=-0.5, antialias=True)


def resize_bilinear_torch(x, out_h, out_w, antialias=False,
                          precision="highest", compute_dtype=jnp.float32):
    """torch ``F.interpolate(mode='bilinear', align_corners=False)``; used in
    the NLPD Laplacian pyramid upsample (reference src/loss.py:63)."""
    return resize2d(x, out_h, out_w, kernel="linear", antialias=antialias,
                    precision=precision, compute_dtype=compute_dtype)


def degrade_bicubic(hr: jnp.ndarray, scale: int) -> jnp.ndarray:
    """HR -> LR bicubic degradation matching the reference dataset contract
    (reference src/dataset.py:36-39: antialiased torch bicubic on the float
    HR crop)."""
    h, w = hr.shape[-3], hr.shape[-2]
    return resize_bicubic_torch(hr, h // scale, w // scale, antialias=True)


def upsample_bicubic(lr: jnp.ndarray, scale: int) -> jnp.ndarray:
    """x`scale` bicubic upsample matching ``F.interpolate(mode='bicubic',
    align_corners=False)`` (no antialias on upsample) — SRCNN's pre-upsample
    (reference src/models.py:98), kept fully on-device (the reference
    round-trips through the CPU as an MPS workaround; pure overhead here)."""
    h, w = lr.shape[-3], lr.shape[-2]
    return resize_bicubic_torch(lr, h * scale, w * scale, antialias=False)

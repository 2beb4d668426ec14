"""Subpixel decomposition of a stride-1 SAME conv with few output channels.

The SR tails end in ``conv9x9(64 -> 3)`` at HR resolution (reference
src/models.py:124,144). On the MXU that contraction has N=3 output
channels against 128 lanes — measured 15 TF/s effective vs the chip's
~125, i.e. ~21% of the whole AttentionSR forward for 3% of its FLOPs.

This module computes the *identical* convolution in phase-decomposed form:

    out = depth_to_space( conv_{k'}( space_to_depth(x, r), K' ), r )

where the r^2 spatial phases of input/output become channels: the
contraction grows to (r^2*cin -> r^2*cout) over a small ``ceil-ish(k/r)``
stencil, filling the MXU (r=4: 1024 -> 48 channels). K' is a pure
re-indexing of the original HWIO kernel (one gather, built from static
index maps), so parameters, checkpoints, and gradients stay in the
original ``[k, k, cin, cout]`` layout.

Exactness: the mapping is an index permutation with zero fill — identical
math in fp32 (golden-tested against the direct conv); on TPU only the
usual accumulation-order float noise differs.
"""
from __future__ import annotations

import functools

import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from .pixel_shuffle import pixel_shuffle


@functools.lru_cache(maxsize=32)
def _phase_index_maps(k: int, r: int):
    """Static index/validity maps for the kernel rearrangement.

    For output phase p and tap q (in the decomposed conv) reading input
    sub-phase s: the original kernel tap is ``d = r*q + s - p + pad``;
    valid iff 0 <= d < k.
    """
    pad = (k - 1) // 2
    # tap range: q is useful iff exists (s, p) with 0 <= r*q + s - p + pad < k
    q_lo = -int(np.floor((pad + r - 1) / r))        # s = r-1, p = 0, d >= 0
    q_hi = int(np.floor((k - 1 + r - 1 - pad) / r))  # s = 0, p = r-1, d <= k-1
    qs = np.arange(q_lo, q_hi + 1)
    s = np.arange(r)
    p = np.arange(r)
    # d[qi, si, pi]
    d = qs[:, None, None] * r + s[None, :, None] - p[None, None, :] + pad
    valid = (d >= 0) & (d < k)
    return qs, np.clip(d, 0, k - 1), valid


def _phase_kernel(kernel: jnp.ndarray, r: int, ps_in: bool,
                  out_perm=None, in_map=None) -> jnp.ndarray:
    """Rearrange an HR HWIO kernel into the phase-decomposed form.

    Returns K' of shape [nq, nq, r*r*cin, r*r*cout]: input channels ordered
    (sy, sx, i) when ``ps_in`` is False (space-to-depth layout) or
    (i, sy, sx) when True (pixel-shuffle layout, channel = i*r*r + sy*r +
    sx); output channels in pixel-shuffle layout (c, py, px), optionally
    re-indexed by ``out_perm`` (``K'_new[..., j] = K'[..., out_perm[j]]``).
    ``in_map`` (ps_in only) gives, per actual input channel j, its
    canonical pixel-shuffle index — consuming a grouped producer's layout
    costs nothing at runtime.
    """
    k, _, cin, cout = kernel.shape
    qs, dmap, valid = _phase_index_maps(k, r)
    nq = len(qs)
    # K'[qy, qx, sy, sx, py, px, i, c] = kernel[d(qy,sy,py), d(qx,sx,px), i, c]
    dy = dmap[:, None, :, None, :, None]          # [qy,1,sy,1,py,1]
    dx = dmap[None, :, None, :, None, :]          # [1,qx,1,sx,1,px]
    vy = valid[:, None, :, None, :, None]
    vx = valid[None, :, None, :, None, :]
    kp = kernel[dy, dx]                           # [qy,qx,sy,sx,py,px,i,c]
    kp = jnp.where((vy & vx)[..., None, None], kp, 0.0)
    if ps_in:  # input channels (i, sy, sx)
        kp = kp.transpose(0, 1, 6, 2, 3, 7, 4, 5)  # [qy,qx,i,sy,sx,c,py,px]
    else:      # input channels (sy, sx, i)
        kp = kp.transpose(0, 1, 2, 3, 6, 7, 4, 5)  # [qy,qx,sy,sx,i,c,py,px]
    kp = kp.reshape(nq, nq, r * r * cin, cout * r * r)  # out = (c, py, px)
    if in_map is not None:
        assert ps_in
        kp = kp[:, :, np.asarray(in_map), :]
    if out_perm is not None:
        kp = kp[..., np.asarray(out_perm)]
    return kp


def _phase_conv(z: jnp.ndarray, kernel: jnp.ndarray, bias, r: int,
                ps_in: bool, out_perm=None, in_map=None) -> jnp.ndarray:
    """The decomposed conv itself, on phase-space input/output."""
    k = kernel.shape[0]
    qs, _, _ = _phase_index_maps(k, r)
    kp = _phase_kernel(kernel, r, ps_in, out_perm, in_map)
    # decomposed conv: padding must map q=0 to the current block, i.e. the
    # tap range [q_lo, q_hi] needs |q_lo| left pad and q_hi right pad.
    lo, hi = -int(qs[0]), int(qs[-1])
    y = lax.conv_general_dilated(
        z, kp.astype(z.dtype), (1, 1),
        padding=((lo, hi), (lo, hi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        b = jnp.repeat(bias, r * r)
        if out_perm is not None:
            b = b[np.asarray(out_perm)]
        y = y + b.astype(y.dtype)
    return y


def subpixel_conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias, r: int):
    """SAME stride-1 conv computed via r-phase decomposition.

    Args:
      x: [N, H, W, cin] with H % r == 0 and W % r == 0.
      kernel: [k, k, cin, cout] HWIO (odd k).
      bias: [cout] or None.
      r: phase factor (the model's upscale step is the natural choice).
    """
    n, h, w, cin = x.shape
    # space-to-depth input: z[b, Y, X, (sy, sx, i)]
    z = x.reshape(n, h // r, r, w // r, r, cin)
    z = z.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // r, w // r, r * r * cin)
    y = _phase_conv(z, kernel, bias, r, ps_in=False)
    # out channel index (c, py, px) == pixel_shuffle's (c*r + i)*r + j
    return pixel_shuffle(y, r)


def phase_conv2d(z: jnp.ndarray, kernel: jnp.ndarray, bias, r: int,
                 out_perm=None, shuffle_out: bool = False,
                 in_map=None) -> jnp.ndarray:
    """``conv_k(pixel_shuffle(z, r), kernel)`` computed WITHOUT materializing
    the shuffle — the phase-space building block of the fused SR tail.

    ``z`` is [N, H, W, r*r*cin] in pixel-shuffle channel layout
    (``i*r*r + sy*r + sx``); the result is the same conv's output at
    HR resolution, returned in pixel-shuffle layout ``[N, H, W, r*r*cout]``
    (``c*r*r + py*r + px``) — or the materialized HR image when
    ``shuffle_out`` (then it equals ``conv(pixel_shuffle(z, r))`` exactly).

    ``out_perm`` statically re-indexes the output channels (folded into the
    rearranged kernel, zero runtime cost) — used by the fused tail to keep
    its accumulated-phase channel layout canonical between x2 stages.

    Exactness: like :func:`subpixel_conv2d`, a pure re-indexing of the HWIO
    kernel with zero fill — identical math in fp32 (golden-tested); on TPU
    only accumulation-order float noise differs.
    """
    y = _phase_conv(z, kernel, bias, r, ps_in=True, out_perm=out_perm,
                    in_map=in_map)
    return pixel_shuffle(y, r) if shuffle_out else y


@functools.lru_cache(maxsize=64)
def _grouped_windows(k: int, r: int):
    """Per-output-phase minimal tap windows.

    The dense K' (``_phase_kernel``) pads every output phase to the union
    window [q_lo, q_hi] with zero taps — for the up-stage k=3 convs that
    multiplies 4x (r=2) to 16x (r=4) structural zeros on the MXU. Per
    phase p the valid taps span only ceil-ish(k/r) blocks; splitting the
    conv by output phase (classic polyphase decomposition) multiplies
    none. Returns ``wins[p] = (q_lo_p, q_hi_p)``.
    """
    pad = (k - 1) // 2
    wins = []
    for p in range(r):
        qs = [q for q in range(-k - 1, k + 2)
              if any(0 <= q * r + s - p + pad < k for s in range(r))]
        wins.append((min(qs), max(qs)))
    return pad, tuple(wins)


def _grouped_kernel(kernel: jnp.ndarray, r: int, py: int, px: int,
                    in_map=None) -> jnp.ndarray:
    """K'_p for one output phase (py, px): [nqy, nqx, r*r*cin, cout].

    Input channels ordered canonically (i, sy, sx) unless ``in_map`` gives,
    per actual input channel j, its canonical pixel-shuffle index."""
    k, _, cin, cout = kernel.shape
    pad, wins = _grouped_windows(k, r)
    (qly, qhy), (qlx, qhx) = wins[py], wins[px]
    qy = np.arange(qly, qhy + 1)
    qx = np.arange(qlx, qhx + 1)
    s = np.arange(r)
    dy = qy[:, None] * r + s[None, :] - py + pad          # [nqy, sy]
    dx = qx[:, None] * r + s[None, :] - px + pad          # [nqx, sx]
    vy, vx = (dy >= 0) & (dy < k), (dx >= 0) & (dx < k)
    kp = kernel[np.clip(dy, 0, k - 1)[:, None, :, None],
                np.clip(dx, 0, k - 1)[None, :, None, :]]  # [qy,qx,sy,sx,i,c]
    kp = jnp.where((vy[:, None, :, None] & vx[None, :, None, :])
                   [..., None, None], kp, 0.0)
    kp = kp.transpose(0, 1, 4, 2, 3, 5)                    # [qy,qx,i,sy,sx,c]
    kp = kp.reshape(len(qy), len(qx), r * r * cin, cout)
    if in_map is not None:
        kp = kp[:, :, np.asarray(in_map), :]
    return kp


def phase_conv2d_grouped(z: jnp.ndarray, kernel: jnp.ndarray, bias, r: int,
                         in_map=None) -> jnp.ndarray:
    """Polyphase-split twin of :func:`phase_conv2d`: one minimal-window
    conv per output phase, concatenated along channels in GROUPED layout
    ``(py, px, c)`` (phase-major, channel = (py*r + px)*cout + c).

    Same math as the dense form but without its structural-zero MACs —
    2.25x fewer FLOPs for the k=3 up-stage convs at r=2, 16/2.25x at r=4.
    The grouped output layout is deliberate: converting to canonical
    pixel-shuffle layout would cost a runtime transpose, so consumers fold
    the layout into their own kernel gather via ``in_map``
    (:func:`grouped_out_map`) instead — zero runtime cost.
    """
    _, wins = _grouped_windows(kernel.shape[0], r)
    outs = []
    for py in range(r):
        for px in range(r):
            kp = _grouped_kernel(kernel, r, py, px, in_map)
            (qly, qhy), (qlx, qhx) = wins[py], wins[px]
            y = lax.conv_general_dilated(
                z, kp.astype(z.dtype), (1, 1),
                padding=((-qly, qhy), (-qlx, qhx)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                y = y + bias.astype(y.dtype)
            outs.append(y)
    return jnp.concatenate(outs, axis=-1)


@functools.lru_cache(maxsize=64)
def grouped_out_map(cout_hr: int, r_in: int, s: int = 2):
    """Canonical pixel-shuffle index (at ``r_new = r_in*s``) of each channel
    a grouped x``s`` up stage emits.

    Stage output channel j factors as (py, px, c, by, bx): (py, px) the
    grouped conv's phase at r_in, (c, by, bx) the HR conv's channels read
    as the stage's own shuffle. HR position = (lr*r_in + P)*s + b, so the
    accumulated phase is ``P*s + b`` per axis. Feed the returned tuple as
    the NEXT phase conv's ``in_map``.
    """
    c = cout_hr // (s * s)
    r_new = r_in * s
    py, px, cc, by, bx = np.meshgrid(
        np.arange(r_in), np.arange(r_in), np.arange(c), np.arange(s),
        np.arange(s), indexing="ij")
    m = (cc * r_new * r_new + (py * s + by) * r_new + (px * s + bx))
    return tuple(int(v) for v in m.reshape(-1))


def phase_major_shuffle(y: jnp.ndarray, r: int) -> jnp.ndarray:
    """pixel_shuffle for GROUPED (phase-major, channel = (py*r+px)*c + cc)
    layout — materializes the final image after a grouped output conv."""
    n, h, w, rrc = y.shape
    c = rrc // (r * r)
    y = y.reshape(n, h, w, r, r, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # N, H, py, W, px, C
    return y.reshape(n, h * r, w * r, c)


@functools.lru_cache(maxsize=32)
def merge_phase_perm(cout_hr: int, r_in: int, s: int = 2):
    """Static output-channel permutation restoring the canonical
    pixel-shuffle layout after a phase-space upsample stage.

    A x``s`` upsample conv computed at ``r_in``-phase space emits channels
    (c_hr, Py, Px) where c_hr itself factors as (c, by, bx) — the stage's
    own shuffle phases (``cout_hr = c*s*s``). The stage's HR position is
    ``(lr*r_in + P)*s + b``, so the accumulated phase at ``r_new = r_in*s``
    is ``P*s + b`` per axis; canonical layout wants dims (c, Py, by, Px,
    bx). Returns ``src`` with ``new[..., j] = raw[..., src[j]]`` (a tuple,
    cacheable and safe to embed in module attrs).
    """
    c = cout_hr // (s * s)
    src = np.arange(cout_hr * r_in * r_in).reshape(c, s, s, r_in, r_in)
    src = src.transpose(0, 3, 1, 4, 2).reshape(-1)
    return tuple(int(v) for v in src)

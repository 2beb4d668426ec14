"""Shared building blocks for the SR model family (Flax / NHWC).

Re-designed TPU-first from the behavior of the reference blocks
(reference src/models.py): convs run NHWC on the MXU, PixelShuffle is a
layout-only depth-to-space, SE attention is a mean-reduce + two Dense
matmuls, and spectral norm keeps its power-iteration vectors in a mutable
``spectral`` variable collection so it stays inside jit.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.pixel_shuffle import pixel_shuffle

Dtype = Any

# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def kaiming_normal(mode: str = "fan_in") -> Callable:
    """He-normal init, gain sqrt(2) (torch ``kaiming_normal_`` semantics).

    The reference uses fan_in (default) in ResNetSR/AttentionSR
    (src/models.py:128-131,171-175) and fan_out in SRCNN (src/models.py:93-96).
    """
    return nn.initializers.variance_scaling(2.0, mode, "normal")


def icnr_kaiming_normal(scale: int) -> Callable:
    """ICNR init for a pre-PixelShuffle conv kernel (HWIO).

    Draws a kaiming-normal sub-kernel for ``out/scale^2`` filters and repeats
    each sub-filter ``scale^2`` times contiguously along the output-channel
    axis, so that depth-to-space of the conv output reproduces a
    nearest-neighbor upsample at init (checkerboard-free). The reference's
    icnr_init (src/models.py:6-23) intends the same property but tiles the
    whole block instead of repeating per-filter, which breaks the sibling
    structure; we implement the canonical form.
    """

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        r2 = scale * scale
        if cout % r2 != 0:
            return kaiming_normal("fan_in")(key, shape, dtype)
        fan_in = kh * kw * cin
        sub = jax.random.normal(key, (kh, kw, cin, cout // r2)) * np.sqrt(2.0 / fan_in)
        return jnp.repeat(sub, r2, axis=-1).astype(dtype)

    return init


def scale_stages(scale: int) -> tuple:
    """Upsample-stage factorization of ``scale``: prime factors, ascending.

    x4 -> (2, 2) — the reference's two x2 stages (src/models.py:116-123) —
    so registry checkpoints keep their exact param tree; x2 -> (2,),
    x3 -> (3,), x6 -> (2, 3), x8 -> (2, 2, 2), x9 -> (3, 3)... Any integer
    scale >= 2 works: PixelShuffle, ICNR, and the phase-space machinery
    (ops/subpixel_conv) are all generic in the stage factor (the reference
    hard-codes log2(scale) x2 stages and therefore powers of two only).
    """
    if int(scale) != scale or scale < 2:
        raise ValueError(f"scale_factor must be an integer >= 2, got {scale}")
    out, s, p = [], int(scale), 2
    while p * p <= s:
        while s % p == 0:
            out.append(p)
            s //= p
        p += 1
    if s > 1:
        out.append(s)
    return tuple(out)


# ---------------------------------------------------------------------------
# Conv with torch-style explicit padding
# ---------------------------------------------------------------------------

class _RawConv(nn.Module):
    """Owns ``kernel``/``bias`` params (same tree as ``nn.Conv``) and picks
    the compute path: direct conv, the subpixel phase decomposition for
    few-output-channel tails (``subpixel_r``) — which fills the MXU's 128
    lanes instead of wasting 125 of them on a 3-channel contraction
    (measured 2.9x on the SR tail conv9 64->3 at 200px; ops/subpixel_conv) —
    or the fused phase-space form (``phase_in``): the input already lives in
    ``phase_in``-phase pixel-shuffle channel layout at LR resolution and the
    HR conv is computed there without ever materializing the shuffle
    (ops/subpixel_conv.phase_conv2d; the param tree is the HR conv's —
    checkpoints unchanged).
    """

    features: int
    kernel_size: int
    strides: int
    use_bias: bool
    kernel_init: Callable
    dtype: Dtype
    subpixel_r: int
    quantize: str = ""
    phase_in: int = 0          # >1: input is phase space at this r
    phase_in_map: tuple | None = None  # canonical ps index per input channel

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        if self.phase_in > 1:
            cin //= self.phase_in * self.phase_in  # param shape = HR conv's
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        dtype = self.dtype or x.dtype
        xc = x.astype(dtype)
        kc = kernel.astype(dtype)
        bc = bias.astype(dtype) if bias is not None else None

        if self.phase_in > 1:
            assert self.strides == 1 and not self.quantize, \
                "phase-space convs are stride-1 full-precision tail ops"
            from ..ops.subpixel_conv import (phase_conv2d,
                                             phase_conv2d_grouped)

            # Two phase forms with opposite cost profiles (both measured,
            # v5e batch 512): the k=3 up-stage convs use the polyphase
            # SPLIT (the dense K' multiplies r^2 = 4x-16x structural zeros
            # on the MXU — 31 -> ~16 ms on up_1); the k=9 final conv uses
            # the DENSE form (inflation only (nq*r/k)^2 ~= 1.8 while the
            # split would re-read its 2.6 GB input r^2 times — measured
            # 220 ms end-to-end vs 156 dense). phase_in_map folds the
            # producer's grouped layout into either kernel's gather;
            # subpixel_r marks the tail's final conv, which materializes
            # the HR image.
            if self.subpixel_r > 1:
                return phase_conv2d(xc, kc, bc, self.phase_in,
                                    in_map=self.phase_in_map,
                                    shuffle_out=True)
            return phase_conv2d_grouped(xc, kc, bc, self.phase_in,
                                        in_map=self.phase_in_map)

        if self.quantize == "qat":  # fake-quant + STE, trainable
            from ..ops.quantize import fake_quant_conv2d

            return fake_quant_conv2d(xc, kernel, bias, strides=self.strides)
        if self.quantize:  # inference-only dynamic int8 (ops/quantize.py)
            from ..ops.quantize import int8_conv2d

            via = "dot" if self.quantize == "int8_dot" else "conv"
            return int8_conv2d(xc, kernel, bias, strides=self.strides,
                               via=via)

        r = self.subpixel_r
        h, w = x.shape[1], x.shape[2]
        if (r > 1 and self.strides == 1 and h % r == 0 and w % r == 0
                and self.features * r * r <= 256):
            from ..ops.subpixel_conv import subpixel_conv2d

            return subpixel_conv2d(xc, kc, bc, r)

        p = (k - 1) // 2
        y = jax.lax.conv_general_dilated(
            xc, kc, (self.strides, self.strides),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y if bc is None else y + bc


class Conv(nn.Module):
    """2-D conv with torch-style symmetric padding ``(k-1)//2``.

    Flax 'SAME' padding is asymmetric for even overhang (stride 2), which
    would misalign activations vs. the reference discriminator's
    ``padding=1, stride=2`` convs — so padding is always explicit here.

    ``subpixel_r > 1`` enables the exact subpixel decomposition for
    few-output-channel tails when the (static) spatial dims divide by r.
    """

    features: int
    kernel_size: int
    strides: int = 1
    use_bias: bool = True
    kernel_init: Callable = kaiming_normal("fan_in")
    dtype: Dtype = None
    subpixel_r: int = 0
    quantize: str = ""  # "" | "int8" | "int8_dot" (inference) | "qat" (training)
    phase_in: int = 0   # >1: fused phase-space tail conv (see _RawConv)
    phase_in_map: tuple | None = None

    @nn.compact
    def __call__(self, x):
        return _RawConv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            subpixel_r=self.subpixel_r,
            quantize=self.quantize,
            phase_in=self.phase_in,
            phase_in_map=self.phase_in_map,
            name="conv",
        )(x)


class PReLU(nn.Module):
    """PReLU with a single shared slope, init 0.25 (torch ``nn.PReLU()``)."""

    init_value: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda k: jnp.asarray(self.init_value, jnp.float32)
        )
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class SEBlock(nn.Module):
    """Squeeze-and-excitation channel attention, reduction 16
    (reference src/models.py:26-41): global mean over H,W -> Dense(c/r) ->
    ReLU -> Dense(c) -> sigmoid -> per-channel rescale."""

    channels: int
    reduction: int = 16
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        # plain XLA reduce, deliberately: the squeeze reads 27% of the
        # serving step (trace: 32 convert_reduce fusions), but every
        # attempt to beat it lost or tied on chip — a Pallas streaming
        # kernel 141->188 ms/step (fusion barrier + forced layout copies),
        # two-stage sum and MXU dot-with-ones both within noise of this
        # form (ops/spatial_mean.py, DESIGN.md §2)
        y = jnp.mean(x, axis=(1, 2))  # [N, C]
        y = nn.Dense(
            self.channels // self.reduction, use_bias=False, dtype=self.dtype, name="fc1"
        )(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False, dtype=self.dtype, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class TorchBatchNorm(nn.Module):
    """BatchNorm with ``torch.nn.BatchNorm2d``'s EXACT running-stat
    semantics (reference src/models.py:47-50,114 et al. all use torch BN).

    ``flax.linen.BatchNorm`` accumulates the BIASED batch variance into
    ``running_var``; torch accumulates the Bessel-corrected (unbiased)
    ``var * n/(n-1)`` (n = N*H*W) while still normalizing the current batch
    with the biased one. The ~1/n systematic offset is invisible to
    train-mode losses but shifts every EVAL-mode activation — measured 92%
    of output pixels beyond 5e-4 after 20 small-batch steps
    (tests/test_training_parity_torch.py::test_sgd_trajectory_and_eval_parity)
    — real drift against the <0.05 dB parity target. Stats are computed in
    f32 regardless of compute dtype. Param/collection layout matches
    nn.BatchNorm (params: scale/bias; batch_stats: mean/var) so existing
    checkpoints, the .pth converters, and detect_architecture are untouched.

    Under a data mesh the batch axes reduce over the GLOBAL batch inside
    jit (XLA inserts the cross-replica psum), so multi-chip training keeps
    torch single-device semantics including the global n in the Bessel
    factor.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
            if not self.is_initializing():
                n = x.size // feat
                m = jnp.float32(self.momentum)
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = (m * ra_var.value
                                + (1 - m) * var * (n / max(n - 1, 1)))
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class ResidualBlock(nn.Module):
    """conv3x3 -> BN -> PReLU -> conv3x3 -> BN (+optional SE), identity skip,
    no residual scaling (reference src/models.py:43-60)."""

    channels: int
    use_se: bool = False
    dtype: Dtype = None
    quantize: str = ""

    @nn.compact
    def __call__(self, x, train: bool = False):
        r = Conv(self.channels, 3, dtype=self.dtype, quantize=self.quantize,
                 name="conv1")(x)
        r = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(r)
        r = PReLU(name="prelu")(r)
        r = Conv(self.channels, 3, dtype=self.dtype, quantize=self.quantize,
                 name="conv2")(r)
        r = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn2",
        )(r)
        if self.use_se:
            r = SEBlock(self.channels, dtype=self.dtype, name="se")(r)
        return x + r


class AttentionResidualBlock(nn.Module):
    """conv3x3 -> PReLU -> conv3x3 -> SE, no BN, residual scaled by 0.1
    (EDSR-style stabilizer; reference src/models.py:62-78)."""

    channels: int
    res_scale: float = 0.1
    dtype: Dtype = None
    quantize: str = ""

    @nn.compact
    def __call__(self, x):
        r = Conv(self.channels, 3, dtype=self.dtype, quantize=self.quantize,
                 name="conv1")(x)
        r = PReLU(name="prelu")(r)
        r = Conv(self.channels, 3, dtype=self.dtype, quantize=self.quantize,
                 name="conv2")(r)
        r = SEBlock(self.channels, dtype=self.dtype, name="se")(r)
        return x + r * jnp.asarray(self.res_scale, r.dtype)


class UpsampleBlock(nn.Module):
    """conv3x3 (ICNR init) -> PixelShuffle(r) -> PReLU — one x``scale``
    stage of the post-upsampling tail shared by ResNetSR/AttentionSR
    (reference src/models.py:116-123,160-167 — there always x2; any integer
    stage factor works here, see ``scale_stages``).

    ``phase_in`` runs the stage entirely in phase space: the input is
    ``phase_in``-phase channel layout at LR resolution (``phase_in_map``
    gives each input channel's canonical pixel-shuffle index — the
    producer's grouped layout folds into this stage's kernel gather) and
    the output is ``phase_in*scale``-phase GROUPED layout
    (ops/subpixel_conv.grouped_out_map), with NO shuffle materialized.
    PReLU's scalar slope commutes with any channel layout. Same params
    either way.
    """

    out_channels: int = 64
    scale: int = 2
    dtype: Dtype = None
    phase_in: int = 0  # 0/1 = materialized stage; >=1 with phase output
    phase_in_map: tuple | None = None

    @nn.compact
    def __call__(self, x):
        r2 = self.scale * self.scale
        if self.phase_in >= 1:
            # phase_in == 1: an ordinary conv whose raw output channels ARE
            # the scale-phase pixel-shuffle layout already
            x = Conv(
                self.out_channels * r2, 3,
                kernel_init=icnr_kaiming_normal(self.scale),
                dtype=self.dtype, phase_in=self.phase_in,
                phase_in_map=self.phase_in_map, name="conv",
            )(x)
            return PReLU(name="prelu")(x)
        x = Conv(
            self.out_channels * r2, 3,
            kernel_init=icnr_kaiming_normal(self.scale),
            dtype=self.dtype, name="conv",
        )(x)
        x = pixel_shuffle(x, self.scale)
        return PReLU(name="prelu")(x)


# ---------------------------------------------------------------------------
# Spectral normalization (power iteration as mutable state)
# ---------------------------------------------------------------------------

class _SpectralKernel(nn.Module):
    """Owns a kernel param plus power-iteration vectors ``u``/``v`` in the
    ``spectral`` collection; returns the spectrally-normalized kernel.

    Matches torch ``nn.utils.spectral_norm``: one power iteration per
    training step on the (out, -1) matricization, sigma = u^T W v; eval uses
    the stored vectors without updating (reference wraps every D conv/linear,
    src/models.py:195-213).
    """

    shape: Sequence[int]
    kernel_init: Callable = kaiming_normal("fan_in")
    eps: float = 1e-12

    @nn.compact
    def __call__(self, update_stats: bool):
        kernel = self.param("kernel", self.kernel_init, self.shape)
        cout = self.shape[-1]
        n = int(np.prod(self.shape[:-1]))
        w = kernel.reshape(n, cout).astype(jnp.float32)  # columns = out filters

        u = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(self.make_rng("params"), (cout,))
            / np.sqrt(cout),
        )
        v = self.variable(
            "spectral", "v",
            lambda: jax.random.normal(self.make_rng("params"), (n,)) / np.sqrt(n),
        )

        def _normalize(x):
            return x / (jnp.linalg.norm(x) + self.eps)

        if update_stats:
            v_new = _normalize(w @ u.value)
            u_new = _normalize(w.T @ v_new)
            u.value, v.value = u_new, v_new
        sigma = jnp.dot(v.value, w @ u.value)
        return (kernel / sigma).astype(kernel.dtype)


class SNConv(nn.Module):
    """Spectral-norm conv with torch-style padding."""

    features: int
    kernel_size: int
    strides: int = 1
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = _SpectralKernel(
            (k, k, cin, self.features), name="sn"
        )(update_stats)
        p = (k - 1) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype),
            kernel.astype(self.dtype or kernel.dtype),
            window_strides=(self.strides, self.strides),
            padding=[(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class SNDense(nn.Module):
    """Spectral-norm dense layer."""

    features: int
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        cin = x.shape[-1]
        kernel = _SpectralKernel((cin, self.features), name="sn")(update_stats)
        y = x.astype(self.dtype or x.dtype) @ kernel.astype(self.dtype or kernel.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y

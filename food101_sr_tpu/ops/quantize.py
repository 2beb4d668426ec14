"""Dynamic int8 quantized convolution for inference.

The v5e MXU runs int8 at 2x the bf16 peak (394 TOPS vs 197 TFLOP/s), and
the AttentionSR body conv3x3 96->96 is the op that bounds both train and
inference MFU (DESIGN.md "MFU attribution"). This module provides the
numerics for an inference-only quantized body:

- weights: symmetric per-output-channel int8 (each output channel of an
  HWIO kernel contracts over H,W,I only, so a per-O scale factors out of
  the convolution exactly);
- activations: symmetric per-SAMPLE int8 with runtime (dynamic) scales —
  one absmax reduce per conv, no calibration pass, and co-batched serving
  requests never affect each other's quantization grid;
- accumulation in int32 (exact: |sum| <= 127*127*k*k*cin < 2^31 for every
  shape in this framework), dequantized as ``y_int32 * (s_x * s_w[o])``.

Two lowerings of the same int8 GEMM are provided because XLA's support for
int8 *convolutions* differs from int8 *matmuls* across backends/compiler
versions (tools/int8_probe.py measures which one the current chip actually
runs fast):

- ``via="conv"``  : lax.conv_general_dilated(preferred_element_type=int32)
- ``via="dot"``   : im2col (lax.conv_general_dilated_patches) + dot_general

Both produce bit-identical int32 accumulators (tests pin this), so the
choice is purely a performance dispatch.

Quantization is applied at inference time from the regular float params —
checkpoints stay float, nothing about training changes for the plain
``int8``/``int8_dot`` modes. For x4 SR the measured quality cost of a
post-training quantized body is fractions of a dB (tests/test_quantize.py
pins the error envelope; serving reports the exact delta per checkpoint
via predict/visualize's --quantize flag).

``quantize="qat"`` closes that remaining gap: the body convs run in float
on *fake-quantized* weights and activations (the exact int8 grids above,
applied as quantize->dequantize with a straight-through estimator), so a
short fine-tune teaches the float params to sit on the int8 grid. The
checkpoint stays float and loads into the ``int8`` serving path unchanged
— QAT changes what the params converge to, not their format.

The reference (torch) has no quantized path; this is a beyond-parity,
TPU-first serving feature.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-12


def quantize_per_tensor(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-tensor int8: returns (q, scale) with q*scale ~= x.

    The scale is computed from the runtime absmax in f32 (bf16 inputs are
    upcast first: a bf16 absmax only carries 8 mantissa bits, which would
    add scale noise on top of the 7-bit quantization grid).
    """
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf)), _EPS) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def quantize_per_sample(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-SAMPLE int8 for NHWC activations: scale [B,1,1,1].

    The serving micro-batcher stacks tiles from different concurrent
    requests into one device batch; a whole-batch scale would make a
    request's output depend on what it was co-batched with (a high-range
    neighbor coarsens everyone's grid). Per-sample scales keep quantized
    serving deterministic per input at identical cost.
    """
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True),
                        _EPS) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def quantize_kernel_per_cout(kernel: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 for an HWIO conv kernel.

    Returns (q_kernel int8 HWIO, scales f32 [O]). Per-O scales are exact
    under convolution: output channel o only ever multiplies kernel[..., o].
    """
    kf = kernel.astype(jnp.float32)
    scales = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), _EPS) / 127.0
    q = jnp.clip(jnp.round(kf / scales), -127.0, 127.0).astype(jnp.int8)
    return q, scales


def _int8_conv_direct(xq, wq, strides, pad):
    return lax.conv_general_dilated(
        xq, wq, strides, pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _int8_conv_im2col(xq, wq, strides, pad):
    """Same GEMM as the direct conv, via explicit patches + dot_general.

    conv_general_dilated_patches flattens the feature dim input-channel
    MAJOR (index = c*K*K + kh*K + kw), so the weight matrix transposes
    HWIO -> IHWO before the (C*K*K, O) reshape.
    """
    kh, kw, cin, cout = wq.shape
    p = lax.conv_general_dilated_patches(
        xq, (kh, kw), strides, pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    wm = jnp.transpose(wq, (2, 0, 1, 3)).reshape(cin * kh * kw, cout)
    return lax.dot_general(p, wm, (((3,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)


def int8_conv2d(x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None,
                *, strides: int = 1, via: str = "conv") -> jax.Array:
    """Dynamic-int8 conv2d with torch-style symmetric (k-1)//2 padding.

    Drop-in for the float path in models/layers.py::_RawConv: same kernel
    layout (HWIO), same padding, bias added in float after dequantization.
    Output dtype matches the input's.
    """
    k = kernel.shape[0]
    p = (k - 1) // 2
    pad = ((p, p), (p, p))
    s = (strides, strides)

    xq, sx = quantize_per_sample(x)
    wq, sw = quantize_kernel_per_cout(kernel)
    run = _int8_conv_direct if via == "conv" else _int8_conv_im2col
    y = run(xq, wq, s, pad).astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Quantization-aware training (fake-quant with straight-through estimator)
# ---------------------------------------------------------------------------

def _ste(x_f32: jax.Array, dequantized: jax.Array) -> jax.Array:
    """Straight-through estimator: forward = dequantized, grad = identity.

    The round/clip in the quantizers has zero gradient almost everywhere;
    treating the whole quantize->dequantize as identity for the backward
    pass (the standard STE) lets SGD move params *through* grid steps.
    The dynamic absmax scale is data-dependent; its gradient contribution
    is dropped with the same stop_gradient (scale-gradient variants like
    LSQ need learned-scale params, which would change the checkpoint tree).
    """
    return x_f32 + lax.stop_gradient(dequantized - x_f32)


def fake_quant_act(x: jax.Array) -> jax.Array:
    """Per-sample symmetric int8 fake-quant for NHWC activations (STE)."""
    xf = x.astype(jnp.float32)
    q, scale = quantize_per_sample(xf)
    return _ste(xf, q.astype(jnp.float32) * scale).astype(x.dtype)


def fake_quant_kernel(kernel: jax.Array) -> jax.Array:
    """Per-output-channel symmetric int8 fake-quant for HWIO kernels (STE)."""
    kf = kernel.astype(jnp.float32)
    q, scales = quantize_kernel_per_cout(kf)
    return _ste(kf, q.astype(jnp.float32) * scales).astype(kernel.dtype)


def fake_quant_conv2d(x: jax.Array, kernel: jax.Array,
                      bias: jax.Array | None = None, *,
                      strides: int = 1) -> jax.Array:
    """QAT twin of :func:`int8_conv2d`: float conv on fake-quantized tensors.

    Forward numerics match int8_conv2d up to accumulation order (int32 is
    exact; f32 conv of the identical dequantized values rounds per-MAC —
    tests pin the envelope). Backward is the STE: gradients flow to the
    float ``kernel``/``x`` as if the quantizers were identity, which is
    what lets a fine-tune pull params onto the int8 grid. Same torch-style
    (k-1)//2 padding and dtype contract as the float/int8 paths. The conv
    runs at highest precision: fake-quantized values carry ~15 significant
    bits (7-bit mantissa * shared scale), which a bf16 MXU pass would
    re-round, defeating the point of matching the int8 grid.
    """
    k = kernel.shape[0]
    p = (k - 1) // 2
    xq = fake_quant_act(x).astype(jnp.float32)
    wq = fake_quant_kernel(kernel).astype(jnp.float32)
    y = lax.conv_general_dilated(
        xq, wq, (strides, strides), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)

"""Pallas TPU kernel: global spatial mean (the SE-block "squeeze").

**Measured and REJECTED for the SE path — kept as the negative result.**

Every SE attention block (reference src/models.py:26-41) opens with
``x.mean(dim=(2, 3))`` over its conv output. The round-3 serving trace
attributes 37.8 ms of the 141 ms AttentionSR batch-512 step (27%) to
XLA's 32 ``convert_reduce`` fusions for these means — seemingly ~4x the
HBM-bandwidth floor for the bytes they must read. Three attempts to
reclaim that time, all measured end-to-end on v5e (DESIGN.md §2):

* THIS kernel (single streaming pass, f32 VPU accumulate, VMEM-budgeted
  row-chunked blocks): 141.3 -> 188.1 ms/step. The custom call is a
  fusion barrier with a pinned operand layout — XLA inserts a full copy
  of every SE input and loses the surrounding-op overlap it had.
* Two-stage explicit sum (f32 over W, then H): 141.3 ms — identical.
* MXU dot-with-ones (``dot_general`` against a 1/(H*W) vector): 143.2 ms.

Conclusion: the convert_reduce fusions already hide the squeeze behind
work XLA co-schedules; the trace's per-fusion attribution is not
separable time. SEBlock therefore keeps the plain ``jnp.mean``. The
kernel stays (a) as the documented experiment, (b) as a usable
standalone streaming reduce for contexts without XLA's fusion freedom.

The op is linear; its VJP is a broadcast of the cotangent scaled by
1/(H*W), left to XLA where it fuses into surrounding elementwise work.

Falls back to ``jnp.mean`` off-TPU (CPU tests run the kernel in
interpreter mode for parity; production CPU paths use XLA).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# input-block byte budget: with double-buffered DMA (2x) plus the f32
# upcast (2x for bf16) a 2 MB block peaks ~8 MB of the 16 MB scoped VMEM
_BLOCK_BUDGET_BYTES = 2 * 1024 * 1024


def _mean_kernel(inv_hw: float, x_ref, o_ref):
    # x_ref: (bn, bh, W, C) row-chunk; accumulate in f32 regardless of
    # input dtype (bf16 inputs would otherwise lose ~8 bits over 2500
    # terms). The inner grid dim revisits o_ref: init on the first chunk.
    part = jnp.sum(x_ref[...].astype(jnp.float32), axis=(1, 2)) * inv_hw

    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[...] = part

    @pl.when(pl.program_id(1) > 0)
    def _acc():
        o_ref[...] += part


def _largest_divisor(n: int, cap: int) -> int:
    for d in range(max(1, min(n, cap)), 1, -1):
        if n % d == 0:
            return d
    return 1


def _block_shape(n: int, h: int, w: int, c: int, itemsize: int):
    """(bn, bh) batch group and row chunk, or None when unsupported.

    Pallas TPU requires the OUTPUT block's sublane dim (bn) be a multiple
    of 8 or the full batch; the row chunk bh then absorbs the VMEM byte
    budget. Batches that are neither small nor 8-divisible only fit if a
    full-batch row chunk stays within ~3x the budget — otherwise the
    caller falls back to the XLA reduce (production batches are pow2).
    """
    row_bytes = w * c * itemsize
    bn = 8 if n % 8 == 0 else n
    bh = _largest_divisor(h, max(1, _BLOCK_BUDGET_BYTES // (bn * row_bytes)))
    if bn * bh * row_bytes > 3 * _BLOCK_BUDGET_BYTES:
        return None
    return bn, bh


def _xla_mean(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)


def _spatial_mean_raw(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    n, h, w, c = x.shape
    blocks = _block_shape(n, h, w, c, x.dtype.itemsize)
    if blocks is None:  # awkward batch x huge image: let XLA handle it
        return _xla_mean(x)
    bn, bh = blocks
    out = pl.pallas_call(
        functools.partial(_mean_kernel, 1.0 / (h * w)),
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.float32),
        grid=(n // bn, h // bh),
        in_specs=[pl.BlockSpec((bn, bh, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bn, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def spatial_mean_pallas(x: jnp.ndarray, interpret: bool = False):
    """``jnp.mean(x, axis=(1, 2))`` as a single-pass Pallas TPU kernel."""
    return _spatial_mean_raw(x, interpret)


def _mean_fwd(x, interpret):
    # residual: the spatial extent only (ints are valid residual leaves;
    # dtypes are not) — the output dtype equals the input dtype
    return _spatial_mean_raw(x, interpret), (x.shape[1], x.shape[2])


def _mean_bwd(interpret, res, g):
    h, w = res
    gx = (g.astype(jnp.float32) * (1.0 / (h * w))).astype(g.dtype)
    n, c = g.shape
    return (jnp.broadcast_to(gx[:, None, None, :], (n, h, w, c)),)


spatial_mean_pallas.defvjp(_mean_fwd, _mean_bwd)


def spatial_mean(x: jnp.ndarray) -> jnp.ndarray:
    """Global mean over H, W: Pallas kernel on TPU, XLA reduce elsewhere.

    Same semantics as ``jnp.mean(x, axis=(1, 2))`` with f32 accumulation;
    returns ``x.dtype``. Branch picked at lowering time per backend, like
    :func:`food101_sr_tpu.ops.pallas_blur.depthwise_blur_fast`.
    """

    def _tpu(x):
        return spatial_mean_pallas(x)

    return jax.lax.platform_dependent(x, tpu=_tpu, default=_xla_mean)

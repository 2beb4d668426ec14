"""NLPD (normalized-Laplacian-pyramid-flavored) loss
(reference src/loss.py:31-79).

4-level Laplacian pyramid: depthwise 5x5 Gaussian blur (sigma 1, zero
padding), stride-2 subsample, bilinear upsample back (align_corners=False),
difference. Loss = alpha * MAE + (1-alpha) * sum_i mean|dL_i|, alpha=0.7.

Everything is static-shaped and jit/vmap-friendly: the pyramid is a Python
loop over a fixed level count, so XLA sees a flat graph of convs+matmul
resizes it can fuse.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.pallas_blur import depthwise_blur_fast
from ..ops.resize import resize_bilinear_torch


def laplacian_pyramid(img: jnp.ndarray, n_levels: int = 4,
                      precision: str = "highest"):
    """List of per-level difference images (NHWC)."""
    pyramid = []
    current = img
    for _ in range(n_levels):
        # Pallas VPU kernel on TPU (2.5x the XLA depthwise conv at 200x200),
        # XLA conv elsewhere — numerics identical to ~3e-7.
        blurred = depthwise_blur_fast(current, size=5, sigma=1.0)
        down = blurred[:, ::2, ::2, :]
        up = resize_bilinear_torch(down, current.shape[1], current.shape[2],
                                   precision=precision,
                                   compute_dtype=(jnp.float32
                                                  if precision == "highest"
                                                  else current.dtype))
        pyramid.append(current - up)
        current = down
    return pyramid


def nlpd_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    n_levels: int = 4,
    alpha: float = 0.7,
) -> jnp.ndarray:
    loss_mae = jnp.mean(jnp.abs(pred - target))
    pyr_p = laplacian_pyramid(pred, n_levels)
    pyr_t = laplacian_pyramid(target, n_levels)
    loss_nlpd = sum(jnp.mean(jnp.abs(p - t)) for p, t in zip(pyr_p, pyr_t))
    return alpha * loss_mae + (1.0 - alpha) * loss_nlpd


def nlpd_loss_train(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    n_levels: int = 4,
    alpha: float = 0.7,
) -> jnp.ndarray:
    """Training-grade NLPD: the same pyramid with bf16 operands and
    single-pass (default-precision) bilinear-upsample contractions.

    The metric-grade path above pins HIGHEST precision because NLPD is a
    *reported number* (CLAUDE.md: any measurement op pins highest — the
    SSIM>1 class of bug). Inside the train step the loss only needs a
    faithful gradient direction: the HIGHEST einsum costs 6 f32 passes
    per pyramid upsample, per level, per image (pred AND target), forward
    and backward — pure non-MXU tail (DESIGN.md §2 attribution). This is
    the same precision split that bought the GAN path +24% (bf16 feature
    nets for the loss, f32 for the LPIPS metric). Gradient parity vs the
    metric-grade loss is pinned in tests/test_losses_metrics.py; MAE term
    stays in input dtype (f32): it dominates the loss (alpha=0.7) and
    costs one subtract.

    A/B VERDICT (v5e, AttentionSR batch 128, runs/nlpd_ab.json,
    2026-08-20): 103.15 vs 103.86 ms/step — +0.7%, inside run-to-run
    noise. REJECTED as the production training loss: XLA already hides
    the pyramid's cost inside the step (the non-MXU tail is latency-bound
    on the 32-block chain, not on pyramid FLOPs), so the precision split
    buys nothing here — unlike the GAN path, where the bf16 feature-net
    split measured +24%. Kept, tested, and documented as the measured
    negative result (house style: every lever measured, kept-or-rejected
    — see DESIGN.md §2).
    """
    loss_mae = jnp.mean(jnp.abs(pred - target))
    p16 = pred.astype(jnp.bfloat16)
    t16 = target.astype(jnp.bfloat16)
    pyr_p = laplacian_pyramid(p16, n_levels, precision="default")
    pyr_t = laplacian_pyramid(t16, n_levels, precision="default")
    # accumulate the level means in f32 (means of bf16 tensors)
    loss_nlpd = sum(jnp.mean(jnp.abs(p - t).astype(jnp.float32))
                    for p, t in zip(pyr_p, pyr_t))
    return alpha * loss_mae + (1.0 - alpha) * loss_nlpd

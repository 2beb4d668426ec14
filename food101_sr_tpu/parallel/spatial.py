"""Spatial tiling for whole-image SR inference — the TPU analogue of
sequence parallelism for this workload (SURVEY §2.2: the reference has no
parallelism at all; its comparison tool runs one full image at a time,
reference visualize.py:47-58).

Large images don't fit a single chip's VMEM-friendly shapes, and a batch of
one wastes the mesh. Instead of halo *exchange* (ppermute'd edge strips
inside shard_map — that design lives in `spatial_mesh.py` for the
one-giant-image-across-the-mesh case), we express the halo as *overlap*:
the image is cut into
windows of ``tile + 2*halo`` whose starts clamp at the borders, the windows
become a plain batch sharded over the ``data`` mesh axis, and each window's
owned interior is cropped from the model output and stitched back. With
``halo`` >= the model's receptive-field radius this is exact:

* interior windows: every owned output pixel sees only real pixels that are
  present in the window;
* border windows: clamping puts the window edge exactly at the image
  border, so the model's own zero padding applies at the same place it
  would in a full-image forward.

This turns spatial parallelism into data parallelism — XLA handles the
sharding, no collectives are hand-written, and the same jitted forward
serves both batched-small-image and tiled-large-image inference.

Exactness caveat on TPU: "exact" is algorithm-level (verified bit-tight in
fp32 on CPU, and seam-free on TPU — mid-tile and boundary diffs are the
same magnitude). TPU conv passes are shape-dependent, so the tiled and
full-image programs accumulate float noise differently: measured rel
~7e-4 through AttentionSR's 70 conv layers, i.e. at most +-1 uint8 step
in the final image.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .mesh import data_sharding

# Conservative receptive-field radii at LR resolution, derived from the
# architecture definitions (reference src/models.py): head conv9 (4) +
# 2 conv3 per residual block + mid conv3 + upsample/tail convs mapped back
# to LR pixels, rounded up with margin for the SRCNN-style pre-upsample
# bicubic support.
RECEPTIVE_RADIUS = {
    "SRCNN": 8,          # bicubic support + conv9/conv1/conv5 at HR -> <=8 LR px
    "RESNET": 48,        # 4 + 16*2 + 1 + tail (~3) = 40, margin to 48
    "AttentionSR": 80,   # 4 + 32*2 + 1 + tail (~3) = 72, margin to 80
    "RRDB": 40,          # EFFECTIVE radius — see receptive_radius docstring
}

# RRDBNet's effective halo (LR px). Its THEORETICAL radius is 15 px per
# RRDB (3 dense blocks x 5 conv3) -> ~365 for the 23-block registry net,
# which would inflate tiled compute ~44x at tile 128. But both residual
# ladders scale by 0.2, so far-field contributions decay super-
# geometrically. Measured on a v5e chip (tools/rrdb_erf.py, HIGHEST-
# precision convs, 256px field, runs/rrdb_erf.json): the half-uint8
# (1/510) crossing of a MAXIMAL center-pixel perturbation's response is
# r=14 at random init (3 seeds), r=7 for the trained supervised winner,
# and r=7 for the GAN winner too (round 5 — measured, not assumed: GAN
# fine-tuning trains high-frequency hallucination and could have
# lengthened the effective kernels; it didn't — exact zeros beyond r=48,
# and the serving-geometry tiled-vs-full check passes at 0.0x uint8
# steps, runs/rrdb_erf.json tiled_check_gan_winner).
#
# The bound is EMPIRICAL, not architectural: it holds for every measured
# checkpoint with >=2.5x margin, but a future checkpoint trained
# differently (no residual-scale discipline, much higher LR) could decay
# more slowly. Before serving a NEW deep-RRDB checkpoint through this
# halo, re-run `tools/rrdb_erf.py --checkpoint <ckpt>` (ring profile) or
# `--tiled_check` (end-to-end serving-geometry assertion); tests pin the
# committed profiles' crossings at <= RADIUS/2.5.
RRDB_EFFECTIVE_RADIUS = 40


def receptive_radius(arch: str, model=None) -> int:
    """Receptive-field radius (LR pixels) the halo must cover for exact
    tiling. Depth-aware when ``model`` exposes ``num_residuals``: head
    conv9 (4) + two conv3 per residual block (2*n) + mid conv3 + tail convs
    at LR scale + margin -> ``2*n + 16``, which reproduces the table for
    registry depths (16 -> 48, 32 -> 80) and stays exact for deeper
    non-registry checkpoints (e.g. ``--architecture auto``), where the
    fixed table would silently under-halo and produce seam artifacts.

    RRDBNet (``model.growth`` present) returns ``min(15*num_blocks + 20,
    RRDB_EFFECTIVE_RADIUS)``: exact for shallow nets, and the MEASURED
    effective radius for deep ones — the 0.2 residual scaling attenuates
    far-field terms below half a uint8 step long before the theoretical
    radius (see RRDB_EFFECTIVE_RADIUS above; tests/test_spatial.py pins
    the decay). RRDB tiling is therefore exact-to-output-quantization
    rather than exact-to-float, which is the guarantee serving needs."""
    n_res = getattr(model, "num_residuals", None) if model is not None else None
    if n_res is not None:
        return 2 * int(n_res) + 16
    if model is not None and getattr(model, "growth", None) is not None:
        return min(15 * int(model.num_blocks) + 20, RRDB_EFFECTIVE_RADIUS)
    return RECEPTIVE_RADIUS.get(arch, 80)


def window_starts(size: int, tile: int, halo: int):
    """Clamped start offsets of ``tile + 2*halo`` windows covering ``size``."""
    n = math.ceil(size / tile)
    win = tile + 2 * halo
    return [min(max(i * tile - halo, 0), size - win) for i in range(n)], n, win


def plan_windows(h: int, w: int, tile: int, halo: int):
    """Window geometry shared by every tiled path (tiled_apply here, the
    serving tiler in serve.py): clamp the halo to what the image allows,
    then compute clamped per-axis window starts.

    Returns (starts_h, starts_w, win_h, win_w). The owned interior of tile
    (i, j) begins at ``(i*tile - starts_h[i], j*tile - starts_w[j])`` inside
    its window (0 at clamped borders).
    """
    win_h = min(tile + 2 * halo, h)
    win_w = min(tile + 2 * halo, w)
    halo_h = (win_h - tile) // 2
    halo_w = (win_w - tile) // 2
    starts_h, _, win_h = window_starts(h, tile, halo_h)
    starts_w, _, win_w = window_starts(w, tile, halo_w)
    return starts_h, starts_w, win_h, win_w


def tiled_apply(
    forward: Callable[[jnp.ndarray], jnp.ndarray],
    images: jnp.ndarray,
    scale: int,
    tile: int,
    halo: int,
    mesh=None,
    max_windows: Optional[int] = 8,
) -> jnp.ndarray:
    """Run ``forward`` (an LR->HR model forward, NHWC) over spatial tiles.

    Args:
      forward: jitted/jittable fn mapping (N, h, w, C) -> (N, h*scale, w*scale, C).
      images: (B, H, W, C) LR batch; H and W must be multiples of ``tile``.
      scale: SR upscale factor.
      tile: owned tile size in LR pixels (window is tile + 2*halo).
      halo: overlap in LR pixels; must cover the receptive-field radius
        (see RECEPTIVE_RADIUS) for exact parity with a full-image forward.
      mesh: optional 1-D mesh; the window batch is sharded over its first
        axis so tiles fan out across chips.
      max_windows: cap on windows per forward call (padded to the cap so a
        big image compiles ONE program). The upsample tail's activations
        are O(windows * (window*scale)^2 * 4*64ch); unbounded window
        batches OOM HBM on large images (measured: 16 x 288px windows of
        AttentionSR = 15.8G in fp32). None = single call (small images /
        multi-chip meshes where the batch is sharded anyway).

    Returns:
      (B, H*scale, W*scale, C) SR batch.
    """
    b, h, w, c = images.shape
    if h % tile or w % tile:
        raise ValueError(f"H={h}, W={w} must be multiples of tile={tile}")
    starts_h, starts_w, win_h, win_w = plan_windows(h, w, tile, halo)
    nh, nw = len(starts_h), len(starts_w)

    # Gather overlapping windows: (B, nh, nw, win_h, win_w, C) -> flat batch.
    rows = jnp.stack([images[:, s : s + win_h] for s in starts_h], axis=1)
    wins = jnp.stack([rows[:, :, :, s : s + win_w] for s in starts_w], axis=2)
    flat = wins.reshape(b * nh * nw, win_h, win_w, c)
    if mesh is not None:
        flat = jax.device_put(flat, data_sharding(mesh))

    n_win = flat.shape[0]
    if max_windows is None or n_win <= max_windows or mesh is not None:
        out = forward(flat)  # (b*nh*nw, win_h*scale, win_w*scale, c)
    else:
        # fixed-size chunks (last one padded) -> one compiled program,
        # bounded activation memory
        chunks = []
        for s in range(0, n_win, max_windows):
            part = flat[s : s + max_windows]
            valid = part.shape[0]
            if valid < max_windows:
                part = jnp.concatenate(
                    [part, jnp.zeros((max_windows - valid,) + part.shape[1:],
                                     part.dtype)])
            chunks.append(forward(part)[:valid])
        out = jnp.concatenate(chunks, axis=0)
    out = out.reshape(b, nh, nw, win_h * scale, win_w * scale, c)

    # Crop each window's owned interior. The owned region of tile (i, j)
    # starts at (i*tile - start_i) inside its window (0 at clamped borders).
    tiles_out = []
    for i, sh in enumerate(starts_h):
        row = []
        off_h = (i * tile - sh) * scale
        for j, sw in enumerate(starts_w):
            off_w = (j * tile - sw) * scale
            row.append(out[:, i, j,
                           off_h : off_h + tile * scale,
                           off_w : off_w + tile * scale])
        tiles_out.append(jnp.concatenate(row, axis=2))
    return jnp.concatenate(tiles_out, axis=1)


def tiled_forward_for(
    model,
    variables,
    arch: str,
    scale: int,
    tile: int = 128,
    halo: Optional[int] = None,
    mesh=None,
):
    """Convenience wrapper: jitted full-image SR via tiling for a registry
    model. Returns a fn (B, H, W, C) -> (B, H*s, W*s, C)."""
    halo = receptive_radius(arch, model) if halo is None else halo
    fwd = jax.jit(lambda x: model.apply(variables, x, train=False))

    def run(images):
        return tiled_apply(fwd, images, scale, tile, halo, mesh=mesh)

    return run

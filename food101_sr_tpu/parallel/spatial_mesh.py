"""Halo-exchange spatially-sharded inference — one giant image split in
rows across the mesh, edge strips exchanged over ICI with ``ppermute``.

The overlap-tiling path (`parallel/spatial.py`) turns spatial parallelism
into data parallelism: cut the image into ``tile + 2*halo`` windows and
shard the *window batch*. That is the right tool for many medium images,
but for ONE image much larger than a chip's working set it recomputes the
halo around every 128-px tile — at AttentionSR's halo of 80 LR px the
window area is (128+160)²/128² = 5.1x the owned area, i.e. 80% of the
mesh's FLOPs are redundant.

This module is the ICI-native alternative (the true sequence-parallel
analogue, SURVEY §2.2): shard the image's row axis over the mesh so each
device owns a slab of H/D rows, exchange ONLY the receptive-field halo
with the two neighbors via ``jax.lax.ppermute`` inside ``shard_map``, run
the full conv stack on slab+halo, and keep the owned interior. Compute
inflation drops to (H/D + 2*halo)/(H/D) — for an 8-way 2048-row image
with halo 80, 1.16x instead of 5.1x — and the only communication is two
fixed-size edge strips, riding ICI (the reference has no parallelism at
all; its tool upscales one image at a time, reference visualize.py:47-58).

Exactness argument (same as overlap tiling, `spatial.py`): each device's
window is exactly the rows ``clamp(i*S - halo, 0, H - S - 2*halo)`` —
an interior window's owned rows see only real pixels, and a border
window's edge coincides with the true image border, where the model's own
SAME zero-padding applies at the same place it would in a full-image
forward. Clamping keeps every window the same shape (SPMD needs static
shapes); the per-device offset differences are two ``dynamic_slice`` calls
on ``axis_index``.

The exchange ships each neighbor's adjacent ``2*halo`` rows (not ``halo``)
because clamped border windows reach up to ``2*halo`` rows into their one
neighbor; devices missing a neighbor receive ``ppermute`` zeros, which the
window slice then provably excludes.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from .spatial import receptive_radius


def row_sharding(mesh) -> NamedSharding:
    """Sharding that splits NHWC images over H across the mesh axis."""
    return NamedSharding(mesh, P(None, mesh.axis_names[0]))


def halo_sharded_apply(
    forward: Callable,
    images: jnp.ndarray,
    scale: int,
    halo: int,
    mesh,
    variables=None,
) -> jnp.ndarray:
    """Spatially-sharded SR forward with ppermute halo exchange.

    Args:
      forward: LR->HR model forward, shape-polymorphic in h (it is called
        on slab+2*halo rows). Called as ``forward(window)``, or as
        ``forward(variables, window)`` when ``variables`` is given — pass
        params this way instead of closing over them so the pytree flows
        through ``shard_map``'s in_specs (replicated) rather than being
        captured (closure over jit tracers is not supported there).
      images: (B, H, W, C) LR image(s); H must divide evenly by the mesh
        size D, with H/D >= 2*halo so one neighbor's slab covers the halo.
      scale: SR upscale factor.
      halo: receptive-field radius in LR rows (see `receptive_radius`).
      mesh: 1-D mesh; the row axis is sharded over its first axis.
      variables: optional param pytree, replicated onto every device.

    Returns:
      (B, H*scale, W*scale, C) SR batch, row-sharded over the mesh.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    b, h_img, w, c = images.shape
    if h_img % n_dev:
        raise ValueError(f"H={h_img} must divide by mesh size {n_dev}")
    slab = h_img // n_dev
    if n_dev == 1:
        return forward(variables, images) if variables is not None else forward(images)
    if slab < 2 * halo:
        raise ValueError(
            f"slab H/D={slab} < 2*halo={2 * halo}: border windows would "
            f"need rows beyond the adjacent neighbor — use fewer devices, "
            f"a taller image, or the overlap-tiling path (tiled_apply)")
    win = slab + 2 * halo
    fwd_perm = [(j, j + 1) for j in range(n_dev - 1)]  # send to next
    bwd_perm = [(j + 1, j) for j in range(n_dev - 1)]  # send to prev

    def block(vs, x):
        # x: (B, slab, W, C) — this device's owned rows [i*slab, (i+1)*slab)
        i = lax.axis_index(axis)
        prev_tail = lax.ppermute(x[:, -2 * halo :], axis, fwd_perm)
        next_head = lax.ppermute(x[:, : 2 * halo], axis, bwd_perm)
        # assembled covers global rows [i*slab - 2h, (i+1)*slab + 2h),
        # zeros where the range leaves the image (edge devices)
        asm = jnp.concatenate([prev_tail, x, next_head], axis=1)
        ws = jnp.clip(i * slab - halo, 0, h_img - win)  # global window start
        window = lax.dynamic_slice_in_dim(
            asm, ws - (i * slab - 2 * halo), win, axis=1)
        y = forward(vs, window) if vs is not None else forward(window)
        return lax.dynamic_slice_in_dim(
            y, (i * slab - ws) * scale, slab * scale, axis=1)

    if variables is None:
        run = jax.shard_map(lambda x: block(None, x), mesh=mesh,
                            in_specs=P(None, axis), out_specs=P(None, axis))
        return run(images)
    run = jax.shard_map(block, mesh=mesh,
                        in_specs=(P(), P(None, axis)),
                        out_specs=P(None, axis))
    return run(variables, images)


def halo_sharded_forward_for(
    model,
    variables,
    arch: str,
    scale: int,
    mesh,
    halo: Optional[int] = None,
):
    """Convenience wrapper: jitted giant-image SR for a registry model,
    rows sharded over ``mesh`` with ppermute halo exchange. Returns a fn
    (B, H, W, C) -> (B, H*scale, W*scale, C)."""
    from .mesh import replicate

    halo = receptive_radius(arch, model) if halo is None else halo
    apply_fn = lambda vs, x: model.apply(vs, x, train=False)

    @jax.jit
    def run(vs, images):
        return halo_sharded_apply(apply_fn, images, scale, halo, mesh,
                                  variables=vs)

    vs = replicate(variables, mesh)

    def fwd(images):
        return run(vs, jax.device_put(images, row_sharding(mesh)))

    return fwd

#!/usr/bin/env python
"""Measure RRDBNet's EFFECTIVE receptive radius (ADVICE r3: RRDB tiling).

The registry RRDB (23 blocks x 3 dense blocks x 5 conv3) has a THEORETICAL
receptive radius of ~350 LR px (15 px per RRDB + head/mid/tail) — tiling
with that halo would inflate compute ~44x at tile 128 and defeat tiled
serving entirely. But both residual scalings are 0.2 (models/rrdb.py), so a
contribution that enters through k full RRDBs is attenuated ~0.2^k relative
to the skip path: the EFFECTIVE radius — where a maximal input perturbation
changes the output by less than half a uint8 step (1/510) — is far smaller.

This tool measures it: forward a random image twice (center pixel perturbed
by +/-0.5 in [0,1] space), reduce |diff| over channels, and report the max
diff per LR-radius ring. Convs are pinned to HIGHEST precision so the decay
is measured against f32 numerics, not bf16 pass noise (CLAUDE.md rule).

Run: python tools/rrdb_erf.py [--size 256] [--blocks 23] [--seeds 3]
The committed result feeds parallel/spatial.py::receptive_radius and
tests/test_spatial.py's RRDB decay test.
"""
from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from food101_sr_tpu.models import get_model  # noqa: E402


def measure(size: int, blocks: int, seeds: int, scale: int = 4,
            checkpoint: str = ""):
    model = get_model("RRDB", scale_factor=scale) if blocks == 23 else None
    if model is None:
        from food101_sr_tpu.models.rrdb import RRDBNet

        model = RRDBNet(scale_factor=scale, num_blocks=blocks)
    loaded_vars = None
    if checkpoint:
        # trained weights: the random-init number is a proxy; re-running
        # with the trained checkpoint validates it on real filters
        from food101_sr_tpu.training import load_checkpoint

        tree = load_checkpoint(checkpoint)
        loaded_vars = {"params": tree["params"], **tree.get("extra", {})}

    c = size // 2

    @jax.jit
    def diff_map(variables, x, xp):
        with jax.default_matmul_precision("highest"):
            a = model.apply(variables, x, train=False)
            b = model.apply(variables, xp, train=False)
        # max |diff| over channels -> (H*scale, W*scale); fold back to LR
        # pixels by max-pooling each scale x scale cell
        d = jnp.max(jnp.abs(a - b), axis=-1)[0]
        d = d.reshape(size, scale, size, scale).max(axis=(1, 3))
        return d

    radii = None
    worst = None
    for seed in range(seeds):
        rng = np.random.default_rng(seed)
        x = rng.uniform(0, 1, (1, size, size, 3)).astype(np.float32)
        xp = x.copy()
        # maximal perturbation of the center pixel, all channels
        xp[0, c, c] = np.clip(1.0 - xp[0, c, c], 0, 1)
        variables = loaded_vars
        if variables is None:
            variables = model.init({"params": jax.random.PRNGKey(seed + 100)},
                                   jnp.zeros((1, 16, 16, 3), jnp.float32),
                                   train=False)
        d = np.asarray(diff_map(variables, jnp.asarray(x), jnp.asarray(xp)))
        yy, xx = np.mgrid[0:size, 0:size]
        r = np.maximum(np.abs(yy - c), np.abs(xx - c))  # chebyshev = conv halo metric
        prof = np.zeros(size // 2)
        for ring in range(size // 2):
            prof[ring] = d[r == ring].max() if (r == ring).any() else 0.0
        radii = prof if radii is None else np.maximum(radii, prof)
        worst = d if worst is None else np.maximum(worst, d)
        print(f"seed {seed}: center diff {prof[0]:.4f}, "
              f"r16 {prof[min(16, len(prof)-1)]:.2e}, "
              f"r32 {prof[min(32, len(prof)-1)]:.2e}, "
              f"r48 {prof[min(48, len(prof)-1)]:.2e}", file=sys.stderr)

    half_step = 1.0 / 510.0  # half a uint8 grey level in [0,1] space
    eff = int(np.max(np.nonzero(radii > half_step)[0])) if (radii > half_step).any() else 0
    out = {
        "blocks": blocks, "size": size, "seeds": seeds,
        "theoretical_radius_lr_px": 15 * blocks + 20,
        "effective_radius_half_uint8": eff,
        "profile_max_by_radius": {str(r): float(radii[r])
                                  for r in range(0, len(radii),
                                                 max(1, len(radii) // 32))},
    }
    print(json.dumps(out, indent=2))
    return out


def tiled_check(size: int, checkpoint: str, scale: int = 4, seed: int = 0):
    """Tiled-vs-full forward at the SERVING geometry (serve.py: tile 64,
    halo = receptive_radius -> 40 for registry RRDB, window 144): the
    direct validation that a given checkpoint's weights respect the halo.
    The ring profile above is a per-pixel response measurement; this is
    the end-to-end guarantee serving relies on, in HIGHEST precision so
    the number isolates the halo truncation error from bf16 pass noise.
    Reports max |tiled - full| in uint8 steps (>= 0.5 would mean a
    visible-quantization seam is possible)."""
    from food101_sr_tpu.models import model_for_params
    from food101_sr_tpu.parallel.spatial import receptive_radius, tiled_apply
    from food101_sr_tpu.training import load_checkpoint

    tree = load_checkpoint(checkpoint)
    variables = {"params": tree["params"], **tree.get("extra", {})}
    model = model_for_params(tree["params"], scale_factor=scale)
    halo = receptive_radius("RRDB", model)

    @jax.jit
    def fwd(x):
        with jax.default_matmul_precision("highest"):
            return model.apply(variables, x, train=False)

    x = jnp.asarray(np.random.default_rng(seed)
                    .uniform(0, 1, (1, size, size, 3)).astype(np.float32))
    full = fwd(x)
    tiled = tiled_apply(fwd, x, scale=scale, tile=64, halo=halo,
                        max_windows=4)
    diff_steps = float(jnp.max(jnp.abs(tiled - full))) * 255.0
    out = {"checkpoint": checkpoint, "size": size, "tile": 64, "halo": halo,
           "max_abs_diff_uint8_steps": round(diff_steps, 4),
           "seam_safe": diff_steps < 0.5}
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=256, help="LR image size")
    p.add_argument("--blocks", type=int, default=23)
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--checkpoint", default="",
                   help="orbax RRDB checkpoint; empty = random init x seeds")
    p.add_argument("--tiled_check", action="store_true",
                   help="skip the ring profile; run the serving-geometry "
                        "tiled-vs-full check on --checkpoint instead")
    a = p.parse_args()
    if a.cpu:
        import food101_sr_tpu

        food101_sr_tpu.use_cpu_backend()
    if a.tiled_check:
        if not a.checkpoint:
            sys.exit("--tiled_check needs --checkpoint")
        tiled_check(a.size, a.checkpoint)
    else:
        measure(a.size, a.blocks, a.seeds, checkpoint=a.checkpoint)

#!/usr/bin/env python
"""Feasibility probe: does int8 win over bf16 for the AttentionSR body conv
on this TPU?

The v5e MXU has a 2x int8 peak (394 TOPS vs 197 TFLOP/s bf16). The body of
the flagship AttentionSR (reference src/models.py:146-189 at 96 channels,
registry src/models.py:225) is conv3x3 96->96 at LR resolution — the op
that bounds both train and inference MFU (DESIGN.md "MFU attribution").
Before building a quantized serving mode, measure whether XLA actually
lowers int8 convs to the int8 MXU path on this chip, three ways:

  a) bf16 conv3x3 (the production op) — baseline;
  b) direct int8 conv via lax.conv_general_dilated(preferred_element_type=int32);
  c) im2col (conv_general_dilated_patches) + int8 dot_general — the matmul
     form, in case (b) is emulated but int8 matmuls are native.

Timing uses the same overhead-cancelled two-point slope as bench.py (the
axon tunnel acks dispatches early; see CLAUDE.md).

    python tools/int8_probe.py            # on the TPU
    python tools/int8_probe.py --cpu --tiny   # smoke-test the code path
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = argparse.ArgumentParser(description=__doc__)
    args.add_argument("--cpu", action="store_true",
                      help="run on the CPU backend (functional smoke only; "
                           "int8 timings are meaningless off-TPU)")
    args.add_argument("--tiny", action="store_true",
                      help="tiny shapes + 1 repeat for a fast smoke run")
    args = args.parse_args()

    import jax

    import food101_sr_tpu  # fingerprint-keyed persistent cache (TPU path)

    if args.cpu:
        # the axon plugin ignores JAX_PLATFORMS (CLAUDE.md); the config knob
        # is the reliable way to keep a smoke run off the chip. Also drops
        # the persistent cache (XLA:CPU AOT entries warn on reload).
        food101_sr_tpu.use_cpu_backend()

    import jax.numpy as jnp
    from jax import lax

    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({dev.device_kind})", file=sys.stderr)

    B, H, W, C = (8, 12, 12, 16) if args.tiny else (512, 50, 50, 96)
    K = 3
    rng = np.random.default_rng(0)

    x_f = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)).astype(np.float32),
                      dtype=jnp.bfloat16)
    w_f = jnp.asarray(rng.uniform(-0.1, 0.1, (K, K, C, C)).astype(np.float32),
                      dtype=jnp.bfloat16)
    x_i = jnp.asarray(rng.integers(-127, 128, (B, H, W, C)), dtype=jnp.int8)
    w_i = jnp.asarray(rng.integers(-127, 128, (K, K, C, C)), dtype=jnp.int8)

    dn = lax.conv_dimension_numbers(x_f.shape, w_f.shape,
                                    ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_bf16(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dn)

    @jax.jit
    def conv_int8(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dn,
                                        preferred_element_type=jnp.int32)

    @jax.jit
    def im2col_int8(x, w):
        # patches: (B, H, W, C*K*K) with input channel MAJOR (flattened
        # feature index = c*K*K + kh*K + kw), so the weight matrix must put
        # C first too: transpose HWIO -> IHWO before the reshape.
        p = lax.conv_general_dilated_patches(
            x, (K, K), (1, 1), "SAME",
            dimension_numbers=dn)
        wm = jnp.transpose(w, (2, 0, 1, 3)).reshape(C * K * K, C)
        return lax.dot_general(p, wm, (((3,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    # drain only needs to force materialization; accumulate int32 results in
    # f32 (x64 is off on both backends, and overflow doesn't matter here)
    total_i = jax.jit(lambda y: jnp.sum(y, dtype=jnp.float32)
                      if y.dtype == jnp.int32 else jnp.sum(y))

    def timed(fn, x, w, n_short=5, n_long=25, repeats=3):
        if args.tiny:
            n_short, n_long, repeats = 1, 3, 1
        out = fn(x, w)
        float(np.asarray(total_i(out), dtype=np.float64))  # compile+drain

        def run(n):
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                o = None
                for _ in range(n):
                    o = fn(x, w)
                np.asarray(total_i(o))
                best = min(best, time.perf_counter() - t0)
            return best

        ts, tl = run(n_short), run(n_long)
        return (tl - ts) / (n_long - n_short)

    flops = 2 * B * H * W * C * C * K * K
    results = {}
    for name, fn, xx, ww in (
        ("bf16_conv", conv_bf16, x_f, w_f),
        ("int8_conv", conv_int8, x_i, w_i),
        ("int8_im2col_dot", im2col_int8, x_i, w_i),
    ):
        try:
            dt = timed(fn, xx, ww)
            results[name] = dt
            print(f"{name:18s} {dt*1e3:7.3f} ms  "
                  f"{flops/dt/1e12:6.1f} T(FL)OP/s", file=sys.stderr)
        except Exception as e:
            print(f"{name:18s} FAILED: {e}", file=sys.stderr)

    if "bf16_conv" in results:
        base = results["bf16_conv"]
        for k, v in results.items():
            if k != "bf16_conv":
                print(f"{k}: {base/v:.2f}x vs bf16", file=sys.stderr)


if __name__ == "__main__":
    main()

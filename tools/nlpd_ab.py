#!/usr/bin/env python
"""A/B: metric-grade vs training-grade NLPD inside the full train step.

VERDICT r3 #6: the AttentionSR train step sits at 56.5% MFU with the NLPD
pyramid among the non-MXU tail (DESIGN.md §2 attribution). The one
candidate lever this round: ``nlpd_loss_train`` (losses/nlpd.py) — the same
pyramid on bf16 operands with single-pass (default-precision) bilinear
upsample contractions, while the REPORTED NLPD metric keeps HIGHEST
precision. Gradient parity is pinned in tests/test_losses_metrics.py; this
tool measures the step-time difference on the chip so the keep-or-reject
call is data, not taste (house style: every lever measured, kept or
rejected, recorded in DESIGN.md §2).

Timing follows bench.py's overhead-cancelled scheme: the tunnel acks
dispatches early, so enqueue n steps, force completion with a precompiled
scalar fetch, and take the slope between short and long runs; min of
repeats rejects tunnel spikes.

Run: python tools/nlpd_ab.py [--batch 128] [--arch AttentionSR] [--json F]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def bench_step(loss_fn, arch: str, batch: int, repeats: int,
               n_short: int, n_long: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from food101_sr_tpu.models import get_model
    from food101_sr_tpu.training import (SRTrainState, make_adam,
                                         make_train_step)

    scale, lr_size = 4, 50
    model = get_model(arch, scale_factor=scale, dtype=jnp.bfloat16,
                      phase_tail=True)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, lr_size, lr_size, 3), jnp.float32),
                           train=False)
    state = SRTrainState.create(dict(variables), make_adam(1e-4))
    step = jax.jit(make_train_step(model, loss_fn, scale,
                                   "input_conv", "output_conv"),
                   donate_argnums=0)
    hr = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch, lr_size * scale, lr_size * scale, 3), dtype=np.uint8))
    total = jax.jit(jnp.sum)

    t = time.perf_counter()
    state, m = step(state, hr)
    float(total(m["train_loss"]))
    print(f"  compile+warmup: {time.perf_counter() - t:.1f}s",
          file=sys.stderr)

    def timed(n):
        nonlocal state
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(n):
                state, m = step(state, hr)
            float(total(m["train_loss"]))
            best = min(best, time.perf_counter() - t0)
        return best

    t_s, t_l = timed(n_short), timed(n_long)
    return (t_l - t_s) / (n_long - n_short)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--arch", default="AttentionSR")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--json", default="")
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args()
    if a.cpu:
        import food101_sr_tpu

        food101_sr_tpu.use_cpu_backend()
        a.batch, a.repeats = 4, 1
        n_short, n_long = 1, 3
    else:
        n_short, n_long = 5, 25

    from food101_sr_tpu.losses import nlpd_loss, nlpd_loss_train

    out = {}
    for name, fn in (("metric_grade", nlpd_loss),
                     ("train_grade", nlpd_loss_train)):
        print(f"{name}:", file=sys.stderr)
        per_step = bench_step(fn, a.arch, a.batch, a.repeats, n_short, n_long)
        out[name] = {"ms_per_step": round(per_step * 1e3, 2),
                     "img_per_sec": round(a.batch / per_step, 1)}
        print(f"  {per_step * 1e3:.2f} ms/step "
              f"({a.batch / per_step:.1f} img/s)", file=sys.stderr)
    out["speedup"] = round(out["metric_grade"]["ms_per_step"]
                           / out["train_grade"]["ms_per_step"], 4)
    out["batch"], out["arch"] = a.batch, a.arch
    print(json.dumps(out))
    if a.json:
        with open(a.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()

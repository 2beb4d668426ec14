#!/usr/bin/env python
"""MFU attribution experiments on the AttentionSR train step.

VERDICT round-1 item #6: the headline bench runs at ~50-60% of v5e peak;
this tool measures where the rest goes and tests the one exact mitigation
available without changing the architecture — whether the 96-channel body
(a parity constraint) is already being billed as full 128 MXU lanes.

    python tools/mfu_experiments.py --channels 96 128 --batch 128
    python tools/mfu_experiments.py --profile   # + xplane trace of 3 steps
    python tools/mfu_experiments.py --inference --batch 512 --profile
        # same attribution for the serving forward (the bench.py headline)

Per variant: wall ms/step (overhead-cancelled two-point slope through the
tunnel — see bench.py), XLA's own FLOP count for the compiled step
(``compiled.cost_analysis()``), and model FLOP utilization against the
v5e-1 bf16 peak (197 TFLOP/s). If 96ch and 128ch step times are ~equal,
the MXU pads 96 -> 128 lanes internally and zero-padding the body would
only add free capacity, not speed; if 128ch is ~1.78x slower, XLA packs
96 efficiently and there is nothing to recover. Either result is recorded
in DESIGN.md.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

# runnable as `python tools/mfu_experiments.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_TFLOPS = 197.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_train_step(channels: int, batch: int, lr_size: int = 50,
                    scale: int = 4, profile_dir: str | None = None,
                    phase_tail: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from food101_sr_tpu.losses import nlpd_loss
    from food101_sr_tpu.models.attention_sr import AttentionSR
    from food101_sr_tpu.training import (SRTrainState, make_adam,
                                         make_train_step)

    model = AttentionSR(scale_factor=scale, num_channels=channels,
                        num_residuals=32, dtype=jnp.bfloat16,
                        phase_tail=phase_tail)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, lr_size, lr_size, 3), jnp.float32), train=False)
    state = SRTrainState.create(dict(variables), make_adam(1e-4))
    step_fn = make_train_step(model, nlpd_loss, scale,
                              "input_conv", "output_conv")
    # donate the state exactly as the production loop does
    # (training/loop.py jits with donate_argnums=0) — without donation XLA
    # materializes copy ops for the params/opt-state update (~10% of the
    # step in the round-2 trace)
    step = jax.jit(step_fn, donate_argnums=0)
    hr = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch, lr_size * scale, lr_size * scale, 3),
        dtype=np.uint8))
    total = jax.jit(jnp.sum)

    t = time.perf_counter()
    # AOT-compile once and execute THROUGH the compiled executable: a plain
    # step(state, hr) call would not hit jit's dispatch cache (lower().
    # compile() does not seed it) and would trigger a second full
    # trace+compile — through the axon tunnel that can cost minutes.
    compiled = step.lower(state, hr).compile()
    state, m = compiled(state, hr)
    float(total(m["train_loss"]))
    log(f"[{channels}ch] compile+warmup: {time.perf_counter() - t:.1f}s")
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception as e:  # cost model availability varies per backend
        log(f"cost_analysis unavailable: {e}")
        flops = float("nan")

    def timed(n, repeats=3):
        nonlocal state
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(n):
                state, m = compiled(state, hr)
            float(total(m["train_loss"]))
            best = min(best, time.perf_counter() - t0)
        return best

    t_short, t_long = timed(3), timed(13)
    per_step = (t_long - t_short) / 10.0

    if profile_dir:
        jax.profiler.start_trace(profile_dir)
        for _ in range(3):
            state, m = compiled(state, hr)
        float(total(m["train_loss"]))
        jax.profiler.stop_trace()
        log(f"trace -> {profile_dir}")

    tflops = flops / per_step / 1e12
    return {
        "channels": channels,
        "ms_per_step": per_step * 1e3,
        "img_per_s": batch / per_step,
        "step_gflop": flops / 1e9,
        "tflops": tflops,
        "mfu_pct": 100.0 * tflops / V5E_BF16_PEAK_TFLOPS,
    }


def time_inference(channels: int, batch: int, lr_size: int = 50,
                   scale: int = 4, profile_dir: str | None = None,
                   phase_tail: bool = False):
    """Same attribution for the serving forward bench.py's headline rides
    on: uint8 in / uint8 out at the jit boundary (serve.py:236-243), bf16
    body, overhead-cancelled two-point slope. ``phase_tail`` measures the
    fused phase-space upsample tail against the standard one."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from food101_sr_tpu.models.attention_sr import AttentionSR

    model = AttentionSR(scale_factor=scale, num_channels=channels,
                        num_residuals=32, dtype=jnp.bfloat16,
                        phase_tail=phase_tail)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, lr_size, lr_size, 3), jnp.float32), train=False)

    def fwd_u8(x8):
        x = x8.astype(jnp.float32) / 255.0
        y = model.apply(variables, x, train=False)
        return (jnp.clip(y, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

    lr = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch, lr_size, lr_size, 3), dtype=np.uint8))
    total = jax.jit(lambda y: jnp.sum(y.astype(jnp.int32)))

    t = time.perf_counter()
    compiled = jax.jit(fwd_u8).lower(lr).compile()
    int(total(compiled(lr)))
    log(f"[{channels}ch inf] compile+warmup: {time.perf_counter() - t:.1f}s")
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception as e:
        log(f"cost_analysis unavailable: {e}")
        flops = float("nan")

    def timed(n, repeats=3):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(n):
                y = compiled(lr)
            int(total(y))
            best = min(best, time.perf_counter() - t0)
        return best

    t_short, t_long = timed(3), timed(13)
    per_step = (t_long - t_short) / 10.0

    if profile_dir:
        jax.profiler.start_trace(profile_dir)
        for _ in range(3):
            y = compiled(lr)
        int(total(y))
        jax.profiler.stop_trace()
        log(f"trace -> {profile_dir}")

    tflops = flops / per_step / 1e12
    return {
        "channels": channels,
        "ms_per_step": per_step * 1e3,
        "img_per_s": batch / per_step,
        "step_gflop": flops / 1e9,
        "tflops": tflops,
        "mfu_pct": 100.0 * tflops / V5E_BF16_PEAK_TFLOPS,
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--channels", type=int, nargs="+", default=[96, 128])
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--inference", action="store_true",
                   help="attribute the serving forward (uint8 I/O, bf16 "
                        "body) instead of the train step")
    p.add_argument("--phase_tail", action="store_true",
                   help="with --inference: fused phase-space upsample tail")
    p.add_argument("--profile", action="store_true",
                   help="capture an xplane trace of the FIRST variant")
    p.add_argument("--profile_dir", default="runs/profile_mfu")
    a = p.parse_args()

    import jax

    import food101_sr_tpu  # noqa: F401  (fingerprint-keyed persistent cache)
    log(f"backend: {jax.devices()[0].platform} "
        f"({jax.devices()[0].device_kind})")

    rows = []
    if a.inference:
        bench = lambda ch, b, profile_dir=None: time_inference(
            ch, b, profile_dir=profile_dir, phase_tail=a.phase_tail)
    else:
        bench = lambda ch, b, profile_dir=None: time_train_step(
            ch, b, profile_dir=profile_dir, phase_tail=a.phase_tail)
    for i, ch in enumerate(a.channels):
        rows.append(bench(
            ch, a.batch,
            profile_dir=a.profile_dir if (a.profile and i == 0) else None))
    print(f"{'ch':>5}{'ms/step':>10}{'img/s':>9}{'GFLOP':>9}"
          f"{'TFLOP/s':>9}{'MFU%':>7}")
    for r in rows:
        print(f"{r['channels']:>5}{r['ms_per_step']:>10.2f}"
              f"{r['img_per_s']:>9.1f}{r['step_gflop']:>9.1f}"
              f"{r['tflops']:>9.1f}{r['mfu_pct']:>7.1f}")
    if len(rows) >= 2:
        a0, a1 = rows[0], rows[1]
        ratio = a1["ms_per_step"] / a0["ms_per_step"]
        fr = a1["step_gflop"] / a0["step_gflop"]
        print(f"\n{a1['channels']}ch/{a0['channels']}ch: {ratio:.2f}x time "
              f"for {fr:.2f}x FLOPs -> "
              + ("MXU already pads to 128 lanes (padding is free capacity, "
                 "not speed)" if ratio < (1 + fr) / 2 else
                 "XLA packs the narrow body efficiently (no waste to "
                 "recover)"))


if __name__ == "__main__":
    main()

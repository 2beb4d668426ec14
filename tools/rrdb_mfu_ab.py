#!/usr/bin/env python
"""A/B the RRDB dense-block compute layout on chip (round-5 VERDICT #1).

Round 4 left RRDB training at ~23% MFU (178 img/s at batch 32) with the
named-but-unmeasured fix: the growth-32 dense convs fill 32 of the MXU's
128 output lanes, and the dense-concat backward builds one giant
concatenate fusion that reproducibly crashes the axon remote-compile
helper at train batch >= 64 (HTTP 500, tpu_compile_helper exit 1).

``models/rrdb.py`` now carries both layouts over the SAME param tree:

* ``concat`` — status quo: conv over the growing [x, c1..c_{k-1}] concat.
* ``split``  — conv-over-concat rewritten per source by linearity; each
  GEMM presents 192/160/128/96/64 output lanes and no activation concat
  exists in either pass (forward/grad parity pinned in tests).

This tool measures both, per leg, with bench.py's overhead-cancelled
two-point-slope timing (the tunnel acks dispatches early):

* train step (NLPD + Adam + diagnostics + uint8 degrade), batch 32 both
  layouts, then the previously-crashing batches 64/128 on the winner;
* inference forward (bf16, phase tail, batch 256) both layouts;
* XLA's own FLOP count per compiled program -> MFU vs v5e bf16 peak.

Results append to runs/rrdb_mfu_ab.json; DESIGN.md §2 quotes the table.

Run: python tools/rrdb_mfu_ab.py [--legs train32,train64,...] [--out PATH]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_TFLOPS = 197.0
LR_SIZE, SCALE = 50, 4
REPEATS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _slope(run, n_short=3, n_long=12):
    best_s = min(run(n_short) for _ in range(REPEATS))
    best_l = min(run(n_long) for _ in range(REPEATS))
    return (best_l - best_s) / (n_long - n_short)


def _flops(compiled) -> float | None:
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def bench_train(layout: str, batch: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from food101_sr_tpu.losses import nlpd_loss
    from food101_sr_tpu.models.rrdb import RRDBNet
    from food101_sr_tpu.training import (SRTrainState, make_adam,
                                         make_train_step)

    model = RRDBNet(scale_factor=SCALE, dtype=jnp.bfloat16, phase_tail=True,
                    dense_layout=layout)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, LR_SIZE, LR_SIZE, 3), jnp.float32), train=False)
    state = SRTrainState.create(dict(variables), make_adam(1e-4))
    step = jax.jit(make_train_step(model, nlpd_loss, SCALE,
                                   "input_conv", "output_conv"),
                   donate_argnums=0)
    hr = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch, LR_SIZE * SCALE, LR_SIZE * SCALE, 3), dtype=np.uint8))
    total = jax.jit(jnp.sum)

    t = time.perf_counter()
    compiled = step.lower(state, hr).compile()
    compile_s = time.perf_counter() - t
    state, m = compiled(state, hr)  # execute the AOT program (no re-trace)
    float(total(m["train_loss"]))
    log(f"[train {layout} b{batch}] compile {compile_s:.0f}s")

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = compiled(state, hr)
        float(total(m["train_loss"]))
        return time.perf_counter() - t0

    per = _slope(run)
    fl = _flops(compiled)
    mfu = (fl / per) / (V5E_BF16_PEAK_TFLOPS * 1e12) if fl else None
    out = {"leg": f"train_b{batch}", "layout": layout,
           "ms_per_step": round(per * 1e3, 2),
           "img_per_s": round(batch / per, 1),
           "compile_s": round(compile_s, 1),
           "mfu": round(mfu, 4) if mfu else None}
    log(f"[train {layout} b{batch}] {out['img_per_s']} img/s "
        f"({out['ms_per_step']} ms), MFU {out['mfu']}")
    return out


def bench_infer(layout: str, batch: int = 256) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from food101_sr_tpu.models.rrdb import RRDBNet

    model = RRDBNet(scale_factor=SCALE, dtype=jnp.bfloat16, phase_tail=True,
                    dense_layout=layout)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, LR_SIZE, LR_SIZE, 3), jnp.float32), train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    total = jax.jit(jnp.sum)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (batch, LR_SIZE, LR_SIZE, 3)).astype(np.float32))

    t = time.perf_counter()
    compiled = fwd.lower(variables, x).compile()
    compile_s = time.perf_counter() - t
    float(total(compiled(variables, x)))
    log(f"[infer {layout} b{batch}] compile {compile_s:.0f}s")

    def run(n):
        out = x
        t0 = time.perf_counter()
        for _ in range(n):
            out = compiled(variables, x)
        float(total(out))
        return time.perf_counter() - t0

    per = _slope(run)
    fl = _flops(compiled)
    mfu = (fl / per) / (V5E_BF16_PEAK_TFLOPS * 1e12) if fl else None
    out = {"leg": f"infer_b{batch}", "layout": layout,
           "ms_per_batch": round(per * 1e3, 2),
           "img_per_s": round(batch / per, 1),
           "compile_s": round(compile_s, 1),
           "mfu": round(mfu, 4) if mfu else None}
    log(f"[infer {layout} b{batch}] {out['img_per_s']} img/s, MFU {out['mfu']}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default="train32:concat,train32:split,"
                                      "train64:split,train128:split,"
                                      "infer256:concat,infer256:split")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "runs", "rrdb_mfu_ab.json"))
    args = ap.parse_args()

    import jax
    dev = jax.devices()[0]
    log(f"backend: {dev.platform} ({dev.device_kind})")

    results = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f).get("results", [])

    for spec in args.legs.split(","):
        name, layout = spec.strip().split(":")
        kind, num = ("train", name[5:]) if name.startswith("train") \
            else ("infer", name[5:])
        try:
            if kind == "train":
                rec = bench_train(layout, int(num))
            else:
                rec = bench_infer(layout, int(num))
        except Exception as e:  # compile-helper crashes are a RESULT here
            rec = {"leg": name, "layout": layout, "error": repr(e)[:300]}
            log(f"[{name} {layout}] FAILED: {e!r}")
        rec["platform"] = dev.platform
        rec["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
        results = [r for r in results
                   if (r.get("leg"), r.get("layout")) !=
                   (rec.get("leg"), rec.get("layout"))] + [rec]
        with open(args.out, "w") as f:
            json.dump({"results": results}, f, indent=1)
        log(f"-> {args.out} updated ({len(results)} rows)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B the training input paths on real hardware: host JPEG loader vs the
device-resident cache (data/device_cache.py).

Measures the FULL training hot loop (jitted AttentionSR train step — NLPD +
Adam + diagnostics + on-device degradation — fed by each input path) with
bench.py's overhead-cancelled two-point timing, on a Food-101-layout JPEG
tree (tools/make_fake_food101.py for hermetic hosts, or the real dataset).

Why this comparison exists: SURVEY §7 hard part 7 — at TPU speeds training
is input-bound on small hosts. On this harness the host path pays twice:
~459 img/s/core of JPEG decode (bench.py --input) AND a ~40 MB/s H2D tunnel
moving 15 MB per batch-128 step. The device cache pays a one-time canvas
upload instead and draws every batch on device.

    python tools/cache_device_ab.py --data_root /tmp/fakefood \
        --batch 128 --steps 25 --json runs/cache_device_ab.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_steps(step, state, batches_iter, n_short, n_long, drain):
    """Two-point overhead-cancelled timing over a stream of input batches.

    The input stream is part of what's being measured: wall time per step =
    max(input production, device compute) in steady state. ``drain`` fetches
    a scalar from the last metrics so the device queue is truly empty
    (tunnel acks early — CLAUDE.md timing rule).
    """
    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = step(state, next(batches_iter))
        drain(m)
        return time.perf_counter() - t0

    t_short, t_long = run(n_short), run(n_long)
    return (t_long - t_short) / (n_long - n_short), state


def endless(make_loader):
    """Chain epochs so timing windows can span epoch boundaries (epoch
    restart cost — producer-thread spinup for the host loader — is real
    steady-state behavior and stays in the measurement)."""
    loader = make_loader()
    epoch = 0
    while True:
        loader.set_epoch(epoch)
        yield from loader
        epoch += 1


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default="/tmp/fakefood")
    p.add_argument("--architecture", default="AttentionSR")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--crop", type=int, default=200)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--canvas", type=int, default=256)
    p.add_argument("--steps", type=int, default=25,
                   help="long-run step count (short run = steps//5)")
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--json", default="",
                   help="append one JSON line with both numbers here")
    p.add_argument("--legs", default="host_loader,host_canvas,device_cache",
                   help="comma list of input paths to time")
    p.add_argument("--store_dir", default="/tmp/canvas_store",
                   help="cache dir for the host_canvas leg's disk store")
    p.add_argument("--reuse", type=int, default=8,
                   help="window reuse factor for the host_window leg")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from food101_sr_tpu.data import (DeviceCacheLoader, DeviceWindowLoader,
                                     Food101Source, HostCanvasLoader,
                                     SRDataLoader)
    from food101_sr_tpu.losses import nlpd_loss
    from food101_sr_tpu.models import get_model
    from food101_sr_tpu.training import (SRTrainState, make_adam,
                                         make_train_step)
    from food101_sr_tpu.training.diagnostics import FIRST_LAST

    source = Food101Source(args.data_root, "train")
    idx = np.arange(len(source))
    print(f"{len(idx)} images | batch {args.batch} | device "
          f"{jax.devices()[0].platform}")

    model = get_model(args.architecture, scale_factor=args.scale,
                      dtype=jnp.bfloat16, phase_tail=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, args.crop // args.scale, args.crop // args.scale, 3),
                  jnp.float32), train=False)
    first, last = FIRST_LAST[args.architecture]
    step = jax.jit(make_train_step(model, nlpd_loss, args.scale, first, last),
                   donate_argnums=0)
    total = jax.jit(jnp.sum)

    def drain(m):
        float(total(m["train_loss"]))

    n_long = args.steps
    n_short = max(2, n_long // 5)

    legs = [l for l in args.legs.split(",") if l]
    all_legs = {
        "host_loader": lambda: SRDataLoader(
            source, idx, crop_size=args.crop, batch_size=args.batch,
            train=True, seed=0),
        "host_canvas": lambda: HostCanvasLoader(
            source, idx, crop_size=args.crop, batch_size=args.batch,
            train=True, seed=0, canvas=args.canvas,
            cache_dir=args.store_dir, max_store_gb=32.0),
        "device_cache": lambda: DeviceCacheLoader(
            source, idx, crop_size=args.crop, batch_size=args.batch,
            train=True, seed=0, canvas=args.canvas, max_cache_gb=8.0),
        "host_window": lambda: DeviceWindowLoader(
            source, idx, crop_size=args.crop, batch_size=args.batch,
            seed=0, canvas=args.canvas, cache_dir=args.store_dir,
            max_store_gb=32.0, reuse=args.reuse),
    }
    results = {}
    for name, make_loader in ((n, all_legs[n]) for n in legs):
        t0 = time.perf_counter()
        batches = endless(make_loader)
        # fresh leaf copies: the donated step consumes the state buffers, so
        # the second loader must not share leaves with the first
        fresh = jax.tree.map(lambda x: jnp.array(x), dict(variables))
        state = SRTrainState.create(fresh, make_adam(1e-4))
        # compile + warm both the step and the input path
        state, m = step(state, next(batches))
        drain(m)
        setup = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.repeats):
            per_step, state = time_steps(step, state, batches,
                                         n_short, n_long, drain)
            best = min(best, per_step)
        ips = args.batch / best
        results[name] = {"img_per_s": round(ips, 1),
                         "ms_per_step": round(best * 1e3, 2),
                         "setup_s": round(setup, 1)}
        print(f"{name:13s}: {ips:8.1f} img/s ({best * 1e3:.1f} ms/step; "
              f"setup {setup:.1f}s incl. compile/cache build)")
        del batches, state

    line = {"tool": "cache_device_ab", "architecture": args.architecture,
            "batch": args.batch, "crop": args.crop, "canvas": args.canvas,
            "n_images": int(len(idx)),
            "platform": jax.devices()[0].platform, **results}
    if "host_loader" in results:
        base = max(results["host_loader"]["img_per_s"], 1e-9)
        for name in results:
            if name != "host_loader":
                r = round(results[name]["img_per_s"] / base, 2)
                line[f"speedup_{name}"] = r
                print(f"{name} is {r:.2f}x the host loader end-to-end")
    if args.json:
        with open(args.json, "a") as f:
            f.write(json.dumps(line) + "\n")
    print(json.dumps(line))


if __name__ == "__main__":
    main()

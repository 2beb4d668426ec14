#!/usr/bin/env python
"""Headline benchmark: AttentionSR (96ch, x4) inference throughput.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

* value      — our Flax model jitted in bfloat16 on the available
               accelerator (one TPU chip under the driver), batch 256 of
               50x50 LR -> 200x200 HR (the reference's training geometry,
               reference train.py:27 / src/dataset.py:36-39). Default
               architecture is the reference flagship AttentionSR;
               ``--architecture RRDB`` (or SRCNN/RESNET) benches the other
               registry families with per-arch metric names.
* vs_baseline— ratio vs. the reference stack: the same architecture
               (reference src/models.py:146-189,225) built in PyTorch and
               timed on this host's best torch device (cuda|mps|cpu —
               the reference's own device pick, reference train.py:24).
               The denominator is PINNED to the committed, dated
               measurement in ``runs/bench_baseline.json`` (the live
               re-measure on this noisy 1-core host swung 2.40->3.15
               img/s between rounds with no change in our perf);
               ``--remeasure_baseline`` re-times torch and REWRITES the
               committed file — that is the only path that moves the
               denominator.

Run directly: ``python bench.py``. Extra diagnostics go to stderr; stdout
carries exactly the one JSON line the driver records.

Outage-proofing (the driver contract must survive a down TPU tunnel —
BENCH_r02.json recorded rc=124 with no JSON when it didn't):

* The top-level process is a thin SUPERVISOR under a hard wall-clock
  budget (``FOOD101_BENCH_BUDGET_S``, default 480 s). It never touches a
  JAX backend itself, so it cannot hang in the axon plugin's ~25-minute
  tunnel-retry loop.
* Backend discovery runs in a bounded subprocess; if it times out or
  fails, the benchmark falls back to the CPU backend with a CPU-SIZED
  workload (tiny batch, one repeat, no torch baseline) — an honest small
  number, tagged ``"platform": "cpu-fallback"``, instead of a timeout.
* The measurement itself runs in a child process with the remaining
  budget; a hung child (tunnel dying mid-run) is killed and rescued on
  CPU. If everything fails, the supervisor still prints a tagged
  ``"platform": "timeout-fallback"`` JSON line with value 0.
* ``JAX_PLATFORMS=cpu`` in the environment skips the probe and goes
  straight to the CPU-sized path (the offline regression test's hook —
  the axon plugin ignores that env var, so inside the child the CPU pin
  uses the config route, mirroring tests/conftest.py).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# TPU-scale workload (the real measurement).
BATCH = 256  # phase-tail batch scan (round 3): 256 -> 3666 img/s, 512 ->
#              3625, 1024 -> 3633 (overhead-cancelled, tools/mfu_experiments)
#              — 256 is fastest AND halves compile+run wall time vs the old
#              512 (picked when the standard tail measured 2546 -> 2600)
LR_SIZE = 50
SCALE = 4
N_SHORT, N_LONG = 5, 25
REPEATS = 3
TRAIN_BATCH = 128  # batch sweep on v5e: 64 -> 664 img/s, 128 -> 985,
#                    256 -> 900 (VMEM pressure past 128); 128 is the knee
GAN_BATCH, GAN_CROP = 32, 192

# Last-resort denominator if runs/bench_baseline.json is unreadable:
# torch-CPU throughput of the reference AttentionSR on this image
# (measured 2026-08-16 on the 1-core driver host, batch 4, eval, fp32).
FALLBACK_BASELINE_IPS = 2.40
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "runs", "bench_baseline.json")


def pinned_baseline(arch: str) -> float | None:
    """Committed torch-CPU img/s for ``arch``; None if never measured."""
    try:
        with open(BASELINE_FILE) as f:
            entry = json.load(f)["baselines"].get(arch)
    except (OSError, ValueError, KeyError, TypeError):
        entry = None
    if entry:
        return float(entry["ips"])
    # entry-missing and file-unreadable take the same fallback: the headline
    # architecture always keeps a denominator (ADVICE r4)
    return FALLBACK_BASELINE_IPS if arch == "AttentionSR" else None


def record_baseline(arch: str, ips: float):
    """--remeasure_baseline: rewrite the committed denominator for ``arch``."""
    try:
        with open(BASELINE_FILE) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        doc = {"baselines": {}}
    doc.setdefault("baselines", {})[arch] = {
        "ips": round(ips, 2),
        "measured": time.strftime("%Y-%m-%d"),
        "source": "bench.py --remeasure_baseline",
    }
    with open(BASELINE_FILE, "w") as f:
        json.dump(doc, f, indent=2)
    log(f"baseline file updated: {arch} -> {ips:.2f} img/s")

WALL_BUDGET_S = float(os.environ.get("FOOD101_BENCH_BUDGET_S", "480"))
PROBE_TIMEOUT_S = 120.0
CPU_RESERVE_S = 60.0  # supervisor holds this back for the CPU rescue leg
#                       (measured: the CPU-sized fallback finishes in ~35 s;
#                       every second not reserved goes to the TPU child's
#                       backend-init/compile window instead)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def apply_cpu_scale():
    """Shrink the workload to what a 1-core CPU host finishes in ~a minute.

    The round-2 outage proved the TPU-sized fallback (batch 512, 25-iter
    runs, 3 repeats) can never finish on this class of host; these knobs
    keep the CPU leg to a handful of small forwards.
    """
    global BATCH, N_SHORT, N_LONG, REPEATS, TRAIN_BATCH, GAN_BATCH, GAN_CROP
    BATCH = 2
    N_SHORT, N_LONG = 1, 3
    REPEATS = 1
    TRAIN_BATCH = 2
    GAN_BATCH, GAN_CROP = 1, 64


def parse_arch(argv) -> str:
    """--architecture NAME (default: the reference flagship AttentionSR)."""
    if "--architecture" in argv:
        i = argv.index("--architecture")
        nxt = argv[i + 1] if i + 1 < len(argv) else ""
        if nxt in ("SRCNN", "RESNET", "AttentionSR", "RRDB"):
            return nxt
        sys.exit(f"unknown --architecture {nxt!r} "
                 "(SRCNN|RESNET|AttentionSR|RRDB)")
    return "AttentionSR"


def parse_mode(argv):
    """(mode, quantize, arch) from CLI args; shared by supervisor and child."""
    arch = parse_arch(argv)
    if "--input" in argv:
        return "input", "", arch
    if "--gan" in argv:
        return "gan", "", arch
    if "--train" in argv:
        return "train", "", arch
    quantize = ""
    if "--quantize_dot" in argv:
        quantize = "int8_dot"
    elif "--quantize" in argv:
        # accept the value form every other CLI uses (--quantize int8_dot);
        # a bare --quantize means int8. Reject unknown modes loudly rather
        # than silently benchmarking the wrong lowering.
        i = argv.index("--quantize")
        nxt = argv[i + 1] if i + 1 < len(argv) else ""
        if nxt in ("int8", "int8_dot"):
            quantize = nxt
        elif nxt and not nxt.startswith("-"):
            sys.exit(f"unknown --quantize mode {nxt!r} (int8|int8_dot)")
        else:
            quantize = "int8"
    return "infer", quantize, arch


def metric_name(mode: str, quantize: str, arch: str) -> tuple[str, str]:
    """(metric, unit) for a mode — also used for the last-resort line."""
    if mode == "input":
        return "input_pipeline_host_throughput", "images/sec/core"
    a = arch.lower()
    if mode == "gan":
        return f"{a}_x4_gan_train_throughput", "images/sec/chip"
    if mode == "train":
        return f"{a}_x4_train_throughput", "images/sec/chip"
    m = f"{a}_x4_inference_throughput"
    if quantize:
        m += f"_{quantize}"
    return m, "images/sec/chip"


# --------------------------------------------------------------------------
# supervisor — never initializes a JAX backend; owns the wall clock
# --------------------------------------------------------------------------

def _probe_platform(deadline: float) -> str:
    """Bounded backend discovery in a subprocess.

    jax.devices() through a down axon tunnel sits in a ~25-minute internal
    retry loop; doing it in a killable child keeps the supervisor honest.
    """
    budget = min(PROBE_TIMEOUT_S, deadline - time.monotonic() - CPU_RESERVE_S)
    if budget < 5:
        log("probe: no budget left, assuming cpu")
        return "cpu"
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            timeout=budget, text=True,
        )
        lines = [ln.strip() for ln in r.stdout.splitlines() if ln.strip()]
        if r.returncode == 0 and lines:
            log(f"probe: platform={lines[-1]}")
            return lines[-1]
        log(f"probe: rc={r.returncode}, assuming cpu")
    except subprocess.TimeoutExpired:
        log(f"probe: timed out after {budget:.0f}s, assuming cpu")
    return "cpu"


def _last_json(text: str) -> dict | None:
    """Last valid ``{"metric": ...}`` JSON object line in ``text``."""
    for ln in reversed((text or "").splitlines()):
        ln = ln.strip()
        if not ln:
            continue
        try:
            obj = json.loads(ln)
        except ValueError:
            continue
        if isinstance(obj, dict) and "metric" in obj:
            return obj
    return None


def _run_child(platform: str, timeout: float) -> dict | None:
    """One measurement attempt in a child process; validated JSON or None.

    The infer child does chip work first and prints PROVISIONAL lines as
    soon as it has any measurement (standard-tail program, then again with
    the measured torch baseline) before attempting the faster phase-tail
    program (whose cold compile through the tunnel has been observed at
    100-230s) — so a timeout kill mid-compile still salvages a real chip
    measurement from the child's partial stdout instead of falling back
    to CPU."""
    if timeout < 5:
        return None
    env = dict(os.environ)
    env["FOOD101_BENCH_CHILD"] = "1"
    env["FOOD101_BENCH_PLATFORM"] = platform
    log(f"child[{platform}]: budget {timeout:.0f}s")
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            *sys.argv[1:]],
                           stdout=subprocess.PIPE, timeout=timeout, text=True,
                           env=env)
    except subprocess.TimeoutExpired as e:
        log(f"child[{platform}]: killed at {timeout:.0f}s budget")
        out = e.stdout
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        obj = _last_json(out or "")
        if obj is not None:
            obj["note"] = "salvaged provisional line after child timeout"
            log(f"child[{platform}]: salvaged provisional measurement")
        return obj
    obj = _last_json(r.stdout)
    if obj is None:
        log(f"child[{platform}]: rc={r.returncode}, no JSON line on stdout")
    return obj


def supervise():
    deadline = time.monotonic() + WALL_BUDGET_S
    mode, quantize, arch = parse_mode(sys.argv)

    if mode == "input":
        # host-only pipeline: no device, no probe; give it the full budget
        result = _run_child("cpu", deadline - time.monotonic() - 5)
    else:
        if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
            platform = "cpu"  # regression-test hook; skip the probe
            log("JAX_PLATFORMS=cpu set: skipping probe")
        else:
            platform = _probe_platform(deadline)
        reserve = CPU_RESERVE_S if platform != "cpu" else 5
        result = _run_child(platform,
                            deadline - time.monotonic() - reserve)
        if result is None and platform != "cpu":
            result = _run_child("cpu", deadline - time.monotonic() - 5)

    if result is None:
        metric, unit = metric_name(mode, quantize, arch)
        result = {"metric": metric, "value": 0.0, "unit": unit,
                  "vs_baseline": 0.0, "platform": "timeout-fallback"}
        log("all measurement attempts failed; emitting tagged zero line")
    print(json.dumps(result), flush=True)


# --------------------------------------------------------------------------
# child — the actual measurement, on a platform the supervisor picked
# --------------------------------------------------------------------------

def bench_tpu(quantize: str = "", phase_tail: bool = True,
              arch: str = "AttentionSR") -> float:
    """Overhead-cancelled device timing.

    The remote-TPU tunnel used by the driver acks dispatches before they
    execute (``block_until_ready`` returns early), so naive wall-clock
    timing reports physically impossible numbers. Dispatches still execute
    in order on the device, so: enqueue ``n`` forwards, force completion by
    fetching a (precompiled) scalar reduction of the last output, and take
    the slope between a short and a long run so dispatch/fetch overhead
    cancels. Min-of-repeats rejects tunnel latency spikes.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from food101_sr_tpu.models import get_model

    dev = jax.devices()[0]
    log(f"jax backend: {dev.platform} ({dev.device_kind})")

    # phase_tail=True matches the production serving path (serve.py
    # default): the upsample tail fused in pixel-shuffle phase space —
    # exact same math/params, measured +26% on v5e (DESIGN.md §2).
    # SRCNN pre-upsamples (no tail/body): both flags are no-ops there and
    # quantize is rejected by the registry, so strip them.
    kw = ({} if arch == "SRCNN"
          else dict(quantize=quantize, phase_tail=phase_tail))
    model = get_model(arch, scale_factor=SCALE, dtype=jnp.bfloat16, **kw)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, LR_SIZE, LR_SIZE, 3), jnp.float32),
        train=False,
    )

    forward = jax.jit(lambda v, x: model.apply(v, x, train=False))
    total = jax.jit(jnp.sum)

    x = jnp.asarray(
        np.random.default_rng(0)
        .uniform(0, 1, (BATCH, LR_SIZE, LR_SIZE, 3))
        .astype(np.float32)
    )

    t = time.perf_counter()
    float(total(forward(variables, x)))  # compile both + drain
    log(f"compile+warmup: {time.perf_counter()-t:.1f}s")

    def timed(n):
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = x
            for _ in range(n):
                out = forward(variables, x)
            float(total(out))  # genuinely waits for the queue to drain
            best = min(best, time.perf_counter() - t0)
        return best

    t_short, t_long = timed(N_SHORT), timed(N_LONG)
    per_fwd = (t_long - t_short) / (N_LONG - N_SHORT)
    ips = BATCH / per_fwd
    log(f"ours: {ips:.1f} images/sec  ({per_fwd*1e3:.2f} ms / batch {BATCH}; "
        f"t_short={t_short*1e3:.0f}ms t_long={t_long*1e3:.0f}ms)")
    return ips


def bench_torch_reference(arch: str = "AttentionSR") -> float | None:
    """The benched architecture in PyTorch on the reference's device pick
    (only runs under ``--remeasure_baseline``; the recorded number in
    runs/bench_baseline.json is the default denominator).

    AttentionSR re-stated from the survey of reference src/models.py:
    conv9(3->96)+PReLU -> 32 x [conv3+PReLU+conv3+SE(r=16), x0.1 + id]
    -> conv3 -> global skip -> 2 x [conv3(->256)+PixelShuffle(2)+PReLU]
    -> conv9(64->3). RRDB is a torch mirror of our models/rrdb.py (the
    reference has no RRDB; the baseline is the same net on the torch
    stack, so the ratio isolates the framework+hardware, not the model).
    """
    try:
        import torch
        import torch.nn as nn
    except Exception as e:  # pragma: no cover
        log(f"torch unavailable ({e}); using fallback baseline")
        return None

    if arch == "RRDB":
        class DenseBlock(nn.Module):
            def __init__(self, c=64, g=32):
                super().__init__()
                self.convs = nn.ModuleList(
                    [nn.Conv2d(c + i * g, g, 3, padding=1) for i in range(4)]
                    + [nn.Conv2d(c + 4 * g, c, 3, padding=1)])
                self.act = nn.LeakyReLU(0.2)

            def forward(self, x):
                feats = [x]
                for conv in self.convs[:-1]:
                    feats.append(self.act(conv(torch.cat(feats, 1))))
                return x + 0.2 * self.convs[-1](torch.cat(feats, 1))

        class TorchRRDB(nn.Module):
            def __init__(self, c=64):
                super().__init__()
                self.blocks = nn.ModuleList(
                    [DenseBlock(c) for _ in range(3)])

            def forward(self, x):
                r = x
                for b in self.blocks:
                    r = b(r)
                return x + 0.2 * r

        class TorchRRDBNet(nn.Module):
            def __init__(self, c=64, n=23):
                super().__init__()
                self.head = nn.Conv2d(3, c, 3, padding=1)
                self.body = nn.Sequential(*[TorchRRDB(c) for _ in range(n)])
                self.mid = nn.Conv2d(c, c, 3, padding=1)
                up = []
                in_c = c
                for _ in range(SCALE // 2):
                    up += [nn.Conv2d(in_c, 256, 3, padding=1),
                           nn.PixelShuffle(2), nn.PReLU()]
                    in_c = 64
                self.up = nn.Sequential(*up)
                self.tail = nn.Conv2d(64, 3, 9, padding=4)

            def forward(self, x):
                h = self.head(x)
                h = h + self.mid(self.body(h))
                return self.tail(self.up(h))

        return _time_torch(TorchRRDBNet(), arch)
    if arch != "AttentionSR":
        log(f"no torch mirror for {arch}; vs_baseline stays unpinned")
        return None

    ch, blocks = 96, 32

    class SE(nn.Module):
        def __init__(self, c, r=16):
            super().__init__()
            self.fc1 = nn.Linear(c, c // r, bias=False)
            self.fc2 = nn.Linear(c // r, c, bias=False)

        def forward(self, x):
            s = x.mean(dim=(2, 3))
            s = torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))
            return x * s[:, :, None, None]

    class Block(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.c1 = nn.Conv2d(c, c, 3, padding=1)
            self.a = nn.PReLU()
            self.c2 = nn.Conv2d(c, c, 3, padding=1)
            self.se = SE(c)

        def forward(self, x):
            return x + 0.1 * self.se(self.c2(self.a(self.c1(x))))

    class RefAttentionSR(nn.Module):
        def __init__(self):
            super().__init__()
            self.head = nn.Sequential(nn.Conv2d(3, ch, 9, padding=4), nn.PReLU())
            self.body = nn.Sequential(*[Block(ch) for _ in range(blocks)])
            self.mid = nn.Conv2d(ch, ch, 3, padding=1)
            up = []
            in_c = ch
            for _ in range(SCALE // 2):
                up += [nn.Conv2d(in_c, 256, 3, padding=1), nn.PixelShuffle(2),
                       nn.PReLU()]
                in_c = 64
            self.up = nn.Sequential(*up)
            self.tail = nn.Conv2d(64, 3, 9, padding=4)

        def forward(self, x):
            h = self.head(x)
            h = h + self.mid(self.body(h))
            return self.tail(self.up(h))

    return _time_torch(RefAttentionSR(), arch)


def _time_torch(model, arch: str) -> float:
    """Shared torch timing leg: reference device pick, min-of-repeats."""
    import torch

    if torch.cuda.is_available():
        device = "cuda"
    elif getattr(torch.backends, "mps", None) and torch.backends.mps.is_available():
        device = "mps"
    else:
        device = "cpu"
    log(f"torch baseline device: {device}")

    model = model.to(device).eval()
    b = 4
    x = torch.rand(b, 3, LR_SIZE, LR_SIZE, device=device)
    n_iters = 3 if device == "cpu" else 10
    best = float("inf")
    with torch.no_grad():
        model(x)  # warmup
        if device == "cuda":
            torch.cuda.synchronize()
        # best-of-repeats: single-pass CPU timing wiggles +-20% on this
        # 1-core host; min rejects scheduler noise the same way the TPU
        # side's min-of-repeats does.
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            for _ in range(n_iters):
                model(x)
            if device == "cuda":
                torch.cuda.synchronize()
            best = min(best, time.perf_counter() - t0)
    ips = n_iters * b / best
    log(f"reference torch {arch} ({device}): {ips:.2f} images/sec")
    return ips


def bench_train_step(batch: int, arch: str = "AttentionSR") -> float:
    """Supervised train-step throughput (model + NLPD + Adam +
    in-graph diagnostics + on-device uint8 degradation) — the full hot
    path of ``train.py``. Same honest-timing scheme as bench_tpu."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from food101_sr_tpu.losses import nlpd_loss
    from food101_sr_tpu.models import get_model
    from food101_sr_tpu.training import SRTrainState, make_adam, make_train_step

    # phase_tail matches train.py's default (fused phase-space tail,
    # measured +8.5% — torch-parity-tested with this tail on our side)
    kw = {} if arch == "SRCNN" else dict(phase_tail=True)
    model = get_model(arch, scale_factor=SCALE, dtype=jnp.bfloat16, **kw)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, LR_SIZE, LR_SIZE, 3), jnp.float32),
        train=False,
    )
    state = SRTrainState.create(dict(variables), make_adam(1e-4))
    # donate the state exactly as the production loop does — without it XLA
    # inserts params/opt-state copies (~10% of the step, round-2 trace)
    step = jax.jit(make_train_step(model, nlpd_loss, SCALE,
                                   "input_conv", "output_conv"),
                   donate_argnums=0)
    hr = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch, LR_SIZE * SCALE, LR_SIZE * SCALE, 3), dtype=np.uint8))
    total = jax.jit(jnp.sum)

    t = time.perf_counter()
    state, m = step(state, hr)
    float(total(m["train_loss"]))
    log(f"train-step compile+warmup: {time.perf_counter()-t:.1f}s")

    def timed(n):
        best = float("inf")
        nonlocal state
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            for _ in range(n):
                state, m = step(state, hr)
            float(total(m["train_loss"]))
            best = min(best, time.perf_counter() - t0)
        return best

    t_short, t_long = timed(N_SHORT), timed(N_LONG)
    per_step = (t_long - t_short) / (N_LONG - N_SHORT)
    ips = batch / per_step
    log(f"train: {ips:.1f} images/sec  ({per_step*1e3:.2f} ms / step, batch {batch})")
    return ips


def bench_gan_step(batch: int, crop: int, arch: str = "AttentionSR") -> float:
    """GAN trainer throughput: composite G step every batch + D step every
    5th (the reference cadence, train.py:87) — reported as effective
    images/sec."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from food101_sr_tpu.losses import get_loss_function
    from food101_sr_tpu.models import Discriminator, get_model
    from food101_sr_tpu.training import (SRTrainState, make_adam,
                                         make_gan_d_step, make_gan_g_step)

    # generator tail fused in phase space, like train.py's default
    g_model = get_model(arch, scale_factor=SCALE, dtype=jnp.bfloat16,
                        phase_tail=True)
    g_vars = g_model.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, crop // SCALE, crop // SCALE, 3),
                                    jnp.float32), train=False)
    g_state = SRTrainState.create(dict(g_vars), make_adam(1e-4, clip_norm=1.0))
    d_model = Discriminator(dtype=jnp.bfloat16)
    d_vars = d_model.init({"params": jax.random.PRNGKey(2)},
                          jnp.zeros((1, crop, crop, 3), jnp.float32),
                          train=False)
    d_state = SRTrainState.create(dict(d_vars), make_adam(1e-5))
    percep = get_loss_function("perceptual", weights_dir="weights")
    d_step = jax.jit(make_gan_d_step(g_model, d_model, SCALE))
    g_step = jax.jit(make_gan_g_step(g_model, d_model, percep, SCALE,
                                     "input_conv", "output_conv"))
    hr = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch, crop, crop, 3), dtype=np.uint8))
    rng = jax.random.PRNGKey(0)
    total = jax.jit(jnp.sum)

    _, dm = d_step(g_state, d_state, hr, rng)
    float(total(dm["train_loss_D"]))
    _, _, gm = g_step(g_state, d_state, hr)
    float(total(gm["train_loss"]))

    n_s, n_l = (1, 2) if REPEATS == 1 else (3, 15)  # REPEATS==1 => CPU scale

    def timed(fn):
        def run(n):
            best = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                m = None
                for _ in range(n):
                    m = fn()
                float(total(m))
                best = min(best, time.perf_counter() - t0)
            return best
        return (run(n_l) - run(n_s)) / (n_l - n_s)

    t_d = timed(lambda: d_step(g_state, d_state, hr, rng)[1]["train_loss_D"])
    t_g = timed(lambda: g_step(g_state, d_state, hr)[2]["train_loss"])
    ips = batch / (t_g + t_d / 5)
    log(f"gan: g_step {t_g*1e3:.1f} ms, d_step {t_d*1e3:.1f} ms "
        f"-> {ips:.1f} img/s effective (D every 5th)")
    return ips


def bench_input_pipeline(n_images: int = 8, batches: int = 24,
                         batch_size: int = 16) -> tuple:
    """Host input-pipeline throughput: JPEG-on-disk -> uint8 HR crop
    batches through SRDataLoader (the stage feeding every train step).

    Builds a small Food-101-layout tree of 512px photo-like JPEGs in /tmp,
    then times the loader's native fused region-decode path against the
    pure-PIL fallback (the reference's per-sample full decode,
    reference src/dataset.py:28). Per *core* numbers: this host has one;
    a real TPU-VM host scales linearly with its vCPUs (the loader's
    thread pool + GIL-released native decode are embarrassingly parallel).
    """
    import tempfile

    import numpy as np
    from PIL import Image

    from food101_sr_tpu.data import Food101Source, SRDataLoader

    root = tempfile.mkdtemp(prefix="bench_input_")
    base = os.path.join(root, "food-101")
    os.makedirs(os.path.join(base, "meta"))
    os.makedirs(os.path.join(base, "images", "pizza"))
    rng = np.random.default_rng(0)
    rel = []
    for k in range(n_images):
        x = rng.integers(0, 255, (512, 512, 3)).astype(np.float32)
        for _ in range(2):
            x = (x + np.roll(x, 1, 0) + np.roll(x, 1, 1)) / 3
        Image.fromarray(np.clip(x, 0, 255).astype(np.uint8)).save(
            os.path.join(base, "images", "pizza", f"im{k}.jpg"), quality=90)
        rel.append(f"pizza/im{k}")
    with open(os.path.join(base, "meta", "train.txt"), "w") as f:
        f.write("\n".join(rel))
    src = Food101Source(root=root, split="train")
    idx = np.arange(batches * batch_size) % n_images

    def run(disable_native: bool) -> float:
        if disable_native:
            from food101_sr_tpu import native
            saved, native._libs = dict(native._libs), {"fast_jpeg": None}
        try:
            loader = SRDataLoader(src, indices=idx, crop_size=200,
                                  batch_size=batch_size, train=True, seed=0)
            n = 0
            t0 = time.perf_counter()
            for b in loader:
                n += b.shape[0]
            return n / (time.perf_counter() - t0)
        finally:
            if disable_native:
                native._libs = saved
    run(False)  # warm page cache + thread pool
    ours, pil = run(False), run(True)
    log(f"input pipeline: native {ours:.0f} img/s/core, PIL-fallback "
        f"{pil:.0f} img/s/core ({ours / pil:.2f}x)")
    return ours, pil


def child_main():
    mode, quantize, arch = parse_mode(sys.argv)
    platform = os.environ.get("FOOD101_BENCH_PLATFORM", "")
    cpu = platform == "cpu"
    if cpu or mode == "input":
        # Pin BEFORE any backend init (the axon plugin ignores the
        # JAX_PLATFORMS env var) and drop the persistent compile cache —
        # its XLA:CPU AOT entries warn on every reload. --input always
        # pins CPU: it measures HOST batch production, and the loader now
        # prefetches batches to device (pipeline.py _produce) — letting
        # those device_puts ride the ~46 MB/s tunnel would fold H2D wire
        # time into a number labeled img/s/core.
        import food101_sr_tpu
        food101_sr_tpu.use_cpu_backend()
    if cpu and mode != "input":
        apply_cpu_scale()
        log(f"cpu-scale workload: batch {BATCH}, n {N_SHORT}/{N_LONG}, "
            f"repeats {REPEATS}")

    metric, unit = metric_name(mode, quantize, arch)
    if mode == "input":
        ours, pil = bench_input_pipeline()
        line = {"metric": metric, "value": round(ours, 1), "unit": unit,
                "vs_baseline": round(ours / pil, 2)}
    elif mode == "gan":
        line = {"metric": metric, "value": round(bench_gan_step(
            GAN_BATCH, GAN_CROP, arch), 1), "unit": unit, "vs_baseline": None}
    elif mode == "train":
        # extra mode (not the driver's headline): full train-step
        # throughput; no torch-side NLPD train baseline, so no vs_baseline.
        # RRDB trains at batch 128 like the others since round 5: the
        # split dense layout (models/rrdb.py, auto-selected for train
        # passes) removed the concat backward's giant concatenate fusion
        # that crashed the tunnel compiler at batch >= 64 and filled the
        # MXU lanes — measured v5e scan (runs/rrdb_mfu_ab.json): concat
        # b32 178 img/s / 24% MFU -> split b32 195, b128 390 / 56% MFU
        # (b64 is an off-knee dip at 175; b256 OOMs HBM at 17.5/15.75G).
        line = {"metric": metric, "value": round(bench_train_step(
            TRAIN_BATCH, arch), 1), "unit": unit, "vs_baseline": None}
    else:
        # the denominator is the committed, dated measurement — the live
        # torch leg only runs under --remeasure_baseline, which rewrites
        # the committed file (VERDICT r3: the re-measured denominator on
        # this noisy host swung 31% round-to-round with no change in our
        # perf, moving the recorded headline ratio for nothing)
        baseline = pinned_baseline(arch)
        if cpu:
            ours = bench_tpu(quantize, arch=arch)
        else:
            # Chip work FIRST. Through a cold tunnel, backend init + the
            # first compile dominate the child's budget (observed >300 s on
            # a wiped /tmp/jax_cache with a slow tunnel). Tiered
            # provisional lines, each overwriting the previous one in the
            # supervisor's salvage:
            #   1. standard-tail measurement (fastest-compiling program);
            #   2. the production phase-tail program (faster to RUN, +26%
            #      measured, but slow to COMPILE cold: 100-230 s observed).
            # SRCNN has no tail; one program, one line.
            if "--remeasure_baseline" in sys.argv:
                # keep the committed denominator when the re-measure fails
                # (torch missing / no mirror for this arch) — ADVICE r4
                remeasured = bench_torch_reference(arch)
                if remeasured is not None:
                    baseline = remeasured
                    record_baseline(arch, remeasured)
            if arch == "SRCNN":
                ours = bench_tpu(quantize, arch=arch)
            else:
                std = bench_tpu(quantize, phase_tail=False, arch=arch)
                print(json.dumps({
                    "metric": metric, "value": round(std, 1), "unit": unit,
                    "vs_baseline": (round(std / baseline, 2)
                                    if baseline else None),
                    "tail": "standard"}), flush=True)
                ours = bench_tpu(quantize, phase_tail=True, arch=arch)
        line = {"metric": metric, "value": round(ours, 1), "unit": unit,
                "vs_baseline": round(ours / baseline, 2) if baseline else None}
        if not cpu and arch != "SRCNN":
            line["tail"] = "phase"
    if cpu and mode != "input":
        # never let a CPU number masquerade as a chip measurement in the
        # recorded history
        line["platform"] = "cpu-fallback"
    print(json.dumps(line), flush=True)


def main():
    if os.environ.get("FOOD101_BENCH_CHILD") == "1":
        child_main()
    else:
        supervise()


if __name__ == "__main__":
    main()

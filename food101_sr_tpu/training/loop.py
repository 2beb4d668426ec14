"""The training runtime: epoch loop, validation, plateau LR, early stop,
best-checkpointing, final test eval — the TPU-native counterpart of the
reference's ``train(config)`` (reference train.py:21-197).

Host/device split: the host loop owns control flow (epochs, logging cadence,
plateau decisions, early stop, GAN D-cadence); all math lives in jitted
steps over a data-parallel mesh. Metric arrays are only synced to Python
floats on log boundaries, not per step.
"""
from __future__ import annotations

import os
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import optax

try:  # reference parity: tqdm bars around the hot loops (train.py:77,190)
    from tqdm import tqdm
except ImportError:  # pragma: no cover
    def tqdm(it, **_kw):
        return it

from ..data import (
    DeviceCacheLoader,
    DeviceWindowLoader,
    Food101Source,
    HostCanvasLoader,
    SRDataLoader,
    SyntheticSource,
    prepare_batch,
    subset_indices,
    train_val_split,
)
from ..losses import get_loss_function
from ..metrics import MetricsCalculator
from ..models import Discriminator, get_model
from ..parallel import (
    data_sharding,
    make_mesh,
    maybe_initialize_from_config,
    replicate,
)
from ..utils import RunLogger
from .checkpoint import (
    load_checkpoint,
    load_train_checkpoint,
    save_checkpoint,
    save_train_checkpoint,
    warm_start_params,
)
from .diagnostics import FIRST_LAST
from .preempt import PreemptionGuard
from .schedule import EarlyStopping, ReduceLROnPlateau
from .state import SRTrainState, make_adam
from .steps import (
    make_accum_apply,
    make_eval_step,
    make_forward,
    make_gan_d_step,
    make_gan_g_step,
    make_grad_step,
    make_train_step,
)

DEFAULTS: dict[str, Any] = {
    "architecture": "SRCNN",
    "batch_size": 16,
    "lr": 4e-4,
    "epochs": 10,
    "loss_function": "nlpd",
    "subset": 1.0,
    "pretrained_weights": "",
    "patience": 5,
    "save_name": "model_best",
    # TPU-native extensions (not in the reference CLI):
    "dataset": "food101",       # food101 | synthetic
    "data_root": "./data",
    "crop_size": 200,
    "scale_factor": 4,
    "dtype": "float32",         # float32 | bfloat16 compute dtype
    "seed": 0,
    "weights_dir": "weights",
    "log_every": 100,
    "synthetic_size": 512,
    "d_update_every": 5,
    "use_wandb": None,
    "run_name": None,
    "resume": "",               # path to a *_last full-state checkpoint
    "profile_steps": 0,         # >0: jax.profiler trace of that many steps
    "profile_dir": "runs/profile",
    "ema": 0.0,                 # >0: EMA decay for generator params; EMA
                                # weights are validated and checkpointed
    "grad_accum": 1,            # k>1: each update = k sequential microbatches
                                # of batch_size/k (1/k activation HBM;
                                # supervised losses only). Same math as the
                                # unsplit batch for BN-free models; RESNET's
                                # train-mode BN normalizes per-microbatch,
                                # so its grads/running stats legitimately
                                # differ (see tests/test_grad_accum.py)
    "quantize": "",             # "qat": train with fake-quantized body convs
                                # (STE) so the float checkpoint lands on the
                                # int8 serving grid; "" = normal float body.
                                # The inference-only int8/int8_dot modes are
                                # rejected here (round/clip has zero grad).
    "phase_tail": True,         # fused phase-space upsample tail in the
                                # train step (the serving default too):
                                # same math/params/ckpts, measured +8.5%
                                # train throughput on v5e (1139 -> 1236
                                # img/s, batch 128). Backed by DIRECT
                                # torch-reference parity with the phase
                                # tail on our side: raw gradients + 20-step
                                # SGD trajectory + eval parity
                                # (tests/test_training_parity_torch.py)
                                # plus phase-vs-standard leaf equality
                                # (tests/test_phase_tail.py).
                                # --no_phase_tail restores the
                                # materialized tail.
    "cache_device": False,      # park the (subset-scale) dataset in device
                                # memory as uint8 canvases and draw batches
                                # on-device (gather + crop + flip in one tiny
                                # jit) — zero host work per step. Built for
                                # the reference's sweep workflow (subset
                                # 0.025-0.1 fits in well under 2 GB of HBM);
                                # train-time crops are drawn from the central
                                # cache_canvas square rather than the full
                                # image (data/device_cache.py docstring).
                                # Eval batches stay byte-identical to the
                                # host loader. Single-process only.
    "cache_canvas": 0,          # cached square side for TRAIN loaders
                                # (0 = auto: max(256, crop_size)); larger =
                                # more crop diversity, more HBM
    "cache_budget_gb": 4.0,     # refuse caches above this (HBM safety)
    "cache_host": "",           # directory for a DISK-staged canvas store
                                # (data/canvas_cache.py): the dataset is
                                # decoded ONCE into a memmapped uint8 store
                                # (content-keyed, reused across runs) and
                                # every epoch after that is decode-free —
                                # canvases stream to HBM and crop/flip
                                # happen on device, so per-step host work
                                # is a block memcpy. Any dataset size that
                                # fits on disk (full Food-101 ≈ 14 GiB at
                                # canvas 256). Same train-crop contract and
                                # determinism as --cache_device; eval
                                # batches byte-identical to the streaming
                                # loader. Empty = off.
    "cache_host_budget_gb": 64.0,  # refuse disk stores above this
    "cache_host_reuse": 0,      # >1: train through the HBM shuffle-window
                                # loader (data/canvas_cache.py
                                # DeviceWindowLoader) — refresh batch/reuse
                                # window slots per step instead of shipping
                                # a canvas per sample, cutting per-step H2D
                                # bytes reuse-x. tf.data shuffle(buffer)
                                # semantics (uniform-with-replacement draws
                                # from the window; a full dataset pass every
                                # `reuse` epochs) instead of exactly-once-
                                # per-epoch — opt-in for hosts whose
                                # H2D link can't feed the chip. Eval is
                                # unaffected (exact HostCanvasLoader).
    "cache_window": 0,          # window size in canvases (0 = auto from
                                # the 1 GiB HBM window budget)
    "preempt_after_updates": 0,  # >0: trigger a graceful preemption after
                                # that many optimizer updates — the same
                                # save+exit path a real SIGTERM takes
                                # (training/preempt.py). For preemption
                                # drills and fixed-update smoke budgets.
    # Multi-host launch (parallel/distributed.py): same command on every
    # host; the mesh then spans all processes' devices and the loader
    # feeds each host its interleaved slice of the global batch.
    "coordinator": "",          # host:port of process 0 (torchrun-style)
    "num_processes": 0,
    "process_id": -1,
    "distributed": "",          # "auto" = bare jax.distributed.initialize()
                                # (TPU pods autodetect the topology)
}

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def _build_sources(cfg):
    if cfg["dataset"] == "synthetic":
        n = int(cfg["synthetic_size"])
        return (SyntheticSource(n=n, seed=cfg["seed"]),
                SyntheticSource(n=max(n // 4, 8), seed=cfg["seed"] + 100))
    return (Food101Source(cfg["data_root"], "train"),
            Food101Source(cfg["data_root"], "test"))


def _mean(values):
    return float(np.mean(values)) if values else 0.0


def train(config: Mapping[str, Any] | None = None) -> dict:
    cfg = {**DEFAULTS, **(config or {})}
    # Multi-host first: jax.distributed must come up before any backend
    # touch (mesh build, device queries). No-op for single-process runs.
    maybe_initialize_from_config(cfg)
    with RunLogger(cfg, name=cfg.get("run_name"),
                   use_wandb=cfg.get("use_wandb")) as logger:
        cfg = {**DEFAULTS, **logger.config}  # sweep agents may override keys
        return _train_impl(cfg, logger)


def _train_impl(cfg: dict, logger: RunLogger) -> dict:
    dtype = _DTYPES[cfg["dtype"]]
    scale = int(cfg["scale_factor"])
    crop = int(cfg["crop_size"])
    is_gan = cfg["loss_function"] == "gan"

    mesh = make_mesh()
    shard = data_sharding(mesh)
    n_dev = len(mesh.devices.flat)
    # Multi-host: every process runs the identical loop on global arrays;
    # only process 0 touches the filesystem (checkpoints, artifact logs) —
    # state is replicated, so one host's copy is the whole story.
    is_main = jax.process_index() == 0
    print(f"Running on {n_dev} device(s) {mesh.devices.flat[0].platform} | "
          f"{jax.process_count()} process(es) | Arch: {cfg['architecture']}")

    # --- data -----------------------------------------------------------
    train_source, test_source = _build_sources(cfg)
    idx = subset_indices(len(train_source), float(cfg["subset"]), cfg["seed"])
    if float(cfg["subset"]) < 1.0:
        print(f"PROXY MODE: Training on {len(idx)} images.")
    train_idx, val_idx = train_val_split(idx, 0.1, cfg["seed"] + 1)
    test_idx = subset_indices(len(test_source), float(cfg["subset"]), cfg["seed"])
    print(f"Dataset: Train={len(train_idx)} | Val={len(val_idx)} | "
          f"Test={len(test_idx)}")

    batch = int(cfg["batch_size"])
    accum = max(int(cfg.get("grad_accum", 1) or 1), 1)
    if accum > 1:
        if is_gan:
            raise ValueError(
                "--grad_accum applies to supervised losses only (the GAN "
                "branch alternates two optimizers on the reference's 5-step "
                "cadence; accumulate there by lowering d_update_every "
                "instead)")
        if batch % accum:
            raise ValueError(
                f"batch_size={batch} must be divisible by grad_accum={accum}")
        if (batch // accum) % n_dev:
            raise ValueError(
                f"microbatch {batch}/{accum}={batch // accum} must stay a "
                f"multiple of the {n_dev}-device mesh for an even shard")
    micro = batch // accum

    def _loader(source, indices, train):
        # Loaders drop the remainder (static shapes for jit); clamp the eval
        # batch so tiny subsets still yield at least one full batch. Keep it
        # a multiple of the mesh size so the shard is even. The train loader
        # yields microbatches (= batch/grad_accum); sample order and augment
        # RNG are position-keyed, so grouping k of them back into one update
        # sees exactly the samples the unsplit batch would.
        b = micro if train else min(batch, max(len(indices) // n_dev * n_dev, n_dev))
        if cfg.get("cache_device") and cfg.get("cache_host"):
            raise ValueError("--cache_device and --cache_host are exclusive "
                             "input paths; pick one")
        if cfg.get("cache_device"):
            return DeviceCacheLoader(
                source, indices, crop_size=crop, batch_size=b, train=train,
                sharding=shard, seed=cfg["seed"],
                canvas=int(cfg.get("cache_canvas") or 0) or None,
                max_cache_gb=float(cfg.get("cache_budget_gb") or 4.0))
        if cfg.get("cache_host"):
            reuse = int(cfg.get("cache_host_reuse") or 0)
            if train and reuse > 1:
                return DeviceWindowLoader(
                    source, indices, crop_size=crop, batch_size=b,
                    sharding=shard, seed=cfg["seed"],
                    cache_dir=str(cfg["cache_host"]), reuse=reuse,
                    canvas=int(cfg.get("cache_canvas") or 0) or None,
                    window=int(cfg.get("cache_window") or 0) or None,
                    max_store_gb=float(
                        cfg.get("cache_host_budget_gb") or 64.0))
            return HostCanvasLoader(
                source, indices, crop_size=crop, batch_size=b, train=train,
                sharding=shard, seed=cfg["seed"],
                cache_dir=str(cfg["cache_host"]),
                canvas=int(cfg.get("cache_canvas") or 0) or None,
                max_store_gb=float(cfg.get("cache_host_budget_gb") or 64.0))
        return SRDataLoader(source, indices, crop_size=crop, batch_size=b,
                            train=train, sharding=shard, seed=cfg["seed"])

    train_loader = _loader(train_source, train_idx, True)
    val_loader = _loader(train_source, val_idx, False)
    test_loader = _loader(test_source, test_idx, False)
    for name, loader in (("train", train_loader), ("val", val_loader),
                         ("test", test_loader)):
        if len(loader) == 0:
            raise ValueError(
                f"{name} loader yields zero batches: {len(loader.indices)} "
                f"samples can't fill a batch of {loader.batch_size} "
                f"(mesh of {n_dev} devices needs a multiple of {n_dev}). "
                f"Increase the dataset/subset or shrink batch_size."
            )
    if accum > 1 and len(train_loader) < accum:
        # without this, every microbatch hits the mid-group `continue` and
        # the run "succeeds" with zero optimizer updates ever applied
        raise ValueError(
            f"train loader yields {len(train_loader)} microbatches per epoch "
            f"but --grad_accum {accum} needs {accum} per update; no update "
            f"would ever run. Increase the dataset/subset or shrink "
            f"batch_size/grad_accum."
        )

    # --- model & states ---------------------------------------------------
    quantize = str(cfg.get("quantize") or "")
    if quantize and quantize != "qat":
        raise ValueError(
            f"--quantize {quantize!r} is inference-only (serve/predict/"
            f"visualize); training supports only 'qat' — int8 round/clip "
            f"has zero gradient, so the body would silently never learn."
        )
    model = get_model(cfg["architecture"], scale_factor=scale, dtype=dtype,
                      quantize=quantize,
                      phase_tail=bool(cfg.get("phase_tail")))
    rng = jax.random.PRNGKey(cfg["seed"])
    dummy = jnp.zeros((1, crop // scale, crop // scale, 3), jnp.float32)
    variables = model.init({"params": rng}, dummy, train=False)

    if cfg["pretrained_weights"]:
        loaded = load_checkpoint(cfg["pretrained_weights"])
        variables = dict(variables)
        variables["params"] = warm_start_params(
            variables["params"], loaded.get("params", loaded)
        )

    ema_decay = float(cfg["ema"]) or None
    g_tx = make_adam(float(cfg["lr"]), clip_norm=1.0 if is_gan else None)
    g_state_raw = SRTrainState.create(dict(variables), g_tx,
                                      ema=ema_decay is not None)

    first, last = FIRST_LAST[cfg["architecture"]]
    loss_name = "mae" if is_gan else cfg["loss_function"]
    criterion = get_loss_function(loss_name, weights_dir=cfg["weights_dir"])

    train_step = jax.jit(
        make_train_step(model, criterion, scale, first, last,
                        ema_decay=ema_decay), donate_argnums=0
    )
    if accum > 1:
        grad_step = jax.jit(make_grad_step(model, criterion, scale))
        # running on-device grad-pytree sum (optax ships the tree op)
        grad_add = jax.jit(optax.tree_utils.tree_add, donate_argnums=0)
        accum_apply = jax.jit(
            make_accum_apply(accum, first, last, ema_decay=ema_decay),
            donate_argnums=(0, 1),
        )
    eval_step = jax.jit(make_eval_step(model, criterion, scale))

    d_state_raw = d_step = g_gan_step = None
    if is_gan:
        d_model = Discriminator(dtype=dtype)
        d_vars = d_model.init(
            {"params": jax.random.PRNGKey(cfg["seed"] + 2)},
            jnp.zeros((1, crop, crop, 3), jnp.float32), train=False,
        )
        d_tx = make_adam(float(cfg["lr"]) * 0.1)
        d_state_raw = SRTrainState.create(dict(d_vars), d_tx)
        percep = get_loss_function("perceptual", weights_dir=cfg["weights_dir"])
        d_step = jax.jit(make_gan_d_step(model, d_model, scale),
                         donate_argnums=1)
        g_gan_step = jax.jit(
            make_gan_g_step(model, d_model, percep, scale, first, last,
                            ema_decay=ema_decay),
            donate_argnums=(0,),
        )

    metrics_calc = MetricsCalculator(weights_dir=cfg["weights_dir"])
    forward = jax.jit(make_forward(model))

    scheduler = ReduceLROnPlateau(float(cfg["lr"]), mode="max", factor=0.5,
                                  patience=2)
    stopper = EarlyStopping(patience=int(cfg["patience"]))
    ckpt_path = os.path.join(cfg["weights_dir"], f"{cfg['save_name']}_best")
    last_path = os.path.join(cfg["weights_dir"], f"{cfg['save_name']}_last")
    noise_rng = jax.random.PRNGKey(cfg["seed"] + 3)

    # --- preemption resume (full state incl. optimizer + host control) ----
    start_epoch, start_batch = 0, 0
    if cfg["resume"]:
        g_state_raw, d_state_raw, start_epoch, start_batch = \
            load_train_checkpoint(
                cfg["resume"], g_state_raw, scheduler, stopper, d_state_raw)
        # Restored leaves come back COMMITTED to local devices; device_put
        # of a committed array onto a global (multi-host) sharding is a
        # cross-host transfer, which the CPU/gloo backend rejects and TPU
        # DCN only supports with extra flags. Every process restored the
        # same bytes from disk, so hop through host numpy — replicate()
        # below then places uncommitted host data locally on each process
        # (found by tests/test_multihost.py's resume leg). Multi-process
        # only: a single-process resume has no placement issue, and the
        # hop is a D2H+H2D round trip of the full train state — multiple
        # seconds for RRDB-scale state through the ~40 MB/s tunnel
        # (ADVICE r4).
        if jax.process_count() > 1:
            g_state_raw = jax.tree_util.tree_map(np.asarray, g_state_raw)
            if d_state_raw is not None:
                d_state_raw = jax.tree_util.tree_map(np.asarray, d_state_raw)
        if start_batch % accum:
            raise ValueError(
                f"checkpoint resumes mid-epoch at microbatch {start_batch}, "
                f"not a multiple of --grad_accum {accum}: it was written "
                f"under a different accumulation grouping")
        print(f"Resumed from {cfg['resume']} at epoch {start_epoch}"
              + (f" batch {start_batch}" if start_batch else "")
              + f" (step {int(g_state_raw.step)}, lr {scheduler.lr})")
    g_state = replicate(g_state_raw, mesh)
    g_state = g_state.set_learning_rate(scheduler.lr)
    d_state = replicate(d_state_raw, mesh) if d_state_raw is not None else None
    del g_state_raw, d_state_raw

    # --- epoch loop --------------------------------------------------------
    # SIGTERM (TPU preemption notice) -> flag -> full-state save at the
    # next update boundary + clean exit; --resume re-enters the epoch at
    # that exact batch (training/preempt.py; tests/test_preempt.py proves
    # preempted+resumed == uninterrupted, leaf-exact)
    guard = PreemptionGuard()
    preempted = False
    updates_done = 0
    preempt_after = int(cfg.get("preempt_after_updates") or 0)
    with guard:  # epoch loop body keeps its indentation (minimal diff)
      for epoch in range(start_epoch, int(cfg["epochs"])):
        skip = start_batch if epoch == start_epoch else 0
        train_loader.set_epoch(epoch, start_batch=skip)  # exact replay
        d_metrics = {}
        bar = tqdm(train_loader, total=len(train_loader) - skip,
                   desc=f"Epoch {epoch + 1}/{cfg['epochs']}", leave=False)
        profile_steps = int(cfg["profile_steps"]) if epoch == start_epoch else 0
        profiling = False
        # device-level tracing (SURVEY §5 tracing row): a window of
        # profile_steps optimizer updates in the first epoch, starting only
        # after every jit in the update path has compiled (batch 0 for the
        # fused/GAN steps; grad_add at batch 1 and accum_apply at batch
        # accum-1 under --grad_accum, so the first full group ends first)
        trace_start = skip + (1 if accum == 1 else accum)
        trace_len = profile_steps * accum  # microbatches per logical update
        if profile_steps and trace_start >= len(train_loader):
            # too few microbatches to skip the warmup batches: trace from
            # the top rather than silently writing nothing (the trace will
            # include first-compile time — warn so nobody reads it as
            # steady-state)
            print(f"WARNING: epoch has {len(train_loader)} microbatches <= "
                  f"trace start {trace_start}; trace will include compile")
            trace_start = skip
        for batch_idx, hr_u8 in enumerate(bar, start=skip):
            if profile_steps and batch_idx == trace_start:
                jax.profiler.start_trace(cfg["profile_dir"])
                profiling = True
            if profiling and batch_idx == trace_start + trace_len:
                jax.profiler.stop_trace()
                profiling = False
                print(f"Wrote device trace to {cfg['profile_dir']}")
            if is_gan:
                if batch_idx % int(cfg["d_update_every"]) == 0:
                    # instance-noise key addressed by (epoch, batch) so a
                    # resumed run replays the exact same noise stream
                    sub = jax.random.fold_in(
                        jax.random.fold_in(noise_rng, epoch), batch_idx)
                    d_state, d_metrics = d_step(g_state, d_state, hr_u8, sub)
                g_state, d_state, metrics = g_gan_step(g_state, d_state, hr_u8)
                logical_idx = batch_idx
            elif accum == 1:
                g_state, metrics = train_step(g_state, hr_u8)
                logical_idx = batch_idx
            else:
                # --grad_accum: k loader microbatches -> one guarded update.
                # Mutable collections thread through the group; a trailing
                # partial group at epoch end is dropped (drop-remainder
                # semantics, same as the loaders').
                if batch_idx % accum == 0:
                    acc_extra, grads_sum, loss_sum = g_state.extra, None, None
                loss_i, g_i, acc_extra = grad_step(g_state.params, acc_extra,
                                                   hr_u8)
                grads_sum = g_i if grads_sum is None else grad_add(grads_sum, g_i)
                loss_sum = loss_i if loss_sum is None else loss_sum + loss_i
                if batch_idx % accum != accum - 1:
                    continue  # mid-group: no update, no metrics to log
                g_state, metrics = accum_apply(g_state, grads_sum, acc_extra,
                                               loss_sum)
                grads_sum = None
                logical_idx = batch_idx // accum

            if logical_idx % int(cfg["log_every"]) == 0:
                log_data = {k: float(v) for k, v in metrics.items()}
                log_data.update({k: float(v) for k, v in d_metrics.items()})
                logger.log(log_data)
                if log_data.get("nonfinite_steps", 0) or \
                        log_data.get("nonfinite_steps_D", 0):
                    print(f"WARNING: non-finite loss/grads at epoch {epoch} "
                          f"update {logical_idx}; update skipped (state kept)")
            # graceful preemption: only at update boundaries (state is
            # consistent here; mid-accum-group paths `continue` above)
            updates_done += 1
            if preempt_after and updates_done >= preempt_after:
                guard.request()
            # poll with the CUMULATIVE update count (0-based), not the
            # epoch-relative logical_idx: the multi-process OR-agree fires
            # every sync_every updates, and an epoch shorter than the
            # cadence would never reach an agreement boundary if the
            # counter reset each epoch (one host requested, nobody stopped)
            if guard.poll(updates_done - 1):
                preempted = True
                break
        if profiling:  # epoch shorter than the requested trace window
            jax.profiler.stop_trace()
            print(f"Wrote device trace to {cfg['profile_dir']}")
        if preempted:
            if is_main:
                save_train_checkpoint(g_state, epoch, scheduler, stopper,
                                      last_path, d_state=d_state,
                                      batch=batch_idx + 1)
            print(f"Preemption: full state saved mid-epoch {epoch} after "
                  f"batch {batch_idx} -> {last_path}; continue with "
                  f"--resume {last_path}")
            break

        # --- validation ----------------------------------------------------
        psnrs, losses = [], []
        for hr_u8 in val_loader:
            # with --ema, validation scores (and hence plateau/early-stop/
            # best-checkpoint decisions) use the EMA weights
            eval_params = (g_state.ema_params if ema_decay is not None
                           else g_state.params)
            out = eval_step(eval_params, g_state.extra, hr_u8)
            psnrs.append(float(out["psnr"]))
            losses.append(float(out["val_loss"]))
        avg_psnr, avg_val_loss = _mean(psnrs), _mean(losses)

        new_lr = scheduler.step(avg_psnr)
        g_state = g_state.set_learning_rate(new_lr)
        print(f"   -> Val PSNR: {avg_psnr:.2f} | Val Loss: {avg_val_loss:.4f} "
              f"| LR: {new_lr}")
        n_skipped = int(jax.device_get(g_state.skipped))  # exact cumulative
        if n_skipped:
            print(f"WARNING: {n_skipped} update(s) skipped so far by the "
                  f"non-finite guard")
        logger.log({"epoch": epoch, "val_psnr": avg_psnr,
                    "val_loss": avg_val_loss, "lr": new_lr,
                    "nonfinite_total": n_skipped})

        if stopper.update(avg_psnr) and is_main:
            best_params = (g_state.ema_params if ema_decay is not None
                           else g_state.params)
            save_checkpoint({"params": best_params, "extra": g_state.extra},
                            ckpt_path)
            logger.save(ckpt_path)
        # rolling full-state checkpoint for preemption resume (--resume)
        if is_main:
            save_train_checkpoint(g_state, epoch, scheduler, stopper,
                                  last_path, d_state=d_state)
        if stopper.should_stop:
            print("Early stopping triggered")
            break

    if preempted:
        # the grace window is for saving, not for a full test sweep; the
        # resumed run finishes the epoch and evaluates as usual
        logger.log({"preempted": 1})
        return {"preempted": True,
                "val_psnr": stopper.best if np.isfinite(stopper.best) else 0.0}

    # --- final test eval -----------------------------------------------------
    print("\nRunning Final Test Set Evaluation...")
    if jax.process_count() > 1:
        # all hosts wait for process 0's best-checkpoint write to finalize
        # before checking for it (weights_dir should be shared storage on a
        # pod); without the barrier a fast host could miss the file and
        # eval divergent params
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("food101_sr_final_eval")
    if os.path.exists(ckpt_path):
        best = load_checkpoint(
            ckpt_path, {"params": g_state.params, "extra": g_state.extra}
        )
        params, extra = replicate(best["params"], mesh), replicate(best["extra"], mesh)
    else:  # zero-epoch runs
        params, extra = g_state.params, g_state.extra

    test_metrics = {"psnr": [], "ssim": [], "lpips": [], "nlpd": []}
    for hr_u8 in tqdm(test_loader, total=len(test_loader),
                      desc="Testing", leave=False):
        lr_img, hr = prepare_batch(hr_u8, scale)
        sr = forward(params, extra, lr_img)
        batch_res = metrics_calc.compute(sr, hr)
        for k in test_metrics:
            test_metrics[k].append(batch_res[k])
    final = {k: _mean(v) for k, v in test_metrics.items()}
    print(f"Final Test Results: {final}")
    logger.log({f"test_{k}": v for k, v in final.items()})
    # Best validation PSNR (the sweep objective, reference
    # configs/sweep_tuning.yaml:3-5) rides along so model selection never
    # touches the test metrics; -inf only for zero-epoch runs.
    final["val_psnr"] = stopper.best if np.isfinite(stopper.best) else 0.0
    return final

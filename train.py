#!/usr/bin/env python
"""Training CLI — same public flags as the reference (reference
train.py:199-212) plus TPU-native extensions (dataset/dtype/scale/etc.;
see food101_sr_tpu.training.DEFAULTS). Works as a W&B sweep target
(``program: train.py`` in configs/sweep_*.yaml) and standalone.
"""
import argparse

from food101_sr_tpu.training import DEFAULTS, train


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    # Reference-compatible flags (same names and defaults).
    p.add_argument("--architecture", type=str, default="SRCNN")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=0.0004)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--loss_function", type=str, default="nlpd")
    p.add_argument("--subset", type=float, default=1.0)
    p.add_argument("--pretrained_weights", type=str, default="")
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--save_name", type=str, default="model_best")
    # TPU-native extensions.
    p.add_argument("--dataset", type=str, default=DEFAULTS["dataset"],
                   choices=["food101", "synthetic"])
    p.add_argument("--data_root", type=str, default=DEFAULTS["data_root"])
    p.add_argument("--crop_size", type=int, default=DEFAULTS["crop_size"])
    p.add_argument("--scale_factor", type=int, default=DEFAULTS["scale_factor"])
    p.add_argument("--dtype", type=str, default=DEFAULTS["dtype"],
                   choices=["float32", "bfloat16"])
    p.add_argument("--seed", type=int, default=DEFAULTS["seed"])
    p.add_argument("--weights_dir", type=str, default=DEFAULTS["weights_dir"])
    p.add_argument("--log_every", type=int, default=DEFAULTS["log_every"])
    p.add_argument("--run_name", type=str, default=None)
    p.add_argument("--resume", type=str, default=DEFAULTS["resume"],
                   help="path to a {save_name}_last full-state checkpoint "
                        "(params + optimizer + scheduler + epoch)")
    p.add_argument("--profile_steps", type=int,
                   default=DEFAULTS["profile_steps"],
                   help="trace this many train steps (first epoch) with "
                        "jax.profiler into --profile_dir")
    p.add_argument("--profile_dir", type=str, default=DEFAULTS["profile_dir"])
    p.add_argument("--preempt_after_updates", type=int,
                   default=DEFAULTS["preempt_after_updates"],
                   help="simulate a preemption: after N optimizer updates, "
                        "take the same graceful path a SIGTERM takes — "
                        "full-state save at the update boundary, clean "
                        "exit, mid-epoch --resume (preemption drills / "
                        "fixed-update smoke budgets). 0 = off; real "
                        "SIGTERMs are always handled")
    p.add_argument("--ema", type=float, default=DEFAULTS["ema"],
                   help="EMA decay for generator params (e.g. 0.999); EMA "
                        "weights are validated and checkpointed. 0 = off")
    p.add_argument("--grad_accum", type=int, default=DEFAULTS["grad_accum"],
                   help="accumulate gradients over k microbatches of "
                        "batch_size/k per optimizer update — 1/k the "
                        "activation memory. Exactly the unsplit-batch math "
                        "for BN-free models (SRCNN/AttentionSR: losses are "
                        "batch means; microbatch sample order/RNG is "
                        "position-keyed); RESNET's train-mode BatchNorm "
                        "normalizes each microbatch by its own statistics, "
                        "so grads/running stats differ from the big-batch "
                        "update (sequential small-batch BN semantics). "
                        "Supervised losses only")
    p.add_argument("--quantize", type=str, default=DEFAULTS["quantize"],
                   choices=["", "qat"],
                   help="'qat': quantization-aware training — body convs "
                        "run on fake-quantized (int8-grid, STE) weights/"
                        "activations so the float checkpoint fine-tunes "
                        "onto the grid the int8 serving path uses "
                        "(serve/predict --quantize int8). RESNET/"
                        "AttentionSR only")
    p.add_argument("--phase_tail", action="store_true",
                   default=DEFAULTS["phase_tail"],
                   help="run the upsample tail fused in pixel-shuffle phase "
                        "space inside the train step (exact same math/"
                        "params/checkpoints; gradients equal to float "
                        "noise): measured +8.5%% train throughput on v5e. "
                        "DEFAULT ON — torch-reference gradient + SGD-"
                        "trajectory parity is recorded with this tail "
                        "(tests/test_training_parity_torch.py)")
    p.add_argument("--no_phase_tail", action="store_false",
                   dest="phase_tail",
                   help="train with the materialized (standard) upsample "
                        "tail instead")
    p.add_argument("--cache_device", action="store_true",
                   default=DEFAULTS["cache_device"],
                   help="cache the dataset in device memory as uint8 "
                        "canvases and draw batches on-device (gather + "
                        "random crop + flip in one jit) — zero host input "
                        "work per step. Sized for the sweep/subset "
                        "workflow (subset 0.1 of Food-101 ~ 1.3 GiB HBM); "
                        "train crops come from the central canvas square "
                        "rather than the full image (eval batches stay "
                        "byte-identical to the host loader). "
                        "Single-process only")
    p.add_argument("--cache_canvas", type=int,
                   default=DEFAULTS["cache_canvas"],
                   help="side of the cached square for train loaders under "
                        "--cache_device (0 = auto: max(256, crop_size)); "
                        "bigger = more crop diversity, more HBM")
    p.add_argument("--cache_budget_gb", type=float,
                   default=DEFAULTS["cache_budget_gb"],
                   help="refuse a --cache_device cache above this many GiB")
    p.add_argument("--cache_host", type=str, default=DEFAULTS["cache_host"],
                   metavar="DIR",
                   help="disk-staged canvas store: decode the dataset ONCE "
                        "into a memmapped uint8 store under DIR "
                        "(content-keyed, reused across runs) and train "
                        "decode-free — canvases stream to HBM and the "
                        "crop/flip happens on device, so per-step host "
                        "work is a block memcpy. Any dataset size that "
                        "fits on disk (full Food-101 ~ 14 GiB at canvas "
                        "256). Same train-crop contract/determinism as "
                        "--cache_device; eval batches byte-identical to "
                        "the streaming loader")
    p.add_argument("--cache_host_budget_gb", type=float,
                   default=DEFAULTS["cache_host_budget_gb"],
                   help="refuse a --cache_host store above this many GiB")
    p.add_argument("--cache_host_reuse", type=int,
                   default=DEFAULTS["cache_host_reuse"], metavar="K",
                   help="with --cache_host: K>1 trains through an HBM "
                        "shuffle window — draw batches on device from a "
                        "resident canvas window and refresh only batch/K "
                        "slots per step, cutting per-step H2D bytes Kx "
                        "(for hosts whose H2D link can't feed the chip). "
                        "tf.data shuffle-buffer semantics: uniform-with-"
                        "replacement draws, full dataset pass every K "
                        "epochs, deterministic in (seed, epoch, step); "
                        "eval batches are unaffected")
    p.add_argument("--cache_window", type=int,
                   default=DEFAULTS["cache_window"], metavar="N",
                   help="shuffle-window size in canvases for "
                        "--cache_host_reuse (0 = auto from a 1 GiB HBM "
                        "budget)")
    p.add_argument("--use_wandb", type=lambda s: s.lower() in ("1", "true"),
                   default=DEFAULTS["use_wandb"], nargs="?", const=True,
                   help="force W&B on/off (default: auto — on iff wandb is "
                        "importable; JSONL fallback otherwise)")
    # Multi-host launch (run the same command on every host of the slice).
    p.add_argument("--coordinator", type=str, default=DEFAULTS["coordinator"],
                   help="host:port of process 0 for jax.distributed "
                        "(with --num_processes/--process_id; or set "
                        "JAX_COORDINATOR_ADDRESS etc.)")
    p.add_argument("--num_processes", type=int,
                   default=DEFAULTS["num_processes"])
    p.add_argument("--process_id", type=int, default=DEFAULTS["process_id"])
    p.add_argument("--distributed", type=str, default=DEFAULTS["distributed"],
                   choices=["", "auto"],
                   help="'auto': bare jax.distributed.initialize() — TPU "
                        "pods autodetect coordinator/count/id, so a pod "
                        "launch needs no per-host flags")
    return p.parse_args()


if __name__ == "__main__":
    train(config=vars(parse_args()))

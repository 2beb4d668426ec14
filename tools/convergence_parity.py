#!/usr/bin/env python
"""Convergence-level training parity: the reference's torch loop vs ours.

The strongest quality-parity statement available in this image: train the
ACTUAL reference model with a torch harness that mirrors the reference's
training control flow line by line (reference train.py:21-197 — Adam
betas=(0.5, 0.999), ReduceLROnPlateau(max, 0.5, patience=2) on val PSNR,
best-checkpoint-by-val-PSNR, early stop, final test eval with the best
weights reloaded) on a Food-101-layout JPEG tree, then run our production
``train()`` on the SAME tree with the SAME hyperparameters, and compare
final test PSNR. Several of our seeds give a run-to-run variance band the
torch number must land inside (augmentation RNG differs across frameworks,
so bit-identical trajectories are out of scope — that horizon is covered
by tests/test_training_parity_torch.py's shared-batch gradient and 20-step
SGD-trajectory parity).

Deviations from the reference harness, applied to BOTH sides:
- crop_size is a flag (reference hardcodes 200, train.py:27) so the torch
  side fits a 1-core CPU budget;
- val metric is PSNR only (torchmetrics/lpips are absent here; our PSNR is
  golden-tested against torchmetrics semantics in tests).
- the torch dataset mirrors reference src/dataset.py:27-41 with PIL +
  ``F.interpolate(antialias=True)`` (what torchvision's tensor Resize
  calls internally); our data contract tests pin the same semantics;
- validation uses the deterministic eval transform on both sides (the
  reference random-crops its val split through the train transform,
  train.py:37 — our loop center-crops; selection noise would otherwise
  differ for reasons unrelated to the training math).

    python tools/make_fake_food101.py /tmp/fakefood --train 400 --test 64
    python tools/convergence_parity.py --data_root /tmp/fakefood \
        --architecture SRCNN --loss mse --epochs 8 --seeds 2

Writes runs/convergence_parity.json and prints a verdict line.
"""
from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.reference_import import load_reference_losses, load_reference_models  # noqa: E402


# --------------------------------------------------------------------------
# torch side — reference control flow, PIL data, core-torch only
# --------------------------------------------------------------------------

def _torch_dataset(root, split, crop, scale, train):
    """(lr, hr) float tensors mirroring reference src/dataset.py semantics:
    resize-if-small (bicubic), RandomCrop+HFlip (train) / CenterCrop (eval),
    ToTensor, then antialiased bicubic x1/scale on the tensor."""
    import torch
    import torch.nn.functional as F
    from PIL import Image

    from food101_sr_tpu.data.sources import Food101Source

    src = Food101Source(root, split)

    class DS(torch.utils.data.Dataset):
        def __len__(self):
            return len(src)

        def __getitem__(self, i):
            img = src[i]
            w, h = img.size
            if w < crop or h < crop:  # shortest side -> crop, keep aspect
                if w <= h:
                    nw, nh = crop, max(crop, round(crop * h / w))
                else:
                    nw, nh = max(crop, round(crop * w / h)), crop
                img = img.resize((nw, nh), Image.BICUBIC)
                w, h = img.size
            if train:
                top = random.randint(0, h - crop)
                left = random.randint(0, w - crop)
            else:
                top, left = (h - crop) // 2, (w - crop) // 2
            img = img.crop((left, top, left + crop, top + crop))
            hr = torch.from_numpy(
                np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0)
            if train and random.random() < 0.5:
                hr = torch.flip(hr, dims=(2,))
            lr = F.interpolate(hr[None], size=(crop // scale, crop // scale),
                               mode="bicubic", antialias=True,
                               align_corners=False)[0].clamp(0, 1)
            return lr, hr

    return DS()


def _psnr(sr, hr):
    """torchmetrics PeakSignalNoiseRatio(data_range=1.0) semantics: one MSE
    over the whole (clamped) batch tensor."""
    import torch
    mse = torch.mean((sr.clamp(0, 1) - hr.clamp(0, 1)) ** 2)
    return float(10 * torch.log10(1.0 / mse))


def train_reference_torch(args):
    """The reference hot loop (reference train.py:72-197), reference model
    classes, on CPU. Returns {test_psnr, val_psnr, epochs_ran, curve}."""
    import torch
    from torch.utils.data import DataLoader, random_split

    ref_models = load_reference_models()
    ref_loss = load_reference_losses()

    torch.manual_seed(args.torch_seed)
    random.seed(args.torch_seed)
    torch.set_num_threads(max(1, os.cpu_count() or 1))

    full = _torch_dataset(args.data_root, "train", args.crop_size,
                          args.scale, train=True)
    train_len = int(0.9 * len(full))
    train_ds, val_ds = random_split(full, [train_len, len(full) - train_len])
    # eval determinism: validation through the eval transform, not train's
    val_eval = _torch_dataset(args.data_root, "train", args.crop_size,
                              args.scale, train=False)
    val_ds = torch.utils.data.Subset(val_eval, list(val_ds.indices))
    test_ds = _torch_dataset(args.data_root, "test", args.crop_size,
                             args.scale, train=False)

    mk = lambda ds, sh: DataLoader(ds, batch_size=args.batch_size,
                                   shuffle=sh, num_workers=0)
    train_loader, val_loader = mk(train_ds, True), mk(val_ds, False)
    test_loader = mk(test_ds, False)
    print(f"[torch] Train={len(train_ds)} Val={len(val_ds)} "
          f"Test={len(test_ds)}")

    model = ref_models.get_model(args.architecture, scale_factor=args.scale,
                                 device="cpu")
    if args.loss == "nlpd":
        criterion = ref_loss.NLPDLoss(device="cpu", channels=3)
    elif args.loss == "mae":
        criterion = torch.nn.L1Loss()
    else:
        criterion = torch.nn.MSELoss()
    opt = torch.optim.Adam(model.parameters(), lr=args.lr, betas=(0.5, 0.999))
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=0.5, patience=2)

    best_psnr, best_state, patience_counter, curve = 0.0, None, 0, []
    t0 = time.time()
    for epoch in range(args.epochs):
        model.train()
        for lr_imgs, hr_imgs in train_loader:
            opt.zero_grad()
            loss = criterion(model(lr_imgs), hr_imgs)
            loss.backward()
            opt.step()
        model.eval()
        with torch.no_grad():
            vals = [_psnr(model(lr), hr) for lr, hr in val_loader]
        avg_psnr = float(np.mean(vals))
        sched.step(avg_psnr)
        curve.append(avg_psnr)
        print(f"[torch] ep {epoch + 1}/{args.epochs} val PSNR "
              f"{avg_psnr:.2f} lr {opt.param_groups[0]['lr']:g} "
              f"({time.time() - t0:.0f}s)")
        if avg_psnr > best_psnr:
            best_psnr, patience_counter = avg_psnr, 0
            best_state = {k: v.clone() for k, v in model.state_dict().items()}
        else:
            patience_counter += 1
        if patience_counter >= args.patience:
            print("[torch] early stop")
            break

    if best_state is not None:
        model.load_state_dict(best_state)
    model.eval()
    with torch.no_grad():
        tests = [_psnr(model(lr), hr) for lr, hr in test_loader]
    test_psnr = float(np.mean(tests))
    print(f"[torch] final test PSNR {test_psnr:.3f} (best val {best_psnr:.3f})")
    return {"test_psnr": test_psnr, "val_psnr": best_psnr,
            "epochs_ran": len(curve), "curve": curve}


# --------------------------------------------------------------------------
# our side — the production train()
# --------------------------------------------------------------------------

def _check_resume_config(args, tag):
    """Refuse to resume a checkpoint recorded under different hyperparams.

    The checkpoint tag only encodes arch/loss/seed, so an interrupted leg
    with (say) a different lr or crop would silently resume into THIS leg's
    summary — the same mislabeled-verdict hazard --skip_torch guards
    against. utils/logging.py appends one _config line per run under the
    same tag; the rolling checkpoint belongs to the most recent run that
    actually TRAINED, i.e. the last _config line followed by at least one
    metric row (a restart that died at startup appends a bare _config line
    without touching the checkpoint). Unreadable/absent logs warn and
    proceed (the documented contract) rather than crash."""
    run_dir = os.environ.get("FOOD101_SR_RUN_DIR", "runs")
    log_path = os.path.join(run_dir, tag, "log.jsonl")
    prior, candidate = {}, None
    try:
        with open(log_path) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except ValueError:
                    continue
                if "_config" in row:
                    candidate = row["_config"]
                elif candidate is not None:
                    prior = candidate
    except OSError:
        pass
    if not prior:
        print(f"[ours] WARNING: no usable run log at {log_path}; cannot "
              f"verify the checkpoint's config matches — resuming anyway")
        return
    now = {"architecture": args.architecture, "loss_function": args.loss,
           "epochs": args.epochs, "batch_size": args.batch_size,
           "lr": args.lr, "crop_size": args.crop_size,
           "scale_factor": args.scale, "patience": args.patience,
           "data_root": args.data_root}
    drift = {k: (prior.get(k), v) for k, v in now.items()
             if k in prior and prior[k] != v}
    if drift:
        sys.exit(f"--resume_ours: checkpoint for {tag} was trained with a "
                 f"different config (prior vs now): {drift}. Delete "
                 f"weights/{tag}_last or drop --resume_ours to restart.")


def train_ours(args, seed):
    from food101_sr_tpu.training import train

    tag = f"convpar_{args.architecture}_{args.loss}_s{seed}"
    resume = ""
    if args.resume_ours:
        last = os.path.join(args.weights_dir, f"{tag}_last")
        if os.path.isdir(last):
            _check_resume_config(args, tag)
            resume = os.path.abspath(last)
            print(f"[ours s{seed}] resuming from {resume}")
    final = train(config={
        "resume": resume,
        "architecture": args.architecture,
        "batch_size": args.batch_size,
        "lr": args.lr,
        "epochs": args.epochs,
        "loss_function": args.loss,
        "subset": 1.0,
        "patience": args.patience,
        "dataset": "food101",
        "data_root": args.data_root,
        "crop_size": args.crop_size,
        "scale_factor": args.scale,
        "seed": seed,
        "weights_dir": args.weights_dir,
        "save_name": tag,
        "run_name": tag,
        "use_wandb": False,
    })
    return {"test_psnr": float(final["psnr"]),
            "val_psnr": float(final["val_psnr"]), "seed": seed}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--architecture", default="SRCNN")
    p.add_argument("--loss", default="mse", choices=["mse", "mae", "nlpd"])
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=6e-4)
    p.add_argument("--crop_size", type=int, default=96)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--seeds", type=int, default=2,
                   help="independent runs of OUR loop (variance band)")
    p.add_argument("--torch_seed", type=int, default=0)
    p.add_argument("--tolerance", type=float, default=0.25,
                   help="max |torch - ours_mean| test-PSNR gap in dB beyond "
                        "the seed band (converged nets agree much tighter; "
                        "short budgets wiggle)")
    p.add_argument("--skip_torch", action="store_true",
                   help="reuse the torch result from --out")
    p.add_argument("--resume_ours", action="store_true",
                   help="resume interrupted ours-side legs from their "
                        "rolling <tag>_last checkpoints (exact-replay "
                        "resume; tests/test_resume.py pins resumed == "
                        "uninterrupted)")
    p.add_argument("--extend_seeds", action="store_true",
                   help="widen the seed band without retraining: reuse the "
                        "per-seed results already recorded in --out (same "
                        "config, guarded like --skip_torch) and train only "
                        "the seeds the record lacks; requires --skip_torch")
    p.add_argument("--weights_dir", default="weights",
                   help="where our side's checkpoints land (legs are named "
                        "convpar_<arch>_<loss>_s<seed> so legs don't "
                        "clobber each other)")
    p.add_argument("--cpu", action="store_true",
                   help="run OUR side on CPU (the axon TPU plugin ignores "
                        "the JAX_PLATFORMS env var; only the config route "
                        "works — tests and TPU-less hosts need this)")
    p.add_argument("--out", default="runs/convergence_parity.json")
    args = p.parse_args()

    if args.extend_seeds and not args.skip_torch:
        p.error("--extend_seeds requires --skip_torch (reused seeds are "
                "only comparable against the recorded torch leg)")
    if args.cpu:
        import food101_sr_tpu

        food101_sr_tpu.use_cpu_backend()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    prior = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)

    cfg_keys = ("architecture", "loss", "epochs", "batch_size", "lr",
                "crop_size", "scale", "patience")
    cfg_now = {k: getattr(args, k) for k in cfg_keys}
    if args.skip_torch and "torch" in prior:
        # a stale record from a different leg would silently produce a
        # mislabeled verdict (e.g. RESNET ours vs an SRCNN torch number)
        cfg_prior = prior.get("config", {})
        if cfg_prior != cfg_now:
            drift = {k: (cfg_prior.get(k), cfg_now[k]) for k in cfg_keys
                     if cfg_prior.get(k) != cfg_now[k]}
            p.error(f"--skip_torch: {args.out} was recorded with a "
                    f"different config (prior vs now): {drift}")
        ref = prior["torch"]
        print(f"[torch] reusing {args.out}: test PSNR {ref['test_psnr']:.3f}")
    else:
        ref = train_reference_torch(args)

    prior_ours = {}
    if args.extend_seeds:
        # seed results are only reusable against the same torch leg/config;
        # the --skip_torch config guard above already enforced both
        prior_ours = {o["seed"]: o for o in prior.get("ours", [])}
        if prior_ours:
            print(f"[ours] reusing seeds {sorted(prior_ours)} from {args.out}")
    ours = [prior_ours.get(seed) or train_ours(args, seed)
            for seed in range(args.seeds)]
    if not ours:
        # --seeds 0: torch-only leg (e.g. a second --torch_seed to measure
        # the reference loop's own seed variance); record it with no verdict
        summary = {"config": cfg_now, "torch": ref,
                   "torch_seed": args.torch_seed}
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)
        print(f"\ntorch-only leg [{args.architecture}/{args.loss}] "
              f"seed {args.torch_seed}: test PSNR {ref['test_psnr']:.3f} dB "
              f"-> {args.out} (no verdict)")
        return
    ours_test = [o["test_psnr"] for o in ours]
    mean_ours = float(np.mean(ours_test))
    band = float(max(ours_test) - min(ours_test)) if len(ours_test) > 1 else 0.0
    gap_signed = mean_ours - ref["test_psnr"]  # + = ours ahead of torch
    gap = abs(gap_signed)
    within = gap <= args.tolerance + band / 2
    # The goal is "match or beat" the reference: only a torch lead beyond
    # tolerance + half the seed band is a parity failure. An ours lead beyond
    # that margin is recorded as its own verdict so the direction is explicit.
    if within:
        verdict = "indistinguishable"
    elif gap_signed > 0:
        verdict = "ours_ahead"
    else:
        verdict = "torch_ahead"
    ok = verdict != "torch_ahead"
    summary = {
        "config": cfg_now,
        "torch": ref,
        "ours": ours,
        "ours_mean_test_psnr": mean_ours,
        "ours_seed_band_db": band,
        "gap_db": gap,
        "gap_signed_db": gap_signed,
        "tolerance_db": args.tolerance,
        "verdict": verdict,
        "ok": ok,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"\nconvergence parity [{args.architecture}/{args.loss}]: "
          f"torch {ref['test_psnr']:.3f} dB vs ours {mean_ours:.3f} dB "
          f"(seed band {band:.3f}) -> gap {gap_signed:+.3f} dB "
          f"[{verdict}] {'OK' if ok else 'FAIL'} (tol {args.tolerance})")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

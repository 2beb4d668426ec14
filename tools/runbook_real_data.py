#!/usr/bin/env python
"""Real-Food-101 readiness check + the runbook's canonical command list.

The reference trains on the real Food-101 dataset, provisioned by
torchvision (reference src/dataset.py:10) and versioned via DVC
(`data.dvc`). This image has zero network egress, so the real 10 GB tree
cannot exist here — RUNBOOK.md documents how to provision it on a real
TPU-VM host, and this tool is the first command in that runbook:

    python tools/runbook_real_data.py --data_root /data/food101

It validates the on-disk layout (the exact one `Food101Source` reads),
samples the production per-sample load path (native JPEG region decode +
crop) to measure THIS host's input throughput, and turns that into a
host-CPU sizing verdict: the measured chip train rate is ~1,234 img/s
(bench.py --train with the default fused phase tail, TPU v5e), one
2.1 GHz core feeds ~459 img/s of 512px JPEG → 200px crops
(bench.py --input), so a 1-core host is input-bound at ~0.4x chip rate
while 4+ vCPUs feed the chip at full rate (the loader's thread pool +
GIL-released native decode scale linearly with cores). Hosts that can't
be sized up have two measured escape hatches: --cache_device (subsets
that fit HBM) and --cache_host + --cache_host_reuse (decode-once disk
canvas store + HBM shuffle window — full chip rate from a 1-core host).

--print_commands emits the exact, copy-pasteable commands for the rest of
the runbook (smoke train → winners → GAN fine-tune → report → int8
quality table). tests/test_runbook.py executes this checker against a
generated Food-101-layout tree and pins every emitted command verbatim
against RUNBOOK.md, with flag-level drift checks against each CLI.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Measured on TPU v5e + the 1-core bench host (README §Measured performance).
CHIP_TRAIN_IPS = 1234.0    # bench.py --train: AttentionSR+NLPD+Adam, batch 128, phase tail
HOST_DECODE_IPS_PER_CORE = 459.0  # bench.py --input: 512px JPEG -> 200px crop
FOOD101_TRAIN_IMAGES = 75_750     # the real dataset's split sizes
FOOD101_TEST_IMAGES = 25_250


def check_layout(data_root: str) -> tuple[list[str], int, int]:
    """Problems (empty = OK) + split sizes for a Food-101-layout tree."""
    problems: list[str] = []
    base = os.path.join(data_root, "food-101")
    images = os.path.join(base, "images")
    if not os.path.isdir(images):
        problems.append(f"missing images dir: {images}")
    counts = {}
    for split in ("train", "test"):
        meta_txt = os.path.join(base, "meta", f"{split}.txt")
        meta_json = os.path.join(base, "meta", f"{split}.json")
        if os.path.exists(meta_txt):
            with open(meta_txt) as f:
                rel = [ln.strip() for ln in f if ln.strip()]
        elif os.path.exists(meta_json):
            with open(meta_json) as f:
                rel = [p for paths in json.load(f).values() for p in paths]
        else:
            problems.append(f"missing split list: {meta_txt} (or .json)")
            counts[split] = 0
            continue
        counts[split] = len(rel)
        if not rel:
            problems.append(f"{split} split list is empty")
            continue
        # spot-check a deterministic sample of paths actually resolve
        rng = np.random.default_rng(0)
        for j in rng.choice(len(rel), size=min(16, len(rel)), replace=False):
            p = os.path.join(images, rel[int(j)] + ".jpg")
            if not os.path.exists(p):
                problems.append(f"listed image missing on disk: {p}")
                break
    return problems, counts.get("train", 0), counts.get("test", 0)


def sample_throughput(data_root: str, n: int, crop: int) -> tuple[float, bool]:
    """img/s of the production load path on THIS host + native-decode flag."""
    from food101_sr_tpu.data.pipeline import load_sample
    from food101_sr_tpu.data.sources import Food101Source
    from food101_sr_tpu.native import jpeg_available

    src = Food101Source(root=data_root, split="train")
    rng = np.random.default_rng(0)
    idx = np.random.default_rng(1).choice(len(src), size=min(n, len(src)),
                                          replace=False)
    for i in idx[:2]:  # warm page cache / lazy native build
        load_sample(src, int(i), crop, train=True, rng=rng)
    t0 = time.perf_counter()
    for i in idx:
        load_sample(src, int(i), crop, train=True, rng=rng)
    dt = time.perf_counter() - t0
    return len(idx) / dt, jpeg_available()


def runbook_commands(data_root: str) -> list[tuple[str, str]]:
    """The runbook's exact commands, in order. RUNBOOK.md quotes these
    verbatim (pinned by tests/test_runbook.py — edit both together)."""
    d = data_root
    return [
        ("readiness check (layout + host throughput + sizing)",
         f"python tools/runbook_real_data.py --data_root {d}"),
        ("2-minute smoke: production loop on 1% of the real data",
         f"python train.py --dataset food101 --data_root {d} "
         f"--architecture SRCNN --loss_function mse --epochs 1 "
         f"--subset 0.01 --batch_size 16 --save_name smoke_real"),
        ("sweep winners to convergence (plateau LR + early stop)",
         f"python tools/run_winners.py --data_root {d} --epochs 40"),
        ("GAN fine-tune from the AttentionSR winner (needs the pretrained "
         "VGG19 npz from the weights turnkey — see RUNBOOK.md step 0)",
         f"python train.py --dataset food101 --data_root {d} "
         f"--architecture AttentionSR --loss_function gan --lr 0.0001 "
         f"--epochs 10 --batch_size 16 --crop_size 200 "
         f"--pretrained_weights weights/winner_attentionsr_best "
         f"--save_name winner_attentionsr_gan"),
        ("4-model comparison report + latency table + metrics",
         f"python visualize.py --dataset food101 --data_root {d} "
         f"--num_examples 4 --metrics"),
        ("f32-vs-int8 serving quality table on real data",
         f"python tools/quant_quality.py "
         f"--weights ATTENTIONSR=weights/winner_attentionsr_best "
         f"--weights RESNET=weights/winner_resnet_best "
         f"--data_root {d} --num_examples 64 --modes f32,int8 "
         f"--out runs/quant_quality.json"),
    ]


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--data_root", required=True,
                    help="dir containing food-101/{images,meta} (the layout "
                         "torchvision's datasets.Food101 manages)")
    ap.add_argument("--sample", type=int, default=64,
                    help="images to sample for the throughput measurement")
    ap.add_argument("--crop", type=int, default=200,
                    help="HR crop size for the throughput sample (the "
                         "winner configs train at 200)")
    ap.add_argument("--print_commands", action="store_true",
                    help="emit the runbook's exact commands and exit")
    args = ap.parse_args()

    if args.print_commands:
        for title, cmd in runbook_commands(args.data_root):
            print(f"# {title}\n{cmd}\n")
        return

    problems, n_train, n_test = check_layout(args.data_root)
    for pr in problems:
        print(f"PROBLEM: {pr}")
    if problems:
        sys.exit(1)
    print(f"layout OK: {n_train} train / {n_test} test images listed")
    if (n_train, n_test) != (FOOD101_TRAIN_IMAGES, FOOD101_TEST_IMAGES):
        print(f"note: split sizes differ from the real Food-101 "
              f"({FOOD101_TRAIN_IMAGES}/{FOOD101_TEST_IMAGES}) — fine for "
              f"a subset or generated tree, unexpected for the real one")

    ips, native = sample_throughput(args.data_root, args.sample, args.crop)
    ncores = os.cpu_count() or 1
    host_rate = ips * ncores  # loader thread pool scales ~linearly
    mode = ("native region decode" if native
            else "PIL fallback: native build deps missing, expect ~2x slower")
    print(f"host load path: {ips:.0f} img/s/core ({mode}), "
          f"{ncores} cores -> ~{host_rate:.0f} img/s")
    need = int(np.ceil(CHIP_TRAIN_IPS / max(ips, 1.0)))
    bound = min(host_rate, CHIP_TRAIN_IPS)
    epoch_s = n_train / bound if bound else float("inf")
    print(f"sizing vs 1 TPU v5e chip ({CHIP_TRAIN_IPS:.0f} img/s train): "
          f"{'INPUT-BOUND' if host_rate < CHIP_TRAIN_IPS else 'chip-bound'} "
          f"on this host; ~{need} cores at this per-core rate feed the "
          f"chip at full rate")
    if host_rate < CHIP_TRAIN_IPS:
        print("  input-bound escape hatches: --cache_device (subsets that "
              "fit HBM) or --cache_host DIR --cache_host_reuse 8 (any "
              "dataset; decode-once disk store + HBM shuffle window — "
              "measured full chip rate from a 1-core host, RUNBOOK §1)")
    print(f"expected epoch wall-clock at {n_train} images: ~{epoch_s:.0f}s "
          f"({epoch_s / 60:.1f} min); real Food-101 "
          f"({FOOD101_TRAIN_IMAGES}): "
          f"~{FOOD101_TRAIN_IMAGES / bound / 60:.1f} min")
    print("\nnext commands (also in RUNBOOK.md):")
    for title, cmd in runbook_commands(args.data_root):
        print(f"# {title}\n{cmd}\n")


if __name__ == "__main__":
    main()

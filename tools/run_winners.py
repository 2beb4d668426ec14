#!/usr/bin/env python
"""Train the reference's three sweep-winner configs to convergence on a
Food-101-layout tree and record the quality pipeline end-to-end.

The reference's recorded winners (reference configs/sweep_winners.txt:1-11):
    RESNET      bs 16, loss nlpd, lr 4e-4
    AttentionSR bs 16, loss mae,  lr 1e-4
    SRCNN       bs 16, loss nlpd, lr 6e-4

Run on-chip against a tree from tools/make_fake_food101.py (real Food-101
is environment-blocked; same code paths either way):

    python tools/make_fake_food101.py /tmp/fakefood --train 2000 --test 200
    python tools/run_winners.py --data_root /tmp/fakefood --epochs 40

Each run uses the production train() (plateau LR, early stop, best-val
checkpointing); per-epoch val curves land in runs/<run>/log.jsonl, best
checkpoints in weights/winner_<arch>_best, and a summary table in
runs/winners_summary.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from food101_sr_tpu.training import train  # noqa: E402

WINNERS = [
    {"architecture": "RESNET", "batch_size": 16, "loss_function": "nlpd",
     "lr": 4e-4},
    {"architecture": "AttentionSR", "batch_size": 16, "loss_function": "mae",
     "lr": 1e-4},
    {"architecture": "SRCNN", "batch_size": 16, "loss_function": "nlpd",
     "lr": 6e-4},
]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--dataset", default="food101")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--subset", type=float, default=1.0)
    p.add_argument("--only", default=None,
                   help="run a single architecture by name")
    p.add_argument("--out", default="runs/winners_summary.json")
    args = p.parse_args()

    selected = [cfg for cfg in WINNERS
                if not args.only or cfg["architecture"] == args.only]
    if not selected:
        names = ", ".join(c["architecture"] for c in WINNERS)
        p.error(f"--only {args.only!r} matches no winner config "
                f"(exact names: {names})")

    results = {}
    for cfg in selected:
        arch = cfg["architecture"]
        run = {
            **cfg,
            "dataset": args.dataset,
            "data_root": args.data_root,
            "epochs": args.epochs,
            "patience": args.patience,
            "subset": args.subset,
            "save_name": f"winner_{arch.lower()}",
            "run_name": f"winner_{arch.lower()}",
        }
        print(f"\n===== sweep winner: {run} =====", flush=True)
        final = train(run)
        results[arch] = {"config": cfg, "final": final}
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"{arch}: {final}")
    print(f"\nsummary -> {args.out}")


if __name__ == "__main__":
    main()

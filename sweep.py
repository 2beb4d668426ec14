#!/usr/bin/env python
"""Sweep runner.

With wandb installed, use the standard flow (the YAMLs are drop-in):
    wandb sweep configs/sweep_srcnn.yaml && wandb agent <sweep-id>

Without wandb (hermetic TPU images), this script runs a local random search
over the same YAML search space, maximizing val_psnr, and records winners —
replacing the reference's externally-orchestrated sweeps
(reference configs/sweep_*.yaml + sweep_winners.txt).
"""
import argparse
import json
import os

import numpy as np
import yaml

from food101_sr_tpu.training import train


def sample_config(space: dict, rng: np.random.Generator) -> dict:
    cfg = {}
    for key, spec in space.items():
        if "value" in spec:
            cfg[key] = spec["value"]
        elif "values" in spec:
            cfg[key] = spec["values"][int(rng.integers(len(spec["values"])))]
        elif "min" in spec and "max" in spec:
            # log-uniform for lr-like ranges
            lo, hi = float(spec["min"]), float(spec["max"])
            cfg[key] = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
        else:
            raise ValueError(f"Unsupported sweep spec for {key}: {spec}")
    return cfg


def run_sweep(sweep_yaml: str, trials: int, seed: int = 0,
              overrides: dict | None = None, out: str = "runs/sweep_results.jsonl"):
    with open(sweep_yaml) as f:
        sweep = yaml.safe_load(f)
    assert sweep["metric"]["name"] == "val_psnr"
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)

    best = None
    with open(out, "a") as fh:
        for t in range(trials):
            cfg = sample_config(sweep["parameters"], rng)
            cfg.update(overrides or {})
            cfg.setdefault("save_name", f"sweep_{os.path.basename(sweep_yaml)}_{t}")
            cfg.setdefault("run_name", cfg["save_name"])
            print(f"\n=== Trial {t + 1}/{trials}: {cfg} ===")
            final = train(cfg)
            record = {"trial": t, "config": cfg, "test_metrics": final}
            fh.write(json.dumps(record) + "\n")
            fh.flush()
            if best is None or final["psnr"] > best[1]["psnr"]:
                best = (cfg, final)
    print(f"\nWINNER: {best[0]}\n  test metrics: {best[1]}")
    return best


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sweep_yaml")
    p.add_argument("--trials", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dataset", default=None, help="override dataset")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="generic config override (repeatable), e.g. "
                        "--set subset=1.0 --set batch_size=8")
    a = p.parse_args()
    overrides = {}
    if a.dataset:
        overrides["dataset"] = a.dataset
    if a.epochs:
        overrides["epochs"] = a.epochs
    for kv in a.set:
        k, _, v = kv.partition("=")
        try:
            overrides[k] = json.loads(v)
        except json.JSONDecodeError:
            overrides[k] = v
    run_sweep(a.sweep_yaml, a.trials, a.seed, overrides)

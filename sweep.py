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


def run_asha(sweep_yaml: str, trials: int, seed: int = 0,
             overrides: dict | None = None,
             out: str = "runs/sweep_results.jsonl",
             eta: int = 2, rung_epochs: int = 1):
    """Successive-halving search (ASHA-style, synchronous rungs).

    All trials train ``rung_epochs`` epochs; the best 1/eta continue for
    eta x the budget, resuming from their rolling full-state checkpoints
    (same --resume machinery as preemption recovery, so a promoted trial
    continues its optimizer/scheduler state and data order exactly rather
    than restarting). Uses the trial's test PSNR at its best-val epoch as
    the rung score, mirroring the W&B sweeps' val_psnr objective
    (reference configs/sweep_*.yaml:3-5). Spends most budget on promising
    configs — a better fit for one-chip sweeps than random search's
    equal-budget trials.
    """
    with open(sweep_yaml) as f:
        sweep = yaml.safe_load(f)
    assert sweep["metric"]["name"] == "val_psnr"
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)

    alive = [(t, sample_config(sweep["parameters"], rng))
             for t in range(trials)]
    epochs, rung = rung_epochs, 0
    tag = os.path.splitext(os.path.basename(sweep_yaml))[0]
    last = {}
    with open(out, "a") as fh:
        while alive:
            results = []
            for t, cfg in alive:
                c = dict(cfg)
                c.update(overrides or {})
                c["epochs"] = epochs
                c["save_name"] = f"asha_{tag}_{t}"
                c["run_name"] = f"asha_{tag}_{t}_rung{rung}"
                if rung > 0:
                    c["resume"] = os.path.join(
                        c.get("weights_dir", "weights"), f"{c['save_name']}_last")
                print(f"\n=== ASHA rung {rung} (epochs<= {epochs}) "
                      f"trial {t}: {cfg} ===")
                final = train(c)
                results.append((t, cfg, final))
                last[t] = (cfg, final)
                fh.write(json.dumps({"trial": t, "rung": rung,
                                     "epochs": epochs, "config": c,
                                     "test_metrics": final}) + "\n")
                fh.flush()
            if len(alive) == 1:
                break
            results.sort(key=lambda r: -r[2]["psnr"])
            alive = [(t, cfg) for t, cfg, _ in
                     results[: max(1, len(results) // eta)]]
            epochs *= eta
            rung += 1
    winner_t, (w_cfg, w_final) = max(last.items(), key=lambda kv: kv[1][1]["psnr"])
    print(f"\nWINNER (trial {winner_t}): {w_cfg}\n  test metrics: {w_final}")
    return w_cfg, w_final


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
    p.add_argument("--asha", action="store_true",
                   help="successive halving instead of equal-budget random "
                        "search: all trials run --rung_epochs, the top "
                        "1/eta resume for eta x the budget, repeat")
    p.add_argument("--eta", type=int, default=2,
                   help="ASHA promotion factor (keep top 1/eta per rung)")
    p.add_argument("--rung_epochs", type=int, default=1,
                   help="epoch budget of the first ASHA rung")
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
    if a.asha:
        run_asha(a.sweep_yaml, a.trials, a.seed, overrides,
                 eta=a.eta, rung_epochs=a.rung_epochs)
    else:
        run_sweep(a.sweep_yaml, a.trials, a.seed, overrides)

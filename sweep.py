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


# ---------------------------------------------------------------------------
# Local Bayes search (TPE) — honors the YAMLs' declared `method: bayes`
# (reference configs/sweep_srcnn.yaml:2) without W&B. Tree-structured
# Parzen estimator: model p(x|good) and p(x|bad) from the trial history and
# pick the candidate maximizing the density ratio (Bergstra et al. 2011).
# ---------------------------------------------------------------------------

def _log_density(cfg, trials, space):
    """Sum of per-key log densities of ``cfg`` under a Parzen model fit to
    ``trials``. Continuous keys: log-space KDE; categorical: Laplace-
    smoothed counts; constants contribute nothing."""
    total = 0.0
    for key, spec in space.items():
        if "value" in spec:
            continue
        if "values" in spec:
            vals = [t[key] for t in trials]
            n_opt = len(spec["values"])
            count = sum(1 for v in vals if v == cfg[key])
            total += np.log((count + 1.0) / (len(vals) + n_opt))
        else:
            lo, hi = np.log(float(spec["min"])), np.log(float(spec["max"]))
            pts = np.log([float(t[key]) for t in trials])
            bw = max((hi - lo) / max(np.sqrt(len(pts)), 1.0), 1e-3)
            x = np.log(float(cfg[key]))
            dens = np.mean(np.exp(-0.5 * ((x - pts) / bw) ** 2)) / (
                bw * np.sqrt(2 * np.pi))
            total += np.log(dens + 1e-12)
    return total


def tpe_sample(space: dict, history: list, rng: np.random.Generator,
               gamma: float = 0.25, n_candidates: int = 24,
               n_startup: int = 4) -> dict:
    """Next config by TPE: random while history < n_startup, then the
    candidate with the best l(x|good)/l(x|bad) ratio. ``history`` is a
    list of (cfg, score) with score = val_psnr (maximized)."""
    if len(history) < n_startup:
        return sample_config(space, rng)
    ranked = sorted(history, key=lambda h: -h[1])
    n_good = max(1, int(np.ceil(len(ranked) * gamma)))
    good = [c for c, _ in ranked[:n_good]]
    bad = [c for c, _ in ranked[n_good:]] or good
    best, best_ratio = None, -np.inf
    for _ in range(n_candidates):
        cand = sample_config(space, rng)
        ratio = _log_density(cand, good, space) - _log_density(cand, bad, space)
        if ratio > best_ratio:
            best, best_ratio = cand, ratio
    return best


def run_asha(sweep_yaml: str, trials: int, seed: int = 0,
             overrides: dict | None = None,
             out: str = "runs/sweep_results.jsonl",
             eta: int = 2, rung_epochs: int = 1):
    """Successive-halving search (ASHA-style, synchronous rungs).

    All trials train ``rung_epochs`` epochs; the best 1/eta continue for
    eta x the budget, resuming from their rolling full-state checkpoints
    (same --resume machinery as preemption recovery, so a promoted trial
    continues its optimizer/scheduler state and data order exactly rather
    than restarting). Rung promotion and the winner are scored on the
    trial's best VALIDATION PSNR (train() returns it as ``val_psnr``),
    matching the W&B sweeps' objective (reference
    configs/sweep_*.yaml:3-5); test metrics are recorded for reporting
    only and never drive selection. The winner is the best trial of the
    FINAL rung — an early-eliminated trial with a lucky low-budget score
    can't be reported over a full-budget survivor. Spends most budget on
    promising configs — a better fit for one-chip sweeps than random
    search's equal-budget trials.
    """
    with open(sweep_yaml) as f:
        sweep = yaml.safe_load(f)
    assert sweep["metric"]["name"] == "val_psnr"
    if sweep.get("method") == "bayes":
        print("ASHA note: the YAML declares method: bayes, but ASHA samples "
              "its whole cohort up-front (random); run without --asha for "
              "the sequential TPE sampler.")
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)

    alive = [(t, sample_config(sweep["parameters"], rng))
             for t in range(trials)]
    epochs, rung = rung_epochs, 0
    tag = os.path.splitext(os.path.basename(sweep_yaml))[0]
    results = []
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
                fh.write(json.dumps({"trial": t, "rung": rung,
                                     "epochs": epochs, "config": c,
                                     "val_psnr": final.get("val_psnr"),
                                     "test_metrics": final}) + "\n")
                fh.flush()
            if len(alive) == 1:
                break
            results.sort(key=lambda r: -r[2]["val_psnr"])
            alive = [(t, cfg) for t, cfg, _ in
                     results[: max(1, len(results) // eta)]]
            epochs *= eta
            rung += 1
    # winner = best of the FINAL rung only (full-budget survivors)
    winner_t, w_cfg, w_final = max(results, key=lambda r: r[2]["val_psnr"])
    print(f"\nWINNER (trial {winner_t}): {w_cfg}\n"
          f"  val_psnr: {w_final['val_psnr']:.3f} | test metrics: "
          f"{ {k: v for k, v in w_final.items() if k != 'val_psnr'} }")
    return w_cfg, w_final


def run_sweep(sweep_yaml: str, trials: int, seed: int = 0,
              overrides: dict | None = None,
              out: str = "runs/sweep_results.jsonl",
              method: str | None = None):
    """Equal-budget search. ``method``: None = honor the YAML's declared
    method ('bayes' -> local TPE, anything else -> random); 'random' /
    'bayes' override it."""
    with open(sweep_yaml) as f:
        sweep = yaml.safe_load(f)
    assert sweep["metric"]["name"] == "val_psnr"
    method = method or sweep.get("method", "random")
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)

    best = None
    history = []  # (sampled cfg, val_psnr) pairs feeding the TPE model
    with open(out, "a") as fh:
        for t in range(trials):
            if method == "bayes":
                cfg = tpe_sample(sweep["parameters"], history, rng)
            else:
                cfg = sample_config(sweep["parameters"], rng)
            sampled = dict(cfg)
            cfg.update(overrides or {})
            cfg.setdefault("save_name", f"sweep_{os.path.basename(sweep_yaml)}_{t}")
            cfg.setdefault("run_name", cfg["save_name"])
            print(f"\n=== Trial {t + 1}/{trials}: {cfg} ===")
            final = train(cfg)
            history.append((sampled, final["val_psnr"]))
            record = {"trial": t, "method": method, "config": cfg,
                      "val_psnr": final.get("val_psnr"),
                      "test_metrics": final}
            fh.write(json.dumps(record) + "\n")
            fh.flush()
            # selection on val_psnr only (the YAML objective); test
            # metrics are report-only — never model selection
            if best is None or final["val_psnr"] > best[1]["val_psnr"]:
                best = (cfg, final)
    print(f"\nWINNER: {best[0]}\n  val_psnr: {best[1]['val_psnr']:.3f} | "
          f"test metrics: "
          f"{ {k: v for k, v in best[1].items() if k != 'val_psnr'} }")
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
    p.add_argument("--method", default=None, choices=["random", "bayes"],
                   help="override the YAML's search method (default: honor "
                        "it — 'bayes' runs the local TPE sampler)")
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
        # ASHA samples its whole cohort up-front (there is no sequential
        # history for TPE to fit), so a sampler override is meaningless.
        if a.method == "bayes":
            p.error("--method bayes is incompatible with --asha: ASHA's "
                    "trial cohort is sampled up-front; drop --asha to use "
                    "the sequential TPE sampler")
        run_asha(a.sweep_yaml, a.trials, a.seed, overrides,
                 eta=a.eta, rung_epochs=a.rung_epochs)
    else:
        run_sweep(a.sweep_yaml, a.trials, a.seed, overrides, method=a.method)

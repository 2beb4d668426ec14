"""Sweep runner: local random search + ASHA successive halving.

The reference's sweeps are W&B-orchestrated YAMLs (reference
configs/sweep_*.yaml); these cover our offline fallback, including the
halving schedule's resume-based promotions.
"""
import json
import os

import pytest
import yaml


@pytest.fixture()
def tiny_sweep(tmp_path):
    sweep = {
        "program": "train.py",
        "method": "random",
        "metric": {"name": "val_psnr", "goal": "maximize"},
        "parameters": {
            "architecture": {"value": "SRCNN"},
            "loss_function": {"value": "mse"},
            "lr": {"min": 1e-4, "max": 1e-3},
            "batch_size": {"values": [8]},
        },
    }
    path = tmp_path / "sweep.yaml"
    path.write_text(yaml.safe_dump(sweep))
    return str(path)


def test_asha_promotes_and_resumes(tiny_sweep, tmp_path):
    from sweep import run_asha

    out = str(tmp_path / "results.jsonl")
    overrides = {
        "dataset": "synthetic", "subset": 1.0, "epochs": 1, "crop_size": 32,
        "scale_factor": 4, "patience": 10,
        "weights_dir": str(tmp_path / "w"),
    }
    cfg, final = run_asha(tiny_sweep, trials=3, seed=0, overrides=overrides,
                          out=out, eta=2, rung_epochs=1)
    assert "psnr" in final and final["psnr"] > 0
    assert "val_psnr" in final and final["val_psnr"] > 0

    rows = [json.loads(l) for l in open(out)]
    rung0 = [r for r in rows if r["rung"] == 0]
    rung1 = [r for r in rows if r["rung"] == 1]
    assert len(rung0) == 3 and len(rung1) == 1       # 3 -> 1 survivor
    assert rung1[0]["epochs"] == 2                   # doubled budget
    # the survivor is the best rung-0 trial BY VAL PSNR (the sweep
    # objective) — never by test metrics (that would be test-set leakage)
    best0 = max(rung0, key=lambda r: r["val_psnr"])
    assert rung1[0]["trial"] == best0["trial"]
    # the reported winner is the final-rung survivor, not a max over
    # earlier (lower-budget) rungs
    assert final["val_psnr"] == rung1[0]["val_psnr"]
    # promotion resumed from the rolling checkpoint (it exists per trial)
    t = rung1[0]["trial"]
    assert os.path.isdir(os.path.join(str(tmp_path / "w"),
                                      f"asha_sweep_{t}_last"))


def test_tpe_concentrates_on_good_region():
    """The local Bayes sampler (method: bayes in the reference YAMLs) must
    propose configs near the high-scoring region of a synthetic history."""
    import numpy as np

    from sweep import tpe_sample

    space = {
        "lr": {"min": 1e-4, "max": 1e-1},
        "loss_function": {"values": ["mae", "mse", "nlpd"]},
        "architecture": {"value": "SRCNN"},
    }
    rng = np.random.default_rng(0)
    # good region: lr ~ 3e-2 (high side, log-space) with loss 'nlpd'
    history = []
    for _ in range(20):
        lr = float(np.exp(rng.uniform(np.log(1e-4), np.log(1e-1))))
        loss = ["mae", "mse", "nlpd"][int(rng.integers(3))]
        score = -abs(np.log(lr) - np.log(3e-2)) + (0.5 if loss == "nlpd" else 0)
        history.append(({"lr": lr, "loss_function": loss,
                         "architecture": "SRCNN"}, score))

    picks = [tpe_sample(space, history, rng) for _ in range(16)]
    lrs = np.array([p["lr"] for p in picks])
    # median proposal lands within ~half a decade of the optimum
    assert abs(np.median(np.log(lrs)) - np.log(3e-2)) < np.log(4)
    # categorical head prefers the good value
    assert sum(p["loss_function"] == "nlpd" for p in picks) >= 8
    # startup phase falls back to random sampling (no history)
    assert tpe_sample(space, [], rng)["architecture"] == "SRCNN"


def test_selection_uses_val_psnr_not_test(tiny_sweep, tmp_path, monkeypatch):
    """Selection must rank on val_psnr even when test PSNR disagrees
    (regression for the round-1 test-set-leakage finding)."""
    import sweep as sweep_mod

    # trial 0: bad val, great test; trial 1: good val, bad test
    fakes = [{"psnr": 99.0, "ssim": 1.0, "lpips": 0.0, "nlpd": 0.0,
              "val_psnr": 10.0},
             {"psnr": 5.0, "ssim": 0.5, "lpips": 0.5, "nlpd": 1.0,
              "val_psnr": 30.0}]
    calls = []

    def fake_train(cfg):
        calls.append(dict(cfg))
        return dict(fakes[len(calls) - 1])

    monkeypatch.setattr(sweep_mod, "train", fake_train)
    cfg, final = sweep_mod.run_sweep(
        tiny_sweep, trials=2, seed=0,
        overrides={"weights_dir": str(tmp_path / "w")},
        out=str(tmp_path / "r.jsonl"))
    assert final["val_psnr"] == 30.0     # trial 1 wins on val
    assert final["psnr"] == 5.0          # despite the worse test PSNR

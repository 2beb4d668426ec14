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

    rows = [json.loads(l) for l in open(out)]
    rung0 = [r for r in rows if r["rung"] == 0]
    rung1 = [r for r in rows if r["rung"] == 1]
    assert len(rung0) == 3 and len(rung1) == 1       # 3 -> 1 survivor
    assert rung1[0]["epochs"] == 2                   # doubled budget
    # the survivor is the best rung-0 trial
    best0 = max(rung0, key=lambda r: r["test_metrics"]["psnr"])
    assert rung1[0]["trial"] == best0["trial"]
    # promotion resumed from the rolling checkpoint (it exists per trial)
    t = rung1[0]["trial"]
    assert os.path.isdir(os.path.join(str(tmp_path / "w"),
                                      f"asha_sweep_{t}_last"))

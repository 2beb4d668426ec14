"""CLI-level smoke for tools/convergence_parity.py — the convergence-scale
torch-vs-ours parity harness (reference train.py:21-197 control flow on the
torch side, production train() on ours). A 1-epoch run on a tiny tree
can't make a convergence claim (so no tolerance assert here; the committed
evidence lives in runs/convergence_parity.json); this pins that the
harness itself runs end-to-end and reports all the fields the claim needs.
"""
import argparse
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_resume_ours_config_drift_guard(tmp_path, monkeypatch):
    """--resume_ours must refuse a checkpoint trained under different
    hyperparams (the tag encodes only arch/loss/seed)."""
    sys.path.insert(0, REPO)
    from tools import convergence_parity as cp

    tag = "convpar_SRCNN_mse_s0"
    rd = tmp_path / "runs" / tag
    rd.mkdir(parents=True)
    prior = {"architecture": "SRCNN", "loss_function": "mse", "epochs": 1,
             "batch_size": 8, "lr": 6e-4, "crop_size": 48,
             "scale_factor": 4, "patience": 5, "data_root": "/tree"}
    stale = {**prior, "lr": 9e-9}  # a restart that died before training:
    # appends a _config line with NO metric rows after it — the checkpoint
    # still belongs to the last config that actually trained
    (rd / "log.jsonl").write_text(
        json.dumps({"_config": prior}) + "\n"
        + json.dumps({"train_loss": 1.0}) + "\n"
        + json.dumps({"_config": stale}) + "\n")
    monkeypatch.setenv("FOOD101_SR_RUN_DIR", str(tmp_path / "runs"))
    args = argparse.Namespace(architecture="SRCNN", loss="mse", epochs=1,
                              batch_size=8, lr=6e-4, crop_size=48, scale=4,
                              patience=5, data_root="/tree")
    cp._check_resume_config(args, tag)  # matches the trained config -> ok
    args.lr = 1e-4
    with pytest.raises(SystemExit, match="different config"):
        cp._check_resume_config(args, tag)
    # missing run log -> warn-and-proceed, never a crash
    cp._check_resume_config(args, "convpar_missing_tag_s9")
    # corrupt/empty log -> warn-and-proceed too
    rd2 = tmp_path / "runs" / "convpar_SRCNN_mse_s1"
    rd2.mkdir(parents=True)
    (rd2 / "log.jsonl").write_text("not json\n")
    cp._check_resume_config(args, "convpar_SRCNN_mse_s1")


def test_convergence_parity_tool_end_to_end(tmp_path):
    tree = tmp_path / "tree"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_fake_food101.py"),
         str(tree), "--train", "48", "--test", "16"],
        check=True, cwd=REPO, capture_output=True)
    out = tmp_path / "parity.json"
    # strip the conftest's 8-virtual-device XLA_FLAGS: an 8-device mesh
    # needs batch multiples of 8 that this tiny tree can't fill (--cpu
    # handles the platform; the axon plugin ignores the env var anyway)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["FOOD101_SR_RUN_DIR"] = str(tmp_path / "runs")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/convergence_parity.py"),
         "--data_root", str(tree), "--architecture", "SRCNN",
         "--loss", "mse", "--epochs", "1", "--seeds", "1",
         "--crop_size", "48", "--batch_size", "8", "--cpu",
         "--weights_dir", str(tmp_path / "w"),
         # 1 epoch is noise, not convergence: disable the verdict gate
         "--tolerance", "1e9", "--out", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    summary = json.loads(out.read_text())
    assert summary["ok"]
    # the verdict is directional: an ours lead is "ours_ahead" (match-or-beat
    # goal), never a parity failure; only "torch_ahead" fails the gate
    assert summary["verdict"] in ("indistinguishable", "ours_ahead",
                                  "torch_ahead")
    assert summary["gap_signed_db"] == pytest.approx(
        summary["ours_mean_test_psnr"] - summary["torch"]["test_psnr"])
    assert summary["torch"]["epochs_ran"] == 1
    assert len(summary["ours"]) == 1
    for side in (summary["torch"], summary["ours"][0]):
        assert 0.0 < side["test_psnr"] < 100.0
    # --skip_torch reuses the recorded torch leg (fast re-check path);
    # --resume_ours picks up the rolling _last checkpoint r1 left behind
    # (here at the final epoch, so the leg re-evals without retraining —
    # the train-more-after-resume half is pinned by tests/test_resume.py)
    seed0_prior = summary["ours"][0]
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/convergence_parity.py"),
         "--data_root", str(tree), "--architecture", "SRCNN",
         "--loss", "mse", "--epochs", "1", "--seeds", "1",
         "--crop_size", "48", "--batch_size", "8", "--cpu",
         "--weights_dir", str(tmp_path / "w"),
         "--tolerance", "1e9", "--skip_torch", "--resume_ours",
         "--out", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert "reusing" in r2.stdout
    assert "resuming from" in r2.stdout
    # --extend_seeds: the recorded seed is reused verbatim (never retrained),
    # only the missing seed trains
    r2b = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/convergence_parity.py"),
         "--data_root", str(tree), "--architecture", "SRCNN",
         "--loss", "mse", "--epochs", "1", "--seeds", "2",
         "--crop_size", "48", "--batch_size", "8", "--cpu",
         "--weights_dir", str(tmp_path / "w"),
         "--tolerance", "1e9", "--skip_torch", "--extend_seeds",
         "--out", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert r2b.returncode == 0, r2b.stdout[-2000:] + r2b.stderr[-2000:]
    assert "reusing seeds [0]" in r2b.stdout
    ext = json.loads(out.read_text())
    assert len(ext["ours"]) == 2
    assert ext["ours"][0] == seed0_prior  # reused verbatim, not retrained
    assert ext["ours"][1]["seed"] == 1
    # --extend_seeds without --skip_torch is a config error (reused seeds
    # are only comparable against the recorded torch leg)
    r2c = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/convergence_parity.py"),
         "--data_root", str(tree), "--architecture", "SRCNN",
         "--loss", "mse", "--epochs", "1", "--seeds", "2",
         "--crop_size", "48", "--batch_size", "8", "--cpu",
         "--tolerance", "1e9", "--extend_seeds", "--out", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert r2c.returncode != 0
    assert "requires --skip_torch" in r2c.stderr
    # our-side checkpoints went to --weights_dir, not the repo
    assert (tmp_path / "w" / "convpar_SRCNN_mse_s0_best").is_dir()
    # --seeds 0: torch-only leg (second --torch_seed measures the reference
    # loop's own variance) — records torch + seed, no verdict, exit 0
    out_t1 = tmp_path / "torch_s1.json"
    r2d = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/convergence_parity.py"),
         "--data_root", str(tree), "--architecture", "SRCNN",
         "--loss", "mse", "--epochs", "1", "--seeds", "0",
         "--crop_size", "48", "--batch_size", "8", "--torch_seed", "1",
         "--out", str(out_t1)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert r2d.returncode == 0, r2d.stdout[-2000:] + r2d.stderr[-2000:]
    t1 = json.loads(out_t1.read_text())
    assert t1["torch_seed"] == 1
    assert 0.0 < t1["torch"]["test_psnr"] < 100.0
    assert "ours" not in t1 and "verdict" not in t1

    # --skip_torch refuses a record from a DIFFERENT leg (a stale torch
    # number must never produce a mislabeled verdict)
    r3 = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/convergence_parity.py"),
         "--data_root", str(tree), "--architecture", "RESNET",
         "--loss", "mse", "--epochs", "1", "--seeds", "1",
         "--crop_size", "48", "--batch_size", "8", "--cpu",
         "--weights_dir", str(tmp_path / "w"),
         "--tolerance", "1e9", "--skip_torch", "--out", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert r3.returncode != 0
    assert "different config" in r3.stderr

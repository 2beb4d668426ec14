"""Regression tests for bench.py's driver contract (one JSON line on
stdout, always, within a bounded wall clock).

Round 2's driver window recorded ``BENCH_r02.json: rc=124, parsed=null``:
the TPU tunnel was down and the then-fallback kept the TPU-sized workload
(batch 512, 25-iter runs, 3 repeats) on a 1-core CPU host, which cannot
finish inside any realistic timeout. bench.py is now a supervisor/child
design — the supervisor never touches a JAX backend and owns the wall
clock; children do bounded measurements; a CPU fallback runs a CPU-SIZED
workload. These tests pin that contract offline:

* ``JAX_PLATFORMS=cpu`` (the regression hook bench.py honors) must yield
  exactly one valid JSON line tagged ``cpu-fallback`` well inside the
  budget, with a real nonzero throughput.
* An exhausted budget must still print the tagged ``timeout-fallback``
  zero line (the last-resort emission) and exit 0.

The unit tests cover the supervisor's pure helpers (mode parsing, metric
naming) so the headline metric names can't drift silently between the
supervisor's last-resort line and the child's measured line.
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
BENCH = ROOT / "bench.py"

sys.path.insert(0, str(ROOT))
import bench  # noqa: E402


def _run(args, budget_s, timeout_s, extra_env=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # bench.py's offline regression hook
    env["FOOD101_BENCH_BUDGET_S"] = str(budget_s)
    env.pop("FOOD101_BENCH_CHILD", None)
    env.update(extra_env or {})
    t0 = time.monotonic()
    r = subprocess.run([sys.executable, str(BENCH), *args],
                       stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                       timeout=timeout_s, text=True, cwd=str(ROOT), env=env)
    return r, time.monotonic() - t0


def _the_one_json_line(stdout: str) -> dict:
    lines = [ln for ln in stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must carry exactly one line: {lines!r}"
    obj = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in obj, f"missing {key!r} in {obj}"
    return obj


def test_bench_cpu_fallback_emits_json_within_budget():
    # The full driver command with the tunnel "down" (CPU pin): must print
    # one JSON line, tagged, nonzero, well inside the wall-clock budget.
    r, elapsed = _run([], budget_s=480, timeout_s=540)
    assert r.returncode == 0, r.stderr[-2000:]
    obj = _the_one_json_line(r.stdout)
    assert obj["metric"] == "attentionsr_x4_inference_throughput"
    assert obj["unit"] == "images/sec/chip"
    assert obj["platform"] == "cpu-fallback"  # never masquerades as chip
    assert obj["value"] > 0
    assert obj["vs_baseline"] > 0
    assert elapsed < 480, f"took {elapsed:.0f}s — not inside the budget"


def test_bench_exhausted_budget_still_prints_tagged_line():
    # Budget too small for any child: the supervisor's last-resort path.
    r, elapsed = _run([], budget_s=1, timeout_s=120)
    assert r.returncode == 0, r.stderr[-2000:]
    obj = _the_one_json_line(r.stdout)
    assert obj["platform"] == "timeout-fallback"
    assert obj["value"] == 0.0
    assert obj["metric"] == "attentionsr_x4_inference_throughput"
    assert elapsed < 60


def test_parse_mode_and_metric_names():
    A = "AttentionSR"
    assert bench.parse_mode(["bench.py"]) == ("infer", "", A)
    assert bench.parse_mode(["bench.py", "--train"]) == ("train", "", A)
    assert bench.parse_mode(["bench.py", "--gan"]) == ("gan", "", A)
    assert bench.parse_mode(["bench.py", "--input"]) == ("input", "", A)
    assert bench.parse_mode(["bench.py", "--quantize"]) == ("infer", "int8", A)
    assert bench.parse_mode(["bench.py", "--quantize", "int8_dot"]) == (
        "infer", "int8_dot", A)
    assert bench.parse_mode(["bench.py", "--quantize_dot"]) == (
        "infer", "int8_dot", A)
    # per-arch benching (VERDICT r3 #1: RRDB needs measured numbers)
    assert bench.parse_mode(["bench.py", "--architecture", "RRDB"]) == (
        "infer", "", "RRDB")
    assert bench.parse_mode(
        ["bench.py", "--train", "--architecture", "RRDB"]) == (
        "train", "", "RRDB")

    assert bench.metric_name("infer", "", A) == (
        "attentionsr_x4_inference_throughput", "images/sec/chip")
    assert bench.metric_name("infer", "int8", A) == (
        "attentionsr_x4_inference_throughput_int8", "images/sec/chip")
    assert bench.metric_name("train", "", A) == (
        "attentionsr_x4_train_throughput", "images/sec/chip")
    assert bench.metric_name("gan", "", A) == (
        "attentionsr_x4_gan_train_throughput", "images/sec/chip")
    assert bench.metric_name("input", "", A) == (
        "input_pipeline_host_throughput", "images/sec/core")
    assert bench.metric_name("infer", "", "RRDB") == (
        "rrdb_x4_inference_throughput", "images/sec/chip")


def test_unknown_architecture_rejected():
    r, _ = _run(["--architecture", "EDSR"], budget_s=60, timeout_s=60)
    assert r.returncode != 0


def test_pinned_baseline_reads_committed_file():
    """The vs_baseline denominator comes from runs/bench_baseline.json —
    the committed, dated measurement — NOT a live torch re-measure
    (VERDICT r3 weak #4: the live denominator swung 31% round-to-round)."""
    committed = json.loads((ROOT / "runs" / "bench_baseline.json").read_text())
    want = committed["baselines"]["AttentionSR"]["ips"]
    assert bench.pinned_baseline("AttentionSR") == want
    assert "measured" in committed["baselines"]["AttentionSR"]
    # an arch never measured on this host has no denominator (honest None,
    # not a borrowed AttentionSR number)
    assert bench.pinned_baseline("SRCNN") is None


def test_unknown_quantize_mode_rejected():
    r, _ = _run(["--quantize", "int4"], budget_s=60, timeout_s=60)
    assert r.returncode != 0


def test_last_json_picks_last_metric_line():
    good = json.dumps({"metric": "m", "value": 1.0})
    better = json.dumps({"metric": "m", "value": 2.0})
    text = f"noise\n{good}\nnot json {{\n{better}\n  \n"
    assert bench._last_json(text)["value"] == 2.0
    assert bench._last_json("no json here") is None
    assert bench._last_json("") is None
    assert bench._last_json(json.dumps({"no_metric": 1})) is None


def test_run_child_salvages_provisional_line_on_timeout(monkeypatch):
    """A child killed at its budget mid-phase-tail-compile must still yield
    the provisional standard-tail measurement it already printed (round-3
    hardening: the phase-tail program's cold compile through the tunnel
    was observed at 100-230s)."""
    provisional = json.dumps({
        "metric": "attentionsr_x4_inference_throughput", "value": 2869.0,
        "unit": "images/sec/chip", "vs_baseline": 1000.0,
        "tail": "standard"})

    def fake_run(*a, **kw):
        raise subprocess.TimeoutExpired(
            cmd=a[0], timeout=kw.get("timeout", 0),
            output=f"log noise\n{provisional}\n".encode())

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    obj = bench._run_child("tpu", timeout=60)
    assert obj is not None
    assert obj["value"] == 2869.0
    assert obj["tail"] == "standard"
    assert "salvaged" in obj["note"]

    # nothing printed before the kill -> still None (CPU rescue takes over)
    def fake_run_empty(*a, **kw):
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=0, output=b"")

    monkeypatch.setattr(bench.subprocess, "run", fake_run_empty)
    assert bench._run_child("tpu", timeout=60) is None

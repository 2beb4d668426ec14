"""REAL multi-process training: two OS processes form a jax.distributed
group over CPU+gloo (2 local devices each -> a 4-device global mesh) and
run the production ``train()`` end-to-end — coordinator bring-up
(parallel/distributed.py), per-host interleaved loading + global-array
assembly (data/pipeline.py ``process_local_slice`` /
``make_array_from_process_local_data``), sharded-jit training, and
process-0-only checkpointing. This exercises the actual multi-host code
path the VERDICT flagged as wired-but-never-launched; the same command
shape runs on a v5e pod unchanged (see parallel/distributed.py docstring).
"""
import json
import os
import socket
import subprocess
import sys

_DRIVER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["FOOD101_SR_RUN_DIR"] = sys.argv[4]
import jax
import food101_sr_tpu
food101_sr_tpu.use_cpu_backend()
jax.config.update("jax_cpu_collectives_implementation", "gloo")
from food101_sr_tpu.training import train

pid, port, wdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
final = train({
    "architecture": "SRCNN", "loss_function": "mse", "dataset": "synthetic",
    "synthetic_size": 64, "crop_size": 32, "batch_size": 8, "epochs": 1,
    "subset": 1.0, "patience": 5, "weights_dir": wdir, "save_name": "mh",
    "coordinator": "localhost:" + port, "num_processes": 2,
    "process_id": pid,
})
print("FINAL_JSON " + json.dumps(final), flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_training(tmp_path):
    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER)
    wdir = tmp_path / "w"
    rundir = tmp_path / "runs"
    rundir.mkdir()
    port = str(_free_port())

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = "/root/repo"
    # Output goes to FILES, not PIPEs: the two processes advance in
    # lockstep through collectives, so if one blocks writing to a full
    # unread pipe while the other is being communicate()d, both deadlock.
    logs = [tmp_path / f"p{pid}.log" for pid in (0, 1)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(driver), str(pid), port, str(wdir),
             str(rundir)],
            cwd="/root/repo", env=env, stdout=open(logs[pid], "w"),
            stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    try:
        for p in procs:
            p.wait(timeout=900)
    except subprocess.TimeoutExpired:
        # never leave orphaned jax processes chewing the 1-core host
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
        raise AssertionError(
            "multi-process training timed out; partial output:\n"
            + "\n---\n".join(l.read_text()[-3000:] for l in logs))
    outs = [l.read_text() for l in logs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    finals = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("FINAL_JSON ")]
        assert line, out[-2000:]
        finals.append(json.loads(line[-1][len("FINAL_JSON "):]))

    # both processes computed the same global math
    assert finals[0]["val_psnr"] > 0
    for k in finals[0]:
        assert abs(finals[0][k] - finals[1][k]) < 1e-6, (k, finals)

    # the 4-device global mesh was actually in play
    assert any("Running on 4 device(s)" in out and "2 process(es)" in out
               for out in outs), outs[0][-2000:]
    # process-0-only checkpointing: exactly one writer, no Orbax collision
    assert (wdir / "mh_best").is_dir()
    # process-0-only run logging: one log dir, one _config row, one copy of
    # each epoch row (both hosts appending would double every entry)
    log_files = list(rundir.glob("*/log.jsonl"))
    assert len(log_files) == 1, log_files
    rows = [json.loads(l) for l in log_files[0].read_text().splitlines()]
    assert sum(1 for r in rows if "_config" in r) == 1
    assert sum(1 for r in rows if "val_psnr" in r) == 1

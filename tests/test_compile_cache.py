"""Compile-cache hygiene (VERDICT r2 item 3).

BENCH_r02.json's stderr tail was wall-to-wall ``cpu_aot_loader.cc`` errors:
XLA:CPU persistent-cache entries embed AOT machine code, and on this JAX
every reload warns "could lead to execution errors such as SIGILL" — even
when the compiling host IS the loading host, because the compile-time
feature list carries LLVM tuning flags (+prefer-no-gather/scatter) the
load-time host check never reports (reproduced 2026-08-18 on this host:
write+reload of a fresh cache dir in back-to-back identical processes).

The fix is two-layered and these tests pin both layers:

* the persistent cache directory is keyed by a per-host CPU fingerprint,
  so genuinely-foreign AOT artifacts are unreachable by construction;
* ``food101_sr_tpu.use_cpu_backend()`` — the one blessed way to pin the
  CPU backend (tests, bench fallback, dryrun, tools --cpu) — disables the
  persistent cache outright for CPU work, so nothing is ever written or
  loaded there. CPU compiles are seconds; only the minutes-long tunnel
  TPU compiles ever paid for the cache.
"""
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

CHILD = """
import jax
import food101_sr_tpu
assert food101_sr_tpu.use_cpu_backend()
import jax.numpy as jnp
out = float(jax.jit(lambda x: jnp.tanh(x @ x).sum())(jnp.ones((128, 128))))
print("ok", out)
"""


def _run_child(cache_dir):
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = str(cache_dir)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run([sys.executable, "-c", CHILD], text=True,
                          capture_output=True, timeout=300, cwd=str(ROOT),
                          env=env)


def test_cpu_backend_runs_emit_zero_aot_loader_errors(tmp_path):
    # Two identical back-to-back processes sharing a cache dir: without the
    # fix the second one reloads the first one's XLA:CPU AOT artifacts and
    # spews cpu_aot_loader errors. With use_cpu_backend() the persistent
    # cache is disabled for CPU work, so the dir stays empty and both runs
    # are loader-error-free.
    cache = tmp_path / "cache"
    for i in range(2):
        r = _run_child(cache)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "ok" in r.stdout
        assert "cpu_aot_loader" not in r.stderr, (
            f"run {i}: AOT loader errors leaked:\n{r.stderr[-2000:]}")
    fp_dir = cache / __import__("food101_sr_tpu")._host_fingerprint()
    assert not fp_dir.exists() or not any(fp_dir.iterdir()), (
        "CPU run wrote persistent-cache entries despite use_cpu_backend()")


def test_cache_dir_is_fingerprint_keyed():
    import jax

    import food101_sr_tpu

    fp = food101_sr_tpu._host_fingerprint()
    assert len(fp) == 10 and fp == food101_sr_tpu._host_fingerprint()
    # the package import pointed the cache at <base>/<fingerprint> so a
    # different host's AOT artifacts can never be loaded here
    assert jax.config.jax_compilation_cache_dir.endswith(fp)

"""food101_sr_tpu — TPU-native Food-101 x4 single-image super-resolution framework.

A from-scratch JAX/Flax/optax/Pallas rebuild of the capabilities of the reference
PyTorch project Jaskieeeer/food101-super-resolution (see SURVEY.md). The compute
path is jitted XLA (NHWC convs on the MXU, resize-as-matmul kernels); data
parallelism is expressed with jax.sharding over a device mesh; the input pipeline
degrades HR crops to LR on-device.
"""

__version__ = "0.1.0"

import os as _os


def _host_fingerprint() -> str:
    """Short hash of this host's CPU feature set (+ arch).

    XLA:CPU persistent-cache entries embed AOT-compiled code specialized to
    the compiling machine's CPU features; loading them on a host with a
    different feature set emits cpu_aot_loader errors and risks SIGILL
    (observed: BENCH_r02.json tail, wall-to-wall loader errors from a cache
    written by a different host). Keying the cache directory by a CPU
    fingerprint makes foreign AOT artifacts unreachable; TPU entries are
    host-CPU-independent but /tmp is per-host anyway, so nothing is lost.
    """
    import hashlib
    import platform as _platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags") or line.startswith("Features"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{_platform.machine()}|{feats}"
    return hashlib.sha1(raw.encode()).hexdigest()[:10]


# XLA compiles are expensive (and, through remote-TPU tunnels, can take
# minutes); a persistent on-disk cache makes every CLI/run after the first
# start in seconds. Opt out with FOOD101_SR_DISABLE_COMPILE_CACHE=1; the
# standard JAX_COMPILATION_CACHE_DIR env var overrides the base location
# (the per-host fingerprint subdir is always appended — see
# _host_fingerprint for why).
if _os.environ.get("FOOD101_SR_DISABLE_COMPILE_CACHE") != "1":
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(
            _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
            _host_fingerprint(),
        ),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def use_cpu_backend() -> bool:
    """Pin JAX to the CPU backend and disable the persistent compile cache.

    Every CPU-hermetic entry point (tests, bench's tunnel-down fallback,
    ``dryrun_multichip``, the tools' ``--cpu`` modes) must use this instead
    of setting ``jax_platforms`` directly, for two hard-won reasons:

    * The axon TPU plugin IGNORES the ``JAX_PLATFORMS`` env var and,
      tunnel-down, sits in a ~25-minute retry loop during backend
      discovery; only the config route keeps discovery off the tunnel.
    * XLA:CPU persistent-cache entries embed AOT machine code, and on this
      JAX (0.9) every reload warns ``cpu_aot_loader: ... could lead to
      SIGILL`` — even compiling host == loading host, because the
      compile-time feature list carries LLVM tuning flags
      (+prefer-no-gather/scatter) the load-time host check never reports.
      CPU compiles here are seconds, so the cache only ever paid for the
      minutes-long tunnel TPU compiles; disabling it for CPU work is free
      and makes stale/foreign AOT artifacts unreachable (BENCH_r02.json's
      wall-to-wall loader errors).

    Returns True if the platform pin took effect, False if a non-CPU
    backend was already initialized (callers then fall back to whatever
    devices exist — e.g. under pytest the pin is a no-op because
    conftest.py already applied it).
    """
    import jax as _jax

    _jax.config.update("jax_enable_compilation_cache", False)
    try:
        _jax.config.update("jax_platforms", "cpu")
        return True
    except RuntimeError:
        return False

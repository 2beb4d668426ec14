"""Measure the TRUE host->device wire rate on the current backend.

Naive timing (`block_until_ready` after `device_put`) is wrong under the
axon tunnel: the ack returns when the transfer is ENQUEUED, not done
(CLAUDE.md timing rule), which once reported a fictional 1.4 GB/s here.
This probe forces completion the only reliable way — a compiled reduction
over the transferred buffer whose SCALAR result is fetched to the host —
and cancels the fixed dispatch/fetch overhead with a two-point slope:

    t(k puts + fetch) - t(1 put + fetch)
    ------------------------------------  =  seconds per put
                  k - 1

Why it matters: a training step that waits on a fresh batch pays
batch_bytes / wire_rate on every step. At the measured ~46 MB/s through
the dev tunnel, a 15 MB uint8 batch costs ~320 ms against a 104 ms
compute step — which is why the device-resident cache (zero per-step
H2D, data/device_cache.py) and the reuse-window streaming loader
(k-fold fewer wire bytes, data/canvas_cache.py) exist. On a real TPU
host PCIe moves the same batch in ~1-2 ms.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    batch = np.random.default_rng(0).integers(
        0, 255, (128, 200, 200, 3), dtype=np.uint8)
    mb = batch.nbytes / 2**20

    checksum = jax.jit(lambda xs: sum(jnp.sum(x, dtype=jnp.int32) for x in xs))

    def timed(k):
        # k distinct host buffers so no caching/dedup can elide a transfer
        bufs = [batch + np.uint8(i) for i in range(k)]
        t0 = time.perf_counter()
        devs = [jax.device_put(b, dev) for b in bufs]
        int(checksum(devs))  # fetch forces every transfer to completion
        return time.perf_counter() - t0

    # warm the dispatch/compile paths for both k's
    timed(1), timed(6)
    t1 = min(timed(1) for _ in range(2))
    t6 = min(timed(6) for _ in range(2))
    per_put = (t6 - t1) / 5

    print(json.dumps({
        "tool": "h2d_probe", "platform": dev.platform,
        "batch_mb": round(mb, 2),
        "h2d_ms_per_batch": round(per_put * 1e3, 1),
        "h2d_mb_s": round(mb / per_put, 1),
    }))


if __name__ == "__main__":
    main()

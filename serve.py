#!/usr/bin/env python
"""Inference server: HTTP POST an image, get the x4 super-resolved PNG back.

The reference has no serving path (its closest analogue is the offline
comparison script, reference visualize.py); this is the production-facing
counterpart: one process owns the chip, the model + checkpoint load once,
forwards are jitted, and large inputs are cut into receptive-field-halo
windows (the exact math of food101_sr_tpu.parallel.spatial) that ride the
same micro-batcher as small images — so arbitrary image sizes run in a
handful of compiled shapes and concurrent requests share device batches.

    python serve.py --architecture AttentionSR --checkpoint weights/attentionsr_run_best &
    curl --data-binary @low_res.png http://localhost:8700/sr > out.png
    curl http://localhost:8700/healthz

Stdlib-only (http.server + PIL + jax): no web-framework dependency to
provision on a TPU VM.
"""
from __future__ import annotations

import argparse
import io
import json
import signal
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from food101_sr_tpu.models import get_model
from food101_sr_tpu.native import encode_jpeg_rgb8, encode_png_rgb8
from food101_sr_tpu.ops import self_ensemble
from food101_sr_tpu.parallel.spatial import plan_windows, receptive_radius
from food101_sr_tpu.training import load_checkpoint


class SRHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer with a listen backlog sized for bursty serving.

    socketserver's default request_queue_size of 5 drops (RST) connections
    whenever more than a handful arrive while handlers are busy — e.g. the
    first seconds of traffic on a fresh shape bucket, where one request
    holds the batcher through an XLA compile and the rest pile up.

    Handler threads are non-daemon + block_on_close, so a graceful
    shutdown (SIGTERM/SIGINT, see main) finishes in-flight requests
    instead of killing them mid-response.
    """

    request_queue_size = 128
    daemon_threads = False
    block_on_close = True


class MicroBatcher:
    """Coalesces concurrent same-shape requests into one device batch.

    Request threads enqueue (array, future); a single batcher thread owns
    the chip: it takes the first pending item, drains whatever else arrived
    within ``window_ms`` that shares its padded shape (up to ``max_batch``),
    runs ONE jitted forward over the stacked batch, and distributes rows.
    Under load this turns N single-image forwards into ceil(N/max_batch)
    batched ones — the difference between ~30 ms/image dispatch-bound and
    MXU-bound throughput serving.
    """

    def __init__(self, fwd, max_batch: int = 8, window_ms: float = 3.0,
                 sharding=None, instrument: bool = False,
                 adaptive: bool = False):
        import queue as _q

        self._fwd = fwd
        self.max_batch = max_batch
        self.window = window_ms / 1e3
        # Adaptive coalescing (round-5 attribution finding,
        # runs/serve_attrib_rrdb.json): under sustained load the 1-core
        # host's encode stage staggers request re-arrival, so a short
        # fixed window dispatches partially-filled batches; waiting ~one
        # batch-exec instead filled every batch and bought +18% req/s for
        # RRDB. But a long FIXED window taxes sparse traffic (a lone
        # request waits out the whole window). Adaptive mode keeps the
        # short window until the previous dispatch went out >=75% full
        # (evidence of load), then extends the collect deadline toward
        # the measured batch-exec EMA, capped at 100 ms.
        self.adaptive = adaptive
        self._ema_exec_s = 0.0
        self._last_fill = 0
        self.sharding = sharding  # optional: shard batches over a device mesh
        # --instrument: split device-execution time from D2H per batch by
        # inserting a 1-element sync fetch between dispatch and the row
        # fetch. That sync costs ~one tunnel RTT per batch, so it is
        # OPT-IN (attribution runs), never the production default; without
        # it t_exec_fetch_s carries the combined execute+D2H time.
        self.instrument = instrument
        # timing accumulators, owned by the single batcher thread
        self.t_collect_s = 0.0     # window wait assembling each group
        self.t_h2d_s = 0.0         # host stack + device_put
        self.t_exec_fetch_s = 0.0  # dispatch+execute+D2H (combined mode)
        self.t_exec_s = 0.0        # execute only (instrument mode)
        self.t_d2h_s = 0.0         # row fetch only (instrument mode)
        self.rows_fetched = 0
        self._q: "_q.Queue" = _q.Queue()
        self.n_batches = 0
        self.n_items = 0
        t = threading.Thread(target=self._run, daemon=True)
        t.start()

    def collect_window(self) -> float:
        """Collect deadline for the next group (seconds). See ``adaptive``
        in __init__; fixed ``window`` otherwise."""
        if (not self.adaptive or self._ema_exec_s <= 0
                or self._last_fill * 4 < self.max_batch * 3):
            return self.window
        return min(max(self.window, 0.75 * self._ema_exec_s), 0.1)

    def submit(self, x: np.ndarray) -> np.ndarray:
        """x: [H,W,C] uint8. Blocks until the SR result row is ready."""
        return self.submit_many([x])[0]

    def submit_many(self, xs) -> list:
        """Enqueue several items at once, block until all are done.

        All items land in the queue before the caller waits, so the batcher
        thread groups them (and any concurrently-arriving same-shape items
        from other requests) into max_batch device batches — this is how a
        tiled large image shares batches with other in-flight requests."""
        pending = []
        for x in xs:
            ev = threading.Event()
            slot = {}
            self._q.put((x, ev, slot))
            pending.append((ev, slot))
        outs = []
        for ev, slot in pending:
            ev.wait()
            if "err" in slot:
                raise slot["err"]
            outs.append(slot["out"])
        return outs

    def _run(self):
        import queue as _q

        pending = None  # mismatched-bucket item held for the NEXT round
        while True:
            # A held item leads the next round rather than being re-queued
            # at the FIFO tail — re-queuing would let sustained traffic of
            # another shape bucket starve a minority-bucket request
            # indefinitely (it lands behind all newly-arrived work each
            # round).
            first = pending if pending is not None else self._q.get()
            pending = None
            group = [first]
            shape = first[0].shape
            t_win0 = time.perf_counter()
            deadline = t_win0 + self.collect_window()
            while len(group) < self.max_batch:
                timeout = deadline - time.perf_counter()
                if timeout <= 0:
                    break
                try:
                    item = self._q.get(timeout=timeout)
                except _q.Empty:
                    break
                if item[0].shape == shape:
                    group.append(item)
                else:  # different bucket: hold it to lead the next round
                    pending = item
                    break
            self.t_collect_s += time.perf_counter() - t_win0
            try:
                # pad the batch dim to max_batch: ONE compiled program per
                # shape bucket regardless of how many requests coalesced
                # (a fresh XLA compile per batch size would dwarf the
                # forward itself)
                t0 = time.perf_counter()
                stack = np.stack([g[0] for g in group])
                pad = self.max_batch - len(group)
                if pad:
                    stack = np.concatenate(
                        [stack, np.zeros((pad,) + stack.shape[1:],
                                         stack.dtype)])
                if self.sharding is not None:
                    # batch dim sharded over the mesh's data axis: each chip
                    # runs max_batch/n_devices rows of the same program
                    dev = jax.device_put(stack, self.sharding)
                else:
                    dev = jnp.asarray(stack)
                t1 = time.perf_counter()
                self.t_h2d_s += t1 - t0
                # fetch only the occupied rows, rounded up to a power of
                # two: D2H cost scales with the coalesced group rather than
                # the padded max_batch, while the row-slice stays one of
                # log2(max_batch) tiny compiled programs (a slice per exact
                # group size caused compile stalls mid-traffic)
                n_fetch = min(self.max_batch,
                              1 << max(0, len(group) - 1).bit_length())
                dev_out = self._fwd(dev)[:n_fetch]
                if self.instrument:
                    # 1-element fetch: waits for execution, ships ~1 byte —
                    # what remains in the row fetch below is pure D2H wire
                    np.asarray(dev_out[:1, :1, :1, :1])
                    t2 = time.perf_counter()
                    self.t_exec_s += t2 - t1
                    out = np.asarray(dev_out)
                    self.t_d2h_s += time.perf_counter() - t2
                else:
                    out = np.asarray(dev_out)
                batch_s = time.perf_counter() - t1
                self.t_exec_fetch_s += batch_s
                self._ema_exec_s = (batch_s if self._ema_exec_s == 0 else
                                    0.7 * self._ema_exec_s + 0.3 * batch_s)
                self._last_fill = len(group)
                self.rows_fetched += n_fetch
                self.n_batches += 1
                self.n_items += len(group)
                for i, (_, ev, slot) in enumerate(group):
                    slot["out"] = out[i]
                    ev.set()
            except Exception as e:  # pragma: no cover - defensive
                for _, ev, slot in group:
                    slot["err"] = e
                    ev.set()


class SRServer:
    def __init__(self, architecture: str, checkpoint: str | None,
                 scale: int = 4, tile: int = 64, dtype=jnp.bfloat16,
                 png_level: int = 1, use_mesh: bool = False,
                 max_batch: int = 8, tta: bool = False,
                 quantize: str = "", phase_tail: bool = True,
                 window_ms: float = 3.0, instrument: bool = False,
                 adaptive_window: bool = False):
        # phase_tail (default on): the RESNET/AttentionSR upsample tail runs
        # fused in pixel-shuffle phase space — exact same math and params,
        # measured +21% AttentionSR x4 throughput on v5e (DESIGN.md §2);
        # SRCNN pre-upsamples, the flag is a no-op there.
        self.scale = scale
        self.tile = tile
        self.png_level = png_level
        self.quantize = quantize
        if architecture == "auto":
            # Infer the network (incl. non-registry width/depth variants)
            # from the checkpoint's tensor shapes — checkpoints carry no
            # metadata, mirroring the reference's bare state_dict files.
            if not checkpoint:
                raise ValueError("--architecture auto requires --checkpoint")
            from food101_sr_tpu.models import (detect_architecture,
                                               model_for_params)

            loaded = load_checkpoint(checkpoint)
            if "g" in loaded and "params" not in loaded:
                # rolling full-state *_last checkpoint: serve its (EMA if
                # present, else raw) generator weights
                g = loaded["g"]
                params = (g["ema_params"] if g.get("ema_params") is not None
                          else g["params"])
                extra = g.get("extra", {})
            else:
                params, extra = loaded["params"], loaded.get("extra", {})
            architecture = detect_architecture(params)
            self.model = model_for_params(params, scale_factor=scale,
                                          dtype=dtype, quantize=quantize,
                                          phase_tail=phase_tail)
            # the checkpoint's upsample stages are authoritative for scale
            self.scale = scale = getattr(self.model, "scale_factor", scale)
            self.variables = {"params": params, **extra}
        else:
            self.model = get_model(architecture, scale_factor=scale,
                                   dtype=dtype, quantize=quantize,
                                   phase_tail=phase_tail)
            variables = self.model.init(
                {"params": jax.random.PRNGKey(0)},
                jnp.zeros((1, 16, 16, 3), jnp.float32), train=False)
            if checkpoint:
                tree = {"params": variables["params"],
                        "extra": {k: v for k, v in variables.items()
                                  if k != "params"}}
                loaded = load_checkpoint(checkpoint, tree)
                self.variables = {"params": loaded["params"],
                                  **loaded["extra"]}
            else:
                self.variables = variables  # random weights (smoke tests)
        self.arch = architecture
        # Halo must cover the receptive-field radius or tiling is no longer
        # exact (seam artifacts); depth-aware for --architecture auto
        # checkpoints deeper than the registry shapes. Under --quantize the
        # guarantee weakens to exact-up-to-quantization-error: dynamic
        # per-sample activation scales depend on tile content, so the same
        # pixel in adjacent overlapping tiles lands on slightly different
        # int8 grids (float paths remain bit-exact).
        self.halo = receptive_radius(architecture, self.model)
        # uint8 in / uint8 out: ToTensor and the 255-quantization both run
        # on device, so host<->device traffic is 4x smaller than shipping
        # float32 either way (the PCIe/tunnel D2H link, not the MXU, is the
        # serving bottleneck for small models).
        def _sr_u8(x8):
            x = x8.astype(jnp.float32) / 255.0
            fwd = lambda b: self.model.apply(self.variables, b, train=False)
            # --tta: x8 geometric self-ensemble inside the same jit (two
            # 4N-batched forwards; quality mode at ~8x device FLOPs, which
            # a host-bound serving deployment mostly absorbs)
            y = self_ensemble(fwd, x) if tta else fwd(x)
            return (jnp.clip(y, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

        self._fwd = jax.jit(_sr_u8)
        sharding = None
        if use_mesh:
            # Multi-chip serving: one jitted program over global arrays on a
            # 1-D data mesh — each device batch is sharded over the mesh's
            # batch axis, so a v5e-8 slice serves 8x the rows per batch.
            from food101_sr_tpu.parallel import data_sharding, make_mesh

            mesh = make_mesh()
            n_dev = len(mesh.devices.flat)
            max_batch = -(-max_batch // n_dev) * n_dev  # round up to a multiple
            if n_dev > 1:
                sharding = data_sharding(mesh)
        self._batcher = MicroBatcher(self._fwd, max_batch=max_batch,
                                     sharding=sharding, window_ms=window_ms,
                                     instrument=instrument,
                                     adaptive=adaptive_window)
        self.n_served = 0
        self._served_lock = threading.Lock()
        # host-side attribution (decode/encode run on handler threads)
        self.t_decode_s = 0.0
        self.t_encode_s = 0.0

    def add_host_time(self, which: str, dt: float):
        with self._served_lock:
            if which == "decode":
                self.t_decode_s += dt
            else:
                self.t_encode_s += dt

    def warmup(self, sizes=None):
        """Precompile the serving programs before taking traffic.

        XLA compiles one program per (shape bucket, occupancy slice); a
        cold compile can take minutes on a fresh cache, which otherwise
        lands on the first unlucky request of each bucket (and stalls the
        whole batcher behind it). Warms each LR shape bucket in ``sizes``
        (default: the single-tile bucket and the tiled-path window bucket)
        at every power-of-two D2H occupancy.
        """
        if sizes is None:
            win = self.tile + 2 * self.halo
            sizes = [(self.tile, self.tile), (win, win)]
        mb = self._batcher
        for h, w in sizes:
            stack = np.zeros((mb.max_batch, h, w, 3), np.uint8)
            dev = (jax.device_put(stack, mb.sharding)
                   if mb.sharding is not None else jnp.asarray(stack))
            n = 1
            while True:
                np.asarray(self._fwd(dev)[:n])
                if n >= mb.max_batch:
                    break
                n = min(2 * n, mb.max_batch)

    def upscale(self, img: Image.Image) -> Image.Image:
        x = np.asarray(img.convert("RGB"), np.uint8)
        h, w = x.shape[:2]
        # pad to a multiple of the tile so the whole service compiles a
        # handful of bucketed shapes; crop the output back.
        ph, pw = (-h) % self.tile, (-w) % self.tile
        xp = np.pad(x, ((0, ph), (0, pw), (0, 0)), mode="edge")
        if max(xp.shape[0], xp.shape[1]) <= self.tile + 2 * self.halo:
            # small images ride the micro-batcher (concurrent requests of
            # the same bucket coalesce into one device batch)
            out = self._batcher.submit(xp)
        else:
            out = self._upscale_tiled(xp)
        with self._served_lock:  # += from concurrent handler threads races
            self.n_served += 1
        return Image.fromarray(out[: h * self.scale, : w * self.scale])

    def _upscale_tiled(self, xp: np.ndarray) -> np.ndarray:
        """Large image -> overlap windows -> micro-batcher -> stitched SR.

        Same window/halo math as parallel.spatial.tiled_apply (shared via
        plan_windows; exact for halo >= the model's receptive-field
        radius), but the windows go through the shared MicroBatcher
        instead of a private device call: every window is one queue item,
        so windows of concurrent requests (and leftover capacity under
        small-image traffic of the same window bucket) coalesce into
        max_batch device batches.

        Windows are submitted in bounded chunks and stitched as each chunk
        completes: a huge-but-legal request (thousands of windows) would
        otherwise hold every SR window in host RAM at once — ~(win/tile)^2
        times the final image — and OOM a small serving host."""
        h, w, c = xp.shape
        tile, s = self.tile, self.scale
        starts_h, starts_w, win_h, win_w = plan_windows(h, w, tile, self.halo)
        coords = [(i, sh, j, sw) for i, sh in enumerate(starts_h)
                  for j, sw in enumerate(starts_w)]
        sr = np.empty((h * s, w * s, c), np.uint8)
        chunk = 4 * self._batcher.max_batch
        for c0 in range(0, len(coords), chunk):
            part = coords[c0:c0 + chunk]
            wins = [np.ascontiguousarray(xp[sh:sh + win_h, sw:sw + win_w])
                    for _, sh, _, sw in part]
            for (i, sh, j, sw), out in zip(part,
                                           self._batcher.submit_many(wins)):
                off_h = (i * tile - sh) * s
                off_w = (j * tile - sw) * s
                sr[i * tile * s:(i + 1) * tile * s,
                   j * tile * s:(j + 1) * tile * s] = \
                    out[off_h:off_h + tile * s, off_w:off_w + tile * s]
        return sr


def make_handler(server, default: str | None = None):
    """HTTP handler for one SRServer or a {name: SRServer} zoo.

    With a dict, ``POST /sr?model=NAME`` routes per request (e.g. a fast
    SRCNN next to a quality AttentionSR on the same chip — each model has
    its own micro-batcher, XLA serializes their device batches);
    ``default`` names the unqualified route (first entry if omitted)."""
    servers = server if isinstance(server, dict) else {"default": server}
    default = default or next(iter(servers))

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive: every response carries Content-Length, so
        # clients can reuse connections — on a single-core host the TCP
        # accept+teardown per request is measurable at high request rates
        protocol_version = "HTTP/1.1"
        # Idle keep-alive timeout. Without it, handler threads block
        # forever in readline() on idle pooled connections — and since
        # graceful shutdown joins handler threads (block_on_close), one
        # idle client would make SIGTERM hang indefinitely.
        timeout = 30

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            if code >= 400:
                # error paths may bail before reading the request body;
                # under HTTP/1.1 keep-alive the unread bytes would desync
                # the next request on this connection — close it instead
                self.close_connection = True
            try:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                if self.close_connection:
                    self.send_header("Connection", "close")
                self.end_headers()
                self.wfile.write(body)
            except OSError:
                # peer closed mid-response (common right after it sent a
                # malformed request): nothing to tell it, nothing to crash
                self.close_connection = True

        def do_GET(self):
            if self.path == "/healthz":
                info = {"status": "ok", "default": default,
                        "device": jax.devices()[0].platform,
                        "models": {n: {"architecture": s.arch,
                                       "scale": s.scale,
                                       "quantize": s.quantize,
                                       "served": s.n_served}
                                   for n, s in servers.items()}}
                if len(servers) == 1:  # single-model back-compat shape
                    s = servers[default]
                    info.update(architecture=s.arch, scale=s.scale,
                                served=s.n_served)
                self._send(200, json.dumps(info).encode(), "application/json")
            elif self.path == "/statz":
                def one(s):
                    b = s._batcher
                    info = {
                        "served": s.n_served,
                        "device_batches": b.n_batches,
                        "batched_items": b.n_items,
                        # <1.0 means the micro-batcher is coalescing; at
                        # 1/max_batch the chip runs full batches every
                        # dispatch
                        "batches_per_item": round(b.n_batches / b.n_items, 4)
                                            if b.n_items else None,
                        "max_batch": b.max_batch,
                        "window_ms": b.window * 1e3,
                        "adaptive_window": b.adaptive,
                        "collect_window_ms": round(b.collect_window() * 1e3,
                                                   2),
                        "queue_depth": b._q.qsize(),
                        # per-stage attribution, cumulative seconds
                        # (t_exec_s/t_d2h_s split only under --instrument;
                        # t_exec_fetch_s always carries execute+D2H)
                        "t_collect_s": round(b.t_collect_s, 3),
                        "t_h2d_s": round(b.t_h2d_s, 3),
                        "t_exec_fetch_s": round(b.t_exec_fetch_s, 3),
                        "rows_fetched": b.rows_fetched,
                        "t_decode_s": round(s.t_decode_s, 3),
                        "t_encode_s": round(s.t_encode_s, 3),
                    }
                    if b.instrument:
                        info["t_exec_s"] = round(b.t_exec_s, 3)
                        info["t_d2h_s"] = round(b.t_d2h_s, 3)
                    return info

                info = (one(servers[default]) if len(servers) == 1
                        else {n: one(s) for n, s in servers.items()})
                self._send(200, json.dumps(info).encode(), "application/json")
            else:
                self._send(404, b"not found; POST an image to /sr", "text/plain")

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse

            url = urlparse(self.path)
            if url.path != "/sr":
                self._send(404, b"POST to /sr", "text/plain")
                return
            # response format: ?format=jpeg[&quality=90] (or Accept:
            # image/jpeg). JPEG responses of photographic SR output are
            # ~10x smaller than fast-PNG and encode faster — the right
            # default for bandwidth-bound clients; PNG stays the default
            # for losslessness.
            q = parse_qs(url.query)
            fmt = q.get("format", [None])[0]
            if fmt is None and "image/jpeg" in self.headers.get("Accept", ""):
                fmt = "jpeg"
            if fmt not in (None, "png", "jpeg", "jpg"):
                self._send(400, b"format must be png or jpeg", "text/plain")
                return
            try:
                quality = int(q.get("quality", ["90"])[0])
            except ValueError:
                self._send(400, b"quality must be an integer", "text/plain")
                return
            srv = servers.get(q.get("model", [default])[0])
            if srv is None:
                self._send(404, ("unknown model; available: "
                                 + ", ".join(servers)).encode(), "text/plain")
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                self._send(400, b"Content-Length must be an integer",
                           "text/plain")
                return
            # <=0 must 400 BEFORE the read: a negative length would make
            # rfile.read() read to EOF, pinning this handler thread on an
            # open connection until the idle timeout
            if length <= 0:
                self._send(400, b"image body required (<=64MB)", "text/plain")
                return
            if length > 64 << 20:
                self._send(413, b"image body required (<=64MB)", "text/plain")
                return
            try:
                data = self.rfile.read(length)
            except OSError:
                self.close_connection = True  # peer vanished mid-body
                return
            if len(data) < length:
                # client promised more bytes than it sent (lying header or
                # death mid-upload): the connection is desynced — reject
                # and close rather than decode a half image
                self._send(400, b"truncated body", "text/plain")
                return
            t_dec = time.perf_counter()
            try:
                img = Image.open(io.BytesIO(data))
                img.load()
            except Exception:
                self._send(400, b"could not decode image", "text/plain")
                return
            srv.add_host_time("decode", time.perf_counter() - t_dec)
            t0 = time.perf_counter()
            sr = srv.upscale(img)
            dt = (time.perf_counter() - t0) * 1e3
            # C++ fast encode: on a single-core TPU-VM host, PIL's encode
            # of a large SR output costs more wall time than the jitted
            # forward itself; the native paths are faster and release the
            # GIL (PNG: fixed SUB filter; JPEG: caller-chosen quality).
            t_enc = time.perf_counter()
            if fmt in ("jpeg", "jpg"):
                body = encode_jpeg_rgb8(np.asarray(sr), quality)
                ctype = "image/jpeg"
            else:
                body = encode_png_rgb8(np.asarray(sr), srv.png_level)
                ctype = "image/png"
            srv.add_host_time("encode", time.perf_counter() - t_enc)
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Inference-Ms", f"{dt:.1f}")
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--architecture", default="AttentionSR",
                   help="model name, or 'auto' to infer architecture and "
                        "width/depth from --checkpoint tensor shapes")
    p.add_argument("--checkpoint", default="",
                   help="orbax checkpoint dir; empty = random init (smoke)")
    p.add_argument("--scale_factor", type=int, default=4)
    p.add_argument("--tile", type=int, default=64)
    p.add_argument("--png_level", type=int, default=1,
                   help="PNG zlib level for responses (1=fastest, 9=smallest)")
    p.add_argument("--tta", action="store_true",
                   help="x8 geometric self-ensemble per request (quality "
                        "mode; ~8x device FLOPs inside the same batch)")
    p.add_argument("--mesh", action="store_true",
                   help="shard device batches over all local devices "
                        "(multi-chip TPU slice serving)")
    p.add_argument("--max_batch", type=int, default=8,
                   help="micro-batcher device batch size (rounded up to a "
                        "multiple of the mesh size with --mesh)")
    p.add_argument("--warmup", action="store_true",
                   help="precompile the common shape buckets before "
                        "listening (cold XLA compiles otherwise land on "
                        "the first request of each bucket)")
    p.add_argument("--warmup_sizes", default="",
                   help="comma-separated HxW LR bucket sizes to warm, e.g. "
                        "'64x64,224x224' (implies --warmup)")
    p.add_argument("--model", action="append", default=[],
                   metavar="NAME=ARCH[@CKPT]",
                   help="multi-model serving: repeat, e.g. --model "
                        "fast=SRCNN --model best=auto@weights/attn_best; "
                        "POST /sr?model=NAME routes (first entry is the "
                        "default). Overrides --architecture/--checkpoint.")
    p.add_argument("--quantize", default="", choices=["", "int8", "int8_dot"],
                   help="dynamic-int8 body convs for RESNET/AttentionSR "
                        "inference (ops/quantize.py; same checkpoints, "
                        "~42-45 dB quantization SNR measured on the winner "
                        "weights). int8_dot selects the im2col+matmul "
                        "lowering where int8 convs aren't native. NB: halo "
                        "tiling of large inputs is exact only up to "
                        "quantization error here — per-sample activation "
                        "scales depend on tile content, so adjacent tiles "
                        "quantize the same pixel on slightly different "
                        "int8 grids.")
    p.add_argument("--no_phase_tail", action="store_true",
                   help="disable the fused phase-space upsample tail "
                        "(exact same math/params; on by default because it "
                        "measures +21%% AttentionSR x4 throughput on v5e — "
                        "this flag exists for A/B timing and debugging)")
    p.add_argument("--batch_window_ms", type=float, default=3.0,
                   help="micro-batcher coalescing window. 3 ms suits the "
                        "small nets (sub-10 ms forwards); for heavy models "
                        "whose forward dwarfs the window the queue itself "
                        "does the coalescing while the device runs, so "
                        "raising this mostly adds latency (A/B'd for RRDB "
                        "in runs/serve_attrib_rrdb.json)")
    p.add_argument("--adaptive_window", action="store_true", default=True,
                   help="(default ON) extend the coalescing window toward "
                        "the measured batch-exec time while the previous "
                        "dispatch went out >=75%% full (sustained load); "
                        "sparse traffic keeps the short fixed window. "
                        "Measured under 32-way load (runs/serve_attrib_*): "
                        "RRDB 38.9 -> 43.2 req/s, AttentionSR 44.4 -> 46.6, "
                        "full 8/8 batches and better p95 on both")
    p.add_argument("--no_adaptive_window", action="store_true",
                   help="disable the adaptive coalescing window (fixed "
                        "--batch_window_ms only; A/B and debugging)")
    p.add_argument("--instrument", action="store_true",
                   help="split device-execute vs D2H time per batch in "
                        "/statz (adds a 1-element sync fetch per batch — "
                        "~one tunnel RTT; attribution runs only)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8700)
    a = p.parse_args()

    def build(arch, ckpt, quantize=None):
        return SRServer(arch, ckpt or None, a.scale_factor, a.tile,
                        png_level=a.png_level, use_mesh=a.mesh,
                        max_batch=a.max_batch, tta=a.tta,
                        quantize=a.quantize if quantize is None else quantize,
                        phase_tail=not a.no_phase_tail,
                        window_ms=a.batch_window_ms, instrument=a.instrument,
                        adaptive_window=(a.adaptive_window
                                         and not a.no_adaptive_window))

    if a.model:
        # validate every spec BEFORE building any server: construction can
        # cost minutes of XLA compile, so fail fast on a bad later entry
        specs = []
        for spec in a.model:
            name, _, rest = spec.partition("=")
            arch, _, ckpt = rest.partition("@")
            if not name or not arch:
                p.error(f"--model needs NAME=ARCH[@CKPT], got {spec!r}")
            if arch == "auto" and not ckpt:
                p.error(f"--model {spec!r}: auto requires @CKPT")
            if any(n == name for n, _, _ in specs):
                p.error(f"--model: duplicate name {name!r}")
            specs.append((name, arch, ckpt))

        def build_spec(name, arch, ckpt):
            # In a zoo, --quantize means "quantize what can be quantized":
            # SRCNN has no body stack (registry rejects it), so it serves
            # float alongside the quantized models instead of killing the
            # whole zoo. Single-model --quantize stays strict.
            q = a.quantize
            if q and arch == "SRCNN":
                print(f"--quantize {q}: model {name!r} (SRCNN) has no "
                      f"quantizable body stack; serving it in float")
                q = ""
            try:
                return build(arch, ckpt, q)
            except ValueError as e:
                if q and "quantizable" in str(e):  # auto@ckpt -> SRCNN
                    print(f"--quantize {q}: model {name!r} ({arch}) is not "
                          f"quantizable; serving it in float")
                    return build(arch, ckpt, "")
                raise

        zoo = {name: build_spec(name, arch, ckpt)
               for name, arch, ckpt in specs}
        srv = zoo
        default = next(iter(zoo))
        to_warm = list(zoo.values())
    else:
        srv = build(a.architecture, a.checkpoint)
        default = None
        to_warm = [srv]
    if a.warmup or a.warmup_sizes:
        sizes = None
        if a.warmup_sizes:
            sizes = [tuple(int(v) for v in s.split("x"))
                     for s in a.warmup_sizes.split(",") if s]
        t0 = time.perf_counter()
        for s in to_warm:
            s.warmup(sizes)
        print(f"warmup done in {time.perf_counter() - t0:.1f}s")
    httpd = SRHTTPServer((a.host, a.port), make_handler(srv, default))

    def _graceful(signum, _frame):
        print(f"signal {signum}: draining in-flight requests ...")
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _graceful)
    signal.signal(signal.SIGINT, _graceful)
    label = (", ".join(f"{n}={s.arch}x{s.scale}" for n, s in srv.items())
             if isinstance(srv, dict) else f"{srv.arch} x{srv.scale}")
    print(f"serving {label} on "
          f"http://{a.host}:{a.port}  (POST /sr, GET /healthz)")
    httpd.serve_forever()
    httpd.server_close()  # joins handler threads (block_on_close)
    n = (sum(s.n_served for s in srv.values()) if isinstance(srv, dict)
         else srv.n_served)
    print(f"shut down cleanly after {n} image(s)")


if __name__ == "__main__":
    main()

"""Serving path: SRServer core (upscale sizes/tiling) without binding a
socket, plus one real HTTP round-trip against a live server."""
import io
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image


def _img(w, h, seed=0):
    arr = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    return Image.fromarray(arr)


@pytest.fixture(scope="module")
def server():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import serve
    import jax.numpy as jnp

    return serve.SRServer("SRCNN", None, scale=4, tile=32, dtype=jnp.float32)


def test_upscale_small_image(server):
    out = server.upscale(_img(20, 12))
    assert out.size == (80, 48)


def test_quantized_serving_close_to_f32():
    """--quantize int8 serves the same checkpoint with a quantized body;
    uint8 outputs stay within a few grey levels of the f32 server's."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import serve
    import jax.numpy as jnp

    srv = serve.SRServer("AttentionSR", None, scale=4, tile=32,
                         dtype=jnp.float32)
    srv_q = serve.SRServer("AttentionSR", None, scale=4, tile=32,
                           dtype=jnp.float32, quantize="int8")
    srv_q.variables = srv.variables  # same (random-init) weights
    img = _img(20, 12, seed=3)
    a = np.asarray(srv.upscale(img), np.int16)
    b = np.asarray(srv_q.upscale(img), np.int16)
    assert a.shape == b.shape
    assert np.mean(np.abs(a - b)) < 3.0  # grey levels (255 scale)
    assert np.max(np.abs(a - b)) < 64


def test_upscale_nonmultiple_size_tiled(server):
    # bigger than tile+2*halo -> goes through tiled_apply; odd size -> padding
    out = server.upscale(_img(70, 50, seed=1))
    assert out.size == (280, 200)


def test_http_roundtrip(server):
    import serve

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve.make_handler(server))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # health
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert b'"status": "ok"' in r.read()
        # SR round trip
        buf = io.BytesIO()
        _img(24, 16, seed=2).save(buf, format="PNG")
        req = urllib.request.Request(f"http://127.0.0.1:{port}/sr",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Type"] == "image/png"
            assert "X-Inference-Ms" in r.headers
            out = Image.open(io.BytesIO(r.read()))
            assert out.size == (96, 64)
        # garbage body -> 400
        req = urllib.request.Request(f"http://127.0.0.1:{port}/sr",
                                     data=b"not an image", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()


def test_tiled_batched_matches_tiled_apply(server):
    """The serving tiled path (windows through the micro-batcher) must
    reproduce the library tiled_apply result on the same padded array."""
    import jax.numpy as jnp
    from food101_sr_tpu.parallel.spatial import tiled_apply

    xp = np.random.default_rng(5).integers(0, 256, (64, 96, 3), dtype=np.uint8)
    ref = np.asarray(tiled_apply(server._fwd, jnp.asarray(xp[None]), 4,
                                 server.tile, server.halo)[0])
    got = server._upscale_tiled(xp)
    assert got.shape == ref.shape
    assert ref.dtype == got.dtype == np.uint8
    assert np.abs(got.astype(np.int16) - ref.astype(np.int16)).max() <= 1


def test_tiled_requests_coalesce(server):
    """Two concurrent large-image requests: windows of both must share
    device batches (no per-request serialization) and match serial results."""
    import concurrent.futures as cf

    imgs = [_img(90, 60, seed=20 + i) for i in range(2)]
    serial = [np.asarray(server.upscale(im), np.int16) for im in imgs]

    b0 = server._batcher.n_batches
    with cf.ThreadPoolExecutor(max_workers=2) as pool:
        outs = list(pool.map(server.upscale, imgs))
    batches_used = server._batcher.n_batches - b0
    # 96x64 pad / tile 32 / halo 8 -> 6 windows per image, 12 items total;
    # coalesced that's ~2 batches of <=8; serialized-per-window would be 12.
    # Generous bound (scheduling jitter on a 1-core host) still proves sharing.
    assert batches_used <= 6, f"tiled windows did not coalesce: {batches_used}"
    for s, o in zip(serial, outs):
        diff = np.abs(s - np.asarray(o, np.int16))
        assert diff.max() <= 1


def test_mesh_serving_matches_single_device(server):
    """--mesh serving: batches sharded over the 8-virtual-device CPU mesh
    must reproduce single-device results (both paths: small + tiled)."""
    import serve
    import jax.numpy as jnp

    mesh_srv = serve.SRServer("SRCNN", None, scale=4, tile=32,
                              dtype=jnp.float32, use_mesh=True, max_batch=6)
    # SRCNN weights are randomly initialized per-server; share them
    mesh_srv.variables = server.variables
    assert mesh_srv._batcher.max_batch % 8 == 0  # rounded up to mesh size

    small, large = _img(20, 12, seed=30), _img(90, 60, seed=31)
    for img in (small, large):
        a = np.asarray(server.upscale(img), np.int16)
        b = np.asarray(mesh_srv.upscale(img), np.int16)
        assert np.abs(a - b).max() <= 1


def test_warmup_precompiles_without_traffic(server):
    """warmup() must not consume batcher slots and must leave results
    unchanged."""
    before = np.asarray(server.upscale(_img(20, 12, seed=40)), np.int16)
    b0, i0 = server._batcher.n_batches, server._batcher.n_items
    server.warmup()
    assert (server._batcher.n_batches, server._batcher.n_items) == (b0, i0)
    after = np.asarray(server.upscale(_img(20, 12, seed=40)), np.int16)
    np.testing.assert_array_equal(before, after)


def test_micro_batcher_coalesces_concurrent_requests(server):
    """Concurrent same-size requests must produce results identical to
    serial calls AND coalesce into fewer device batches."""
    import concurrent.futures as cf

    imgs = [_img(24, 16, seed=10 + i) for i in range(8)]
    serial = [np.asarray(server.upscale(im)) for im in imgs]

    b0 = server._batcher.n_batches
    with cf.ThreadPoolExecutor(max_workers=8) as pool:
        outs = list(pool.map(server.upscale, imgs))
    batches_used = server._batcher.n_batches - b0
    for s, o in zip(serial, outs):
        # batched vs single forward may differ by float rounding at a
        # uint8 quantization boundary — allow 1 step
        diff = np.abs(s.astype(np.int16) - np.asarray(o).astype(np.int16))
        assert diff.max() <= 1
    assert batches_used < len(imgs), (
        f"no coalescing: {batches_used} batches for {len(imgs)} requests")


def test_architecture_auto_from_checkpoint(server, tmp_path):
    """--architecture auto must reconstruct the model (incl. width/depth)
    from the checkpoint tensors and serve identically to the explicit
    server sharing the same weights."""
    import serve
    from food101_sr_tpu.training import save_checkpoint

    params = server.variables["params"]
    extra = {k: v for k, v in server.variables.items() if k != "params"}
    path = save_checkpoint({"params": params, "extra": extra},
                           str(tmp_path / "ckpt"))

    import jax.numpy as jnp

    auto = serve.SRServer("auto", path, scale=4, tile=32, dtype=jnp.float32)
    assert auto.arch == "SRCNN"
    img = _img(20, 12, seed=50)
    a = np.asarray(server.upscale(img), np.int16)
    b = np.asarray(auto.upscale(img), np.int16)
    assert np.abs(a - b).max() <= 1


def test_http_jpeg_response_format(server):
    """?format=jpeg (and Accept: image/jpeg) return a JPEG body."""
    import serve

    httpd = serve.SRHTTPServer(("127.0.0.1", 0), serve.make_handler(server))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        buf = io.BytesIO()
        _img(24, 16, seed=60).save(buf, format="PNG")
        body = buf.getvalue()
        for url, hdrs in (
            (f"http://127.0.0.1:{port}/sr?format=jpeg&quality=85", {}),
            (f"http://127.0.0.1:{port}/sr", {"Accept": "image/jpeg"}),
        ):
            req = urllib.request.Request(url, data=body, method="POST",
                                         headers=hdrs)
            with urllib.request.urlopen(req) as r:
                assert r.headers["Content-Type"] == "image/jpeg"
                out = Image.open(io.BytesIO(r.read()))
                assert out.size == (96, 64) and out.format == "JPEG"
        # default stays lossless PNG
        req = urllib.request.Request(f"http://127.0.0.1:{port}/sr",
                                     data=body, method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Type"] == "image/png"
        # bad format -> 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/sr?format=webp", data=body,
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()


def test_statz_endpoint(server):
    """/statz reports micro-batcher coalescing counters."""
    import json as _json
    import serve

    httpd = serve.SRHTTPServer(("127.0.0.1", 0), serve.make_handler(server))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        server.upscale(_img(20, 12, seed=70))
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/statz") as r:
            stats = _json.loads(r.read())
        assert stats["device_batches"] >= 1
        assert stats["batched_items"] >= stats["device_batches"]
        assert stats["max_batch"] == server._batcher.max_batch
        # round-5 attribution fields: cumulative per-stage seconds
        # (t_exec_fetch_s carries execute+D2H; the exec/D2H split only
        # appears under --instrument)
        for key in ("t_collect_s", "t_h2d_s", "t_exec_fetch_s",
                    "t_decode_s", "t_encode_s", "window_ms"):
            assert key in stats, key
        assert stats["t_exec_fetch_s"] > 0
        assert stats["rows_fetched"] >= 1
        assert "t_exec_s" not in stats  # not an --instrument server
    finally:
        httpd.shutdown()


def test_statz_instrumented_split_and_window():
    """--instrument splits execute vs D2H per batch; --batch_window_ms is
    honored by the micro-batcher (the RRDB serving-attribution knob)."""
    import json as _json
    import serve
    import jax.numpy as jnp

    srv = serve.SRServer("SRCNN", None, scale=4, tile=32,
                         dtype=jnp.float32, window_ms=7.5, instrument=True)
    assert srv._batcher.window == pytest.approx(7.5e-3)
    httpd = serve.SRHTTPServer(("127.0.0.1", 0), serve.make_handler(srv))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        srv.upscale(_img(20, 12, seed=71))
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/statz") as r:
            stats = _json.loads(r.read())
        assert stats["window_ms"] == pytest.approx(7.5)
        assert stats["t_exec_s"] >= 0
        assert stats["t_d2h_s"] >= 0
        # split must account for (nearly all of) the combined counter
        assert (stats["t_exec_s"] + stats["t_d2h_s"]
                <= stats["t_exec_fetch_s"] + 1e-6)
    finally:
        httpd.shutdown()


def test_tta_serving_matches_library_ensemble(server):
    """--tta serving output equals the library self-ensemble of the same
    forward (and differs from the plain forward)."""
    import serve
    import jax
    import jax.numpy as jnp
    import numpy as np
    from food101_sr_tpu.ops import self_ensemble

    srv = serve.SRServer("SRCNN", None, scale=4, tile=32,
                         dtype=jnp.float32, tta=True)
    srv.variables = server.variables  # share weights with the plain server

    img = _img(20, 12, seed=80)
    a = np.asarray(srv.upscale(img), np.int16)
    b = np.asarray(server.upscale(img), np.int16)
    assert a.shape == b.shape and np.abs(a - b).max() > 1  # actually ensembles

    x = np.asarray(img.convert("RGB"), np.float32)[None] / 255.0
    # pad like the server does (tile 32 -> 32x32 bucket)
    xp = np.pad(x, ((0, 0), (0, 20), (0, 12), (0, 0)), mode="edge")
    fwd = lambda bch: srv.model.apply(srv.variables, bch, train=False)
    ref = np.asarray(jnp.clip(self_ensemble(fwd, jnp.asarray(xp)), 0, 1))
    ref8 = (ref[0, :48, :80] * 255.0 + 0.5).astype(np.int16)
    assert np.abs(a - ref8).max() <= 1


def test_zoo_quantize_skips_unquantizable(server, tmp_path):
    """serve.py CLI: in a --model zoo, --quantize int8 applies only to
    quantizable archs; SRCNN (explicit or auto-detected from a checkpoint)
    serves float with a loud note instead of killing the whole zoo
    (regression: the zoo used to die on the registry's SRCNN rejection)."""
    import json as _json
    import os
    import signal
    import socket
    import subprocess
    import sys
    import time

    import serve
    from food101_sr_tpu.training import save_checkpoint

    repo = os.path.join(os.path.dirname(__file__), "..")
    params = server.variables["params"]
    extra = {k: v for k, v in server.variables.items() if k != "params"}
    ckpt = save_checkpoint({"params": params, "extra": extra},
                           str(tmp_path / "srcnn_ckpt"))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, "serve.py",
         "--model", "fast=SRCNN", "--model", f"auto_s=auto@{ckpt}",
         "--model", "best=RESNET", "--quantize", "int8",
         "--tile", "16", "--max_batch", "2", "--port", str(port)],
        cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    try:
        deadline = time.time() + 420  # cold CPU compiles for 3 models
        h = None
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"serve.py died rc={proc.returncode}:\n"
                    f"{proc.stdout.read()[-4000:]}")
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=5) as r:
                    h = _json.loads(r.read())
                break
            except (urllib.error.URLError, OSError):
                time.sleep(1.0)
        assert h is not None, "server never came up"
        assert set(h["models"]) == {"fast", "auto_s", "best"}
        # only the quantizable arch got the int8 body
        assert h["models"]["best"]["quantize"] == "int8"
        assert h["models"]["fast"]["quantize"] == ""
        assert h["models"]["auto_s"]["quantize"] == ""
        assert h["models"]["auto_s"]["architecture"] == "SRCNN"
        # every model actually serves
        buf = io.BytesIO()
        _img(16, 16, seed=91).save(buf, format="PNG")
        body = buf.getvalue()
        for name in ("fast", "auto_s", "best"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/sr?model={name}", data=body,
                method="POST")
            with urllib.request.urlopen(req, timeout=600) as r:
                out = np.asarray(Image.open(io.BytesIO(r.read())))
            assert out.shape == (64, 64, 3)
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            out, _ = proc.communicate(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
    # both float fallbacks announced themselves loudly
    assert out.count("serving it in float") == 2, out[-4000:]


def test_multi_model_routing(server):
    """?model= routes between models in one process; unknown -> 404;
    healthz/statz report the zoo."""
    import json as _json
    import serve
    import jax.numpy as jnp

    other = serve.SRServer("RESNET", None, scale=4, tile=32,
                           dtype=jnp.float32)
    zoo = {"fast": server, "best": other}
    httpd = serve.SRHTTPServer(("127.0.0.1", 0), serve.make_handler(zoo))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            h = _json.loads(r.read())
        assert h["default"] == "fast"
        assert set(h["models"]) == {"fast", "best"}
        assert h["models"]["best"]["architecture"] == "RESNET"

        buf = io.BytesIO()
        _img(16, 16, seed=90).save(buf, format="PNG")
        body = buf.getvalue()
        outs = {}
        for name in ("fast", "best"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/sr?model={name}", data=body,
                method="POST")
            with urllib.request.urlopen(req) as r:
                outs[name] = np.asarray(
                    Image.open(io.BytesIO(r.read())), np.int16)
        assert outs["fast"].shape == outs["best"].shape == (64, 64, 3)
        assert np.abs(outs["fast"] - outs["best"]).max() > 1  # distinct nets
        # unqualified route == default model
        req = urllib.request.Request(f"http://127.0.0.1:{port}/sr",
                                     data=body, method="POST")
        with urllib.request.urlopen(req) as r:
            d = np.asarray(Image.open(io.BytesIO(r.read())), np.int16)
        assert np.array_equal(d, outs["fast"])
        # unknown model -> 404
        req = urllib.request.Request(f"http://127.0.0.1:{port}/sr?model=nope",
                                     data=body, method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 404
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/statz") as r:
            st = _json.loads(r.read())
        assert set(st) == {"fast", "best"}
    finally:
        httpd.shutdown()


# ---------------------------------------------------------------------------
# Malformed-input fuzzing + graceful drain (VERDICT r3 weak #6): the error
# paths exist; these tests actually feed them the traffic they were written
# for — through raw sockets, because urllib cannot send lies.
# ---------------------------------------------------------------------------

def _raw_request(port, payload: bytes, recv_timeout=10.0) -> bytes:
    """Send raw bytes, half-close the send side, read the full response."""
    import socket

    with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
        s.sendall(payload)
        s.shutdown(socket.SHUT_WR)
        s.settimeout(recv_timeout)
        chunks = []
        try:
            while True:
                b = s.recv(65536)
                if not b:
                    break
                chunks.append(b)
        except OSError:
            pass
        return b"".join(chunks)


@pytest.fixture()
def live_server(server):
    import serve

    httpd = serve.SRHTTPServer(("127.0.0.1", 0), serve.make_handler(server))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        yield httpd, port
    finally:
        httpd.shutdown()
        httpd.server_close()


def _post_ok(port):
    """A normal request succeeds — the server survived whatever came before."""
    buf = io.BytesIO()
    _img(16, 16, seed=77).save(buf, format="PNG")
    req = urllib.request.Request(f"http://127.0.0.1:{port}/sr",
                                 data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert Image.open(io.BytesIO(r.read())).size == (64, 64)


def test_oversized_content_length_413(live_server):
    _, port = live_server
    # header lies about a 100MB body that is never sent: must 413 from the
    # header alone, without waiting for bytes
    resp = _raw_request(
        port,
        b"POST /sr HTTP/1.1\r\nHost: x\r\nContent-Length: 104857600\r\n\r\n")
    assert resp.startswith(b"HTTP/1.1 413"), resp[:200]
    _post_ok(port)


def test_negative_content_length_400(live_server):
    _, port = live_server
    # a negative length must NOT reach rfile.read() (read(-1) would pin the
    # handler thread reading to EOF on a held-open connection)
    resp = _raw_request(
        port, b"POST /sr HTTP/1.1\r\nHost: x\r\nContent-Length: -5\r\n\r\n")
    assert resp.startswith(b"HTTP/1.1 400"), resp[:200]
    _post_ok(port)


def test_non_numeric_content_length_400(live_server):
    _, port = live_server
    resp = _raw_request(
        port, b"POST /sr HTTP/1.1\r\nHost: x\r\nContent-Length: banana\r\n\r\n")
    assert resp.startswith(b"HTTP/1.1 400"), resp[:200]
    _post_ok(port)


def test_truncated_body_400(live_server):
    _, port = live_server
    # promises 5000 bytes, delivers 10, then half-closes: the server must
    # detect the short read and reject rather than decode a half image
    resp = _raw_request(
        port,
        b"POST /sr HTTP/1.1\r\nHost: x\r\nContent-Length: 5000\r\n\r\n"
        b"0123456789")
    assert resp.startswith(b"HTTP/1.1 400"), resp[:200]
    assert b"truncated" in resp
    _post_ok(port)


def test_garbage_request_line_survived(live_server):
    _, port = live_server
    resp = _raw_request(port, b"\x00\xff GARBAGE\r\n\r\n")
    # http.server answers 400 (or just closes); either way the server lives
    assert resp == b"" or b"400" in resp.split(b"\r\n", 1)[0], resp[:200]
    _post_ok(port)


def test_non_image_payload_400_raw(live_server):
    _, port = live_server
    body = b"this is not an image at all, not even close"
    resp = _raw_request(
        port,
        b"POST /sr HTTP/1.1\r\nHost: x\r\nContent-Length: "
        + str(len(body)).encode() + b"\r\n\r\n" + body)
    assert resp.startswith(b"HTTP/1.1 400"), resp[:200]
    assert b"could not decode" in resp
    _post_ok(port)


def test_shutdown_drains_in_flight_requests(server):
    """The graceful-shutdown contract (serve.py main's SIGTERM handler is
    exactly `threading.Thread(target=httpd.shutdown)`): a request already
    being handled when shutdown starts must complete with a full 200
    response, not die mid-flight."""
    import serve

    httpd = serve.SRHTTPServer(("127.0.0.1", 0), serve.make_handler(server))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever)
    t.start()

    # a large image takes the tiled path -> many device batches -> slow
    # enough on this host that shutdown lands mid-request
    buf = io.BytesIO()
    _img(200, 150, seed=88).save(buf, format="PNG")
    results = {}

    def slow_request():
        req = urllib.request.Request(f"http://127.0.0.1:{port}/sr",
                                     data=buf.getvalue(), method="POST")
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                results["img"] = Image.open(io.BytesIO(r.read()))
        except Exception as e:  # pragma: no cover - the failure under test
            results["err"] = e

    rt = threading.Thread(target=slow_request)
    rt.start()
    time.sleep(0.5)  # let the request reach the handler
    httpd.shutdown()  # what SIGTERM does in serve.py main
    httpd.server_close()  # joins handler threads (block_on_close)
    rt.join(timeout=120)
    t.join(timeout=30)
    assert not rt.is_alive() and not t.is_alive()
    assert "err" not in results, results.get("err")
    assert results["img"].size == (800, 600)


def test_adaptive_window_policy():
    """Adaptive coalescing (round 5): the collect window stays at the
    short fixed value for sparse traffic, extends toward the batch-exec
    EMA only after a >=75%-full dispatch, and caps at 100 ms."""
    import serve

    mb = serve.MicroBatcher.__new__(serve.MicroBatcher)
    mb.window = 3e-3
    mb.max_batch = 8
    mb.adaptive = True
    mb._ema_exec_s = 0.0
    mb._last_fill = 0
    # no exec history yet -> fixed window
    assert mb.collect_window() == pytest.approx(3e-3)
    # exec history but last dispatch was sparse -> still fixed
    mb._ema_exec_s = 0.08
    mb._last_fill = 2
    assert mb.collect_window() == pytest.approx(3e-3)
    # >=75% full dispatch -> extend toward 0.75 * ema
    mb._last_fill = 6
    assert mb.collect_window() == pytest.approx(0.06)
    # cap at 100 ms for very slow models
    mb._ema_exec_s = 0.5
    assert mb.collect_window() == pytest.approx(0.1)
    # adaptive off -> always fixed
    mb.adaptive = False
    assert mb.collect_window() == pytest.approx(3e-3)

"""Content-addressed artifact push/pull/status (the DVC-layer stand-in)."""
import json
import os
import subprocess
import sys

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "artifact_sync.py")


def _run(*args):
    return subprocess.run([sys.executable, TOOL, *args],
                          capture_output=True, text=True)


def test_push_pull_roundtrip(tmp_path):
    src = tmp_path / "weights"
    (src / "sub").mkdir(parents=True)
    (src / "a.bin").write_bytes(b"alpha" * 100)
    (src / "sub" / "b.bin").write_bytes(b"beta" * 50)
    store = str(tmp_path / "store")

    r = _run("push", str(src), "--store", store)
    assert r.returncode == 0, r.stderr
    manifest = json.loads((tmp_path / "weights.manifest.json").read_text())
    assert manifest["nfiles"] == 2

    # corrupt + delete, then pull restores both
    (src / "a.bin").write_bytes(b"corrupted")
    (src / "sub" / "b.bin").unlink()
    r = _run("pull", str(src), "--store", store)
    assert r.returncode == 0, r.stderr
    assert (src / "a.bin").read_bytes() == b"alpha" * 100
    assert (src / "sub" / "b.bin").read_bytes() == b"beta" * 50

    r = _run("status", str(src), "--store", store)
    assert r.returncode == 0 and "clean" in r.stdout


def test_status_detects_drift(tmp_path):
    src = tmp_path / "report"
    src.mkdir()
    (src / "x.png").write_bytes(b"png")
    store = str(tmp_path / "store")
    _run("push", str(src), "--store", store)

    (src / "x.png").write_bytes(b"png2")
    (src / "new.png").write_bytes(b"new")
    r = _run("status", str(src), "--store", store)
    assert r.returncode == 1
    assert "changed: x.png" in r.stdout
    assert "untracked: new.png" in r.stdout


def test_pull_missing_blob_fails_loudly(tmp_path):
    src = tmp_path / "d"
    src.mkdir()
    (src / "f").write_bytes(b"data")
    store = str(tmp_path / "store")
    _run("push", str(src), "--store", store)
    (src / "f").unlink()
    import shutil
    shutil.rmtree(store)
    r = _run("pull", str(src), "--store", store)
    assert r.returncode != 0
    assert "missing blob" in r.stderr + r.stdout


def test_gc_removes_only_unreferenced_blobs(tmp_path):
    """gc keeps every blob any given manifest references and removes the
    rest (stale revisions); pull still works afterwards."""
    import shutil

    store = str(tmp_path / "store")
    d1, d2 = tmp_path / "a", tmp_path / "b"
    for d, content in ((d1, b"one"), (d2, b"two")):
        d.mkdir()
        (d / "f.bin").write_bytes(content)
        assert _run("push", str(d), "--store", store).returncode == 0
    # revise d1: its old blob becomes unreferenced by the NEW manifest
    (d1 / "f.bin").write_bytes(b"one-v2")
    assert _run("push", str(d1), "--store", store).returncode == 0

    r = _run("gc", str(d1), str(d2), "--store", store)
    assert r.returncode == 0 and "removed 1 blob" in r.stdout

    # both dirs restore from the collected store
    for d in (d1, d2):
        shutil.rmtree(d)
        assert _run("pull", str(d), "--store", store).returncode == 0
    assert (d1 / "f.bin").read_bytes() == b"one-v2"
    assert (d2 / "f.bin").read_bytes() == b"two"

"""CLI-level tests for predict.py — offline bulk SR (the batch-inference
counterpart of the serving stack; engine shared with serve.py's SRServer).
Runs on the virtual-CPU backend with random SRCNN weights: pins I/O
collection, output naming/shape, the small-image micro-batch path AND the
exact-halo tiled path, plus per-file failure isolation."""
import json
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import predict  # noqa: E402


def _write_png(path, h, w, seed=0):
    rng = np.random.default_rng(seed)
    Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8)).save(path)


def test_collect_inputs_dirs_globs_dedup(tmp_path):
    d = tmp_path / "imgs"
    (d / "sub").mkdir(parents=True)
    _write_png(d / "a.png", 8, 8)
    _write_png(d / "sub" / "b.jpg", 8, 8)
    (d / "notes.txt").write_text("not an image")
    paths, empty = predict.collect_inputs([str(d), str(d / "a.png"),
                                           str(d / "*.png")])
    names = [Path(p).name for p in paths]
    assert names == ["a.png", "b.jpg"]  # recursed, filtered, deduped, sorted
    assert empty == []
    # a typoed directory among matching inputs is REPORTED, not dropped
    _, empty = predict.collect_inputs([str(d), str(d / "nope_dir")])
    assert empty == [str(d / "nope_dir")]


def test_output_names_disambiguate_duplicate_stems():
    names = predict.output_names(
        ["a/cat.png", "b/cat.png", "c/cat.jpg", "dog.png"], "_x4", ".png")
    assert names["a/cat.png"] == "cat_x4.png"
    assert names["b/cat.png"] == "cat_2_x4.png"
    assert names["c/cat.jpg"] == "cat_3_x4.png"
    assert names["dog.png"] == "dog_x4.png"
    assert len(set(names.values())) == 4


def test_predict_end_to_end_small_and_tiled(tmp_path, capsys, monkeypatch):
    src = tmp_path / "in"
    src.mkdir()
    _write_png(src / "small.png", 20, 24, seed=1)
    # > tile + 2*halo (16 + 2*8 for SRCNN) on both axes -> tiled path
    _write_png(src / "big.png", 48, 56, seed=2)
    (src / "corrupt.jpg").write_bytes(b"\xff\xd8 not actually a jpeg")
    out = tmp_path / "out"

    monkeypatch.setattr(sys, "argv", [
        "predict.py", str(src), "--out_dir", str(out),
        "--architecture", "SRCNN", "--tile", "16", "--max_batch", "4",
        "--concurrency", "2", "--suffix", "_sr"])
    predict.main()

    small = Image.open(out / "small_sr.png")
    big = Image.open(out / "big_sr.png")
    assert small.size == (24 * 4, 20 * 4)  # PIL size is (W, H)
    assert big.size == (56 * 4, 48 * 4)
    assert not (out / "corrupt_sr.png").exists()

    captured = capsys.readouterr()
    summary = json.loads(captured.out.strip().splitlines()[-1])
    assert summary["n_images"] == 2 and summary["failed"] == 1
    assert summary["architecture"] == "SRCNN" and summary["scale"] == 4
    assert "FAILED" in captured.err and "corrupt.jpg" in captured.err


def test_predict_strict_exits_nonzero_on_partial_failure(tmp_path,
                                                         monkeypatch):
    # Default: partial failure exits 0 (per-file isolation; the JSON
    # summary carries the failed count). --strict flips that for scripted
    # callers that gate on the exit code (ADVICE r2).
    src = tmp_path / "in"
    src.mkdir()
    _write_png(src / "ok.png", 8, 8, seed=1)
    (src / "bad.png").write_bytes(b"nope")
    argv = ["predict.py", str(src), "--out_dir", str(tmp_path / "out"),
            "--architecture", "SRCNN", "--tile", "16", "--strict"]
    monkeypatch.setattr(sys, "argv", argv)
    with pytest.raises(SystemExit) as e:
        predict.main()
    assert e.value.code == 1
    assert (tmp_path / "out" / "ok_x4.png").exists()  # good file still done


def test_predict_all_failures_exits_nonzero(tmp_path, monkeypatch):
    src = tmp_path / "in"
    src.mkdir()
    (src / "bad.png").write_bytes(b"nope")
    monkeypatch.setattr(sys, "argv", [
        "predict.py", str(src), "--out_dir", str(tmp_path / "out"),
        "--architecture", "SRCNN", "--tile", "16"])
    with pytest.raises(SystemExit) as e:
        predict.main()
    assert e.value.code == 1

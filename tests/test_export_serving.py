"""AOT serving export (`tools/export_serving.py`): the serialized StableHLO
program must round-trip byte-exact against the live serving forward, and the
manifest must describe the artifact fully."""
import hashlib
import json
import os

import numpy as np
import pytest


def _run(tmp_path, extra):
    from tools.export_serving import main

    out = str(tmp_path / "aot")
    main(["--architecture", "SRCNN", "--out", out, "--batch", "2",
          "--check", *extra])
    return out


def test_export_check_and_manifest(tmp_path):
    out = _run(tmp_path, ["--shapes", "16x16,24x20"])
    with open(os.path.join(out, "manifest.json")) as f:
        man = json.load(f)
    assert man["architecture"] == "SRCNN"
    assert man["scale"] == 4
    assert man["io"].startswith("uint8 NHWC")
    assert len(man["buckets"]) == 2
    for b in man["buckets"]:
        path = os.path.join(out, b["file"])
        blob = open(path, "rb").read()
        assert len(blob) == b["bytes"]
        assert hashlib.sha256(blob).hexdigest() == b["sha256"]
        assert b["sr_shape"][1] == b["lr_shape"][1] * 4


def test_deserialized_program_needs_no_model_code(tmp_path):
    """The deployment contract: deserialize + call, nothing else — and the
    result is uint8 of the promised shape."""
    out = _run(tmp_path, ["--shapes", "16x16"])
    from jax import export as jexport

    with open(os.path.join(out, "manifest.json")) as f:
        b = json.load(f)["buckets"][0]
    exp = jexport.deserialize(
        open(os.path.join(out, b["file"]), "rb").read())
    x = np.random.default_rng(1).integers(0, 256, b["lr_shape"],
                                          dtype=np.uint8)
    y = np.asarray(exp.call(x))
    assert y.dtype == np.uint8
    assert list(y.shape) == b["sr_shape"]
    # a real image-range output, not a degenerate constant
    assert y.std() > 0


def test_bad_shapes_rejected(tmp_path):
    from tools.export_serving import main

    with pytest.raises(SystemExit):
        main(["--architecture", "SRCNN", "--out", str(tmp_path / "x"),
              "--shapes", "64"])
    with pytest.raises(SystemExit):
        main(["--architecture", "SRCNN", "--out", str(tmp_path / "x"),
              "--shapes", "0x64"])

"""tools/profile_summary.py: trace parsing + op bucketing on a synthetic
perfetto trace (the format jax.profiler writes next to the xplane.pb)."""
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_summary import bucket_of, find_trace, summarize


def _write_trace(tmp_path):
    events = [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0 (compute)"}},
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "python host"}},
        # enclosing spans that must NOT be double-counted
        {"ph": "X", "pid": 1, "tid": 1, "name": "jit_train_step(123)",
         "ts": 0, "dur": 1000},
        {"ph": "X", "pid": 1, "tid": 2, "name": "7", "ts": 0, "dur": 1000},
        # leaf device ops
        {"ph": "X", "pid": 1, "tid": 3, "name": "convolution_add_fusion",
         "ts": 0, "dur": 600},
        {"ph": "X", "pid": 1, "tid": 3, "name": "copy.42", "ts": 600,
         "dur": 100},
        {"ph": "X", "pid": 1, "tid": 3, "name": "fusion.99", "ts": 700,
         "dur": 300},
        # host event: ignored (wrong pid)
        {"ph": "X", "pid": 2, "tid": 1, "name": "callback", "ts": 0,
         "dur": 5000},
    ]
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return tmp_path


def test_summarize_buckets_and_excludes_spans(tmp_path, capsys):
    root = _write_trace(tmp_path)
    per_bucket, per_op = summarize(find_trace(str(root)))
    # spans and host events excluded: busy = 600 + 100 + 300 us
    assert sum(per_op.values()) == 1000
    assert "jit_train_step(123)" not in per_op and "7" not in per_op
    assert per_bucket["mxu"] == 600            # convolution fusion
    assert per_bucket["data-movement"] == 100  # copy
    assert per_bucket["elementwise"] == 300    # generic fusion
    out = capsys.readouterr().out
    assert "100% occupancy" in out


def test_bucket_classifier():
    assert bucket_of("convolution_add_fusion.3") == "mxu"
    assert bucket_of("all-reduce.1") == "collective"
    assert bucket_of("transpose.7") == "data-movement"
    assert bucket_of("infeed") == "infeed/outfeed"
    assert bucket_of("weird_op") == "other"

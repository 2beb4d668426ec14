"""RRDB dense-block compute-layout equivalence (models/rrdb.py).

The ``split`` layout rewrites conv-over-concat per source by linearity so
every GEMM presents >=64 (up to 192) output lanes to the MXU and no
activation concatenate exists in forward or backward (the concat form's
backward fusion crashed the tunnel compiler at train batch >= 64 —
VERDICT r4 weak #1). Same param tree, same math up to re-associated sums:
these tests pin that equivalence so the layout can never drift from the
checkpoint-defining concat semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from food101_sr_tpu.models.rrdb import RRDBNet

KW = dict(scale_factor=4, num_blocks=2, num_channels=32, growth=16)


def _x(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(0, 1, shape).astype(np.float32))


def test_split_param_tree_identical_to_concat():
    """Checkpoints are layout-blind: identical tree structure, names, and
    shapes (conv{k}/conv/{kernel,bias}), and identical init values from the
    same seed."""
    m_cat = RRDBNet(dense_layout="concat", **KW)
    m_spl = RRDBNet(dense_layout="split", **KW)
    x = _x((1, 8, 8, 3))
    v1 = m_cat.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    v2 = m_spl.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(v1),
                    jax.tree_util.tree_leaves(v2)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_split_forward_matches_concat():
    m_cat = RRDBNet(dense_layout="concat", **KW)
    m_spl = RRDBNet(dense_layout="split", **KW)
    x = _x((2, 10, 10, 3), seed=1)
    v = m_cat.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    y1 = m_cat.apply(v, x, train=False)
    y2 = m_spl.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               atol=1e-5, rtol=1e-5)


def test_split_gradients_match_concat():
    """Backward parity with shared params: the layouts must train
    identically (raw gradients, not post-Adam params — CLAUDE.md rule)."""
    m_cat = RRDBNet(dense_layout="concat", **KW)
    m_spl = RRDBNet(dense_layout="split", **KW)
    x = _x((2, 8, 8, 3), seed=2)
    v = m_cat.init({"params": jax.random.PRNGKey(2)}, x, train=False)
    tgt = _x((2, 32, 32, 3), seed=3)

    def loss(params, model):
        return jnp.mean(jnp.abs(model.apply(params, x, train=False) - tgt))

    g1 = jax.grad(lambda p: loss(p, m_cat))(v)
    g2 = jax.grad(lambda p: loss(p, m_spl))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=1e-4)


def test_split_no_activation_concatenate_in_hlo():
    """The point of the layout: NO concatenate OP producing an
    activation-sized result in the compiled train-graph. Weight-side
    concats (the kernel regrouping, [3,3,...] results) are fine — they are
    KB-scale; the regression this guards against is the batch-scaled
    concat fusion reappearing (it crashed the tunnel compiler at batch
    >= 64). The concat layout trips this detector (asserted below), so
    the check is known to discriminate."""
    import re

    from food101_sr_tpu.losses import mse_loss
    from food101_sr_tpu.training import (SRTrainState, make_adam,
                                         make_train_step)

    def activation_concats(layout):
        model = RRDBNet(dense_layout=layout, **KW)
        v = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 8, 8, 3), jnp.float32), train=False)
        state = SRTrainState.create(dict(v), make_adam(1e-4))
        hr = jnp.zeros((4, 32, 32, 3), jnp.uint8)
        step = make_train_step(model, mse_loss, 4,
                               "input_conv", "output_conv")
        hlo = jax.jit(step).lower(state, hr).compile().as_text()
        # a concatenate op (not an operand reference) with a batched
        # [4,8,8,...] result: `%x = f32[4,8,8,C]{...} concatenate(...`
        pat = re.compile(r"=\s*\S+\[4,8,8[,\]][^=]*\bconcatenate\(")
        return [ln for ln in hlo.splitlines() if pat.search(ln)]

    assert activation_concats("concat"), (
        "detector no longer sees the concat layout's activation concats — "
        "fix the pattern before trusting the split assertion")
    bad = activation_concats("split")
    assert not bad, f"activation-sized concatenate in split-layout HLO: {bad[:3]}"


def test_quantize_falls_back_to_concat():
    """Quantized bodies keep the concat layout (per-conv activation scales
    are defined on the concatenated inputs)."""
    m = RRDBNet(dense_layout="split", quantize="qat", **KW)
    assert m.resolved_layout(train=True) == "concat"
    m2 = RRDBNet(dense_layout="auto", quantize="int8", **KW)
    assert m2.resolved_layout() == "concat"
    with pytest.raises(ValueError, match="dense_layout"):
        RRDBNet(dense_layout="bogus", **KW).resolved_layout()


def test_auto_layout_resolves_per_pass():
    """The measured policy (runs/rrdb_mfu_ab.json): split where a backward
    exists (train=True passes — supervised loss and the GAN G step),
    concat for forward-only passes (eval/serving and the D step's
    stop-gradient G forward)."""
    m = RRDBNet(dense_layout="auto", **KW)
    assert m.resolved_layout(train=True) == "split"
    assert m.resolved_layout(train=False) == "concat"


def test_qat_forward_unchanged_by_layout_request():
    """Asking for split on a QAT model must produce the concat-QAT math."""
    m_req = RRDBNet(dense_layout="split", quantize="qat", **KW)
    m_cat = RRDBNet(dense_layout="concat", quantize="qat", **KW)
    x = _x((1, 8, 8, 3), seed=4)
    v = m_cat.init({"params": jax.random.PRNGKey(3)}, x, train=False)
    np.testing.assert_array_equal(
        np.asarray(m_req.apply(v, x, train=False)),
        np.asarray(m_cat.apply(v, x, train=False)))

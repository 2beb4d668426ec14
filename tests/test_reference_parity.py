"""Numerical parity against the REAL reference implementation.

test_model_parity_torch.py checks hand-written torch replicas (which could
share a transcription error with the Flax code); here the authoritative
``/root/reference/src/models.py`` itself is imported (it depends only on
core torch) and weights flow through ``tools/export_sr_checkpoint.py``'s
``export_state_dict`` with ``load_state_dict(strict=True)`` — so one test
validates the exporter's tensor layout AND the forward math against the
reference's own classes (reference src/models.py:80-217), registry
hyperparams included (src/models.py:219-227).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from food101_sr_tpu.models import Discriminator, get_model
from tools.export_sr_checkpoint import export_state_dict
from tools.reference_import import load_reference_models

torch.manual_seed(0)


ref_models = load_reference_models()


def _rand_stats(variables, seed):
    """Randomize BN running stats so parity isn't trivially 0-mean/1-var."""
    rng = np.random.default_rng(seed)

    def rnd(path, leaf):
        name = path[-1].key
        if name == "mean":
            return jnp.asarray(rng.normal(0, 0.3, leaf.shape), jnp.float32)
        if name == "var":
            return jnp.asarray(rng.uniform(0.5, 1.5, leaf.shape), jnp.float32)
        return leaf

    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map_with_path(
        rnd, variables["batch_stats"])
    return variables


def _to_ref(variables, ref_model, arch=None):
    """Flax variables -> reference model via the production exporter."""
    tree = {"params": variables["params"],
            "extra": {k: v for k, v in variables.items() if k != "params"}}
    sd, _ = export_state_dict(tree, arch)
    ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True)
    ref_model.eval()


def _fwd_ref(ref_model, x_nhwc):
    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        y = ref_model(x)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("arch,lr_hw", [
    ("SRCNN", 10),
    ("RESNET", 8),
    ("AttentionSR", 8),
])
def test_registry_forward_parity_vs_reference(arch, lr_hw):
    """Full registry-size models (SRCNN 64h / RESNET 16x64 / AttentionSR
    32x96 — reference src/models.py:219-227), one weight set, eval-mode
    forward: ours vs the reference's own get_model."""
    model = get_model(arch, scale_factor=4)
    variables = model.init({"params": jax.random.PRNGKey(1)},
                           jnp.zeros((1, lr_hw, lr_hw, 3), jnp.float32),
                           train=False)
    if "batch_stats" in variables:
        variables = _rand_stats(variables, 7)

    ref = ref_models.get_model(arch, scale_factor=4, device="cpu")
    _to_ref(variables, ref, arch)

    x = np.random.default_rng(3).uniform(0, 1, (2, lr_hw, lr_hw, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    want = _fwd_ref(ref, x)
    assert ours.shape == want.shape == (2, lr_hw * 4, lr_hw * 4, 3)
    # randomly-initialized deep nets produce large-magnitude outputs (the
    # 16-block un-scaled ResNetSR reaches O(1e3)); compare scale-normalized
    # so the tolerance means "f32 accumulation noise", not absolute pixels
    scale = np.abs(want).max() + 1e-8
    np.testing.assert_allclose(ours / scale, want / scale, atol=5e-5)


def test_discriminator_forward_parity_vs_reference():
    """Our power-iteration spectral norm vs the reference Discriminator
    (reference src/models.py:191-217) at its full nf=64 size."""
    model = Discriminator(nf=64)
    variables = model.init({"params": jax.random.PRNGKey(5)},
                           jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)
    ref = ref_models.Discriminator(nf=64)
    _to_ref(variables, ref, "Discriminator")

    x = np.random.default_rng(8).uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        want = ref(xt).numpy()
    np.testing.assert_allclose(ours, want, atol=2e-4, rtol=1e-4)


def test_registry_param_counts_match_reference():
    """Exact per-registry-entry param-count parity with the live reference
    modules (not SURVEY's derived numbers)."""
    for arch in ("SRCNN", "RESNET", "AttentionSR"):
        ref = ref_models.get_model(arch, scale_factor=4, device="cpu")
        want = sum(p.numel() for p in ref.parameters())
        model = get_model(arch, scale_factor=4)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((1, 8, 8, 3), jnp.float32),
                               train=False)
        got = sum(int(np.prod(p.shape)) for p in
                  jax.tree_util.tree_leaves(variables["params"]))
        assert got == want, f"{arch}: {got} != {want}"

    refd = ref_models.Discriminator()
    want = sum(p.numel() for p in refd.parameters())
    model = Discriminator()
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 16, 16, 3), jnp.float32), train=False)
    got = sum(int(np.prod(p.shape)) for p in
              jax.tree_util.tree_leaves(variables["params"]))
    assert got == want, f"Discriminator: {got} != {want}"

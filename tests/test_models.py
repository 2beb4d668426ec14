"""Model-family tests: exact param-count parity with the reference
(BASELINE.md derived counts), forward shapes, ICNR property, spectral-norm
power iteration, and block-level numerics vs torch primitives."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from food101_sr_tpu.models import (
    AttentionSR,
    Discriminator,
    ResNetSR,
    SRCNN,
    get_model,
    icnr_kaiming_normal,
    param_count,
)
from food101_sr_tpu.ops import pixel_shuffle


def _init(model, shape, train=False):
    x = jnp.zeros(shape, jnp.float32)
    return model.init({"params": jax.random.PRNGKey(0)}, x, train=train)


# --- Param-count parity (reference counts derived in BASELINE.md) -----------

@pytest.mark.parametrize("name,shape,want", [
    ("SRCNN", (1, 12, 12, 3), 24_579),
    ("RESNET", (1, 12, 12, 3), 1_549_462),
    ("AttentionSR", (1, 12, 12, 3), 5_842_630),
])
def test_registry_param_counts(name, shape, want):
    model = get_model(name, scale_factor=4)
    variables = _init(model, shape)
    assert param_count(variables["params"]) == want


def test_discriminator_param_count():
    model = Discriminator()
    variables = _init(model, (1, 32, 32, 3))
    assert param_count(variables["params"]) == 1_603_273


def test_attention_sr_64ch_variant_count():
    # The 64-channel variant used by the reference's analysis tools
    # (src/analyze_models.py:20).
    model = AttentionSR(num_channels=64, num_residuals=32)
    variables = _init(model, (1, 12, 12, 3))
    assert param_count(variables["params"]) == 2_743_334


def test_unknown_architecture_raises():
    with pytest.raises(ValueError):
        get_model("nope")


# --- Forward shapes ----------------------------------------------------------

@pytest.mark.parametrize("name", ["SRCNN", "RESNET", "AttentionSR"])
def test_forward_shape_x4(name):
    model = get_model(name, scale_factor=4)
    x = jnp.ones((2, 12, 12, 3), jnp.float32)
    variables = _init(model, x.shape)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 48, 48, 3)


def test_discriminator_forward_shape():
    model = Discriminator()
    x = jnp.ones((2, 48, 48, 3), jnp.float32)
    variables = _init(model, x.shape)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 1)


def test_resnet_train_mode_updates_batch_stats():
    model = ResNetSR(num_residuals=2)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 12, 12, 3))
    variables = _init(model, x.shape, train=True)
    y, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


# --- ICNR: pixel-shuffled init == nearest-neighbor structure -----------------

def test_icnr_init_produces_nn_upsample():
    r, cin, cout = 2, 8, 64
    k = icnr_kaiming_normal(r)(jax.random.PRNGKey(0), (3, 3, cin, cout))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 6, 6, cin))
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    up = np.asarray(pixel_shuffle(y, r))
    # Each r x r output cell must be constant (nearest-neighbor at init).
    cells = up.reshape(1, 6, r, 6, r, cout // (r * r))
    np.testing.assert_allclose(
        cells, np.broadcast_to(cells[:, :, :1, :, :1], cells.shape), atol=1e-6
    )


# --- Spectral norm -----------------------------------------------------------

def test_spectral_norm_constrains_sigma():
    from food101_sr_tpu.models.layers import SNDense

    m = SNDense(features=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64))
    variables = m.init({"params": jax.random.PRNGKey(1)}, x, update_stats=True)
    # Run several power-iteration updates.
    for _ in range(200):
        _, updates = m.apply(variables, x, update_stats=True, mutable=["spectral"])
        variables = {**variables, "spectral": updates["spectral"]}
    kernel = variables["params"]["sn"]["kernel"]
    u = variables["spectral"]["sn"]["u"]
    v = variables["spectral"]["sn"]["v"]
    sigma_est = v @ (np.asarray(kernel) @ u)
    sigma_true = np.linalg.svd(np.asarray(kernel), compute_uv=False)[0]
    assert abs(sigma_est - sigma_true) / sigma_true < 5e-3

    # Eval pass must not mutate spectral state.
    y1 = m.apply(variables, x, update_stats=False)
    y2 = m.apply(variables, x, update_stats=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))


# --- Block numerics vs torch -------------------------------------------------

def test_se_block_matches_torch():
    from food101_sr_tpu.models.layers import SEBlock

    c = 32
    m = SEBlock(channels=c)
    x = np.random.default_rng(0).normal(size=(2, 5, 5, c)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w1 = np.asarray(variables["params"]["fc1"]["kernel"])  # [c, c/16]
    w2 = np.asarray(variables["params"]["fc2"]["kernel"])  # [c/16, c]

    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    y = t.mean(dim=(2, 3))
    y = F.relu(y @ torch.from_numpy(w1))
    y = torch.sigmoid(y @ torch.from_numpy(w2))
    want = (t * y[:, :, None, None]).permute(0, 2, 3, 1).numpy()

    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_conv_matches_torch_stride2_padding1():
    """Guard the torch-vs-SAME padding divergence on stride-2 convs."""
    from food101_sr_tpu.models.layers import Conv

    m = Conv(features=8, kernel_size=3, strides=2)
    x = np.random.default_rng(0).normal(size=(1, 9, 9, 4)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    k = np.asarray(variables["params"]["conv"]["kernel"])  # HWIO
    b = np.asarray(variables["params"]["conv"]["bias"])

    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    kt = torch.from_numpy(k).permute(3, 2, 0, 1)  # OIHW
    want = F.conv2d(t, kt, torch.from_numpy(b), stride=2, padding=1)
    want = want.permute(0, 2, 3, 1).numpy()

    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_prelu_matches_torch():
    from food101_sr_tpu.models.layers import PReLU

    m = PReLU()
    x = np.linspace(-2, 2, 24, dtype=np.float32).reshape(2, 12)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert float(variables["params"]["alpha"]) == 0.25
    want = F.prelu(torch.from_numpy(x), torch.tensor([0.25])).numpy()
    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_remat_gradients_match():
    """remat=True must not change gradients (bit-level up to float noise)."""
    import numpy as np
    from food101_sr_tpu.losses import mse_loss
    from food101_sr_tpu.data.pipeline import prepare_batch

    hr = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8))
    grads = []
    for remat in (False, True):
        m = get_model("AttentionSR", scale_factor=4, remat=remat)
        v = m.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 8, 8, 3)), train=False)

        def loss_of(params):
            lr_img, hrf = prepare_batch(hr, 4)
            out = m.apply({"params": params}, lr_img, train=False)
            return mse_loss(out, hrf)

        grads.append(jax.device_get(jax.jit(jax.grad(loss_of))(v["params"])))
    for a, b in zip(jax.tree_util.tree_leaves(grads[0]),
                    jax.tree_util.tree_leaves(grads[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-7)


def test_model_for_params_infers_nonregistry_variants():
    """Architecture + width/depth inference from params covers variants the
    registry doesn't list (e.g. the reference analysis tools' 64-channel
    AttentionSR, reference src/analyze_models.py:20)."""
    import jax
    import jax.numpy as jnp

    from food101_sr_tpu.models import (AttentionSR, Discriminator, ResNetSR,
                                       SRCNN, detect_architecture,
                                       model_for_params)

    cases = [
        (SRCNN(scale_factor=2, hidden_dim=24), "SRCNN",
         {"hidden_dim": 24}),
        (ResNetSR(scale_factor=4, num_channels=20, num_residuals=3), "RESNET",
         {"num_channels": 20, "num_residuals": 3}),
        (AttentionSR(scale_factor=4, num_channels=64, num_residuals=5),
         "AttentionSR", {"num_channels": 64, "num_residuals": 5}),
        (Discriminator(nf=16), "Discriminator", {"nf": 16}),
    ]
    for module, arch, attrs in cases:
        v = module.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 16, 16, 3)), train=False)
        assert detect_architecture(v["params"]) == arch
        rebuilt = model_for_params(v["params"],
                                   scale_factor=module.scale_factor
                                   if hasattr(module, "scale_factor") else 4)
        for k, want in attrs.items():
            assert getattr(rebuilt, k) == want, (arch, k)


def test_any_integer_scale_beyond_reference():
    """The reference hard-codes two x2 PixelShuffle stages (x4 only,
    src/models.py:116-123); our tail factorizes any integer scale >= 2
    into prime stages (models/layers.scale_stages; x3/x6 exactness vs the
    phase tail in tests/test_scales.py and test_phase_tail.py)."""
    import jax
    import jax.numpy as jnp

    from food101_sr_tpu.models import AttentionSR, ResNetSR

    for cls in (ResNetSR, AttentionSR):
        for s in (2, 3, 4, 6, 8):
            m = cls(scale_factor=s, num_channels=32, num_residuals=1)
            v = m.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 8, 8, 3)), train=False)
            out = m.apply(v, jnp.zeros((1, 8, 8, 3)), train=False)
            assert out.shape == (1, 8 * s, 8 * s, 3), (cls.__name__, s)
        import pytest

        with pytest.raises(ValueError):
            cls(scale_factor=1, num_channels=32, num_residuals=1).init(
                {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 8, 8, 3)),
                train=False)


def test_self_ensemble_properties():
    """x8 geometric TTA: exact for a D4-equivariant forward, equivariant
    under input flips for any forward, correct output shape."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from food101_sr_tpu.models import SRCNN
    from food101_sr_tpu.ops import self_ensemble

    # 1) equivariant forward (nearest-neighbor x2): ensemble == forward
    def nn_up(x):
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 6, 9, 3)),
                    jnp.float32)
    np.testing.assert_allclose(self_ensemble(nn_up, x), nn_up(x), atol=1e-7)

    # 2) real (non-equivariant) model: group-averaging makes the result
    # equivariant — se(flip(x)) == flip(se(x)) — and shapes are right
    model = SRCNN(scale_factor=2, hidden_dim=8)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    fwd = jax.jit(lambda b: model.apply(v, b, train=False))
    se = jax.jit(lambda b: self_ensemble(fwd, b))
    out = se(x)
    assert out.shape == (2, 12, 18, 3)
    assert not np.allclose(out, fwd(x), atol=1e-4)  # it actually ensembles
    np.testing.assert_allclose(se(jnp.flip(x, 2)), jnp.flip(out, 2),
                               atol=1e-5)

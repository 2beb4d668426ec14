"""Full-state preemption resume: a run interrupted after epoch k and
resumed must continue with the exact optimizer/scheduler/epoch state."""
import jax
import jax.numpy as jnp
import numpy as np

from food101_sr_tpu.models import get_model
from food101_sr_tpu.training import (
    SRTrainState,
    load_train_checkpoint,
    make_adam,
    save_train_checkpoint,
)
from food101_sr_tpu.training.schedule import EarlyStopping, ReduceLROnPlateau


def _state(model, lr_shape, lr=1e-3, seed=0):
    variables = model.init({"params": jax.random.PRNGKey(seed)},
                           jnp.zeros(lr_shape, jnp.float32), train=False)
    return SRTrainState.create(dict(variables), make_adam(lr))


def test_train_checkpoint_roundtrip(tmp_path):
    model = get_model("SRCNN", scale_factor=2)
    state = _state(model, (1, 8, 8, 3))
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    sched = ReduceLROnPlateau(1e-3)
    sched.step(20.0)
    sched.step(10.0)  # one bad epoch
    stop = EarlyStopping(patience=3)
    stop.update(20.0)
    stop.update(10.0)

    path = str(tmp_path / "ckpt_last")
    save_train_checkpoint(state, epoch=4, scheduler=sched, stopper=stop,
                          path=path)

    state2 = _state(model, (1, 8, 8, 3), seed=1)  # different init
    sched2 = ReduceLROnPlateau(1e-3)
    stop2 = EarlyStopping(patience=3)
    state2, d2, next_epoch, start_batch = load_train_checkpoint(
        path, state2, sched2, stop2)

    assert d2 is None
    assert next_epoch == 5
    assert start_batch == 0  # epoch-boundary save: start the next epoch
    assert int(state2.step) == 7
    assert sched2.best == 20.0 and sched2.num_bad == 1
    assert stop2.best == 20.0 and stop2.counter == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(state2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_training(tmp_path):
    """train(epochs=2) == train(epochs=1) -> resume(epochs=2) on the same
    data order (epoch-seeded loader)."""
    from food101_sr_tpu.training import train

    common = dict(
        dataset="synthetic", synthetic_size=96, crop_size=32, scale_factor=4,
        architecture="SRCNN", loss_function="mse", batch_size=8,
        patience=10, use_wandb=False, seed=3,
        weights_dir=str(tmp_path / "w"),
    )
    train({**common, "epochs": 2, "save_name": "full",
           "run_name": "full"})

    train({**common, "epochs": 1, "save_name": "part", "run_name": "part"})
    train({**common, "epochs": 2, "save_name": "part2", "run_name": "part2",
           "resume": str(tmp_path / "w" / "part_last")})

    from food101_sr_tpu.training import load_checkpoint
    # Compare the rolling full-state checkpoints (written every epoch; the
    # *_best one is only written on val-PSNR improvement, which the resumed
    # single epoch may not produce).
    full = load_checkpoint(str(tmp_path / "w" / "full_last"))
    part = load_checkpoint(str(tmp_path / "w" / "part2_last"))
    assert int(full["host"]["epoch"]) == int(part["host"]["epoch"]) == 1
    for a, b in zip(jax.tree_util.tree_leaves(full["g"]),
                    jax.tree_util.tree_leaves(part["g"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_gan_resume_restores_discriminator(tmp_path):
    """Resuming a GAN run must restore D (params + spectral state) and its
    optimizer, not just the generator."""
    from food101_sr_tpu.training import train, load_checkpoint

    common = dict(
        dataset="synthetic", synthetic_size=96, crop_size=32, scale_factor=4,
        architecture="SRCNN", loss_function="gan", batch_size=8,
        patience=10, use_wandb=False, seed=4, lr=1e-4,
        weights_dir=str(tmp_path / "w"),
    )
    train({**common, "epochs": 2, "save_name": "gfull", "run_name": "gfull"})
    train({**common, "epochs": 1, "save_name": "gpart", "run_name": "gpart"})
    train({**common, "epochs": 2, "save_name": "gpart2", "run_name": "gpart2",
           "resume": str(tmp_path / "w" / "gpart_last")})

    import jax
    full = load_checkpoint(str(tmp_path / "w" / "gfull_last"))
    part = load_checkpoint(str(tmp_path / "w" / "gpart2_last"))
    assert "d" in full and "d" in part
    for sub in ("g", "d"):
        for a, b in zip(jax.tree_util.tree_leaves(full[sub]),
                        jax.tree_util.tree_leaves(part[sub])):
            np.testing.assert_allclose(np.asarray(a, np.float64),
                                       np.asarray(b, np.float64),
                                       atol=1e-5, rtol=1e-5)

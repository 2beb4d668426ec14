"""Loop-level GAN training test — exercises the exact wiring of train()
(the step-level tests in test_training.py call the factories directly and
missed a return-arity bug in the epoch loop)."""
import os


def test_train_gan_end_to_end(tmp_path):
    from food101_sr_tpu.training import train

    cfg = {
        "architecture": "SRCNN",
        "dataset": "synthetic",
        "synthetic_size": 96,
        "crop_size": 32,
        "scale_factor": 4,
        "batch_size": 8,
        "lr": 1e-4,
        "epochs": 1,
        "loss_function": "gan",
        "patience": 5,
        "save_name": "gan_test",
        "weights_dir": str(tmp_path / "weights"),
        "run_name": "gan_loop_test",
        "use_wandb": False,
        "log_every": 2,
    }
    final = train(cfg)
    assert set(final) == {"psnr", "ssim", "lpips", "nlpd", "val_psnr"}
    assert final["psnr"] > 0.0
    assert final["val_psnr"] > 0.0
    assert os.path.isdir(os.path.join(cfg["weights_dir"], "gan_test_best"))
    # GAN runs checkpoint the discriminator in the rolling full-state ckpt
    from food101_sr_tpu.training import load_checkpoint
    last = load_checkpoint(str(tmp_path / "weights" / "gan_test_last"))
    assert "d" in last and "params" in last["d"]

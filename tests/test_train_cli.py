"""Training CLI end-to-end: both stages driven through `python -m
ebfi_tpu.train`-equivalent main() on tiny synthetic data."""
import os

import numpy as np
import pytest
import yaml

from ebfi_tpu.data.synth import write_clip_h5
from ebfi_tpu.train.cli import main as train_main


def _write_cfg(path, updates):
    import copy

    base = yaml.safe_load(open("configs/train_evfi.yml"))
    cfg = copy.deepcopy(base)
    for k, v in updates.items():
        d = cfg
        keys = k.split(";")
        for kk in keys[:-1]:
            d = d[kk]
        d[keys[-1]] = v
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("traindata")
    clip = str(d / "clip.h5")
    write_clip_h5(clip, num_frames=48, H=32, W=32, seed=2)
    real = str(d / "real.h5")
    write_clip_h5(real, num_frames=24, H=32, W=32, seed=6, real_exposure=(0.5, 0.1))
    (d / "train.txt").write_text(clip + "\n")
    (d / "real.txt").write_text(real + "\n")
    return d


def small_dataset_overrides(datalist):
    out = {}
    for dl in ("train_dataloader", "valid_dataloader"):
        out[f"{dl};path_to_datalist_txt"] = datalist
        out[f"{dl};batch_size"] = 2
        out[f"{dl};dataset;scale"] = 1
        out[f"{dl};dataset;ori_scale"] = "ori"
        out[f"{dl};dataset;time_bins"] = 4
        out[f"{dl};dataset;NumFramePerPeriod"] = 8
        out[f"{dl};dataset;NumFramePerBlurry"] = 8
        out[f"{dl};dataset;NumPeriodPerSeq"] = 1
        out[f"{dl};dataset;SlidingWindowSeq"] = 1
        out[f"{dl};dataset;ExposureTime"] = [3, 5]
        out[f"{dl};dataset;data_augment;random_crop;enabled"] = False
        out[f"{dl};dataset;data_augment;center_crop;enabled"] = False
        out[f"{dl};dataset;data_augment;flip;enabled"] = False
    return out


def test_full_model_training_cli(data, tmp_path):
    cfg_updates = {
        "trainer;output_path": str(tmp_path / "out"),
        "trainer;iteration_based_train;iterations": 3,
        "trainer;iteration_based_train;save_period": 2,
        "trainer;iteration_based_train;valid_step": 1000,
        "trainer;tensorboard": False,
        "model;args;FrameBasech": 8,
        "model;args;EventBasech": 8,
        "model;args;InterCH": 8,
        "model;args;TB": 4,
        "model;args;step": 2,
        "model;args;channels": [4, 6, 8, 12],
        "model;args;UseGTEx": True,
        "model;args;BlurryFashion": "RGBLap",
    }
    cfg_updates.update(small_dataset_overrides(str(data / "train.txt")))
    cfg_path = _write_cfg(str(tmp_path / "cfg.yml"), cfg_updates)

    trainer = train_main(["-c", cfg_path, "-id", "clirun"])
    assert int(trainer.state.step) == 3
    save_dir = os.path.join(str(tmp_path / "out"), "models", "EVFIAutoEx", "clirun")
    assert any(d.startswith("checkpoint-iteration") for d in os.listdir(save_dir))
    # resolved config snapshot exists (config/parser.py:42 analogue)
    log_cfg = os.path.join(str(tmp_path / "out"), "logs", "EVFIAutoEx", "clirun", "config.yml")
    assert os.path.exists(log_cfg)


def test_exposure_pretrain_cli(data, tmp_path):
    import copy

    base = yaml.safe_load(open("configs/train_exposure.yml"))
    cfg = copy.deepcopy(base)
    cfg["trainer"]["output_path"] = str(tmp_path / "out")
    cfg["trainer"]["iteration_based_train"].update(
        {"iterations": 2, "save_period": 1, "valid_step": 1000}
    )
    cfg["trainer"]["tensorboard"] = False
    cfg["model"]["args"].update({"EventInch": 8, "InterCH": 8, "BLInch": 4})
    for dl in ("train_dataloader", "valid_dataloader"):
        cfg[dl]["path_to_datalist_txt"] = str(data / "real.txt")
        cfg[dl]["batch_size"] = 2
        ds = cfg[dl]["dataset"]
        ds.update({"scale": 1, "ori_scale": "ori", "time_bins": 4, "interp_num": 4})
        ds["data_augment"]["random_crop"]["enabled"] = False
        ds["data_augment"]["center_crop"]["enabled"] = False
        ds["data_augment"]["flip"]["enabled"] = False
    cfg_path = str(tmp_path / "excfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    trainer = train_main(["-c", cfg_path, "-id", "exrun"])
    assert int(trainer.state.step) == 2
    save_dir = os.path.join(
        str(tmp_path / "out"), "models", "TrainExposureDecision", "exrun"
    )
    assert any(d.startswith("checkpoint") for d in os.listdir(save_dir))


def test_two_stage_pretrain_handoff(data, tmp_path):
    """Stage-1 ExposureDecision pretrain checkpoint -> LoadPretrainEX into
    the full EVFIAutoEx (model_singleframe.py:44-54, train_ours.py:181-185):
    the pretrained params must land bit-for-bit in the exposure_decision
    subtree AND survive a FrozenEX stage-2 run untouched while every other
    subtree trains."""
    import copy

    import jax
    import numpy as np

    from ebfi_tpu.train.checkpoint import restore_checkpoint

    # ---- stage 1: pretrain ExposureDecision via the real CLI ------------ #
    base = yaml.safe_load(open("configs/train_exposure.yml"))
    cfg = copy.deepcopy(base)
    cfg["trainer"]["output_path"] = str(tmp_path / "out")
    cfg["trainer"]["iteration_based_train"].update(
        {"iterations": 2, "save_period": 2, "valid_step": 1000}
    )
    cfg["trainer"]["tensorboard"] = False
    cfg["model"]["args"].update({"EventInch": 8, "InterCH": 8, "BLInch": 4})
    for dl in ("train_dataloader", "valid_dataloader"):
        cfg[dl]["path_to_datalist_txt"] = str(data / "real.txt")
        cfg[dl]["batch_size"] = 2
        ds = cfg[dl]["dataset"]
        ds.update({"scale": 1, "ori_scale": "ori", "time_bins": 4, "interp_num": 4})
        ds["data_augment"]["random_crop"]["enabled"] = False
        ds["data_augment"]["center_crop"]["enabled"] = False
        ds["data_augment"]["flip"]["enabled"] = False
    cfg_path = str(tmp_path / "stage1.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    train_main(["-c", cfg_path, "-id", "stage1"])
    save_dir = os.path.join(
        str(tmp_path / "out"), "models", "TrainExposureDecision", "stage1"
    )
    ckpt = os.path.join(
        save_dir,
        sorted(d for d in os.listdir(save_dir) if d.startswith("checkpoint"))[-1],
    )
    ex_params = restore_checkpoint(ckpt)["model_states"]
    ex_tree = ex_params["params"] if "params" in ex_params else ex_params

    # ---- stage 2: full model, LoadPretrainEX + FrozenEX ----------------- #
    cfg_updates = {
        "trainer;output_path": str(tmp_path / "out2"),
        "trainer;iteration_based_train;iterations": 3,
        "trainer;iteration_based_train;save_period": 100,
        "trainer;iteration_based_train;valid_step": 1000,
        "trainer;tensorboard": False,
        "model;args;FrameBasech": 8,
        "model;args;EventBasech": 8,
        "model;args;InterCH": 8,
        "model;args;TB": 4,
        "model;args;step": 2,
        "model;args;channels": [4, 6, 8, 12],
        "model;args;UseGTEx": False,
        "model;args;BlurryFashion": "RGBLap",
        "model;args;BLInch": 4,
        "model;args;LoadPretrainEX": True,
        "model;args;PretrainedEXPath": ckpt,
        "model;args;FrozenEX": True,
    }
    cfg_updates.update(small_dataset_overrides(str(data / "train.txt")))
    cfg2 = _write_cfg(str(tmp_path / "stage2.yml"), cfg_updates)
    trainer = train_main(["-c", cfg2, "-id", "stage2"])
    assert int(trainer.state.step) == 3

    got = jax.tree.map(np.asarray, trainer.state.params["params"])
    # the exposure subtree equals the stage-1 checkpoint bit-for-bit after
    # 3 FrozenEX training steps
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        ex_tree, got["exposure_decision"],
    )
    # ...while the rest of the model actually trained
    changed = [
        k for k in got
        if k != "exposure_decision"
        and any(
            not np.array_equal(a, b)
            for a, b in zip(
                jax.tree.leaves(got[k]),
                jax.tree.leaves(jax.tree.map(np.asarray, trainer_init_params(trainer)[k])),
            )
        )
    ]
    assert changed, "no non-exposure subtree received updates under FrozenEX"


def trainer_init_params(trainer):
    """Reconstruct the stage-2 init params for the changed-subtree check
    (same key the CLI used: jax.random.key(config seed), init at 64x64 —
    train/cli.py:156-167)."""
    import jax
    import jax.numpy as jnp

    model = trainer.model
    return model.init(
        jax.random.key(123),
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 2 * model.tb)),
        jnp.zeros((1, 1)), jnp.zeros((1, 1)),
    )["params"]

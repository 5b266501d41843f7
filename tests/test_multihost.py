"""Real 2-process training: the full CLI under jax.distributed on CPU.

The reference's multi-process story is one DDP process per GPU with
env-var rendezvous (train_ours.py:63-84) and rank-0-only checkpointing
(:331).  Here two OS processes (2 local CPU devices each, 4 global)
rendezvous through RANK/WORLD_SIZE/MASTER_ADDR/MASTER_PORT, run the real
`ebfi_tpu.train` CLI on a shared synthetic clip — per-process loader
shards, cross-process gloo collectives inside the jitted step — and only
rank 0 may write checkpoints.
"""
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from ebfi_tpu.data.synth import write_clip_h5

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
# initialize before anything touches the backend (the CLI's own
# maybe_init_distributed is a no-op once initialized)
from ebfi_tpu.parallel import maybe_init_distributed
maybe_init_distributed()
from ebfi_tpu.train.cli import main
trainer = main(["-c", {cfg!r}, "-id", "mh"])
print("RANK{{0}} done step={{1}}".format(jax.process_index(), int(trainer.state.step)),
      flush=True)
"""


@pytest.mark.slow
def test_two_process_training_cli(tmp_path):
    clip = str(tmp_path / "clip.h5")
    write_clip_h5(clip, num_frames=48, H=32, W=32, seed=2)
    (tmp_path / "train.txt").write_text(clip + "\n")

    base = yaml.safe_load(open(os.path.join(REPO, "configs/train_evfi.yml")))
    ups = {
        "trainer;output_path": str(tmp_path / "out"),
        "trainer;iteration_based_train;iterations": 2,
        "trainer;iteration_based_train;save_period": 1,
        "trainer;iteration_based_train;valid_step": 1000,
        "trainer;tensorboard": False,
        "model;args;FrameBasech": 8,
        "model;args;EventBasech": 8,
        "model;args;InterCH": 8,
        "model;args;TB": 4,
        "model;args;step": 2,
        "model;args;channels": [4, 6, 8, 12],
        "model;args;UseGTEx": True,
    }
    for dl in ("train_dataloader", "valid_dataloader"):
        ups[f"{dl};path_to_datalist_txt"] = str(tmp_path / "train.txt")
        ups[f"{dl};batch_size"] = 4  # global; 2 per process
        ups[f"{dl};dataset;scale"] = 1
        ups[f"{dl};dataset;ori_scale"] = "ori"
        ups[f"{dl};dataset;time_bins"] = 4
        ups[f"{dl};dataset;NumFramePerPeriod"] = 8
        ups[f"{dl};dataset;NumFramePerBlurry"] = 8
        ups[f"{dl};dataset;NumPeriodPerSeq"] = 1
        ups[f"{dl};dataset;SlidingWindowSeq"] = 1
        ups[f"{dl};dataset;ExposureTime"] = [3, 5]
        ups[f"{dl};dataset;data_augment;random_crop;enabled"] = False
        ups[f"{dl};dataset;data_augment;center_crop;enabled"] = False
        ups[f"{dl};dataset;data_augment;flip;enabled"] = False
    for k, v in ups.items():
        d = base
        keys = k.split(";")
        for kk in keys[:-1]:
            d = d[kk]
        d[keys[-1]] = v
    cfg = str(tmp_path / "cfg.yml")
    yaml.safe_dump(base, open(cfg, "w"))

    env_base = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")
    }
    procs = []
    for rank in range(2):
        env = dict(
            env_base,
            RANK=str(rank),
            WORLD_SIZE="2",
            MASTER_ADDR="localhost",
            MASTER_PORT="12421",
            # isolated compile cache: the shared default can hold entries
            # AOT-compiled for other CPU feature sets (tunnel machines),
            # which XLA:CPU refuses to load
            EBFI_COMPILE_CACHE=str(tmp_path / "xla_cache"),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER.format(repo=REPO, cfg=cfg)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"RANK{rank} done step=2" in out, out[-2000:]

    # rank-0-only checkpointing: exactly one process wrote the ckpt tree
    out_dir = tmp_path / "out" / "models"
    ckpts = list(out_dir.rglob("checkpoint-iteration*"))
    assert ckpts, "rank 0 wrote no checkpoint"

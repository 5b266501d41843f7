"""StableHLO export round trip."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from ebfi_tpu.train import build_optimizer, create_train_state
from ebfi_tpu.train.checkpoint import save_checkpoint
from test_infer_cli import MODEL_CFG
from ebfi_tpu.models.factory import build_model


def test_export_roundtrip(tmp_path, rng):
    model = build_model(MODEL_CFG)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 8)),
        jnp.zeros((1, 1)), jnp.zeros((1, 1)),
    )
    tx, _ = build_optimizer({"name": "Adam", "args": {"lr": 1e-4}})
    state = create_train_state(model, params, tx)
    ckpt = save_checkpoint(
        str(tmp_path), "ckpt", state.params, state.opt_state, 0,
        {"model": MODEL_CFG}, {"iteration": 0},
    )

    from export_stablehlo import export_model

    exported = export_model(ckpt, height=32, width=32, num_t=3)
    blob = exported.serialize()
    assert len(blob) > 1000

    restored = jax.export.deserialize(bytearray(blob))
    frame = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    event = jnp.asarray(rng.standard_normal((1, 32, 32, 8)).astype(np.float32))
    ts = jnp.asarray(rng.uniform(0, 1, (1, 3)).astype(np.float32))
    gt_ex = jnp.zeros((1, 1))
    sharps, finals = restored.call(frame, event, ts, gt_ex)
    assert sharps.shape == (3, 1, 32, 32, 3)
    assert np.isfinite(np.asarray(finals)).all()

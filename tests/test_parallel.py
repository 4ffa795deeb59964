"""Mesh/sharding/trainer tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from stt_tpu.models.whisper import get_config, init_params
from stt_tpu.parallel.sharding import (
    MODEL_AXIS,
    build_mesh,
    shard_params,
    whisper_param_specs,
)
from stt_tpu.parallel.trainer import ShardedTrainer, TrainBatch, loss_fn

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_build_mesh_shapes():
    mesh = build_mesh((4, 2))
    assert mesh.shape == {"data": 4, "model": 2}
    default = build_mesh()
    assert default.shape == {"data": jax.device_count(), "model": 1}
    with pytest.raises(ValueError):
        build_mesh((3, 2))


def test_param_specs_tp_rules():
    params = init_params(get_config("test"))
    specs = whisper_param_specs(params)
    enc_blocks = specs["encoder"]["blocks"]
    dec_blocks = specs["decoder"]["blocks"]
    # qkv split output dim, o splits input dim (stacked layer axis first)
    assert enc_blocks["attn"]["q"]["w"] == P(None, None, MODEL_AXIS)
    assert enc_blocks["attn"]["o"]["w"] == P(None, MODEL_AXIS, None)
    assert enc_blocks["attn"]["o"]["b"] == P(None, None)  # replicated
    assert dec_blocks["xattn"]["v"]["w"] == P(None, None, MODEL_AXIS)
    assert dec_blocks["mlp"]["fc1"]["w"] == P(None, None, MODEL_AXIS)
    assert dec_blocks["mlp"]["fc1"]["b"] == P(None, MODEL_AXIS)
    assert dec_blocks["mlp"]["fc2"]["w"] == P(None, MODEL_AXIS, None)
    # embeddings / norms replicated
    assert specs["decoder"]["tok"] == P()
    assert specs["encoder"]["conv1"]["w"] == P()
    assert enc_blocks["ln1"]["g"] == P()  # fully replicated


def test_sharded_forward_matches_single_device():
    """TP-sharded loss == unsharded loss (GSPMD correctness)."""
    config = get_config("test")
    params = init_params(config, seed=7)
    rng = np.random.default_rng(7)
    batch = TrainBatch(
        mel=jnp.asarray(rng.normal(0, 1, (4, config.n_mels, 100)), jnp.float32),
        tokens=jnp.asarray(rng.integers(0, 1000, (4, 10)), jnp.int32),
        loss_mask=jnp.ones((4, 10), jnp.float32),
    )
    ref = float(loss_fn(params, batch, config))

    mesh = build_mesh((4, 2))
    sharded = shard_params(params, mesh)
    got = float(loss_fn(sharded, batch, config))
    assert abs(got - ref) < 1e-3


def test_train_step_reduces_loss():
    config = get_config("test")
    params = init_params(config, seed=1)
    mesh = build_mesh((4, 2))
    trainer = ShardedTrainer(config, mesh)
    params, opt_state = trainer.init_state(params)
    rng = np.random.default_rng(1)
    batch = TrainBatch(
        mel=jnp.asarray(rng.normal(0, 1, (4, config.n_mels, 100)), jnp.float32),
        tokens=jnp.asarray(rng.integers(0, 1000, (4, 10)), jnp.int32),
        loss_mask=jnp.ones((4, 10), jnp.float32),
    )
    losses = []
    for _ in range(4):
        params, opt_state, loss = trainer.train_step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses))

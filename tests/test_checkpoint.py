"""Checkpoint round-trips: orbax save/restore + HF safetensors export/load."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stt_tpu.models.whisper import (
    encode, get_config, init_params, load_hf_safetensors,
)
from stt_tpu.parallel.checkpoint import (
    export_hf_safetensors, restore_checkpoint, save_checkpoint,
)


def _trees_equal(a, b):
    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_orbax_roundtrip(tmp_path):
    config = get_config("test")
    params = init_params(config, seed=42)
    save_checkpoint(str(tmp_path / "ckpt"), params, step=7)
    template = jax.tree.map(np.zeros_like, params)
    restored, opt_state, step = restore_checkpoint(
        str(tmp_path / "ckpt"), template
    )
    assert step == 7
    assert opt_state is None
    _trees_equal(params, restored)


def test_hf_export_then_load(tmp_path):
    """Exported safetensors reload through the HF loader bit-for-bit and
    produce identical encoder outputs."""
    config = get_config("test")
    params = init_params(config, seed=9)
    out_dir = tmp_path / "hf_ckpt"
    export_hf_safetensors(str(out_dir), params, config)
    reloaded, cfg2 = load_hf_safetensors(str(out_dir))
    assert cfg2.n_audio_layer == config.n_audio_layer
    assert cfg2.n_vocab == config.n_vocab
    _trees_equal(params, reloaded)

    mel = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (1, config.n_mels, 100)),
        jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(encode(params, mel, config.n_audio_head)),
        np.asarray(encode(reloaded, mel, cfg2.n_audio_head)),
        atol=1e-5,
    )

"""Checkpoint save/restore for model params + optimizer state (orbax).

The reference has no training checkpointing (SURVEY.md §5 — its nearest
analogue is admin model load profiles). The TPU build adds a real
checkpoint/resume path for the fine-tune trainer: orbax for sharded
pytrees (restores respect the current mesh's NamedShardings) plus an
HF-compatible safetensors export so fine-tuned weights can be served via
``model.weights_path`` / the admin load API.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def save_checkpoint(path: str, params: Dict[str, Any],
                    opt_state: Any = None, step: int = 0) -> None:
    """Write params (+ optional optimizer state) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    payload = {"params": params, "step": np.asarray(step)}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def restore_checkpoint(
    path: str,
    template: Dict[str, Any],
    opt_state_template: Any = None,
) -> Tuple[Dict[str, Any], Any, int]:
    """Restore into the template's shapes/dtypes/shardings.

    Pass sharded templates (e.g. from ``ShardedTrainer.init_state``) to get
    the restored arrays laid out on the current mesh directly.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    target = {"params": template, "step": np.asarray(0)}
    if opt_state_template is not None:
        target["opt_state"] = opt_state_template
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, target)
    return (
        restored["params"],
        restored.get("opt_state"),
        int(restored["step"]),
    )


# -- HF-compatible export (servable via weights_path) --------------------------

def _unstack(stacked: Dict[str, Any], n_layers: int):
    return [
        jax.tree.map(lambda x: np.asarray(x[i]), stacked)
        for i in range(n_layers)
    ]


def export_hf_safetensors(path: str, params: Dict[str, Any], config) -> None:
    """Write params as a WhisperForConditionalGeneration-layout checkpoint
    directory (model.safetensors + config.json) loadable by
    :func:`stt_tpu.models.whisper.load_hf_safetensors`."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    t: Dict[str, np.ndarray] = {}

    def put_linear(prefix, leaf, bias=True):
        t[f"{prefix}.weight"] = np.asarray(leaf["w"]).T.copy()
        if bias and "b" in leaf:
            t[f"{prefix}.bias"] = np.asarray(leaf["b"])

    def put_ln(prefix, leaf):
        t[f"{prefix}.weight"] = np.asarray(leaf["g"])
        t[f"{prefix}.bias"] = np.asarray(leaf["b"])

    def put_attn(prefix, leaf):
        put_linear(f"{prefix}.q_proj", leaf["q"])
        t[f"{prefix}.k_proj.weight"] = np.asarray(leaf["k"]["w"]).T.copy()
        put_linear(f"{prefix}.v_proj", leaf["v"])
        put_linear(f"{prefix}.out_proj", leaf["o"])

    enc, dec = params["encoder"], params["decoder"]
    t["encoder.conv1.weight"] = np.asarray(enc["conv1"]["w"]).transpose(2, 1, 0).copy()
    t["encoder.conv1.bias"] = np.asarray(enc["conv1"]["b"])
    t["encoder.conv2.weight"] = np.asarray(enc["conv2"]["w"]).transpose(2, 1, 0).copy()
    t["encoder.conv2.bias"] = np.asarray(enc["conv2"]["b"])
    t["encoder.embed_positions.weight"] = np.asarray(enc["pos"])
    put_ln("encoder.layer_norm", enc["ln_post"])
    for i, block in enumerate(_unstack(enc["blocks"], config.n_audio_layer)):
        p = f"encoder.layers.{i}"
        put_ln(f"{p}.self_attn_layer_norm", block["ln1"])
        put_attn(f"{p}.self_attn", block["attn"])
        put_ln(f"{p}.final_layer_norm", block["ln2"])
        put_linear(f"{p}.fc1", block["mlp"]["fc1"])
        put_linear(f"{p}.fc2", block["mlp"]["fc2"])

    t["decoder.embed_tokens.weight"] = np.asarray(dec["tok"])
    t["decoder.embed_positions.weight"] = np.asarray(dec["pos"])
    put_ln("decoder.layer_norm", dec["ln"])
    for i, block in enumerate(_unstack(dec["blocks"], config.n_text_layer)):
        p = f"decoder.layers.{i}"
        put_ln(f"{p}.self_attn_layer_norm", block["ln1"])
        put_attn(f"{p}.self_attn", block["attn"])
        put_ln(f"{p}.encoder_attn_layer_norm", block["ln_x"])
        put_attn(f"{p}.encoder_attn", block["xattn"])
        put_ln(f"{p}.final_layer_norm", block["ln2"])
        put_linear(f"{p}.fc1", block["mlp"]["fc1"])
        put_linear(f"{p}.fc2", block["mlp"]["fc2"])

    t = {f"model.{k}": v.astype(np.float32) for k, v in t.items()}
    save_file(t, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({
            "model_type": "whisper",
            "architectures": ["WhisperForConditionalGeneration"],
            "num_mel_bins": config.n_mels,
            "d_model": config.n_audio_state,
            "encoder_attention_heads": config.n_audio_head,
            "encoder_layers": config.n_audio_layer,
            "encoder_ffn_dim": 4 * config.n_audio_state,
            "decoder_ffn_dim": 4 * config.n_text_state,
            "activation_function": "gelu",
            "vocab_size": config.n_vocab,
            "decoder_attention_heads": config.n_text_head,
            "decoder_layers": config.n_text_layer,
            "max_source_positions": config.n_audio_ctx,
            "max_target_positions": config.n_text_ctx,
        }, f)


__all__ = ["export_hf_safetensors", "restore_checkpoint", "save_checkpoint"]

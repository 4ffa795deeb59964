"""Whisper encoder/decoder as pure-functional JAX with KV-cached decoding.

This replaces the reference's delegated native inference engines
(CTranslate2 via ``stt_server/model/backends/faster_whisper.py``, libtorch via
``torch_whisper.py``, MLX via ``mlx_whisper.py``) with a single TPU-native
implementation:

- Parameters are a pytree with **per-layer leaves stacked** on a leading
  layer axis, so both encoder and decoder run their transformer stacks under
  ``lax.scan`` — one traced block regardless of depth (fast compiles, XLA
  pipelines the layers).
- All matmuls carry ``preferred_element_type=float32`` so bf16 weights hit
  the MXU with f32 accumulation.
- Greedy decoding is one jitted ``lax.while_loop`` with a **donated,
  statically-shaped KV cache** (B, L, T_max, d); per-row finished flags make
  it batch-correct for the continuous-batching engine, which packs many
  sessions into one call.
- Weights load from a local HF-format ``model.safetensors``
  (WhisperForConditionalGeneration layout) or fall back to deterministic
  random init, which keeps tests/benches hermetic in a zero-egress build.

Architecture constants follow openai/whisper (conv stem k=3 s=1 then k=3 s=2,
pre-LN blocks, sinusoidal audio positions, learned text positions, key
projections bias-free, logits tied to the token embedding).
"""

from __future__ import annotations

import json
import math
import os
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Configuration
# ---------------------------------------------------------------------------


# Model-family table + token-layout derivations live in presets.py (pure
# data, excluded from the exec-cache fingerprint's traced-source hash —
# adding a preset must not invalidate committed artifacts; the VALUES are
# hashed semantically by engine.exec_fingerprint). Re-exported here so
# every existing `W.get_config` / `W.token_layout` call site holds.
from stt_tpu.models.presets import (  # noqa: F401
    PRESETS,
    WHISPER_LANG_CODES,
    TokenLayout,
    WhisperConfig,
    get_config,
    token_layout,
)


# ---------------------------------------------------------------------------
# Parameter init / loading
# ---------------------------------------------------------------------------


def _sinusoids(length: int, channels: int) -> np.ndarray:
    assert channels % 2 == 0
    log_timescale = math.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def _init_block(rng: np.random.Generator, d: int, cross: bool) -> Dict[str, Any]:
    def lin(n_in, n_out, bias=True):
        w = rng.normal(0.0, n_in**-0.5, (n_in, n_out)).astype(np.float32)
        out = {"w": w}
        if bias:
            out["b"] = np.zeros(n_out, np.float32)
        return out

    def ln():
        return {"g": np.ones(d, np.float32), "b": np.zeros(d, np.float32)}

    block = {
        "ln1": ln(),
        "attn": {
            "q": lin(d, d), "k": lin(d, d, bias=False),
            "v": lin(d, d), "o": lin(d, d),
        },
        "ln2": ln(),
        "mlp": {"fc1": lin(d, 4 * d), "fc2": lin(4 * d, d)},
    }
    if cross:
        block["ln_x"] = ln()
        block["xattn"] = {
            "q": lin(d, d), "k": lin(d, d, bias=False),
            "v": lin(d, d), "o": lin(d, d),
        }
    return block


def _stack_blocks(blocks) -> Dict[str, Any]:
    """List of per-layer dicts -> single dict with (L, ...) leaves."""
    return jax.tree.map(lambda *xs: np.stack(xs), *blocks)


def init_params(
    config: WhisperConfig, seed: int = 0, dtype=jnp.float32
) -> Dict[str, Any]:
    """Deterministic random parameters with the exact checkpoint structure."""
    rng = np.random.default_rng(seed)
    d_a, d_t = config.n_audio_state, config.n_text_state

    enc = {
        "conv1": {
            "w": rng.normal(0, (3 * config.n_mels) ** -0.5,
                            (3, config.n_mels, d_a)).astype(np.float32),
            "b": np.zeros(d_a, np.float32),
        },
        "conv2": {
            "w": rng.normal(0, (3 * d_a) ** -0.5, (3, d_a, d_a)).astype(np.float32),
            "b": np.zeros(d_a, np.float32),
        },
        "pos": _sinusoids(config.n_audio_ctx, d_a),
        "blocks": _stack_blocks(
            [_init_block(rng, d_a, cross=False) for _ in range(config.n_audio_layer)]
        ),
        "ln_post": {"g": np.ones(d_a, np.float32), "b": np.zeros(d_a, np.float32)},
    }
    dec = {
        "tok": rng.normal(0, 0.02, (config.n_vocab, d_t)).astype(np.float32),
        "pos": rng.normal(0, 0.01, (config.n_text_ctx, d_t)).astype(np.float32),
        "blocks": _stack_blocks(
            [_init_block(rng, d_t, cross=True) for _ in range(config.n_text_layer)]
        ),
        "ln": {"g": np.ones(d_t, np.float32), "b": np.zeros(d_t, np.float32)},
    }
    params = {"encoder": enc, "decoder": dec}
    return jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), params)


# HF WhisperForConditionalGeneration name mapping -> our pytree paths.
def load_hf_safetensors(
    path: str, config: Optional[WhisperConfig] = None, dtype=jnp.float32
) -> Tuple[Dict[str, Any], WhisperConfig]:
    """Load a local HF Whisper checkpoint directory (model.safetensors +
    config.json) into the stacked-pytree layout."""
    from safetensors import safe_open

    cfg_path = os.path.join(path, "config.json")
    if config is None:
        with open(cfg_path) as f:
            hf = json.load(f)
        name = os.path.basename(path.rstrip("/"))
        config = WhisperConfig(
            name=name,
            n_mels=hf["num_mel_bins"],
            n_audio_state=hf["d_model"],
            n_audio_head=hf["encoder_attention_heads"],
            n_audio_layer=hf["encoder_layers"],
            n_vocab=hf["vocab_size"],
            n_text_state=hf["d_model"],
            n_text_head=hf["decoder_attention_heads"],
            n_text_layer=hf["decoder_layers"],
            n_audio_ctx=hf.get("max_source_positions", 1500),
            n_text_ctx=hf.get("max_target_positions", 448),
        )

    st_path = os.path.join(path, "model.safetensors")
    tensors: Dict[str, np.ndarray] = {}
    with safe_open(st_path, framework="numpy") as f:
        for key in f.keys():
            tensors[key.replace("model.", "", 1)] = f.get_tensor(key)

    def T(name):  # linear weight (out, in) -> (in, out)
        return tensors[name].T

    def attn(prefix):
        out = {
            "q": {"w": T(f"{prefix}.q_proj.weight"), "b": tensors[f"{prefix}.q_proj.bias"]},
            "k": {"w": T(f"{prefix}.k_proj.weight")},
            "v": {"w": T(f"{prefix}.v_proj.weight"), "b": tensors[f"{prefix}.v_proj.bias"]},
            "o": {"w": T(f"{prefix}.out_proj.weight"), "b": tensors[f"{prefix}.out_proj.bias"]},
        }
        return out

    def ln(prefix):
        return {"g": tensors[f"{prefix}.weight"], "b": tensors[f"{prefix}.bias"]}

    def enc_block(i):
        p = f"encoder.layers.{i}"
        return {
            "ln1": ln(f"{p}.self_attn_layer_norm"),
            "attn": attn(f"{p}.self_attn"),
            "ln2": ln(f"{p}.final_layer_norm"),
            "mlp": {
                "fc1": {"w": T(f"{p}.fc1.weight"), "b": tensors[f"{p}.fc1.bias"]},
                "fc2": {"w": T(f"{p}.fc2.weight"), "b": tensors[f"{p}.fc2.bias"]},
            },
        }

    def dec_block(i):
        p = f"decoder.layers.{i}"
        return {
            "ln1": ln(f"{p}.self_attn_layer_norm"),
            "attn": attn(f"{p}.self_attn"),
            "ln_x": ln(f"{p}.encoder_attn_layer_norm"),
            "xattn": attn(f"{p}.encoder_attn"),
            "ln2": ln(f"{p}.final_layer_norm"),
            "mlp": {
                "fc1": {"w": T(f"{p}.fc1.weight"), "b": tensors[f"{p}.fc1.bias"]},
                "fc2": {"w": T(f"{p}.fc2.weight"), "b": tensors[f"{p}.fc2.bias"]},
            },
        }

    enc = {
        # HF conv: (out, in, k) -> (k, in, out)
        "conv1": {
            "w": tensors["encoder.conv1.weight"].transpose(2, 1, 0),
            "b": tensors["encoder.conv1.bias"],
        },
        "conv2": {
            "w": tensors["encoder.conv2.weight"].transpose(2, 1, 0),
            "b": tensors["encoder.conv2.bias"],
        },
        "pos": tensors["encoder.embed_positions.weight"],
        "blocks": _stack_blocks([enc_block(i) for i in range(config.n_audio_layer)]),
        "ln_post": ln("encoder.layer_norm"),
    }
    dec = {
        "tok": tensors["decoder.embed_tokens.weight"],
        "pos": tensors["decoder.embed_positions.weight"],
        "blocks": _stack_blocks([dec_block(i) for i in range(config.n_text_layer)]),
        "ln": ln("decoder.layer_norm"),
    }
    params = jax.tree.map(
        lambda x: jnp.asarray(x, dtype=dtype), {"encoder": enc, "decoder": dec}
    )
    return params, config


# ---------------------------------------------------------------------------
# Core modules (pure functions)
# ---------------------------------------------------------------------------


def _layer_norm(x, p):
    mean = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    return (normed * p["g"] + p["b"]).astype(x.dtype)


def _quant_activation_rows(x):
    """Dynamic symmetric per-row int8 activation quantization for the
    native int8 MXU path: returns (xq int8, sx f32 row scales with a
    trailing keepdim). Exactness is NOT claimed — int8_native is a
    throughput experiment whose accuracy bar is the real-weights parity
    gate, like every other storage policy here."""
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.round(xf / sx).astype(jnp.int8)
    return xq, sx


def _linear(x, p):
    if "wq" in p:
        if _W8_NATIVE:
            # native int8 MXU matmul (VERDICT r4 #3a): both operands
            # int8, int32 accumulate, per-row activation scale x
            # per-out-channel weight scale on the accumulator — the
            # weight streams from HBM at 1 byte/elem AND the MXU runs
            # at its int8 rate, vs the dequant-to-bf16 operand read
            # measured at 0.91x in the r4 A/B (tools/ab_weights_dtype.py)
            xq, sx = _quant_activation_rows(x)
            y = jax.lax.dot_general(
                xq, p["wq"],
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            y = y * sx * p["ws"].astype(jnp.float32)
        else:
            # quantized storage (see quantize_decoder_weights): the narrow
            # weight converts in the operand read; int8's per-out-channel
            # scale applies to the f32 accumulator (same matmul semantics)
            y = jnp.dot(x, p["wq"].astype(x.dtype),
                        preferred_element_type=jnp.float32)
            y = y * p["ws"].astype(jnp.float32)
    else:
        y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _split_heads(x, n_head):  # (B, T, d) -> (B, H, T, Dh)
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x):  # (B, H, T, Dh) -> (B, T, d)
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


# Flash-attention policy: "auto" routes unmasked long-sequence
# self-attention (the encoder at 5 s+ buckets) to the Pallas TPU flash
# kernel; "off" keeps the XLA einsum path (CPU always does). Default off:
# this serving workload is decode-loop-dominated and whisper's head_dim of
# 64 underfills the kernel's 128-lane tiles, so flash mainly adds compile
# time here. Flip with STT_FLASH_ATTENTION=auto for long-context regimes.
FLASH_ATTENTION = os.getenv("STT_FLASH_ATTENTION", "off").strip().lower()
_FLASH_MIN_SEQ = 512


def _flash_applicable(t: int) -> bool:
    if FLASH_ATTENTION == "off" or t < _FLASH_MIN_SEQ:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


# Cross-attention decode kernel policy: "auto" routes the per-step
# cross-attention inside _decoder_step to the fused Pallas kernel on
# non-CPU backends — the decode loop streams the whole cross K/V from
# HBM every token and the XLA einsum pair reaches only ~half of HBM
# peak there (round-3 profile: cross-attn was ~70% of the loop).
# Default OFF. Variants, selected by value (A/B record in ROADMAP,
# measured with tools/ab_xattn_kernel.py at the serving shape
# L12 B64 H12 Ta500 Dh64 fp8; einsum baseline 2.19 ms/step = 33% of
# the 0.72 ms HBM floor):
#   "vpu" — elementwise multiply+reduce over row-grouped blocks:
#     27.0 ms/step (12x SLOWER) — Dh=64 underfills the 128 lanes and
#     both reductions cross lanes; kept for A/B history.
#   "mxu" — per-head M=1 dots, grid over rows: 22.4 ms/step — Mosaic
#     emits ~1.5k tiny MXU ops per layer; kept for A/B history.
#   "mm" (also what any other non-off value, e.g. "auto", selects) —
#     merged-head matmul + diagonal mask; the least-bad variant.
# See tests/test_xattn_decode.py for parity.
XATTN_KERNEL = os.getenv("STT_XATTN_KERNEL", "off").strip().lower()


# Prompt-prefill policy: "parallel" (default) fills the KV cache for all
# prompt positions in ONE teacher-forced pass (matmuls with M=prompt_len
# on the MXU); "seq" keeps the one-_decoder_step-per-position fori_loop.
# The sequential path costs one full decode step per prompt token — for
# a conditioned long-final window (sot_prev + up to ~224 ctx tokens,
# reference faster_whisper condition_on_previous_text) that is ~3x the
# whole generation loop. Kept as an A/B/fallback knob; part of the exec
# fingerprint (engine.exec_fingerprint).
PREFILL = os.getenv("STT_PREFILL", "parallel").strip().lower()

# Fused decoder self-attention q/k/v projection (VERDICT r4 #3b, op-count
# reduction in the unrolled decode step): the three projections share the
# same layer-normed input, so one (d, 3d) matmul replaces three (d, d)
# matmuls — 24 fewer dispatches per 12-layer step. Exact by construction
# (identical products; k's absent bias becomes a zero block). Load-time
# params transform (fuse_decoder_qkv) + a structure branch in the step;
# A/B: tools/ab_weights_dtype.py --modes bf16,fused.
FUSED_QKV = os.getenv("STT_FUSED_QKV", "off").strip().lower()


def _fused_qkv_on() -> bool:
    return FUSED_QKV in ("1", "on", "true", "yes")


def _xattn_kernel_applicable() -> bool:
    if XATTN_KERNEL in ("off", "0", "false"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _flash_self_attention(qh, kh, vh, sm_scale: float):
    """Pallas TPU flash attention over 128-padded sequences; padding is
    excluded via segment ids (pad rows form their own segment)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention,
    )

    b, h, t, dh = qh.shape
    t_pad = (-t) % 128
    if t_pad:
        pad4 = ((0, 0), (0, 0), (0, t_pad), (0, 0))
        qh = jnp.pad(qh, pad4)
        kh = jnp.pad(kh, pad4)
        vh = jnp.pad(vh, pad4)
        seg = jnp.concatenate(
            [jnp.ones((b, t), jnp.int32), jnp.zeros((b, t_pad), jnp.int32)],
            axis=1,
        )
        segment_ids = SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None
    out = flash_attention(
        qh, kh, vh, segment_ids=segment_ids, causal=False, sm_scale=sm_scale
    )
    return out[:, :, :t, :]


def _attention(q, k, v, n_head, mask=None):
    """q: (B, Tq, d); k/v: (B, Tk, d). Scaled as whisper (q,k each by
    d_head**-0.25); f32 logits on the MXU. Long unmasked self-attention
    (the encoder) routes to the Pallas flash kernel on TPU."""
    scale = (q.shape[-1] // n_head) ** -0.25
    qh = _split_heads(q, n_head) * scale
    kh = _split_heads(k, n_head) * scale
    vh = _split_heads(v, n_head)
    if (
        mask is None
        and q.shape[1] == k.shape[1]
        and _flash_applicable(q.shape[1])
    ):
        out = _flash_self_attention(qh, kh, vh, sm_scale=1.0).astype(q.dtype)
        return _merge_heads(out)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        logits = logits + mask
    weights = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return _merge_heads(out)


def _self_attn(x, p, n_head, mask=None):
    q, k, v = _linear(x, p["q"]), _linear(x, p["k"]), _linear(x, p["v"])
    return _linear(_attention(q, k, v, n_head, mask), p["o"])


def _mlp(x, p):
    return _linear(jax.nn.gelu(_linear(x, p["fc1"]), approximate=False), p["fc2"])


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _conv1d(x, p, stride):
    # x: (B, T, C); kernel (K, I, O); SAME padding of 1 for k=3
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + p["b"].astype(x.dtype)


@partial(jax.jit, static_argnames=("n_head",))
def encode(params: Dict[str, Any], mel: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """mel (B, n_mels, T_frames) -> encoder states (B, T_frames//2, d)."""
    enc = params["encoder"]
    x = mel.transpose(0, 2, 1)  # (B, T, n_mels)
    x = jax.nn.gelu(_conv1d(x, enc["conv1"], 1), approximate=False)
    x = jax.nn.gelu(_conv1d(x, enc["conv2"], 2), approximate=False)
    t = x.shape[1]
    x = x + jax.lax.dynamic_slice_in_dim(enc["pos"], 0, t, axis=0).astype(x.dtype)

    def layer(h, block):
        h = h + _self_attn(_layer_norm(h, block["ln1"]), block["attn"], n_head)
        h = h + _mlp(_layer_norm(h, block["ln2"]), block["mlp"])
        return h, None

    x, _ = jax.lax.scan(layer, x, enc["blocks"])
    return _layer_norm(x, enc["ln_post"])


# ---------------------------------------------------------------------------
# Decoder with KV cache
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    """Self-attention cache in **head-split layout**: (L, B, H, T_max, Dh)
    post-projection k and v, with k pre-scaled by d_head**-0.25.

    Layout rationale (measured on v5e): storing (L, B, T, d) forces a
    (B, T, d) -> (B, H, T, Dh) transpose of the FULL cache (and of the
    cross K/V: ~1 GB for a 64x10s batch) on every decode step, which
    dominated per-step latency by an order of magnitude over the actual
    attention math. Head-split storage transposes each k/v exactly once,
    at write time, on a single position.
    """

    k: jnp.ndarray
    v: jnp.ndarray


def kv_cache_shape(
    config: WhisperConfig, batch: int, max_len: int
) -> tuple:
    h = config.n_text_head
    return (config.n_text_layer, batch, h, max_len, config.n_text_state // h)


# Self-KV cache storage: same bandwidth argument as the cross-KV (below)
# but a smaller term (the self cache is T_max<=228 slots vs 1500 audio
# frames). Experimentally gated, default bf16.
SELF_KV_DTYPE = os.getenv("STT_SELF_KV_DTYPE", "bf16").strip().lower()


def kv_cache_dtype(compute_dtype):
    """Storage dtype of the self-KV cache for a given compute dtype."""
    if SELF_KV_DTYPE in ("fp8", "f8", "float8", "fp8_e4m3") and (
        compute_dtype == jnp.bfloat16
    ):
        return jnp.float8_e4m3fn
    return compute_dtype


def init_kv_cache(
    config: WhisperConfig, batch: int, max_len: int, dtype=jnp.float32
) -> KVCache:
    shape = kv_cache_shape(config, batch, max_len)
    dtype = kv_cache_dtype(dtype)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


# Cross-KV storage dtype: decode steps stream the full cross K/V from HBM
# every token (~1 GB/step for a 64x10s batch — the per-step bandwidth
# floor), so an 8-bit storage format cuts the dominant term (measured
# -15% on the 64x10s decode loop, v5e). The default is int8 with
# per-(row,head) symmetric scales: same byte width as the earlier fp8
# default and measured end-to-end neutral against it (RTFx 1597 vs 1601
# at 64x10s, within round noise), but ~8x finer quantization within
# each (row, head)'s range (e4m3 keeps 3 mantissa bits; int8 ~7.9
# effective bits after scaling) — it shrinks the one default-on
# numeric approximation the serving path carries, and int8 is the
# reference's own quantization practice (faster_whisper
# int8_float16). Transcripts are token-identical to bf16 storage on
# the test models for BOTH formats
# (test_engine.py::test_quantized_cross_kv_transcript_parity); verify
# on a real checkpoint with tools/validate_real_weights.py. Applies
# only when the compute dtype is bfloat16; values: int8 (default),
# fp8, bf16 (exact storage).
CROSS_KV_DTYPE = os.getenv("STT_CROSS_KV_DTYPE", "int8").strip().lower()


def _cross_store_dtype(compute_dtype):
    if compute_dtype != jnp.bfloat16:
        return None
    if CROSS_KV_DTYPE in ("fp8", "f8", "float8", "fp8_e4m3"):
        return jnp.float8_e4m3fn
    # int8 with per-(row,head) symmetric scales: same byte width as fp8
    # but ~8x finer quantization within each (row, head)'s range, and the
    # scales fold into the tiny per-step q/output tensors so the large
    # K/V reads stay a pure fused int8->bf16 convert. Device A/B at the
    # 64x10s decode point: 1.499 ms/step vs fp8's 1.906 (1.27x, 48% of
    # HBM peak) — tools/ab_xattn_kernel.py --kv-dtype int8.
    if CROSS_KV_DTYPE in ("int8", "i8"):
        return jnp.int8
    return None


# Decoder weight storage: every decode step streams every decoder
# linear weight + the token table from HBM (~280 MB/step bf16 for
# whisper-small — the second-largest per-step term after the cross-KV).
# int8 with symmetric per-out-channel scales halves it (the reference's
# own fast path serves int8 by default: faster_whisper compute_type
# int8_float16, BASELINE.md profiles). A straight fp8_e4m3 cast was
# also tried and REJECTED: same byte width but only a 3-bit mantissa
# and no per-channel scaling — token agreement collapsed to 42% on the
# hermetic tiny model vs int8's 96%. EXPERIMENTAL, default bf16 —
# promote only with an on-device A/B and a real-weights accuracy check
# (tests/test_integration_backends.py gates).
DECODER_WEIGHTS_DTYPE = os.getenv(
    "STT_DECODER_WEIGHTS_DTYPE", "bf16"
).strip().lower()
# int8 storage variants: "int8" dequantizes in the operand read and
# matmuls in bf16; "int8_native" keeps both operands int8 and runs the
# MXU's int8 path (dynamic per-row activation quantization — see
# _quant_activation_rows; throughput A/B: tools/ab_weights_dtype.py
# --modes bf16,int8,int8_native).
_W8_MODES = ("int8", "i8", "int8_native", "i8n")
_W8_NATIVE = DECODER_WEIGHTS_DTYPE in ("int8_native", "i8n")


def _quant_linear_leaf(w, reduce_axes):
    """Symmetric int8 {'wq','ws'} with per-out-channel scales over
    ``reduce_axes``; exact dequant bound |w - wq*ws| <= ws/2."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=reduce_axes, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.round(wf / s).astype(jnp.int8)
    return {"wq": q, "ws": jnp.squeeze(s, axis=reduce_axes)}


def quantize_decoder_weights(dec, compute_dtype):
    """Return a decoder-params copy with int8 linear weights + token
    table when DECODER_WEIGHTS_DTYPE selects it ('bf16' or non-bf16
    compute = no-op). Biases, layer norms, and positional tables stay
    bf16. Stacked block weights (L, d_in, d_out) quantize per (layer,
    out-channel); the token table (V, d) per d-column so one scale
    vector serves both the embedding gather and the logits matmul."""
    if DECODER_WEIGHTS_DTYPE not in _W8_MODES:
        return dec
    if compute_dtype != jnp.bfloat16:
        return dec

    def quant_block_tree(tree):
        out = {}
        for name, sub in tree.items():
            if isinstance(sub, dict) and "w" in sub:
                leaf = dict(sub)
                w = leaf.pop("w")
                leaf.update(_quant_linear_leaf(w, (1,)))
                out[name] = leaf
            elif isinstance(sub, dict):
                out[name] = quant_block_tree(sub)
            else:
                out[name] = sub
        return out

    new = dict(dec)
    blocks = dict(dec["blocks"])
    for key in ("attn", "xattn", "mlp"):
        if key in blocks:
            blocks[key] = quant_block_tree(blocks[key])
    new["blocks"] = blocks
    new["tok"] = _quant_linear_leaf(dec["tok"], (0,))
    return new


def fuse_decoder_qkv(dec):
    """Return a decoder-params copy whose self-attn q/k/v projections are
    concatenated into one ``qkv`` linear of shape (L, d, 3d) (+ bias
    (L, 3d) with a zero block where k had no bias). No-op unless
    STT_FUSED_QKV enables the policy. Applied by the engine at load time
    BEFORE quantize_decoder_weights: per-out-channel int8 scales are
    computed per output column either way, so fusion composes exactly
    with int8 storage."""
    if not _fused_qkv_on():
        return dec
    blocks = dict(dec["blocks"])
    attn = dict(blocks["attn"])
    if "qkv" in attn:
        return dec
    q, k, v = attn["q"], attn["k"], attn["v"]
    w = jnp.concatenate([q["w"], k["w"], v["w"]], axis=-1)
    kb = jnp.zeros(k["w"].shape[:-2] + (k["w"].shape[-1],), q["b"].dtype)
    b = jnp.concatenate([q["b"], kb, v["b"]], axis=-1)
    blocks["attn"] = {"qkv": {"w": w, "b": b}, "o": attn["o"]}
    new = dict(dec)
    new["blocks"] = blocks
    return new


def _attn_qkv_lin(hn, attn_p):
    """The step's self-attn input projections, fused or separate
    depending on the params structure (see fuse_decoder_qkv). Returns
    (q_lin, k_lin, v_lin), head-merge layout, unscaled."""
    if "qkv" in attn_p:
        qkv = _linear(hn, attn_p["qkv"])
        return tuple(jnp.split(qkv, 3, axis=-1))
    return (
        _linear(hn, attn_p["q"]),
        _linear(hn, attn_p["k"]),
        _linear(hn, attn_p["v"]),
    )


def _tok_embed(dec, tokens):
    """Token-embedding gather, dequantizing when the table is stored
    8-bit (per-column scale)."""
    tok = dec["tok"]
    if isinstance(tok, dict):
        e = tok["wq"][tokens].astype(jnp.bfloat16)
        return e * tok["ws"].astype(jnp.bfloat16)
    return tok[tokens]


def _tok_logits(dec, x):
    """Vocab logits against the (possibly quantized) token table: with
    a per-column scale s, x @ (q * s).T == (x * s) @ q.T — the scale
    folds into the small activation instead of the (V, d) table."""
    tok = dec["tok"]
    if isinstance(tok, dict):
        x = x * tok["ws"].astype(x.dtype)
        if _W8_NATIVE:
            # the (V, d) table is the single largest weight read of the
            # step; stream it int8 and use the MXU int8 path (the
            # per-column scale is already folded into x above)
            xq, sx = _quant_activation_rows(x)
            y = jax.lax.dot_general(
                xq, tok["wq"],
                (((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            return y * sx
        return jnp.dot(x, tok["wq"].T.astype(x.dtype),
                       preferred_element_type=jnp.float32)
    return jnp.dot(x, tok.T, preferred_element_type=jnp.float32)


def _tok_dtype(dec):
    tok = dec["tok"]
    return jnp.bfloat16 if isinstance(tok, dict) else tok.dtype


class CrossKV(NamedTuple):
    """Precomputed cross-attention K/V, head-split and k pre-scaled:
    (L, B, H, T_audio, Dh) each. ``k_scale``/``v_scale`` are the
    per-(layer, row, head) symmetric dequant scales (L, B, H, 1, 1) f32
    when storage is int8, else None."""

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray]
    v_scale: Optional[jnp.ndarray]


def precompute_cross_kv(params, enc_out, n_head) -> CrossKV:
    """Cross-attention K/V for all layers. Computed once per window;
    every decode step then attends without re-transposing the (large)
    audio K/V."""
    blocks = params["decoder"]["blocks"]
    scale = (enc_out.shape[-1] // n_head) ** -0.25
    store = _cross_store_dtype(enc_out.dtype) or enc_out.dtype

    def kv_layer(block):
        k = _split_heads(_linear(enc_out, block["xattn"]["k"]), n_head)
        v = _split_heads(_linear(enc_out, block["xattn"]["v"]), n_head)
        return k * scale, v

    if store == jnp.int8:
        def per_layer_q(block):
            def q8(x):
                xf = x.astype(jnp.float32)
                s = jnp.max(jnp.abs(xf), axis=(2, 3), keepdims=True) / 127.0
                s = jnp.maximum(s, 1e-12)
                return jnp.round(xf / s).astype(jnp.int8), s

            k, v = kv_layer(block)
            kq, ks = q8(k)
            vq, vs = q8(v)
            return kq, vq, ks, vs

        kq, vq, ks, vs = jax.lax.map(per_layer_q, blocks)
        return CrossKV(kq, vq, ks, vs)

    def per_layer(block):
        k, v = kv_layer(block)
        return k.astype(store), v.astype(store)

    k, v = jax.lax.map(per_layer, blocks)
    return CrossKV(k, v, None, None)


def _cross_dequant(ckv: CrossKV):
    """(k, v) in compute dtype. Materializes dequantized copies — for the
    one-shot teacher-forced passes (train oracle, DTW timing) only; the
    per-token decode loops read storage dtype via _cross_layer_attn."""
    if ckv.k_scale is None:
        return ckv.k, ckv.v
    k = ckv.k.astype(jnp.bfloat16) * ckv.k_scale.astype(jnp.bfloat16)
    v = ckv.v.astype(jnp.bfloat16) * ckv.v_scale.astype(jnp.bfloat16)
    return k, v


def _cross_layer_attn(qx, cross_kv: CrossKV, li):
    """Cross-attention for one (unrolled) layer against the stored-dtype
    K/V. int8 storage folds the per-(row,head) scales into the tiny q
    and output tensors — logits = (q*ks)·kq and out = (w·vq)*vs are
    exact since the scales are scalar per (row, head) — so the large
    K/V only pay a fused convert on the operand read."""
    ck, cv = cross_kv.k[li], cross_kv.v[li]
    if cross_kv.k_scale is not None:
        qx = qx * cross_kv.k_scale[li].astype(qx.dtype)
        out = _attn_cached(qx, ck.astype(qx.dtype), cv.astype(qx.dtype))
        return out * cross_kv.v_scale[li].astype(out.dtype)
    if qx.shape[2] == 1 and _xattn_kernel_applicable():
        from ..ops.pallas.xattn_decode import xattn_decode

        variant = (
            XATTN_KERNEL if XATTN_KERNEL in ("mxu", "vpu", "mm", "mmd")
            else "mm"
        )
        return xattn_decode(
            qx[:, :, 0, :], ck, cv, variant=variant
        )[:, :, None, :]
    return _attn_cached(qx, ck, cv)


def _attn_cached(qh, kh, vh, mask=None):
    """Attention over pre-split, pre-scaled K (qh must also be pre-scaled
    by d_head**-0.25): qh (B, H, Tq, Dh), kh/vh (B, H, Tk, Dh). K/V may
    be stored in a narrower dtype (fp8 cross-KV); the convert fuses into
    the operand read."""
    if kh.dtype != qh.dtype:
        kh = kh.astype(qh.dtype)
    if vh.dtype != qh.dtype:
        vh = vh.astype(qh.dtype)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        logits = logits + mask
    weights = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, vh,
                      preferred_element_type=jnp.float32)


def _decoder_step(
    params, tokens, pos, cache: KVCache, cross_kv, n_head, valid_len
):
    """One decode position for a whole batch.

    tokens: (B,) int32; pos: position index — a scalar (the lockstep
    serving loop) or a (B,) vector (the draft-verified resume loop,
    where each row continues from its own acceptance boundary);
    valid_len: count of valid cache entries (== pos), same rank as
    ``pos``. Returns (logits (B, V), new cache).

    Vector-pos cache writes merge through a per-row one-hot mask over
    the full (B, H, T, Dh) layer cache instead of a single
    dynamic_update_slice — roughly doubling self-KV write traffic (the
    self cache is ~6% of per-step HBM) in exchange for rows decoding
    at independent positions.
    """
    vec_pos = jnp.ndim(pos) > 0  # static: traced rank, not value
    dec = params["decoder"]
    x = _tok_embed(dec, tokens)[:, None, :]  # (B, 1, d)
    if vec_pos:
        x = x + dec["pos"][pos][:, None, :].astype(x.dtype)  # (B, 1, d)
    else:
        x = x + jax.lax.dynamic_slice_in_dim(
            dec["pos"], pos, 1, axis=0
        )[None].astype(x.dtype)
    d = x.shape[-1]
    scale = (d // n_head) ** -0.25

    t_max = cache.k.shape[3]
    # mask future cache slots: (1|B, 1, 1, T_max) additive
    slot_ids = jnp.arange(t_max)
    if vec_pos:
        mask = jnp.where(
            slot_ids[None, None, None, :] <= valid_len[:, None, None, None],
            0.0, -jnp.inf,
        )
    else:
        mask = jnp.where(
            slot_ids[None, None, None, :] <= valid_len, 0.0, -jnp.inf
        )
    write_row = (
        slot_ids[None, :] == pos[:, None] if vec_pos else None
    )  # (B, T_max) one-hot column selector per row

    k_cache, v_cache = cache.k, cache.v
    n_layers = k_cache.shape[0]

    # The layer loop is UNROLLED (not lax.scan): scanning with the cache as
    # a scanned carry made XLA materialize per-layer slice+update copies of
    # the whole layer cache AND double-buffer the full stacked cache across
    # while-loop iterations (profiled at ~2.3 ms/step of pure copies for a
    # 64x10s batch on v5e). Unrolled, each layer writes one (B, H, 1, Dh)
    # position into the stacked buffer in place, and the while-loop carry
    # aliases cleanly.
    h = x
    for li in range(n_layers):
        block = jax.tree_util.tree_map(lambda a: a[li], dec["blocks"])
        # self-attention against the head-split cache (k stored pre-scaled)
        hn = _layer_norm(h, block["ln1"])
        q_lin, k_lin, v_lin = _attn_qkv_lin(hn, block["attn"])
        qh = _split_heads(q_lin, n_head) * scale
        k_new = _split_heads(k_lin, n_head) * scale
        v_new = _split_heads(v_lin, n_head)
        if vec_pos:
            sel = write_row[:, None, :, None]  # (B, 1, T, 1)
            kl = jnp.where(sel, k_new.astype(k_cache.dtype), k_cache[li])
            vl = jnp.where(sel, v_new.astype(v_cache.dtype), v_cache[li])
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, kl[None], (li, 0, 0, 0, 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, vl[None], (li, 0, 0, 0, 0)
            )
        else:
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k_new.astype(k_cache.dtype)[None], (li, 0, 0, pos, 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v_new.astype(v_cache.dtype)[None], (li, 0, 0, pos, 0)
            )
            kl, vl = k_cache[li], v_cache[li]
        attn_out = _attn_cached(qh, kl, vl, mask).astype(
            h.dtype
        )
        h = h + _linear(_merge_heads(attn_out), block["attn"]["o"])
        # cross-attention (precomputed, pre-split, pre-scaled K/V)
        hx = _layer_norm(h, block["ln_x"])
        qx = _split_heads(_linear(hx, block["xattn"]["q"]), n_head) * scale
        x_out = _cross_layer_attn(qx, cross_kv, li).astype(h.dtype)
        h = h + _linear(_merge_heads(x_out), block["xattn"]["o"])
        h = h + _mlp(_layer_norm(h, block["ln2"]), block["mlp"])

    x = _layer_norm(h, dec["ln"])
    logits = _tok_logits(dec, x[:, 0, :])
    return logits, KVCache(k_cache, v_cache)


def _prefill_parallel(params, tokens, width, cache: KVCache, cross_kv, n_head):
    """Teacher-forced pass over positions [0, width): writes the same
    cache contents as ``width`` sequential :func:`_decoder_step` calls —
    position i attends slots <= i, and K/V round-trip through the cache
    storage dtype so fp8 self-KV parity holds — but as ONE batched
    program whose matmuls have M=width instead of M=1.

    tokens: (B, >=width) int32. Returns (h (B, width, d) pre-final-LN
    hidden states, cache). The layer loop is unrolled for the same
    write-aliasing reason as :func:`_decoder_step`.
    """
    dec = params["decoder"]
    x = _tok_embed(dec, tokens[:, :width])
    x = x + dec["pos"][:width][None].astype(x.dtype)
    scale = (x.shape[-1] // n_head) ** -0.25
    causal = jnp.where(
        jnp.arange(width)[None, :] <= jnp.arange(width)[:, None],
        0.0, -jnp.inf,
    )[None, None]
    k_cache, v_cache = cache.k, cache.v
    n_layers = k_cache.shape[0]
    h = x
    for li in range(n_layers):
        block = jax.tree_util.tree_map(lambda a: a[li], dec["blocks"])
        hn = _layer_norm(h, block["ln1"])
        q_lin, k_lin, v_lin = _attn_qkv_lin(hn, block["attn"])
        qh = _split_heads(q_lin, n_head) * scale
        k_new = (
            _split_heads(k_lin, n_head) * scale
        ).astype(k_cache.dtype)
        v_new = _split_heads(v_lin, n_head).astype(v_cache.dtype)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_new[None], (li, 0, 0, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_new[None], (li, 0, 0, 0, 0)
        )
        attn_out = _attn_cached(qh, k_new, v_new, causal).astype(h.dtype)
        h = h + _linear(_merge_heads(attn_out), block["attn"]["o"])
        hx = _layer_norm(h, block["ln_x"])
        qx = _split_heads(_linear(hx, block["xattn"]["q"]), n_head) * scale
        x_out = _cross_layer_attn(qx, cross_kv, li).astype(h.dtype)
        h = h + _linear(_merge_heads(x_out), block["xattn"]["o"])
        h = h + _mlp(_layer_norm(h, block["ln2"]), block["mlp"])
    return h, KVCache(k_cache, v_cache)


def _prefill(params, tokens, p_len, cache, cross_kv, n_head, sot_pos, layout):
    """Prompt prefill shared by the decode loops: fills cache positions
    [0, p_len-1) (the generation loop itself processes the last prompt
    position) and captures p(no_speech) from the logits AT the sot
    position (openai ``DecodingTask._main_loop`` reads it there).

    tokens: (B*, T_max) int32 (beam callers pass beam-flattened rows).
    Returns (cache, no_speech_prob (B*,)). STT_PREFILL=seq selects the
    one-step-per-position loop; the default computes the same cache in
    one parallel pass (see :data:`PREFILL`).
    """
    b = tokens.shape[0]
    no_speech0 = jnp.zeros((b,), jnp.float32)
    if p_len <= 1:
        return cache, no_speech0
    if PREFILL != "seq":
        h, cache = _prefill_parallel(
            params, tokens, p_len - 1, cache, cross_kv, n_head
        )
        dec = params["decoder"]
        # sot_pos is a traced scalar < p_len - 1 (the sot sequence is
        # always followed by at least lang + task tokens)
        h_sot = jax.lax.dynamic_slice_in_dim(h, sot_pos, 1, axis=1)
        logits = _tok_logits(dec, _layer_norm(h_sot, dec["ln"])[:, 0, :])
        no_speech = jax.nn.softmax(logits, axis=-1)[:, layout.no_speech]
        return cache, no_speech

    def prefill_step(i, state):
        cache, no_speech_prob = state
        tok_i = jax.lax.dynamic_slice(tokens, (0, i), (b, 1))[:, 0]
        logits, cache = _decoder_step(
            params, tok_i, i, cache, cross_kv, n_head, i
        )
        probs = jax.nn.softmax(logits, axis=-1)
        no_speech_prob = jnp.where(
            i == sot_pos, probs[:, layout.no_speech], no_speech_prob
        )
        return cache, no_speech_prob

    return jax.lax.fori_loop(
        0, p_len - 1, prefill_step, (cache, no_speech0)
    )


@partial(jax.jit, static_argnames=("n_head",))
def decoder_forward(
    params: Dict[str, Any],
    tokens: jnp.ndarray,
    enc_out: jnp.ndarray,
    n_head: int,
) -> jnp.ndarray:
    """Full teacher-forced decoder pass: tokens (B, T) -> logits (B, T, V).

    Used by the fine-tune train step (parallel.trainer) and as the
    ground-truth oracle for KV-cache equivalence tests.
    """
    dec = params["decoder"]
    b, t = tokens.shape
    x = _tok_embed(dec, tokens) + dec["pos"][:t][None].astype(
        _tok_dtype(dec)
    )
    causal = jnp.where(
        jnp.arange(t)[None, :] <= jnp.arange(t)[:, None], 0.0, -jnp.inf
    )[None, None]
    xk, xv = _cross_dequant(precompute_cross_kv(params, enc_out, n_head))
    scale = (x.shape[-1] // n_head) ** -0.25

    def layer(h, inputs):
        block, ck, cv = inputs
        h = h + _self_attn(_layer_norm(h, block["ln1"]), block["attn"], n_head, causal)
        hx = _layer_norm(h, block["ln_x"])
        qx = _split_heads(_linear(hx, block["xattn"]["q"]), n_head) * scale
        x_out = _merge_heads(_attn_cached(qx, ck, cv).astype(h.dtype))
        h = h + _linear(x_out, block["xattn"]["o"])
        h = h + _mlp(_layer_norm(h, block["ln2"]), block["mlp"])
        return h, None

    x, _ = jax.lax.scan(layer, x, (dec["blocks"], xk, xv))
    x = _layer_norm(x, dec["ln"])
    return _tok_logits(dec, x)


# ---------------------------------------------------------------------------
# Greedy decoding loop
# ---------------------------------------------------------------------------


class DecodeResult(NamedTuple):
    tokens: jnp.ndarray        # (B, max_len) int32, prompt + generated, eot-padded
    lengths: jnp.ndarray       # (B,) total valid length incl. prompt
    sum_logprob: jnp.ndarray   # (B,) sum of generated-token logprobs
    no_speech_prob: jnp.ndarray  # (B,) p(no_speech) at the sot position


def _sot_pos_arr(sot_pos) -> jnp.ndarray:
    """Position of the sot token in the prompt: 0 for a bare sot sequence,
    len(ctx) when a conditioning prefix ([sot_prev] + tokens) precedes it.
    whisper reads p(no_speech) from the logits produced AT the sot position
    (openai ``DecodingTask._main_loop``), so prefill must capture at
    ``i == sot_pos``, not a hardcoded 0."""
    return jnp.asarray(0 if sot_pos is None else sot_pos, jnp.int32)


def _suppress_mask(config: WhisperConfig, suppress_blank: bool) -> np.ndarray:
    """Additive logit mask suppressing special/timestamp tokens (greedy,
    no-timestamps mode)."""
    layout = token_layout(config.n_vocab)
    mask = np.zeros(config.n_vocab, np.float32)
    # all specials except eot
    mask[layout.sot:] = -np.inf
    mask[layout.eot] = 0.0
    return mask


BLANK_TOKEN = 220  # byte-level BPE id of " " (openai tokenizer.encode(" "))


def _sample_begin_mask(config: WhisperConfig) -> np.ndarray:
    """Additive mask for the FIRST generated position when
    ``suppress_blank`` is on (faster_whisper/openai default): never start
    a transcript with a lone space or an immediate eot (empty result)."""
    layout = token_layout(config.n_vocab)
    mask = np.zeros(config.n_vocab, np.float32)
    mask[BLANK_TOKEN] = -np.inf
    mask[layout.eot] = -np.inf
    return mask



def _ngram_banned_tokens(tokens2d, pos, n: int, v: int):
    """(R, V) bool: tokens that would complete an n-gram already present
    in each row's history (CT2 ``no_repeat_ngram_size``). tokens2d is
    (R, T) with the current sequence in [0, pos); the candidate position
    is ``pos``. Static small n (2-4); one scatter per step."""
    r, t = tokens2d.shape
    # the (n-1)-token tail ending at pos-1
    tail = jax.lax.dynamic_slice(tokens2d, (0, pos - (n - 1)), (r, n - 1))
    match = jnp.ones((r, t), bool)
    for j in range(n - 1):
        eq_j = tokens2d == tail[:, j][:, None]
        match = jnp.logical_and(match, jnp.roll(eq_j, -j, axis=1))
    idx = jnp.arange(t)[None, :]
    # window start i is valid when its banned position i+n-1 < pos
    valid = jnp.logical_and(match, idx + n - 1 < pos)
    next_tok_at = jnp.roll(tokens2d, -(n - 1), axis=1)  # tokens2d[:, i+n-1]
    banned = jnp.zeros((r, v), bool)
    return banned.at[jnp.arange(r)[:, None], next_tok_at].max(valid)



def _seen_text_mask(tokens, prompt_len, layout, v: int):
    """(B, V) bool: text tokens present in each row's logical prompt
    (positions < prompt_len; specials excluded). Seed for the
    repetition-penalty seen-set."""
    b, t = tokens.shape
    in_prompt = jnp.arange(t)[None, :] < prompt_len[:, None]
    ids = jnp.where(in_prompt, tokens, v)  # out-of-range -> dropped
    seen = jnp.zeros((b, v + 1), bool)
    seen = seen.at[jnp.arange(b)[:, None], ids].set(True)
    seen = seen[:, :v]
    return seen.at[:, layout.eot:].set(False)


def _apply_repetition_penalty(logits, seen, rep_penalty):
    """CT2 semantics: logits of already-seen tokens are divided by the
    penalty when positive, multiplied when negative. rep_penalty is a
    traced per-row scalar (B,), 1.0 = no-op."""
    rp = rep_penalty.reshape(rep_penalty.shape[0], *([1] * (logits.ndim - 1)))
    penalized = jnp.where(logits > 0, logits / rp, logits * rp)
    return jnp.where(seen, penalized, logits)


@partial(
    jax.jit,
    static_argnames=("n_head", "max_new_tokens", "config",
                     "suppress_blank", "ngram_n"),
    donate_argnames=("cache",),
)
def greedy_decode(
    params: Dict[str, Any],
    enc_out: jnp.ndarray,
    prompt: jnp.ndarray,
    prompt_len: jnp.ndarray,
    cache: Optional[KVCache],
    config: WhisperConfig,
    n_head: int,
    max_new_tokens: int,
    suppress_blank: bool = True,
    rep_penalty: Optional[jnp.ndarray] = None,
    ngram_n: int = 0,
    sot_pos: Optional[jnp.ndarray] = None,
) -> DecodeResult:
    """Batched greedy decode with per-row early stop.

    prompt: (B, P) int32, right-padded with eot past ``prompt_len`` (all rows
    share P but may have different logical lengths — shorter rows re-feed
    their last valid token, which is harmless because their outputs are
    ignored until their real positions). enc_out: (B, T_a, d).

    ``cache=None`` (the serving path) allocates the KV cache INSIDE the
    traced program: its shape is static anyway (p_len + max_new_tokens),
    and a host-allocated cache can never be donated cleanly — the program
    does not return it, so XLA must copy the ~hundreds-of-MB input buffer
    every dispatch (the round-2 "donated buffers were not usable"
    warning). In-trace allocation makes it a plain scratch buffer XLA
    places and reuses freely. An explicit cache is still accepted for
    KV-equivalence tests.
    """
    layout = token_layout(config.n_vocab)
    b, p_len = prompt.shape
    if cache is None:
        cache = init_kv_cache(
            config, b, p_len + max_new_tokens, dtype=enc_out.dtype
        )
    t_max = cache.k.shape[3]
    cross_kv = precompute_cross_kv(params, enc_out, n_head)
    suppress = jnp.asarray(_suppress_mask(config, True))
    begin = jnp.asarray(
        _sample_begin_mask(config) if suppress_blank
        else np.zeros(config.n_vocab, np.float32)
    )
    sot_pos = _sot_pos_arr(sot_pos)

    tokens = jnp.full((b, t_max), layout.eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))

    cache, no_speech_prob = _prefill(
        params, tokens, p_len, cache, cross_kv, n_head, sot_pos, layout
    )
    # repetition penalty is structurally optional: rep_penalty=None traces
    # a program with NO seen-state at all (the hot serving path); passing
    # an array traces the penalized variant once per shape
    track_rep = rep_penalty is not None
    seen0 = (
        _seen_text_mask(tokens, prompt_len, layout, config.n_vocab)
        if track_rep else jnp.zeros((b, 1), bool)
    )

    def cond(state):
        _, _, pos, finished, _, _ = state
        return jnp.logical_and(
            pos < min(p_len + max_new_tokens, t_max), ~jnp.all(finished)
        )

    def body(state):
        tokens, cache, pos, finished, sum_lp, seen = state
        last_tok = jax.lax.dynamic_slice(tokens, (0, pos - 1), (b, 1))[:, 0]
        logits, cache = _decoder_step(
            params, last_tok, pos - 1, cache, cross_kv, n_head, pos - 1
        )
        if track_rep:
            logits = _apply_repetition_penalty(logits, seen, rep_penalty)
        if ngram_n:
            banned = _ngram_banned_tokens(
                tokens, pos, ngram_n, config.n_vocab
            )
            logits = jnp.where(banned, -jnp.inf, logits)
        logits = logits + suppress + jnp.where(
            (pos == prompt_len)[:, None], begin[None, :], 0.0
        )
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(finished, layout.eot, next_tok)
        tok_lp = jnp.take_along_axis(logprobs, next_tok[:, None], axis=1)[:, 0]
        sum_lp = sum_lp + jnp.where(finished, 0.0, tok_lp)
        tokens = jax.lax.dynamic_update_slice(
            tokens, next_tok[:, None], (0, pos)
        )
        if track_rep:
            seen = seen.at[jnp.arange(b), next_tok].max(
                next_tok < layout.eot
            )
        finished = jnp.logical_or(finished, next_tok == layout.eot)
        return tokens, cache, pos + 1, finished, sum_lp, seen

    init = (
        tokens,
        cache,
        jnp.asarray(p_len, jnp.int32),
        jnp.zeros((b,), bool),
        jnp.zeros((b,), jnp.float32),
        seen0,
    )
    tokens, cache, pos, finished, sum_lp, _ = jax.lax.while_loop(
        cond, body, init
    )

    # length = index of first eot at/after prompt (or pos if none)
    gen_region = tokens[:, :]
    is_eot = jnp.logical_and(
        gen_region == layout.eot,
        jnp.arange(t_max)[None, :] >= p_len,
    )
    first_eot = jnp.where(
        is_eot.any(axis=1), jnp.argmax(is_eot, axis=1), pos
    ).astype(jnp.int32)
    return DecodeResult(tokens, first_eot, sum_lp, no_speech_prob)


class DraftedResult(NamedTuple):
    """:class:`DecodeResult` plus the per-row count of draft tokens the
    verify pass accepted (diagnostics / metrics)."""
    tokens: jnp.ndarray
    lengths: jnp.ndarray
    sum_logprob: jnp.ndarray
    no_speech_prob: jnp.ndarray
    n_accepted: jnp.ndarray    # (B,) int32


def _verify_positions(dec, h, begin_rows, suppress, begin, chunk: int = 8):
    """Masked greedy argmax + its logprob at every position of
    ``h`` (B, J, d): returns (g (B, J) int32, lp (B, J) f32).

    Chunked over J so the f32 logits materialize as (B, chunk, V)
    (~100 MB at B=64 for whisper vocab) instead of J/chunk times that.
    ``begin_rows`` (B, J) marks positions where the sample-begin mask
    applies (generation position == the row's logical prompt length).
    """
    b, jtot, d = h.shape
    pad = (-jtot) % chunk
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        begin_rows = jnp.pad(begin_rows, ((0, 0), (0, pad)))
    nch = (jtot + pad) // chunk
    hs = jnp.transpose(h.reshape(b, nch, chunk, d), (1, 0, 2, 3))
    brs = jnp.transpose(begin_rows.reshape(b, nch, chunk), (1, 0, 2))

    def one(args):
        hc, bc = args
        logits = _tok_logits(dec, _layer_norm(hc, dec["ln"]))
        logits = logits + suppress[None, None, :] + jnp.where(
            bc[:, :, None], begin[None, None, :], 0.0
        )
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lp = jax.nn.log_softmax(logits, axis=-1)
        lpg = jnp.take_along_axis(lp, g[..., None], axis=-1)[..., 0]
        return g, lpg

    g, lpg = jax.lax.map(one, (hs, brs))
    g = jnp.transpose(g, (1, 0, 2)).reshape(b, jtot + pad)[:, :jtot]
    lpg = jnp.transpose(lpg, (1, 0, 2)).reshape(b, jtot + pad)[:, :jtot]
    return g, lpg


@partial(
    jax.jit,
    static_argnames=("n_head", "max_new_tokens", "config", "suppress_blank"),
)
def greedy_decode_drafted(
    params: Dict[str, Any],
    enc_out: jnp.ndarray,
    prompt: jnp.ndarray,
    prompt_len: jnp.ndarray,
    draft: jnp.ndarray,
    draft_len: jnp.ndarray,
    config: WhisperConfig,
    n_head: int,
    max_new_tokens: int,
    suppress_blank: bool = True,
    sot_pos: Optional[jnp.ndarray] = None,
) -> DraftedResult:
    """Greedy decode that VERIFIES a per-row draft before generating.

    Streaming partials re-decode a growing buffer every ~1.5 s; the
    previous partial's tokens are a near-perfect draft for the next
    decode of the same session. This runs prompt+draft through ONE
    teacher-forced parallel pass (the cross-KV stream — the per-step
    bandwidth floor — is paid once for the whole draft instead of per
    token), accepts the longest prefix where the model's masked greedy
    argmax equals the draft, commits the corrected token at the first
    mismatch for free, and resumes the sequential loop per row from its
    own acceptance boundary. Output is token-identical to
    :func:`greedy_decode` on the same inputs for ANY draft — the draft
    only moves work between the parallel and sequential phases.

    Precision caveat: "identical" is exact up to matmul accumulation
    order. The M=width verify pass and the M=1 sequential step compute
    the same logits through different tilings; in bf16 a near-tie
    between the top-2 tokens (|delta| under the accumulation-order
    epsilon) can argmax differently, so a drafted decode on real TPU
    bf16 may rarely diverge from plain greedy at such ties — the same
    class of benign flip any batch-size or layout change produces. The
    parity tests (tests/test_draft_decode.py) prove the ALGORITHM exact
    in f32; there is no semantic (non-tie) divergence path.

    Reference role: the speed side of faster_whisper's streaming
    partials (the reference re-decodes from scratch; this is strictly
    additional). draft: (B, D) int32, eot-padded past ``draft_len``;
    requires D <= max_new_tokens. No rep-penalty/ngram variant — the
    engine routes those policies through :func:`greedy_decode`.
    """
    layout = token_layout(config.n_vocab)
    b, p_len = prompt.shape
    d_max = draft.shape[1]
    assert d_max <= max_new_tokens, (d_max, max_new_tokens)
    t_max = p_len + max_new_tokens
    cache = init_kv_cache(config, b, t_max, dtype=enc_out.dtype)
    cross_kv = precompute_cross_kv(params, enc_out, n_head)
    dec = params["decoder"]
    suppress = jnp.asarray(_suppress_mask(config, True))
    begin = jnp.asarray(
        _sample_begin_mask(config) if suppress_blank
        else np.zeros(config.n_vocab, np.float32)
    )
    sot_pos = _sot_pos_arr(sot_pos)
    eot = layout.eot

    tokens = jnp.full((b, t_max), eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))
    tokens = jax.lax.dynamic_update_slice(tokens, draft, (0, p_len))

    # -- parallel verify pass over prompt + draft ---------------------------
    width = p_len + d_max
    h, cache = _prefill_parallel(params, tokens, width, cache, cross_kv, n_head)
    h_sot = jax.lax.dynamic_slice_in_dim(h, sot_pos, 1, axis=1)
    ns_logits = _tok_logits(dec, _layer_norm(h_sot, dec["ln"])[:, 0, :])
    no_speech_prob = jax.nn.softmax(ns_logits, axis=-1)[:, layout.no_speech]

    # masked greedy choice at generation positions p_len-1 .. width-1
    # (g[j] = the token greedy writes AT position p_len + j)
    hv = h[:, p_len - 1:, :]                                   # (B, D+1, d)
    jd = jnp.arange(d_max + 1)
    begin_rows = (p_len + jd[None, :]) == prompt_len[:, None]  # (B, D+1)
    g, lp_g = _verify_positions(dec, hv, begin_rows, suppress, begin)

    # -- acceptance ----------------------------------------------------------
    dlen = jnp.clip(draft_len, 0, d_max)
    valid = jd[None, :d_max] < dlen[:, None]
    eq = jnp.logical_and(draft == g[:, :d_max], valid)
    accs = jnp.cumprod(eq.astype(jnp.int32), axis=1)           # (B, D)
    acc = accs.sum(axis=1)                                     # accepted count
    # greedy stops AT an eot: cap the committed prefix at the first
    # accepted eot (everything past it would have been forced padding)
    acc_eot = jnp.logical_and(draft == eot, accs.astype(bool))
    has_eot = acc_eot.any(axis=1)
    n_keep = jnp.where(has_eot, jnp.argmax(acc_eot, axis=1) + 1, acc)
    budget_full = n_keep >= max_new_tokens
    commit_c = jnp.logical_and(~has_eot, ~budget_full)
    c_tok = jnp.take_along_axis(g, n_keep[:, None], axis=1)[:, 0]
    c_tok = jnp.where(commit_c, c_tok, eot)

    # committed token row: accepted draft prefix, then the corrected
    # token, then eot padding (stale rejected draft must not survive —
    # the final first-eot scan reads this buffer)
    col = jnp.arange(t_max)[None, :]
    end_pos = p_len + n_keep
    tokens = jnp.where(col < end_pos[:, None], tokens, eot)
    tokens = jnp.where(
        jnp.logical_and(col == end_pos[:, None], commit_c[:, None]),
        c_tok[:, None], tokens,
    )

    lp_keep = jnp.where(jd[None, :] < n_keep[:, None], lp_g, 0.0).sum(axis=1)
    lp_c = jnp.take_along_axis(lp_g, n_keep[:, None], axis=1)[:, 0]
    sum_lp0 = lp_keep + jnp.where(commit_c, lp_c, 0.0)
    pos0 = end_pos + commit_c.astype(jnp.int32)
    # done when: an accepted eot ended the row, the corrected token IS
    # the eot, or the committed tokens already fill the max_new budget
    # (n_keep + commit_c == max_new — the loop must not run an extra
    # step past the greedy bound)
    finished0 = jnp.logical_or(
        jnp.logical_or(has_eot, c_tok == eot),
        pos0 >= p_len + max_new_tokens,
    )

    # -- per-row sequential resume ------------------------------------------
    def cond(state):
        _, _, _, finished, _ = state
        return ~jnp.all(finished)

    def body(state):
        tokens, cache, pos, finished, sum_lp = state
        prev = jnp.maximum(pos - 1, 0)
        last_tok = jnp.take_along_axis(tokens, prev[:, None], axis=1)[:, 0]
        logits, cache = _decoder_step(
            params, last_tok, prev, cache, cross_kv, n_head, prev
        )
        # positions here are all > prompt_len: the sample-begin mask was
        # already applied (if due) in the verify pass
        logits = logits + suppress
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(finished, eot, next_tok)
        tok_lp = jnp.take_along_axis(logprobs, next_tok[:, None], axis=1)[:, 0]
        sum_lp = sum_lp + jnp.where(finished, 0.0, tok_lp)
        wcol = jnp.minimum(pos, t_max - 1)
        write = jnp.logical_and((~finished)[:, None], col == wcol[:, None])
        tokens = jnp.where(write, next_tok[:, None], tokens)
        newly_done = jnp.logical_or(
            next_tok == eot, pos + 1 >= p_len + max_new_tokens
        )
        pos = jnp.where(finished, pos, pos + 1)
        finished = jnp.logical_or(finished, newly_done)
        return tokens, cache, pos, finished, sum_lp

    init = (tokens, cache, pos0.astype(jnp.int32), finished0, sum_lp0)
    tokens, cache, pos, finished, sum_lp = jax.lax.while_loop(
        cond, body, init
    )

    is_eot = jnp.logical_and(tokens == eot, col >= p_len)
    first_eot = jnp.where(
        is_eot.any(axis=1), jnp.argmax(is_eot, axis=1),
        p_len + max_new_tokens,
    ).astype(jnp.int32)
    return DraftedResult(
        tokens, first_eot, sum_lp, no_speech_prob, acc.astype(jnp.int32)
    )


# ---------------------------------------------------------------------------
# Sampled decoding (temperature-fallback ladder)
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("n_head", "max_new_tokens", "config",
                     "suppress_blank", "ngram_n"),
    donate_argnames=("cache",),
)
def sample_decode(
    params: Dict[str, Any],
    enc_out: jnp.ndarray,
    prompt: jnp.ndarray,
    prompt_len: jnp.ndarray,
    cache: Optional[KVCache],
    config: WhisperConfig,
    n_head: int,
    max_new_tokens: int,
    temperature: jnp.ndarray = 1.0,
    rng: Optional[jnp.ndarray] = None,
    suppress_blank: bool = True,
    rep_penalty: Optional[jnp.ndarray] = None,
    ngram_n: int = 0,
    sot_pos: Optional[jnp.ndarray] = None,
) -> DecodeResult:
    """Categorical sampling at a (traced) temperature — the retry rungs of
    whisper's temperature-fallback ladder (reference faster_whisper passes
    ``temperature`` tuples to CTranslate2). Structure mirrors
    :func:`greedy_decode`; ``temperature`` is a runtime scalar so every rung
    reuses ONE compiled program per shape. ``cache=None`` allocates
    in-trace (see :func:`greedy_decode`)."""
    layout = token_layout(config.n_vocab)
    b, p_len = prompt.shape
    if cache is None:
        cache = init_kv_cache(
            config, b, p_len + max_new_tokens, dtype=enc_out.dtype
        )
    t_max = cache.k.shape[3]
    cross_kv = precompute_cross_kv(params, enc_out, n_head)
    suppress = jnp.asarray(_suppress_mask(config, True))
    begin = jnp.asarray(
        _sample_begin_mask(config) if suppress_blank
        else np.zeros(config.n_vocab, np.float32)
    )
    sot_pos = _sot_pos_arr(sot_pos)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    temperature = jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-3)

    tokens = jnp.full((b, t_max), layout.eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))

    cache, no_speech_prob = _prefill(
        params, tokens, p_len, cache, cross_kv, n_head, sot_pos, layout
    )

    def cond(state):
        _, _, pos, finished, _, _, _ = state
        return jnp.logical_and(
            pos < min(p_len + max_new_tokens, t_max), ~jnp.all(finished)
        )

    track_rep = rep_penalty is not None
    seen0 = (
        _seen_text_mask(tokens, prompt_len, layout, config.n_vocab)
        if track_rep else jnp.zeros((b, 1), bool)
    )

    def body(state):
        tokens, cache, pos, finished, sum_lp, key, seen = state
        last_tok = jax.lax.dynamic_slice(tokens, (0, pos - 1), (b, 1))[:, 0]
        logits, cache = _decoder_step(
            params, last_tok, pos - 1, cache, cross_kv, n_head, pos - 1
        )
        if track_rep:
            logits = _apply_repetition_penalty(logits, seen, rep_penalty)
        if ngram_n:
            banned = _ngram_banned_tokens(
                tokens, pos, ngram_n, config.n_vocab
            )
            logits = jnp.where(banned, -jnp.inf, logits)
        logits = logits + suppress + jnp.where(
            (pos == prompt_len)[:, None], begin[None, :], 0.0
        )
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        key, sub = jax.random.split(key)
        next_tok = jax.random.categorical(
            sub, logits / temperature, axis=-1
        ).astype(jnp.int32)
        next_tok = jnp.where(finished, layout.eot, next_tok)
        tok_lp = jnp.take_along_axis(logprobs, next_tok[:, None], axis=1)[:, 0]
        sum_lp = sum_lp + jnp.where(finished, 0.0, tok_lp)
        tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None], (0, pos))
        if track_rep:
            seen = seen.at[jnp.arange(b), next_tok].max(
                next_tok < layout.eot
            )
        finished = jnp.logical_or(finished, next_tok == layout.eot)
        return tokens, cache, pos + 1, finished, sum_lp, key, seen

    init = (
        tokens, cache,
        jnp.asarray(p_len, jnp.int32),
        jnp.zeros((b,), bool),
        jnp.zeros((b,), jnp.float32),
        rng,
        seen0,
    )
    tokens, cache, pos, finished, sum_lp, _, _ = jax.lax.while_loop(
        cond, body, init
    )
    is_eot = jnp.logical_and(
        tokens == layout.eot, jnp.arange(t_max)[None, :] >= p_len
    )
    first_eot = jnp.where(
        is_eot.any(axis=1), jnp.argmax(is_eot, axis=1), pos
    ).astype(jnp.int32)
    return DecodeResult(tokens, first_eot, sum_lp, no_speech_prob)


@partial(jax.jit, static_argnames=("n_head", "n_align_layers"))
def cross_attention_weights(
    params: Dict[str, Any],
    tokens: jnp.ndarray,
    enc_out: jnp.ndarray,
    n_head: int,
    n_align_layers: int = 2,
) -> jnp.ndarray:
    """Teacher-forced decoder pass returning the cross-attention maps of
    the LAST ``n_align_layers`` decoder layers: (K, B, H, T_text, T_audio)
    float32 softmax weights.

    This is the word-timestamp alignment signal (openai ``whisper/
    timing.py add_word_timestamps``; reference torch backend maps the
    ``word_timestamps`` option at ``stt_server/model/backends/
    torch_whisper.py:78-110``). openai uses per-checkpoint alignment-head
    masks; those ship with neither HF checkpoints nor this build, so the
    upper layers' heads — where cross-attention is most localized — stand
    in (the same fallback whisper uses for unknown models). Splitting the
    layer scan keeps memory at (K, ...) instead of (L, ...).
    """
    dec = params["decoder"]
    b, t = tokens.shape
    x = _tok_embed(dec, tokens) + dec["pos"][:t][None].astype(
        _tok_dtype(dec)
    )
    causal = jnp.where(
        jnp.arange(t)[None, :] <= jnp.arange(t)[:, None], 0.0, -jnp.inf
    )[None, None]
    xk, xv = _cross_dequant(
        precompute_cross_kv(params, enc_out, n_head)
    )  # (L, B, H, Ta, Dh)
    n_layers = jax.tree.leaves(dec["blocks"])[0].shape[0]
    k_layers = max(1, min(n_align_layers, n_layers))
    split = n_layers - k_layers
    first = jax.tree.map(lambda a: a[:split], dec["blocks"])
    last = jax.tree.map(lambda a: a[split:], dec["blocks"])

    scale = (x.shape[-1] // n_head) ** -0.25

    def layer(h, inputs):
        block, ck, cv = inputs
        h = h + _self_attn(_layer_norm(h, block["ln1"]), block["attn"], n_head, causal)
        hx = _layer_norm(h, block["ln_x"])
        qx = _split_heads(_linear(hx, block["xattn"]["q"]), n_head) * scale
        x_out = _merge_heads(_attn_cached(qx, ck, cv).astype(h.dtype))
        h = h + _linear(x_out, block["xattn"]["o"])
        h = h + _mlp(_layer_norm(h, block["ln2"]), block["mlp"])
        return h, None

    def layer_w(h, inputs):
        block, ck, cv = inputs
        ck, cv = ck.astype(h.dtype), cv.astype(h.dtype)
        h = h + _self_attn(_layer_norm(h, block["ln1"]), block["attn"], n_head, causal)
        hx = _layer_norm(h, block["ln_x"])
        qh = _split_heads(_linear(hx, block["xattn"]["q"]), n_head) * scale
        # ck arrives pre-scaled (precompute_cross_kv), cv pre-split
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, ck,
                            preferred_element_type=jnp.float32)
        w = jax.nn.softmax(logits, axis=-1)              # (B, H, T, Ta)
        out = jnp.einsum("bhqk,bhkd->bhqd", w.astype(cv.dtype), cv,
                         preferred_element_type=jnp.float32).astype(h.dtype)
        h = h + _linear(_merge_heads(out), block["xattn"]["o"])
        h = h + _mlp(_layer_norm(h, block["ln2"]), block["mlp"])
        return h, w

    if split > 0:
        x, _ = jax.lax.scan(layer, x, (first, xk[:split], xv[:split]))
    _, weights = jax.lax.scan(layer_w, x, (last, xk[split:], xv[split:]))
    return weights  # (K, B, H, T, Ta) float32


def compression_ratio(text: str) -> float:
    """zlib compression ratio — whisper's repetition heuristic."""
    import zlib

    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


# ---------------------------------------------------------------------------
# Timestamp-mode decoding (per-segment times)
# ---------------------------------------------------------------------------


class _TsRules(NamedTuple):
    """Constants for the openai timestamp grammar (ApplyTimestampRules)."""

    vocab_ids: jnp.ndarray  # (V,) int32
    is_ts: jnp.ndarray      # (V,) bool — timestamp tokens
    is_text: jnp.ndarray    # (V,) bool — plain text tokens (eot excluded)
    ts_begin: int
    max_initial: int


def _ts_rules(config: WhisperConfig, max_initial_timestamp: int) -> _TsRules:
    layout = token_layout(config.n_vocab)
    vocab_ids = jnp.arange(config.n_vocab, dtype=jnp.int32)
    return _TsRules(
        vocab_ids,
        vocab_ids >= layout.timestamp_begin,
        vocab_ids < layout.eot,
        layout.timestamp_begin,
        max_initial_timestamp,
    )


def _ts_base_mask(config: WhisperConfig) -> np.ndarray:
    """Additive base suppression for timestamp mode: specials in
    [sot, ts_begin) stay banned, eot and timestamp tokens are allowed."""
    layout = token_layout(config.n_vocab)
    base = np.zeros(config.n_vocab, np.float32)
    base[layout.sot:layout.timestamp_begin] = -np.inf
    base[layout.eot] = 0.0
    return base


def _ts_apply(
    rules: _TsRules, logits, last_ts, last_was_ts, penult_was_ts, gen_count
):
    """openai-whisper timestamp rules applied to (..., V) logits; the state
    arrays share the leading dims. ``gen_count`` is the number of tokens
    generated so far (scalar):

    - after a lone timestamp: only a timestamp (its pair) or EOT
    - after a timestamp pair: text only (no third timestamp)
    - timestamps never decrease; after a CLOSED pair the next segment's
      opening timestamp must be strictly greater (whisper's
      ``timestamps[-1] + 1`` rule — prevents zero-advance loops)
    - the first generated token is a timestamp within the initial cap
    - when total timestamp probability beats the best text token, a
      timestamp is forced (the sum-probability rule)
    """
    neg_inf = jnp.float32(-jnp.inf)
    is_ts, is_text = rules.is_ts, rules.is_text
    # openai convention: with fewer than 2 generated tokens the
    # penultimate counts as a timestamp, so a lone initial <|t|> is
    # followed by text, not forced into a pair
    penult = jnp.logical_or(penult_was_ts, gen_count < 2)
    ban_ts = jnp.logical_and(last_was_ts, penult)
    force_ts = jnp.logical_and(last_was_ts, ~penult)
    mask = jnp.zeros_like(logits)
    mask = jnp.where(
        jnp.logical_and(ban_ts[..., None], is_ts), neg_inf, mask
    )
    mask = jnp.where(
        jnp.logical_and(force_ts[..., None], is_text), neg_inf, mask
    )
    # monotonic floor: an unpaired timestamp may repeat (its pair);
    # otherwise the next timestamp must exceed the last one seen.
    # last_ts inits to ts_begin - 1 ("none yet"), making the floor vacuous.
    floor = last_ts + jnp.where(force_ts, 0, 1)
    below = rules.vocab_ids < floor[..., None]
    mask = jnp.where(jnp.logical_and(is_ts, below), neg_inf, mask)
    init_allowed = jnp.logical_and(
        is_ts, rules.vocab_ids <= rules.ts_begin + rules.max_initial
    )
    first = jnp.asarray(gen_count == 0)
    mask = jnp.where(jnp.logical_and(first, ~init_allowed), neg_inf, mask)
    logits = logits + mask

    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_logprob = jax.nn.logsumexp(
        jnp.where(is_ts, logprobs, neg_inf), axis=-1
    )
    max_text = jnp.max(jnp.where(is_ts, neg_inf, logprobs), axis=-1)
    force_sum = ts_logprob > max_text
    return jnp.where(
        jnp.logical_and(force_sum[..., None], ~is_ts), neg_inf, logits
    )


def _ts_state_update(
    next_tok, active, ts_begin: int, last_ts, last_was_ts, penult_was_ts
):
    """Advance the per-row grammar state after appending ``next_tok``;
    inactive (finished) rows keep their state frozen."""
    next_is_ts = jnp.logical_and(active, next_tok >= ts_begin)
    last_ts = jnp.where(next_is_ts, next_tok, last_ts)
    penult_was_ts = jnp.where(
        active, jnp.logical_and(last_was_ts, next_is_ts), penult_was_ts
    )
    last_was_ts = jnp.where(active, next_is_ts, last_was_ts)
    return last_ts, last_was_ts, penult_was_ts


def _ts_state_init(shape, ts_begin: int):
    return (
        jnp.full(shape, ts_begin - 1, jnp.int32),  # last_ts: none yet
        jnp.zeros(shape, bool),                    # last_was_ts
        jnp.zeros(shape, bool),                    # penult_was_ts
    )


@partial(
    jax.jit,
    static_argnames=("n_head", "max_new_tokens", "config",
                     "max_initial_timestamp"),
    donate_argnames=("cache",),
)
def greedy_decode_timestamps(
    params: Dict[str, Any],
    enc_out: jnp.ndarray,
    prompt: jnp.ndarray,
    prompt_len: jnp.ndarray,
    cache: Optional[KVCache],
    config: WhisperConfig,
    n_head: int,
    max_new_tokens: int,
    max_initial_timestamp: int = 50,  # 1.0 s at 0.02 s/token
    sot_pos: Optional[jnp.ndarray] = None,
) -> DecodeResult:
    """Greedy decode WITH timestamp tokens (openai-whisper timestamp rules,
    ``whisper/decoding.py ApplyTimestampRules``): the prompt omits
    ``no_timestamps``; generation interleaves ``<|t|>`` tokens with text.
    The grammar lives in :func:`_ts_apply`; host-side segmentation in
    :func:`split_timestamp_segments`. ``cache=None`` allocates in-trace
    (see :func:`greedy_decode`).
    """
    layout = token_layout(config.n_vocab)
    b, p_len = prompt.shape
    if cache is None:
        cache = init_kv_cache(
            config, b, p_len + max_new_tokens, dtype=enc_out.dtype
        )
    t_max = cache.k.shape[3]
    ts_begin = layout.timestamp_begin
    cross_kv = precompute_cross_kv(params, enc_out, n_head)
    rules = _ts_rules(config, max_initial_timestamp)
    base_mask = jnp.asarray(_ts_base_mask(config))
    begin_blank = jnp.zeros(
        (config.n_vocab,), jnp.float32
    ).at[BLANK_TOKEN].set(-jnp.inf)
    sot_pos = _sot_pos_arr(sot_pos)

    tokens = jnp.full((b, t_max), layout.eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))

    cache, no_speech_prob = _prefill(
        params, tokens, p_len, cache, cross_kv, n_head, sot_pos, layout
    )

    def cond(state):
        (_, _, pos, finished, _, _) = state
        return jnp.logical_and(
            pos < min(p_len + max_new_tokens, t_max), ~jnp.all(finished)
        )

    def body(state):
        (tokens, cache, pos, finished, sum_lp, ts_state) = state
        last_tok = jax.lax.dynamic_slice(tokens, (0, pos - 1), (b, 1))[:, 0]
        logits, cache = _decoder_step(
            params, last_tok, pos - 1, cache, cross_kv, n_head, pos - 1
        )
        logits = logits + base_mask + jnp.where(
            (pos == prompt_len)[:, None], begin_blank[None, :], 0.0
        )
        logits = _ts_apply(rules, logits, *ts_state, gen_count=pos - p_len)

        logprobs = jax.nn.log_softmax(logits, axis=-1)
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(finished, layout.eot, next_tok)
        tok_lp = jnp.take_along_axis(logprobs, next_tok[:, None], axis=1)[:, 0]
        sum_lp = sum_lp + jnp.where(finished, 0.0, tok_lp)
        tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None], (0, pos))

        ts_state = _ts_state_update(next_tok, ~finished, ts_begin, *ts_state)
        finished = jnp.logical_or(finished, next_tok == layout.eot)
        return (tokens, cache, pos + 1, finished, sum_lp, ts_state)

    init = (
        tokens, cache,
        jnp.asarray(p_len, jnp.int32),
        jnp.zeros((b,), bool),
        jnp.zeros((b,), jnp.float32),
        _ts_state_init((b,), ts_begin),
    )
    (tokens, cache, pos, finished, sum_lp, _) = jax.lax.while_loop(
        cond, body, init
    )
    is_eot = jnp.logical_and(
        tokens == layout.eot, jnp.arange(t_max)[None, :] >= p_len
    )
    first_eot = jnp.where(
        is_eot.any(axis=1), jnp.argmax(is_eot, axis=1), pos
    ).astype(jnp.int32)
    return DecodeResult(tokens, first_eot, sum_lp, no_speech_prob)


def split_timestamp_segments(
    token_ids, config: WhisperConfig, duration: float
):
    """Host-side: split a timestamp-mode token sequence into
    ``[(start_sec, end_sec, [text_token_ids...]), ...]``.

    Whisper emits ``<|t0|> text… <|t1|><|t1|> text… <|t2|>``; a trailing
    open segment (no closing timestamp before EOT) ends at ``duration``.
    """
    layout = token_layout(config.n_vocab)
    ts_begin = layout.timestamp_begin
    segments = []
    seg_start: Optional[float] = None
    seg_tokens: list = []
    prev_was_ts = False
    for tok in token_ids:
        tok = int(tok)
        if tok == layout.eot:
            break
        if tok >= ts_begin:
            t_sec = (tok - ts_begin) * 0.02
            if seg_start is None:
                seg_start = t_sec
            elif not prev_was_ts:
                # closing timestamp
                if seg_tokens:
                    segments.append((seg_start, t_sec, seg_tokens))
                seg_start = None
                seg_tokens = []
            else:
                # second of a pair: opens the next segment
                seg_start = t_sec
            prev_was_ts = True
        else:
            if seg_start is None:
                seg_start = 0.0
            seg_tokens.append(tok)
            prev_was_ts = False
    if seg_tokens:
        segments.append((seg_start or 0.0, duration, seg_tokens))
    return segments


# ---------------------------------------------------------------------------
# Beam search (the `accurate` decode profile)
# ---------------------------------------------------------------------------


def _beam_decode_pooled(
    params, cross_kv, tokens, cache, sum_lp, no_speech_prob,
    layout, suppress, begin, seen0, rep_penalty, b: int, k: int,
    p_len: int, t_max: int, v: int, n_head: int, max_new_tokens: int,
    max_candidates: int, length_penalty: float = 1.0, ngram_n: int = 0,
    ts_rules: Optional[_TsRules] = None,
) -> DecodeResult:
    """Patience > 1 beam search: finished hypotheses are banked into a
    fixed-size per-row candidate pool (best ``max_candidates`` by sum
    logprob) and their beam slot is freed to the next-best live
    candidate, so the search keeps exploring until the pool fills
    (openai-whisper ``BeamSearchDecoder`` patience semantics,
    arXiv:2204.05424). Static shapes throughout: the pool is
    (B, C, T) with -inf scores for empty entries."""
    neg_inf = jnp.float32(-1e9)
    bk = b * k
    c = max_candidates
    k2 = 2 * k
    pool_tokens = jnp.full((b, c, t_max), layout.eot, jnp.int32)
    pool_lp = jnp.full((b, c), neg_inf, jnp.float32)
    pool_len = jnp.full((b, c), p_len, jnp.int32)
    limit = min(p_len + max_new_tokens, t_max)

    def pool_full(pool_lp):
        n_fin = jnp.sum((pool_lp > neg_inf / 2).astype(jnp.int32), axis=1)
        return n_fin >= c

    def cond(state):
        _, _, _, pos, pool_lp, _, _, _, _ = state
        return jnp.logical_and(pos < limit, ~jnp.all(pool_full(pool_lp)))

    def body(state):
        (tokens, cache, sum_lp, pos, pool_lp, pool_tokens, pool_len,
         seen, ts_state) = state
        last_tok = jax.lax.dynamic_slice(
            tokens, (0, 0, pos - 1), (b, k, 1)
        ).reshape(bk)
        logits, cache = _decoder_step(
            params, last_tok, pos - 1, cache, cross_kv, n_head, pos - 1
        )
        logits = logits.reshape(b, k, v)
        if rep_penalty is not None:
            logits = _apply_repetition_penalty(logits, seen, rep_penalty)
        if ngram_n:
            banned = _ngram_banned_tokens(
                tokens.reshape(bk, t_max), pos, ngram_n, v
            ).reshape(b, k, v)
            logits = jnp.where(banned, -jnp.inf, logits)
        logits = (logits + suppress) + jnp.where(
            pos == p_len, begin[None, None, :], 0.0
        )
        if ts_rules is not None:
            logits = _ts_apply(
                ts_rules, logits, *ts_state, gen_count=pos - p_len
            )
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        cand = sum_lp[:, :, None] + logprobs            # (B, K, V)
        top_vals, top_idx = jax.lax.top_k(cand.reshape(b, k * v), k2)
        parent = top_idx // v                            # (B, 2K)
        new_tok = (top_idx % v).astype(jnp.int32)
        is_eot = new_tok == layout.eot

        # bank finished candidates: merge into the pool, keep best C
        cand_tokens = jnp.take_along_axis(
            tokens, parent[:, :, None], axis=1
        )                                                # (B, 2K, T)
        cand_tokens = jax.lax.dynamic_update_slice(
            cand_tokens,
            jnp.full((b, k2, 1), layout.eot, jnp.int32),
            (0, 0, pos),
        )
        fin_scores = jnp.where(is_eot, top_vals, neg_inf)
        merged_lp = jnp.concatenate([pool_lp, fin_scores], axis=1)
        merged_tokens = jnp.concatenate([pool_tokens, cand_tokens], axis=1)
        merged_len = jnp.concatenate(
            [pool_len, jnp.zeros((b, k2), jnp.int32) + pos], axis=1
        )
        pool_lp, keep_idx = jax.lax.top_k(merged_lp, c)
        pool_tokens = jnp.take_along_axis(
            merged_tokens, keep_idx[:, :, None], axis=1
        )
        pool_len = jnp.take_along_axis(merged_len, keep_idx, axis=1)

        # keep the best K unfinished candidates live
        live_scores = jnp.where(is_eot, neg_inf, top_vals)
        sum_lp, live_sel = jax.lax.top_k(live_scores, k)  # (B, K)
        live_parent = jnp.take_along_axis(parent, live_sel, axis=1)
        live_tok = jnp.take_along_axis(new_tok, live_sel, axis=1)
        tokens = jnp.take_along_axis(
            tokens, live_parent[:, :, None], axis=1
        )
        tokens = jax.lax.dynamic_update_slice(
            tokens, live_tok[:, :, None], (0, 0, pos)
        )
        if rep_penalty is not None:
            seen = jnp.take_along_axis(
                seen, live_parent[:, :, None], axis=1
            )
            seen = seen.at[
                jnp.arange(b)[:, None], jnp.arange(k)[None, :], live_tok
            ].max(live_tok < layout.eot)
        ts_state = jax.tree.map(
            lambda s: jnp.take_along_axis(s, live_parent, axis=1), ts_state
        )
        ts_state = _ts_state_update(
            live_tok, jnp.ones((b, k), bool), layout.timestamp_begin,
            *ts_state,
        )

        def reorder_cache(x):  # (L, B*K, H, T, Dh)
            l, _, h, t, dh = x.shape
            x = x.reshape(l, b, k, h, t, dh)
            x = jnp.take_along_axis(
                x, live_parent[None, :, :, None, None, None], axis=2
            )
            return x.reshape(l, bk, h, t, dh)

        cache = KVCache(reorder_cache(cache.k), reorder_cache(cache.v))
        return (tokens, cache, sum_lp, pos + 1, pool_lp, pool_tokens,
                pool_len, seen, ts_state)

    init = (
        tokens, cache, sum_lp, jnp.asarray(p_len, jnp.int32),
        pool_lp, pool_tokens, pool_len, seen0,
        _ts_state_init((b, k), layout.timestamp_begin),
    )
    (tokens, cache, sum_lp, pos, pool_lp, pool_tokens, pool_len, _, _) = (
        jax.lax.while_loop(cond, body, init)
    )

    # finalize by avg logprob; finished candidates take priority, live
    # beams only fill in when a row ran out of steps with an empty pool
    # CT2 length normalization: score / length**length_penalty (the
    # reference's faster_whisper backend semantics; penalty 1.0 = avg)
    pool_gen = jnp.maximum(1, pool_len - p_len).astype(jnp.float32)
    pool_avg = jnp.where(
        pool_lp > neg_inf / 2, pool_lp / pool_gen ** length_penalty, neg_inf
    )
    live_gen = jnp.maximum(1, pos - p_len).astype(jnp.float32)
    any_finished = (pool_lp > neg_inf / 2).any(axis=1, keepdims=True)
    live_avg = jnp.where(
        any_finished, neg_inf, sum_lp / live_gen ** length_penalty
    )
    all_avg = jnp.concatenate([pool_avg, live_avg], axis=1)   # (B, C+K)
    all_lp = jnp.concatenate([pool_lp, sum_lp], axis=1)
    all_len = jnp.concatenate(
        [pool_len, jnp.zeros((b, k), jnp.int32) + pos], axis=1
    )
    all_tokens = jnp.concatenate([pool_tokens, tokens], axis=1)
    best = jnp.argmax(all_avg, axis=1)
    best_tokens = jnp.take_along_axis(
        all_tokens, best[:, None, None], axis=1
    )[:, 0, :]
    best_len = jnp.take_along_axis(all_len, best[:, None], axis=1)[:, 0]
    best_lp = jnp.take_along_axis(all_lp, best[:, None], axis=1)[:, 0]
    return DecodeResult(best_tokens, best_len, best_lp, no_speech_prob)


@partial(
    jax.jit,
    static_argnames=("n_head", "max_new_tokens", "config", "beam_size",
                     "patience", "length_penalty", "suppress_blank",
                     "ngram_n", "with_timestamps", "max_initial_timestamp"),
    donate_argnames=("cache",),
)
def beam_decode(
    params: Dict[str, Any],
    enc_out: jnp.ndarray,
    prompt: jnp.ndarray,
    prompt_len: jnp.ndarray,
    cache: Optional[KVCache],
    config: WhisperConfig,
    n_head: int,
    max_new_tokens: int,
    beam_size: int = 5,
    patience: float = 1.0,
    length_penalty: float = 1.0,
    suppress_blank: bool = True,
    rep_penalty: Optional[jnp.ndarray] = None,
    ngram_n: int = 0,
    with_timestamps: bool = False,
    max_initial_timestamp: int = 50,
    sot_pos: Optional[jnp.ndarray] = None,
) -> DecodeResult:
    """Fixed-width batched beam search in a ``lax.while_loop``.

    Parity target: the reference's faster_whisper `accurate` profile uses
    CTranslate2 beam search (``stt_server/model/backends/faster_whisper.py``,
    ``config/model.yaml`` accurate profile beam_size=5) — with timestamps ON
    by default; mlx_whisper drops beam options — this build must not. Final
    hypothesis selection follows openai-whisper's default: highest
    sum-logprob / length among finished beams (falling back to all beams
    when none finished).

    ``with_timestamps`` applies the openai timestamp grammar
    (:func:`_ts_apply`) per beam, so `accurate` + timestamps keeps its
    beam width instead of silently downgrading to greedy. The prompt must
    then omit ``no_timestamps``.

    enc_out: (B, T_a, d); prompt: (B, P); an explicit cache must be sized
    for ``B * beam_size`` rows; ``cache=None`` allocates in-trace (see
    :func:`greedy_decode`). Returns the best beam per batch row in the
    same DecodeResult layout as :func:`greedy_decode`.
    """
    layout = token_layout(config.n_vocab)
    b, p_len = prompt.shape
    k = beam_size
    bk = b * k
    if cache is None:
        cache = init_kv_cache(
            config, bk, p_len + max_new_tokens, dtype=enc_out.dtype
        )
    t_max = cache.k.shape[3]
    v = config.n_vocab

    # replicate encoder states / prompts across beams: row order (B, K)
    enc_bk = jnp.repeat(enc_out, k, axis=0)            # (B*K, T_a, d)
    cross_kv = precompute_cross_kv(params, enc_bk, n_head)
    if with_timestamps:
        ts_rules = _ts_rules(config, max_initial_timestamp)
        suppress = jnp.asarray(_ts_base_mask(config))
        begin = (
            jnp.zeros((v,), jnp.float32).at[BLANK_TOKEN].set(-jnp.inf)
            if suppress_blank else jnp.zeros((v,), jnp.float32)
        )
    else:
        ts_rules = None
        suppress = jnp.asarray(_suppress_mask(config, True))
        begin = jnp.asarray(
            _sample_begin_mask(config) if suppress_blank
            else np.zeros(config.n_vocab, np.float32)
        )
    sot_pos = _sot_pos_arr(sot_pos)

    tokens = jnp.full((b, k, t_max), layout.eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(
        tokens, jnp.repeat(prompt[:, None, :], k, axis=1), (0, 0, 0)
    )

    cache, nsp_rows = _prefill(
        params, tokens.reshape(bk, t_max), p_len, cache, cross_kv, n_head,
        sot_pos, layout,
    )
    no_speech_prob = nsp_rows.reshape(b, k)[:, 0]

    # beam 0 starts live; the rest at -inf so the first expansion
    # diversifies instead of duplicating
    neg_inf = jnp.float32(-1e9)
    sum_lp = jnp.where(
        jnp.arange(k)[None, :] == 0, 0.0, neg_inf
    ) * jnp.ones((b, k), jnp.float32)

    # openai-whisper patience (arXiv:2204.05424): keep collecting finished
    # candidates until round(beam_size * patience) per row, freeing the
    # slot of a finished beam instead of freezing it. patience == 1.0
    # (max_candidates == k) keeps the frozen-slot algorithm below, whose
    # stopping condition ("all k beams finished") is equivalent.
    track_rep = rep_penalty is not None
    seen0 = (
        jnp.repeat(
            _seen_text_mask(
                tokens.reshape(b * k, t_max)[::k], prompt_len, layout, v
            )[:, None, :],
            k, axis=1,
        )  # (B, K, V): all beams share the prompt's seen-set
        if track_rep else jnp.zeros((b, k, 1), bool)
    )

    max_candidates = max(k, int(round(k * float(patience))))
    if max_candidates > k:
        return _beam_decode_pooled(
            params, cross_kv, tokens, cache, sum_lp, no_speech_prob,
            layout, suppress, begin, seen0, rep_penalty, b, k, p_len,
            t_max, v, n_head, max_new_tokens, max_candidates,
            length_penalty, ngram_n, ts_rules,
        )
    finished = jnp.zeros((b, k), bool)

    # eot-only continuation row for finished beams (score frozen)
    eot_only = jnp.full((v,), neg_inf, jnp.float32).at[layout.eot].set(0.0)

    def cond(state):
        _, _, _, pos, finished, _, _ = state
        return jnp.logical_and(
            pos < min(p_len + max_new_tokens, t_max), ~jnp.all(finished)
        )

    def body(state):
        tokens, cache, sum_lp, pos, finished, seen, ts_state = state
        last_tok = jax.lax.dynamic_slice(
            tokens, (0, 0, pos - 1), (b, k, 1)
        ).reshape(bk)
        logits, cache = _decoder_step(
            params, last_tok, pos - 1, cache, cross_kv, n_head, pos - 1
        )
        logits = logits.reshape(b, k, v)
        if track_rep:
            logits = _apply_repetition_penalty(logits, seen, rep_penalty)
        if ngram_n:
            banned = _ngram_banned_tokens(
                tokens.reshape(bk, t_max), pos, ngram_n, v
            ).reshape(b, k, v)
            logits = jnp.where(banned, -jnp.inf, logits)
        logits = (logits + suppress) + jnp.where(
            (pos == prompt_len)[:, None, None], begin[None, None, :], 0.0
        )
        if ts_rules is not None:
            logits = _ts_apply(
                ts_rules, logits, *ts_state, gen_count=pos - p_len
            )
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        step_lp = jnp.where(finished[:, :, None], eot_only[None, None, :],
                            logprobs)
        cand = sum_lp[:, :, None] + step_lp            # (B, K, V)
        top_vals, top_idx = jax.lax.top_k(cand.reshape(b, k * v), k)
        parent = top_idx // v                           # (B, K)
        new_tok = (top_idx % v).astype(jnp.int32)

        # reorder beam state by parent
        tokens = jnp.take_along_axis(tokens, parent[:, :, None], axis=1)
        tokens = jax.lax.dynamic_update_slice(
            tokens, new_tok[:, :, None], (0, 0, pos)
        )
        finished = jnp.take_along_axis(finished, parent, axis=1)
        if track_rep:
            seen = jnp.take_along_axis(seen, parent[:, :, None], axis=1)
            seen = seen.at[
                jnp.arange(b)[:, None], jnp.arange(k)[None, :], new_tok
            ].max(new_tok < layout.eot)
        ts_state = jax.tree.map(
            lambda s: jnp.take_along_axis(s, parent, axis=1), ts_state
        )
        ts_state = _ts_state_update(
            new_tok, ~finished, layout.timestamp_begin, *ts_state
        )
        new_tok_is_eot = new_tok == layout.eot
        finished = jnp.logical_or(finished, new_tok_is_eot)

        def reorder_cache(x):  # (L, B*K, H, T, Dh)
            l, _, h, t, dh = x.shape
            x = x.reshape(l, b, k, h, t, dh)
            x = jnp.take_along_axis(
                x, parent[None, :, :, None, None, None], axis=2
            )
            return x.reshape(l, bk, h, t, dh)

        cache = KVCache(reorder_cache(cache.k), reorder_cache(cache.v))
        return tokens, cache, top_vals, pos + 1, finished, seen, ts_state

    init = (
        tokens, cache, sum_lp,
        jnp.asarray(p_len, jnp.int32),
        finished,
        seen0,
        _ts_state_init((b, k), layout.timestamp_begin),
    )
    tokens, cache, sum_lp, pos, finished, _, _ = jax.lax.while_loop(
        cond, body, init
    )

    # per-beam generated length = first eot at/after prompt
    is_eot = jnp.logical_and(
        tokens == layout.eot,
        jnp.arange(t_max)[None, None, :] >= p_len,
    )
    first_eot = jnp.where(
        is_eot.any(axis=2), jnp.argmax(is_eot, axis=2), pos
    ).astype(jnp.int32)                                  # (B, K)
    gen_len = jnp.maximum(1, first_eot - p_len).astype(jnp.float32)
    # CT2 length normalization (reference faster_whisper semantics):
    # score / length**length_penalty; penalty 1.0 = plain average
    avg_lp = sum_lp / gen_len ** length_penalty

    # prefer finished beams (openai-whisper finalization semantics)
    any_finished = finished.any(axis=1, keepdims=True)
    selectable = jnp.where(
        jnp.logical_and(any_finished, ~finished), neg_inf, avg_lp
    )
    best = jnp.argmax(selectable, axis=1)                # (B,)

    take = lambda arr: jnp.take_along_axis(
        arr, best[:, None] if arr.ndim == 2 else best[:, None, None], axis=1
    )
    best_tokens = take(tokens)[:, 0, :]
    best_len = take(first_eot)[:, 0]
    best_lp = take(sum_lp)[:, 0]
    return DecodeResult(best_tokens, best_len, best_lp, no_speech_prob)


@partial(jax.jit, static_argnames=("n_head", "config"))
def detect_language(
    params: Dict[str, Any],
    enc_out: jnp.ndarray,
    config: WhisperConfig,
    n_head: int,
) -> jnp.ndarray:
    """Return (B, n_langs) language probabilities from the sot logits."""
    layout = token_layout(config.n_vocab)
    b = enc_out.shape[0]
    cross_kv = precompute_cross_kv(params, enc_out, n_head)
    cache = init_kv_cache(config, b, 4, dtype=enc_out.dtype)
    sot = jnp.full((b,), layout.sot, jnp.int32)
    logits, _ = _decoder_step(params, sot, 0, cache, cross_kv, n_head, 0)
    lang_logits = jax.lax.dynamic_slice_in_dim(
        logits, layout.lang_begin, layout.n_langs, axis=1
    )
    return jax.nn.softmax(lang_logits, axis=-1)


def build_prompt(
    config: WhisperConfig,
    language: Optional[str],
    task: str = "transcribe",
    without_timestamps: bool = True,
) -> list:
    """SOT sequence: [sot, lang, task, (no_timestamps)]."""
    layout = token_layout(config.n_vocab)
    lang = language if language in WHISPER_LANG_CODES else "en"
    lang_token = layout.lang_begin + WHISPER_LANG_CODES.index(lang)
    task_token = layout.translate if task == "translate" else layout.transcribe
    prompt = [layout.sot, lang_token, task_token]
    if without_timestamps:
        prompt.append(layout.no_timestamps)
    return prompt


__all__ = [
    "DecodeResult",
    "KVCache",
    "PRESETS",
    "TokenLayout",
    "WHISPER_LANG_CODES",
    "WhisperConfig",
    "build_prompt",
    "cross_attention_weights",
    "detect_language",
    "encode",
    "get_config",
    "beam_decode",
    "greedy_decode",
    "greedy_decode_timestamps",
    "split_timestamp_segments",
    "init_kv_cache",
    "init_params",
    "load_hf_safetensors",
    "precompute_cross_kv",
    "quantize_decoder_weights",
    "token_layout",
]

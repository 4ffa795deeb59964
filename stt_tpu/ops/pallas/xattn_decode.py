"""Cross-attention decode-step kernel (Pallas TPU).

Every KV-cached decode step streams the ENTIRE cross-attention K/V from
HBM to score one new token: at a 64-stream 10 s batch that is ~590 MB of
fp8 per step across the 12 decoder layers — the decode loop's bandwidth
floor and, measured, ~70% of its wall time (ROADMAP round-3 profile).
The XLA einsum pair reaches only about half of HBM peak on this
pattern; this kernel performs the whole scores -> softmax -> mix for
one layer in ONE fused pass over the K/V:

    grid (B,): program b DMAs K[b], V[b] (H, Ta, Dh) into VMEM
    (double-buffered across grid steps by the Pallas pipeline) and
    computes every head's attention for the single query position on
    the MXU; the fp8 -> bf16 convert is inlined into the tile read, so
    the dequantized K/V never exists in HBM.

Numerics mirror ``stt_tpu.models.whisper._attn_cached`` (f32 logits,
max-subtracted softmax, bf16 weights into an f32-accumulated mix);
parity is covered in interpret mode on CPU and against the einsum path
on real TPU in tests/test_xattn_decode.py.

Reference role: the fused decoder attention inside CTranslate2 serves
the same purpose for the reference's fast path
(/root/reference/stt_server/model/backends/faster_whisper.py:22-35,
marked [NATIVE-EQUIV] in SURVEY.md §2.1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xattn_kernel(q_ref, k_ref, v_ref, o_ref):
    """One batch row: q (1, H, Dh) bf16 pre-scaled; k/v (1, H, Ta, Dh)
    storage dtype (fp8_e4m3 or bf16); out (1, H, Dh) f32."""
    n_head = q_ref.shape[1]
    for h in range(n_head):  # unrolled; H is small (8..20)
        kh = k_ref[0, h, :, :].astype(jnp.bfloat16)   # (Ta, Dh)
        vh = v_ref[0, h, :, :].astype(jnp.bfloat16)
        qh = q_ref[:, h, :].astype(jnp.bfloat16)      # (1, Dh)
        # scores: contract Dh -> (1, Ta), f32 on the MXU
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        # mix: contract Ta -> (1, Dh), f32 accumulate
        o_ref[:, h, :] = jax.lax.dot_general(
            w, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _xattn_kernel_vpu(q_ref, k_ref, v_ref, o_ref):
    """VPU formulation: the op is pure HBM streaming (arithmetic
    intensity ~2 FLOP/byte), so the MXU buys nothing — the first
    kernel's per-head M=1 dots wasted 127/128 MXU rows and lost 5x to
    per-op overhead. Here each head is an elementwise multiply +
    reduction pair on the VPU while the Pallas pipeline double-buffers
    the next row-group's contiguous K/V DMA under the compute.

    Block: q (G, H, Dh), k/v (G, H, Ta, Dh) storage dtype, o (G, H, Dh)
    f32. All products are exact f32 (bf16 inputs upcast), sums f32 —
    same accumulation semantics as the einsum's MXU f32 accumulate up
    to reduction order."""
    n_head = q_ref.shape[1]
    for h in range(n_head):  # unrolled; H is small (8..20)
        kh = k_ref[:, h, :, :].astype(jnp.float32)     # (G, Ta, Dh)
        qh = q_ref[:, h, :].astype(jnp.float32)        # (G, Dh)
        s = jnp.sum(kh * qh[:, None, :], axis=-1)      # (G, Ta)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        w = p / jnp.sum(p, axis=-1, keepdims=True)
        vh = v_ref[:, h, :, :].astype(jnp.float32)     # (G, Ta, Dh)
        o_ref[:, h, :] = jnp.sum(w[:, :, None] * vh, axis=1)


def _xattn_kernel_mm(q_ref, k_ref, v_ref, o_ref):
    """Matmul-diagonal formulation: both contractions run as ONE large
    MXU matmul per block by merging (rows, heads) into the output lane
    dimension and extracting the valid (row, head) diagonal with a
    mask.

    The batched-matvec's problem on the MXU is M=1 per (b, h) pair —
    the "mxu" variant pays ~per-op overhead x B x H. Here instead:

        scores  S = K2 (G*H*Ta, Dh) @ Q2^T          -> (G*H*Ta, G*H)
        mix     Y = W^T (G*H*Ta, G*H) ^T-contracted with
                    V2 (G*H*Ta, Dh)                 -> (G*H, Dh)

    Each (row-block r, query j) column pair is computed, but only the
    j == r diagonal is kept (identity mask after the per-(r, j)
    softmax) — (G*H)x redundant MXU flops, which is noise next to the
    HBM stream the block DMA already pays (arithmetic intensity stays
    ~2 * G*H flops/byte ~ 100, far under the MXU roofline). The
    fp8 -> bf16 convert is inlined after the tile read.

    Block: q (G, H, Dh), k/v (G, H, Ta, Dh) storage dtype, o (G, H, Dh)
    f32. f32 scores, max-subtracted softmax, bf16 weights into an
    f32-accumulated mix — the einsum path's numerics."""
    g, h, dh = q_ref.shape
    ta = k_ref.shape[2]
    gh = g * h
    k2 = k_ref[...].astype(jnp.bfloat16).reshape(gh * ta, dh)
    q2 = q_ref[...].astype(jnp.bfloat16).reshape(gh, dh)
    s = jax.lax.dot_general(                       # (gh*ta, gh) f32
        k2, q2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(gh, ta, gh)
    # softmax over ta at every (r, j) lane; only j == r survives below
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    w = p / jnp.sum(p, axis=1, keepdims=True)
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (gh, 1, gh), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (gh, 1, gh), 2)
    )
    wt = (w * eye.astype(w.dtype)).astype(jnp.bfloat16).reshape(
        gh * ta, gh
    )
    v2 = v_ref[...].astype(jnp.bfloat16).reshape(gh * ta, dh)
    y = jax.lax.dot_general(                       # (gh, dh) f32
        wt, v2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = y.reshape(g, h, dh)


def _xattn_kernel_mmd(q_ref, k_ref, v_ref, o_ref):
    """"mm" with the diagonal extracted BEFORE the softmax: the mm
    variant exponentiates the full lane-padded (GH, Ta, 128) score
    block although only the j == r diagonal survives the mask — ~128x
    redundant transcendental VPU work per step. Here the diagonal is
    reduced out first (one multiply+lane-reduce pass), the softmax runs
    on the tiny (GH, Ta) plane, and the weights are scattered back onto
    the diagonal for the MXU mix matmul. Numerically identical to
    "mm" (the masked softmax's max/sum see exactly the diagonal
    scores)."""
    g, h, dh = q_ref.shape
    ta = k_ref.shape[2]
    gh = g * h
    k2 = k_ref[...].astype(jnp.bfloat16).reshape(gh * ta, dh)
    q2 = q_ref[...].astype(jnp.bfloat16).reshape(gh, dh)
    s = jax.lax.dot_general(                       # (gh*ta, gh) f32
        k2, q2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(gh, ta, gh)
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (gh, 1, gh), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (gh, 1, gh), 2)
    )
    sd = jnp.sum(s * eye.astype(s.dtype), axis=2)  # (gh, ta) diag scores
    m = jnp.max(sd, axis=1, keepdims=True)
    p = jnp.exp(sd - m)
    w = p / jnp.sum(p, axis=1, keepdims=True)      # (gh, ta)
    wt = (w[:, :, None] * eye.astype(w.dtype)).astype(jnp.bfloat16)
    v2 = v_ref[...].astype(jnp.bfloat16).reshape(gh * ta, dh)
    y = jax.lax.dot_general(                       # (gh, dh) f32
        wt.reshape(gh * ta, gh), v2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = y.reshape(g, h, dh)


def _row_group(b: int, h: int, ta: int, dh: int, itemsize: int) -> int:
    """Rows per grid step: largest divisor of B whose double-buffered
    K+V block stays under ~8 MB of VMEM (v5e VMEM is 128 MB; stay far
    below so the serve program's other buffers fit alongside)."""
    budget = 8 * 1024 * 1024
    per_row = 2 * h * ta * dh * itemsize
    g = max(1, min(b, budget // (2 * per_row)))
    while b % g:
        g -= 1
    return g


@partial(jax.jit, static_argnames=("interpret", "variant",
                                   "rows_per_block"))
def xattn_decode(q, k, v, *, interpret: bool = False,
                 variant: str = "vpu", rows_per_block: int = 0):
    """Single-position cross-attention over precomputed K/V.

    q: (B, H, Dh) — query for ONE decode position, pre-scaled by
       d_head**-0.25 (K arrives pre-scaled from precompute_cross_kv).
    k, v: (B, H, Ta, Dh) in their storage dtype.
    variant: "mm" (merged-head matmul + diagonal mask), "mmd" (mm with
       the diagonal reduced out before the softmax), "vpu"
       (elementwise multiply+reduce, row-grouped grid) or "mxu"
       (first attempt: per-head M=1 dots, kept for A/B history).
    rows_per_block: override the per-grid-step row group G (must divide
       B; 0 = auto). For "mm" G trades MXU redundancy (the masked
       (G*H, G*H) column block) against DMA pipeline depth — the A/B
       harness sweeps it; auto-G is a VMEM-bound guess, not a tuned
       optimum.
    Returns (B, H, Dh) float32.
    """
    b, h, dh = q.shape
    ta = k.shape[2]
    if variant == "mxu":
        g, kernel = 1, _xattn_kernel
    elif variant in ("mm", "mmd"):
        g = _row_group(b, h, ta, dh, jnp.dtype(k.dtype).itemsize)
        # the (G*H*Ta, G*H) f32 score/weight buffers (lane-padded to
        # 128) dominate VMEM for this variant — cap them at ~12 MB
        while g > 1 and g * h * ta * 128 * 4 > 12 * 1024 * 1024:
            g -= 1
            while b % g:
                g -= 1
        kernel = _xattn_kernel_mm if variant == "mm" else _xattn_kernel_mmd
    else:
        g = _row_group(b, h, ta, dh, jnp.dtype(k.dtype).itemsize)
        kernel = _xattn_kernel_vpu
    if rows_per_block:
        if b % rows_per_block:
            raise ValueError(
                f"rows_per_block={rows_per_block} must divide B={b}"
            )
        g = rows_per_block
    params = None
    if variant in ("mm", "mmd"):
        # the merged f32 score/weight buffers exceed Mosaic's default
        # 16 MB scoped-vmem stack — raise the cap for this kernel
        params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        compiler_params=params,
        in_specs=[
            pl.BlockSpec((g, h, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, h, ta, dh), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((g, h, ta, dh), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, h, dh), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, dh), jnp.float32),
        interpret=interpret,
    )(q, k, v)

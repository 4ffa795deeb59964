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


@partial(jax.jit, static_argnames=("interpret",))
def xattn_decode(q, k, v, *, interpret: bool = False):
    """Single-position cross-attention over precomputed K/V.

    q: (B, H, Dh) — query for ONE decode position, pre-scaled by
       d_head**-0.25 (K arrives pre-scaled from precompute_cross_kv).
    k, v: (B, H, Ta, Dh) in their storage dtype.
    Returns (B, H, Dh) float32.
    """
    b, h, dh = q.shape
    ta = k.shape[2]
    return pl.pallas_call(
        _xattn_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, ta, dh), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, ta, dh), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, dh), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, dh), jnp.float32),
        interpret=interpret,
    )(q, k, v)

"""A/B the cross-attention decode-step formulations on the real device.

Emulates the serve decode loop's cross-attention traffic exactly: the
10 s bucket's (B=64, H=12, Ta=500, Dh=64) fp8 K/V for all 12 layers,
statically indexed per layer (as the unrolled decode loop does), inside
a fori_loop over decode steps with a loop-carried query (defeats
loop-invariant hoisting). Per-step wall = total / steps; the HBM floor
for the shape is 2*L*B*H*Ta*Dh bytes / 819 GB/s (v5e).

Variants: einsum (the serving default, models/whisper._attn_cached),
vpu / mxu / mm / mmd (ops/pallas/xattn_decode variants). "mm@G" /
"mmd@G" pins rows_per_block=G for the block-size sweep (G must divide
--b); bare names use the auto block size.

Timing is fetch-based (np.asarray of a scalar), not block_until_ready —
the axon tunnel makes block_until_ready unreliable (ROADMAP round-3
notes); the constant fetch cost is amortized over `--steps`.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--b", type=int, default=64)
    parser.add_argument("--heads", type=int, default=12)
    parser.add_argument("--ta", type=int, default=500)
    parser.add_argument("--dh", type=int, default=64)
    parser.add_argument("--layers", type=int, default=12)
    parser.add_argument("--steps", type=int, default=40)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--kv-dtype", default="fp8",
                        choices=["fp8", "bf16", "int8", "int4"],
                        help="int8/int4 store quantized K/V with per-"
                             "(layer,row,head) f32 scales dequantized in "
                             "the matmul read (einsum variant only) — "
                             "measures whether halving/quartering the "
                             "dominant cross-KV HBM stream beats the "
                             "dequant cost, as fp8 did vs bf16")
    parser.add_argument("--variants", default="einsum,vpu")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from stt_tpu.models.whisper import _attn_cached
    from stt_tpu.ops.pallas.xattn_decode import xattn_decode

    b, h, ta, dh, nl = args.b, args.heads, args.ta, args.dh, args.layers
    quant_bits = {"int8": 8, "int4": 4}.get(args.kv_dtype, 0)
    if quant_bits:
        store = jnp.int8 if quant_bits == 8 else jnp.int4
    else:
        store = (jnp.float8_e4m3fn if args.kv_dtype == "fp8"
                 else jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    t0 = time.monotonic()
    q0 = jax.random.normal(kq, (b, h, dh), jnp.float32).astype(jnp.bfloat16)

    # per-layer normals: a single (nl, b, h, ta, dh) f32 normal peaks at
    # ~12 GB HBM before the fp8 cast — layerwise stays ~1 GB per step
    def kv_stack(key):
        layers, scales = [], []
        qmax = float(2 ** (quant_bits - 1) - 1) if quant_bits else 0.0
        for li in range(nl):
            key, sub = jax.random.split(key)
            x = jax.random.normal(sub, (b, h, ta, dh), jnp.float32)
            if quant_bits:
                # symmetric per-(row,head) scale, as a serving engine
                # would compute at cross-KV write time
                s = jnp.max(jnp.abs(x), axis=(2, 3), keepdims=True) / qmax
                layers.append(
                    jnp.round(x / s).clip(-qmax, qmax).astype(store)
                )
                scales.append(s.astype(jnp.float32))
            else:
                layers.append(x.astype(store))
        return jnp.stack(layers), (
            jnp.stack(scales) if quant_bits else None
        )

    k, k_scale = kv_stack(kk)
    v, v_scale = kv_stack(kv)
    log(f"inputs dispatched {time.monotonic() - t0:.1f}s")
    # tiny fetch: materializes the inputs AND opens the device->host
    # transfer channel (first readback pays ~90s setup on the tunnel)
    # outside the measured walls
    t0 = time.monotonic()
    float(np.asarray(jnp.sum(q0).astype(jnp.float32)))
    float(np.asarray(jnp.max(k[0, 0, 0, 0].astype(jnp.float32))))
    float(np.asarray(jnp.max(v[-1, -1, -1, -1].astype(jnp.float32))))
    log(f"inputs materialized + channel open {time.monotonic() - t0:.1f}s")

    bytes_per_elem = (quant_bits / 8.0 if quant_bits
                      else jnp.dtype(store).itemsize)
    kv_bytes = 2 * nl * b * h * ta * dh * bytes_per_elem
    if quant_bits:
        kv_bytes += 2 * nl * b * h * 4  # per-(row,head) f32 scales
    floor_ms = kv_bytes / 819e9 * 1e3
    log(f"K/V per step: {kv_bytes / 1e6:.0f} MB "
        f"-> HBM floor {floor_ms:.2f} ms/step (v5e 819 GB/s)")

    def build(op):
        # k/v must be jit ARGUMENTS, not closures: closed-over device
        # arrays lower as embedded HLO constants — ~6 GB of constant
        # data serialized into the program (minutes of "compile")
        def layer_pass(q, kk_, vv_, ks_, vs_):
            for li in range(nl):
                if ks_ is None:
                    out = op(q, kk_[li], vv_[li])  # static index/layer
                else:
                    out = op(q, kk_[li], vv_[li], ks_[li], vs_[li])
                q = q + 0.001 * out.astype(q.dtype)
            return q

        @jax.jit
        def run(q, kk_, vv_, ks_, vs_):
            return jax.lax.fori_loop(
                0, args.steps,
                lambda s, qq: layer_pass(qq, kk_, vv_, ks_, vs_), q
            )[0, 0, 0]

        return run

    def op_for(name):
        # "mm@4" = variant mm with rows_per_block=4 (G sweep); bare
        # names use the variant's auto G
        if name == "einsum":
            if quant_bits:
                def deq_einsum(q, kk_, vv_, ks_, vs_):
                    # convert+scale fuses into the matmul read stream
                    # (same mechanism that made fp8 storage free)
                    kb = kk_.astype(jnp.bfloat16) * ks_.astype(jnp.bfloat16)
                    vb = vv_.astype(jnp.bfloat16) * vs_.astype(jnp.bfloat16)
                    return _attn_cached(q[:, :, None, :], kb, vb)[:, :, 0, :]
                return deq_einsum
            return lambda q, kk_, vv_: _attn_cached(
                q[:, :, None, :], kk_, vv_
            )[:, :, 0, :]
        if quant_bits:
            raise SystemExit(
                f"--kv-dtype {args.kv_dtype} is einsum-only (the Pallas "
                "variants are settled-NO and have no dequant path)"
            )
        variant, _, g = name.partition("@")
        rows = int(g) if g else 0
        return lambda q, kk_, vv_: xattn_decode(
            q, kk_, vv_, variant=variant, rows_per_block=rows
        )

    results = {}
    for name in [x.strip() for x in args.variants.split(",") if x.strip()]:
        run = build(op_for(name))
        t0 = time.monotonic()
        compiled = run.lower(q0, k, v, k_scale, v_scale).compile()
        log(f"{name}: compile {time.monotonic() - t0:.1f}s")
        run = compiled
        t0 = time.monotonic()
        float(np.asarray(run(q0, k, v, k_scale, v_scale)))  # first execute
        log(f"{name}: first execute {time.monotonic() - t0:.1f}s")
        walls = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            float(np.asarray(run(q0, k, v, k_scale, v_scale)))
            walls.append(time.monotonic() - t0)
        per_step_ms = sorted(walls)[len(walls) // 2] / args.steps * 1e3
        results[name] = round(per_step_ms, 3)
        log(f"{name}: per-step {per_step_ms:.3f} ms "
            f"(walls {[f'{w:.3f}' for w in walls]}, "
            f"{floor_ms / per_step_ms * 100:.0f}% of HBM peak)")

    print(json.dumps({
        "shape": f"L{nl} B{b} H{h} Ta{ta} Dh{dh} {args.kv_dtype}",
        "steps": args.steps, "floor_ms_per_step": round(floor_ms, 3),
        "per_step_ms": results,
    }))


if __name__ == "__main__":
    main()

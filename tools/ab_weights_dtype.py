"""A/B decoder-weight storage dtype (bf16 vs int8) on the real device.

int8 decoder weights (STT_DECODER_WEIGHTS_DTYPE=int8, symmetric
per-out-channel scales — see tests/test_quant_weights.py) halve the
~280 MB/step decoder weight stream, the second-largest per-step HBM
term after the cross-KV. This measures the actual serving win at the
headline bench point (whisper-small, 64x10 s saturated waves) so the
default can be promoted or the experiment dropped (VERDICT r3 #6).

Each mode runs in its own SUBPROCESS because the policy is read at
module import and baked into traced programs; the parent combines the
two JSON lines. Accuracy promotion bar is separate:
tools/validate_real_weights.py gate `int8_decoder_weights_parity`.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(m):
    print(m, file=sys.stderr, flush=True)


def run_mode(args) -> None:
    import numpy as np
    from concurrent import futures

    import jax

    env_platforms = os.environ.get("JAX_PLATFORMS", "").strip()
    if env_platforms and env_platforms != jax.config.jax_platforms:
        jax.config.update("jax_platforms", env_platforms)
    cache_dir = os.getenv("STT_XLA_CACHE_DIR", "").strip() or os.path.join(
        os.path.expanduser("~"), ".cache", "stt_tpu_xla"
    )
    if cache_dir.lower() != "off":
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stt_tpu.engine.engine import DecodeRequest, WhisperEngine

    dev = jax.devices()[0]
    log(f"[{args.mode}] device: {dev}")
    engine = WhisperEngine(
        args.model, device=dev.platform, compute_type="bfloat16",
        max_batch=args.streams, batch_window_ms=5.0,
        batch_buckets=(1, 2, 4, 8, 16, 32, 64),
    )
    engine.start()
    try:
        rng = np.random.default_rng(0)
        n = int(args.secs * 16000)
        t = np.arange(n) / 16000.0
        audio = (
            0.1 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.normal(0, 1, n)
        ).astype(np.float32)
        bucket = engine._bucket_for(n)
        bsz = engine._batch_bucket(args.streams)
        t0 = time.monotonic()
        engine.prewarm(bucket_secs=[bucket], batch_sizes=[bsz],
                       mode="aot", parallelism=2)
        engine.prewarm(bucket_secs=[bucket], batch_sizes=[bsz])
        compile_s = time.monotonic() - t0
        log(f"[{args.mode}] prewarm {compile_s:.1f}s")

        def wave():
            return [engine.submit(DecodeRequest(audio=audio, language="en"))
                    for _ in range(args.streams)]

        done_at = []
        t0 = time.perf_counter()
        prev = wave()
        for _ in range(args.rounds):
            nxt = wave()
            futures.wait(prev)
            done_at.append(time.perf_counter() - t0)
            for f in prev:
                f.result()
            prev = nxt
        futures.wait(prev)
        done_at.append(time.perf_counter() - t0)
        walls = sorted(
            done_at[i] - done_at[i - 1] for i in range(1, len(done_at))
        )
        med = walls[len(walls) // 2]
        print(json.dumps({
            "mode": args.mode, "wall_median_s": round(med, 3),
            "wall_min_s": round(walls[0], 3),
            "wall_max_s": round(walls[-1], 3),
            "rtfx": round(args.streams * args.secs / med, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)
    finally:
        engine.close()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--streams", type=int, default=64)
    parser.add_argument("--model", default="small")
    parser.add_argument("--secs", type=float, default=10.0)
    parser.add_argument("--rounds", type=int, default=5)
    parser.add_argument("--modes", default="bf16,int8")
    parser.add_argument("--mode", default="",
                        help="(internal) run one mode in this process")
    args = parser.parse_args()

    if args.mode:
        run_mode(args)
        return

    # mode -> env-traced policy set (subprocess-isolated; policies are
    # read at module import and baked into traced programs)
    mode_env = {
        "bf16": {"STT_DECODER_WEIGHTS_DTYPE": "bf16"},
        "int8": {"STT_DECODER_WEIGHTS_DTYPE": "int8"},
        # VERDICT r4 #3a: native int8 MXU dot_general (int8 operands,
        # int32 accumulate), not the dequant-to-bf16 read "int8" measures
        "int8_native": {"STT_DECODER_WEIGHTS_DTYPE": "int8_native"},
        # VERDICT r4 #3b: fused q/k/v projection (op-count reduction)
        "fused": {"STT_DECODER_WEIGHTS_DTYPE": "bf16",
                  "STT_FUSED_QKV": "on"},
        "fused_int8_native": {"STT_DECODER_WEIGHTS_DTYPE": "int8_native",
                              "STT_FUSED_QKV": "on"},
    }
    results = {}
    for mode in [m.strip() for m in args.modes.split(",") if m.strip()]:
        env = dict(os.environ)
        env.update(mode_env.get(
            mode, {"STT_DECODER_WEIGHTS_DTYPE": mode}
        ))
        proc = subprocess.run(
            [sys.executable, __file__, "--mode", mode,
             "--streams", str(args.streams), "--model", args.model,
             "--secs", str(args.secs), "--rounds", str(args.rounds)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        sys.stderr.write(proc.stderr)
        if proc.returncode != 0:
            log(f"mode {mode} failed rc={proc.returncode}")
            results[mode] = {"error": proc.stderr.strip()[-300:]}
            continue
        results[mode] = json.loads(proc.stdout.strip().splitlines()[-1])

    out = {"model": args.model, "streams": args.streams,
           "secs": args.secs, "modes": results}
    base = results.get("bf16", {})
    if "wall_median_s" in base:
        for mode, r in results.items():
            if mode != "bf16" and "wall_median_s" in r:
                out[f"{mode}_speedup"] = round(
                    base["wall_median_s"] / r["wall_median_s"], 3,
                )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

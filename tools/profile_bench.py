"""Decompose the bench wall time: device compute vs transfer vs host prep.

Builds the bench engine (whisper-small, 10 s bucket, batch 64), prewarms the
bench shapes, then times each phase separately:
  1. end-to-end engine round (what bench.py measures)
  2. pure device compute: inputs pre-staged on device, exec-table dispatch,
     block_until_ready
  3. host->device transfer of the int16 rows alone
  4. host prep (np packing) alone
Diagnostics to stderr, one JSON summary line to stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

# NB: sys.path, not PYTHONPATH — exporting PYTHONPATH=<repo> breaks
# jax plugin discovery for the TPU backend in this image
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "stt_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from concurrent import futures

    from stt_tpu.engine.engine import DecodeRequest, WhisperEngine
    from stt_tpu.models import whisper as W

    streams, secs = 64, 10.0
    engine = WhisperEngine(
        "small", device=jax.devices()[0].platform, compute_type="bfloat16",
        max_batch=streams, batch_window_ms=5.0,
        batch_buckets=(1, 2, 4, 8, 16, 32, 64),
        use_pallas=jax.devices()[0].platform != "cpu",
    )
    engine.start()
    rng = np.random.default_rng(0)
    n = int(secs * 16000)
    t = np.arange(n) / 16000.0
    audio = (0.1 * np.sin(2 * np.pi * 220 * t)
             + 0.05 * rng.normal(0, 1, n)).astype(np.float32)
    bucket = engine._bucket_for(n)
    t0 = time.monotonic()
    engine.prewarm(bucket_secs=[bucket], batch_sizes=[64], mode="aot",
                   parallelism=2)
    log(f"prewarm(aot): {time.monotonic()-t0:.1f}s")
    t0 = time.monotonic()
    engine.prewarm(bucket_secs=[bucket], batch_sizes=[64])
    log(f"prewarm(exec): {time.monotonic()-t0:.1f}s")

    # 1. end-to-end rounds
    e2e = []
    for i in range(4):
        reqs = [DecodeRequest(audio=audio, language="en")
                for _ in range(streams)]
        t0 = time.perf_counter()
        futs = [engine.submit(r) for r in reqs]
        futures.wait(futs)
        e2e.append(time.perf_counter() - t0)
        gen = sum(f.result()._n_gen for f in futs)
        log(f"e2e round {i}: {e2e[-1]:.3f}s gen={gen}")

    # 2. pure device compute via the exec table (inputs pre-staged)
    from stt_tpu.ops.mel import HOP_LENGTH, SAMPLE_RATE
    bucket_samples = int(bucket * SAMPLE_RATE)
    bucket_samples -= bucket_samples % HOP_LENGTH
    pcm = np.zeros((64, bucket_samples), np.int16)
    pcm[:, :n] = np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)
    # the exec-table programs are compiled for the configured wire format
    # (mu-law uint8 by default) — stage rows exactly as the engine does
    from stt_tpu.engine.engine import _encode_wire_rows
    rows = _encode_wire_rows(pcm)
    p = W.build_prompt(engine.config, "en")
    p_len = len(p)
    prompt = jnp.asarray(np.tile(np.asarray(p, np.int32), (64, 1)))
    prompt_len = jnp.full((64,), p_len, jnp.int32)
    auto = jnp.zeros((64,), bool)
    max_new = engine._max_new_for(bucket)
    enc_key = engine._enc_exec_key(bucket, 64)
    dec_key = engine._serve_exec_key(bucket, 64, 1)
    assert enc_key in engine._serve_exec and dec_key in engine._serve_exec, (
        list(engine._serve_exec))
    rows_dev = jnp.asarray(rows)
    jax.block_until_ready(rows_dev)
    jax.block_until_ready(prompt)

    dev_total, enc_only, dec_only = [], [], []
    for i in range(4):
        t0 = time.perf_counter()
        enc = engine._serve_exec[enc_key](engine.params, rows_dev)
        jax.block_until_ready(enc)
        t1 = time.perf_counter()
        packed = engine._serve_exec[dec_key](
            engine.params, enc, prompt, prompt_len, auto, None)
        jax.block_until_ready(packed)
        t2 = time.perf_counter()
        dev_total.append(t2 - t0)
        enc_only.append(t1 - t0)
        dec_only.append(t2 - t1)
        log(f"device round {i}: enc={t1-t0:.3f}s dec={t2-t1:.3f}s")

    # 3. transfer of rows alone (fresh arrays to defeat caching)
    xfer = []
    for i in range(4):
        r2 = rows.copy()
        r2[0, 0] = i  # defeat any dedup
        t0 = time.perf_counter()
        d = jnp.asarray(r2)
        jax.block_until_ready(d)
        xfer.append(time.perf_counter() - t0)
    log(f"rows transfer ({rows.nbytes/1e6:.1f} MB): "
        f"{[f'{x:.3f}' for x in xfer]}")

    # 4. host prep alone
    prep = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = np.zeros((64, bucket_samples), np.int16)
        for i in range(64):
            out[i, :n] = np.clip(audio * 32768.0, -32768, 32767
                                 ).astype(np.int16)
        _encode_wire_rows(out)
        prep.append(time.perf_counter() - t0)
    log(f"host prep: {[f'{x:.3f}' for x in prep]}")

    # 5. null dispatch round-trip latency (tiny program)
    f = jax.jit(lambda x: x + 1)
    z = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(f(z))
    rt = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(z))
        rt.append(time.perf_counter() - t0)
    log(f"null dispatch RTT: {[f'{x*1000:.1f}ms' for x in rt]}")

    engine.close()
    print(json.dumps({
        "e2e_min": round(min(e2e), 3),
        "e2e_med": round(sorted(e2e)[len(e2e)//2], 3),
        "dev_min": round(min(dev_total), 3),
        "enc_min": round(min(enc_only), 3),
        "dec_min": round(min(dec_only), 3),
        "xfer_min": round(min(xfer), 3),
        "prep_min": round(min(prep), 3),
        "null_rtt_ms": round(min(rt) * 1000, 1),
    }), flush=True)


if __name__ == "__main__":
    main()

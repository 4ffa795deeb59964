"""Backend-matrix integration (reference tests/test_integration_backends.py):
the real jax_whisper data plane through the full gRPC stack on CPU.

Uses the 'test' model config (full vocab, tiny dims) so boot compiles in
seconds. The fake-backend integration suite covers control-plane behavior;
this one proves the actual XLA decode path serves end to end.
"""

import json
import os
import urllib.request

import grpc
import numpy as np
import pytest

from stt_tpu.gen import stt_pb2, stt_pb2_grpc
from tests.test_integration import _stub, temp_server

pytestmark = pytest.mark.skipif(
    os.environ.get("STT_SKIP_INTEGRATION") == "1",
    reason="integration tests skipped (STT_SKIP_INTEGRATION=1)",
)


@pytest.fixture(scope="module")
def jax_server():
    with temp_server(extra_args=(
        "--model", "test",
        "--model-backend", "jax_whisper",
        "--language", "en", "--language-fix",
    )) as ports:
        yield ports


def _pcm(seconds: float, seed=3) -> bytes:
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * seconds)) / 16000
    sig = 0.3 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.normal(0, 1, t.shape)
    return (sig * 32767).astype(np.int16).tobytes()


def test_jax_whisper_streaming_roundtrip(jax_server):
    grpc_port, _ = jax_server
    stub, channel = _stub(grpc_port)
    sid = "jax-rt-1"
    stub.CreateSession(stt_pb2.SessionRequest(
        session_id=sid, attributes={"partial": "true"},
    ))
    pcm = _pcm(2.0)

    def chunks():
        step = 3200
        for i in range(0, len(pcm), step):
            yield stt_pb2.AudioChunk(
                session_id=sid, pcm16=pcm[i:i + step], sample_rate=16000
            )
        yield stt_pb2.AudioChunk(session_id=sid, is_final=True, sample_rate=16000)

    call = stub.StreamingRecognize(chunks(), metadata=(("session-id", sid),))
    results = list(call)
    assert any(r.is_final for r in results)
    final = next(r for r in results if r.is_final)
    assert final.text.strip()
    assert final.language_code == "en"
    assert 0.0 <= final.start_sec <= final.end_sec <= 2.5
    trailing = {k: v for k, v in call.trailing_metadata()}
    assert float(trailing["stt-decode-inference-sec"]) > 0
    channel.close()


def test_jax_whisper_accurate_profile(jax_server):
    """Beam search through the wire (DECODE_PROFILE_ACCURATE)."""
    grpc_port, _ = jax_server
    stub, channel = _stub(grpc_port)
    sid = "jax-acc-1"
    stub.CreateSession(stt_pb2.SessionRequest(
        session_id=sid,
        decode_profile=stt_pb2.DECODE_PROFILE_ACCURATE,
    ))
    pcm = _pcm(1.0, seed=5)

    def chunks():
        yield stt_pb2.AudioChunk(session_id=sid, pcm16=pcm, sample_rate=16000)
        yield stt_pb2.AudioChunk(session_id=sid, is_final=True, sample_rate=16000)

    results = list(
        stub.StreamingRecognize(chunks(), metadata=(("session-id", sid),))
    )
    assert any(r.is_final and r.text.strip() for r in results)
    channel.close()


def test_jax_whisper_resample_path(jax_server):
    """8 kHz input resamples server-side before decode."""
    grpc_port, _ = jax_server
    stub, channel = _stub(grpc_port)
    sid = "jax-8k-1"
    stub.CreateSession(stt_pb2.SessionRequest(session_id=sid))
    rng = np.random.default_rng(6)
    t = np.arange(8000) / 8000
    pcm = ((0.3 * np.sin(2 * np.pi * 220 * t)
            + 0.05 * rng.normal(0, 1, t.shape)) * 32767).astype(
        np.int16
    ).tobytes()

    def chunks():
        yield stt_pb2.AudioChunk(session_id=sid, pcm16=pcm, sample_rate=8000)
        yield stt_pb2.AudioChunk(session_id=sid, is_final=True, sample_rate=8000)

    results = list(
        stub.StreamingRecognize(chunks(), metadata=(("session-id", sid),))
    )
    final = next(r for r in results if r.is_final)
    assert final.end_sec <= 1.2  # duration computed at the original rate
    channel.close()


@pytest.mark.skipif(
    not os.environ.get("STT_WEIGHTS_DIR"),
    reason="real-weights accuracy gate: set STT_WEIGHTS_DIR to an HF "
           "whisper checkpoint dir (and optionally STT_SPEECH_FIXTURE="
           "path.wav + STT_FIXTURE_TEXT='expected words')",
)
def test_real_weights_accuracy():
    """Accuracy gate on a genuine checkpoint (reference
    tests/test_integration_backends.py:28-133 decodes hello.wav per
    backend and asserts transcript tolerance). Zero-egress CI skips this;
    any deployment with real weights must pass it:

        STT_WEIGHTS_DIR=/path/to/whisper-tiny \\
        STT_SPEECH_FIXTURE=/path/to/hello.wav \\
        STT_FIXTURE_TEXT='hello' pytest tests/test_integration_backends.py \\
            -k real_weights

    Without a speech fixture it still asserts the checkpoint loads with a
    REAL tokenizer (not the byte-fallback) and that decoding runs.
    """
    import wave

    from stt_tpu.backends.jax_whisper import JaxWhisperBackend
    from stt_tpu.models.tokenizer import FallbackTokenizer

    weights = os.environ["STT_WEIGHTS_DIR"]
    backend = JaxWhisperBackend(
        "tiny", "cpu", "float32", weights_path=weights,
        audio_buckets_sec=(30.0,), batch_buckets=(1,),
    )
    try:
        assert not isinstance(backend.engine.tokenizer, FallbackTokenizer), (
            "checkpoint dir has no tokenizer files - transcripts would be "
            "approximate"
        )
        fixture = os.environ.get("STT_SPEECH_FIXTURE")
        if fixture:
            with wave.open(fixture, "rb") as w:
                assert w.getframerate() == 16000 and w.getnchannels() == 1
                pcm = np.frombuffer(
                    w.readframes(w.getnframes()), np.int16
                )
            audio = pcm.astype(np.float32) / 32768.0
        else:
            audio = np.zeros(16000, np.float32)
        segments, info = backend.transcribe(audio, {"language": "en"})
        expected = os.environ.get("STT_FIXTURE_TEXT", "").strip().lower()
        if expected:
            text = " ".join(s.text for s in segments).strip().lower()
            assert expected in text, f"expected {expected!r} in {text!r}"
    finally:
        backend.close()


@pytest.mark.skipif(
    not os.environ.get("STT_WEIGHTS_DIR"),
    reason="real-weights fp8 parity gate: set STT_WEIGHTS_DIR (see "
           "test_real_weights_accuracy)",
)
def test_real_weights_fp8_cross_kv_parity(monkeypatch):
    """fp8 cross-KV storage is the bf16 serving default; its transcript
    parity is proven on tiny random-weight models in CI, but e4m3's 3
    mantissa bits could in principle flip argmax decisions on REAL logit
    distributions (ADVICE r2). This gate lets any deployment verify
    parity on its actual checkpoint in one command: transcripts under
    fp8 and bf16 cross-KV storage must match on the speech fixture."""
    import importlib
    import wave

    weights = os.environ["STT_WEIGHTS_DIR"]
    fixture = os.environ.get("STT_SPEECH_FIXTURE")
    if fixture:
        with wave.open(fixture, "rb") as w:
            pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        audio = pcm.astype(np.float32) / 32768.0
    else:
        rng = np.random.default_rng(3)
        audio = (0.05 * rng.standard_normal(16000)).astype(np.float32)

    texts = {}
    for mode in ("fp8", "int8", "bf16"):
        monkeypatch.setenv("STT_CROSS_KV_DTYPE", mode)
        import stt_tpu.models.whisper as W_mod

        importlib.reload(W_mod)  # re-read the env-traced storage policy
        from stt_tpu.backends.jax_whisper import JaxWhisperBackend

        backend = JaxWhisperBackend(
            "tiny", "cpu", "bfloat16", weights_path=weights,
            audio_buckets_sec=(30.0,), batch_buckets=(1,),
        )
        try:
            segments, _ = backend.transcribe(audio, {"language": "en"})
            texts[mode] = " ".join(s.text for s in segments).strip()
        finally:
            backend.close()
    monkeypatch.delenv("STT_CROSS_KV_DTYPE")
    importlib.reload(importlib.import_module("stt_tpu.models.whisper"))
    for mode in ("fp8", "int8"):
        assert texts[mode] == texts["bf16"], (
            f"{mode} cross-KV storage changed the transcript on real "
            "weights - set STT_CROSS_KV_DTYPE=bf16 in this deployment:\n"
            f"  {mode}: {texts[mode]!r}\n  bf16: {texts['bf16']!r}"
        )


def test_serving_from_hf_checkpoint_dir(tmp_path):
    """weights_path loading through the real server: export an HF-format
    checkpoint, boot a server on it, decode."""
    import subprocess
    import sys
    import time
    import socket as socket_mod

    import yaml

    from stt_tpu.models.whisper import get_config, init_params
    from stt_tpu.parallel.checkpoint import export_hf_safetensors
    from tests.test_integration import REPO_ROOT, _free_port

    config = get_config("test")
    params = init_params(config, seed=77)
    ckpt_dir = tmp_path / "ckpt"
    export_hf_safetensors(str(ckpt_dir), params, config)

    model_yaml = tmp_path / "model.yaml"
    yaml.safe_dump({
        "model": {
            "backend": "jax_whisper", "name": "test", "device": "cpu",
            "compute_type": "float32", "weights_path": str(ckpt_dir),
            "language": "en", "language_fix": True,
        }
    }, open(model_yaml, "w"))

    grpc_port, http_port = _free_port(), _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the exported checkpoint has no vocab files; real-weights serving
    # hard-fails on the fallback tokenizer unless explicitly allowed
    env["STT_ALLOW_FALLBACK_TOKENIZER"] = "1"
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "stt_tpu.server.main",
            "--model-config", str(model_yaml),
            "--port", str(grpc_port), "--metrics-port", str(http_port),
            "--ws-port", "0",
        ],
        cwd=REPO_ROOT, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        deadline = time.monotonic() + 90
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                raise RuntimeError(
                    "server exited: "
                    + proc.stdout.read().decode(errors="replace")
                )
            try:
                if urllib.request.urlopen(
                    f"http://127.0.0.1:{http_port}/health", timeout=1
                ).status == 200:
                    break
            except Exception:
                time.sleep(0.3)
        else:
            raise TimeoutError("server never healthy")
        stub, channel = _stub(grpc_port)
        stub.CreateSession(stt_pb2.SessionRequest(session_id="hf-ckpt-1"))
        pcm = _pcm(1.0, seed=77)

        def chunks():
            yield stt_pb2.AudioChunk(
                session_id="hf-ckpt-1", pcm16=pcm, sample_rate=16000
            )
            yield stt_pb2.AudioChunk(
                session_id="hf-ckpt-1", is_final=True, sample_rate=16000
            )

        results = list(stub.StreamingRecognize(
            chunks(), metadata=(("session-id", "hf-ckpt-1"),)
        ))
        assert any(r.is_final and r.text for r in results)
        channel.close()
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()


@pytest.mark.skipif(
    not os.environ.get("STT_WEIGHTS_DIR"),
    reason="real-weights mu-law wire parity gate: set STT_WEIGHTS_DIR "
           "(see test_real_weights_accuracy)",
)
def test_real_weights_mulaw_wire_parity(monkeypatch):
    """The mu-law audio wire (8-bit companded host->device rows, the
    serving default — engine.AUDIO_WIRE) quantizes at ~38 dB SNR, far
    above what the log-mel front end resolves; CI proves the round-trip
    SNR on fixtures, and this gate lets a deployment verify transcript
    parity against the lossless int16 wire on its actual checkpoint:
    transcripts under both wires must match."""
    import importlib

    import wave

    weights = os.environ["STT_WEIGHTS_DIR"]
    fixture = os.environ.get("STT_SPEECH_FIXTURE")
    if fixture:
        with wave.open(fixture, "rb") as w:
            pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        audio = pcm.astype(np.float32) / 32768.0
    else:
        rng = np.random.default_rng(3)
        audio = (0.05 * rng.standard_normal(16000)).astype(np.float32)

    texts = {}
    for wire in ("mulaw", "int16"):
        monkeypatch.setenv("STT_AUDIO_WIRE", wire)
        import stt_tpu.engine.engine as E_mod

        importlib.reload(E_mod)  # re-read the env-traced wire policy
        from stt_tpu.backends.jax_whisper import JaxWhisperBackend

        backend = JaxWhisperBackend(
            "tiny", "cpu", "bfloat16", weights_path=weights,
            audio_buckets_sec=(30.0,), batch_buckets=(1,),
        )
        try:
            segments, _ = backend.transcribe(audio, {"language": "en"})
            texts[wire] = " ".join(s.text for s in segments).strip()
        finally:
            backend.close()
    monkeypatch.delenv("STT_AUDIO_WIRE")
    importlib.reload(importlib.import_module("stt_tpu.engine.engine"))
    assert texts["mulaw"] == texts["int16"], (
        "the mu-law wire changed the transcript on real weights - set "
        f"STT_AUDIO_WIRE=int16 in this deployment:\n"
        f"  mulaw: {texts['mulaw']!r}\n  int16: {texts['int16']!r}"
    )


@pytest.mark.skipif(
    not os.environ.get("STT_WEIGHTS_DIR"),
    reason="real-weights int8 decoder-weight parity gate: set "
           "STT_WEIGHTS_DIR (see test_real_weights_accuracy)",
)
def test_real_weights_int8_decoder_weights_parity(monkeypatch):
    """int8 decoder-weight storage (STT_DECODER_WEIGHTS_DTYPE=int8)
    halves the per-step weight stream — the second-largest HBM term
    after the cross-KV. Hermetic CI bounds its logits delta on random
    weights (tests/test_quant_weights.py); THIS gate is the promotion
    bar ROADMAP names: on a real checkpoint the transcript must match
    bf16 weights (real logit margins dwarf the measured 3.4% delta)."""
    import importlib
    import wave

    weights = os.environ["STT_WEIGHTS_DIR"]
    fixture = os.environ.get("STT_SPEECH_FIXTURE")
    if fixture:
        with wave.open(fixture, "rb") as w:
            pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        audio = pcm.astype(np.float32) / 32768.0
    else:
        rng = np.random.default_rng(3)
        audio = (0.05 * rng.standard_normal(16000)).astype(np.float32)

    texts = {}
    for mode in ("int8", "bf16"):
        monkeypatch.setenv("STT_DECODER_WEIGHTS_DTYPE", mode)
        import stt_tpu.models.whisper as W_mod

        importlib.reload(W_mod)  # re-read the weight-storage policy
        from stt_tpu.backends.jax_whisper import JaxWhisperBackend

        backend = JaxWhisperBackend(
            "tiny", "cpu", "bfloat16", weights_path=weights,
            audio_buckets_sec=(30.0,), batch_buckets=(1,),
        )
        try:
            segments, _ = backend.transcribe(audio, {"language": "en"})
            texts[mode] = " ".join(s.text for s in segments).strip()
        finally:
            backend.close()
    monkeypatch.delenv("STT_DECODER_WEIGHTS_DTYPE")
    importlib.reload(importlib.import_module("stt_tpu.models.whisper"))
    assert texts["int8"] == texts["bf16"], (
        "int8 decoder weights changed the transcript on real weights - "
        "keep STT_DECODER_WEIGHTS_DTYPE=bf16 in this deployment:\n"
        f"  int8: {texts['int8']!r}\n  bf16: {texts['bf16']!r}"
    )


@pytest.mark.skipif(
    not os.environ.get("STT_WEIGHTS_DIR"),
    reason="real-weights drafted-partial parity gate: set "
           "STT_WEIGHTS_DIR (see test_real_weights_accuracy)",
)
def test_real_weights_drafted_partials_parity():
    """Partial-draft verification (default on) is token-identical to
    plain greedy by construction — proven exhaustively on synthetic
    models in tests/test_draft_decode.py, exact up to benign bf16
    near-tie argmax flips. This gate proves the END-TO-END streaming
    profile on a real checkpoint: successive growing-buffer partial
    ticks with drafts enabled must produce the same transcripts as the
    same ticks through the plain program (session-less requests never
    route to the drafted program)."""
    import wave

    from stt_tpu.engine.engine import DecodeRequest, WhisperEngine

    weights = os.environ["STT_WEIGHTS_DIR"]
    fixture = os.environ.get("STT_SPEECH_FIXTURE")
    if fixture:
        with wave.open(fixture, "rb") as w:
            pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        audio = pcm.astype(np.float32) / 32768.0
    else:
        rng = np.random.default_rng(3)
        audio = (0.05 * rng.standard_normal(32000)).astype(np.float32)

    engine = WhisperEngine(
        "tiny", device="cpu", compute_type="bfloat16", max_batch=2,
        weights_path=weights, batch_buckets=(1, 2),
        # the gate MEASURES the drafted path; the adaptive serving
        # default would route these few ticks plain (EMA needs
        # min-obs observations before it can engage)
        draft_mode="on",
    )
    engine.start()
    try:
        n = len(audio)
        ticks = [int(n * f) for f in (0.6, 0.8, 1.0)]

        def run(session_id):
            out = []
            for ln in ticks:
                res = engine.transcribe_sync(DecodeRequest(
                    audio=audio[:ln], language="en", is_final=False,
                    session_id=session_id,
                ))
                out.append(
                    " ".join(s.text for s in res.segments).strip()
                )
            return out

        drafted = run("parity_session")  # routes to the drafted program
        offered = engine.draft_stats["offered"]
        plain = run("")                  # session-less: plain program
        assert offered > 0, (
            "drafted ticks never offered a draft - routing regression"
        )
        assert drafted == plain, (
            "drafted partials diverged from plain greedy on real "
            f"weights:\n  drafted: {drafted!r}\n  plain:   {plain!r}"
        )
    finally:
        engine.close()


def _fixture_audio(min_len=32000, seed=3):
    """Real speech fixture when provided, synthetic tone+noise otherwise."""
    import wave

    fixture = os.environ.get("STT_SPEECH_FIXTURE")
    if fixture:
        with wave.open(fixture, "rb") as w:
            pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        return pcm.astype(np.float32) / 32768.0
    rng = np.random.default_rng(seed)
    t = np.arange(min_len) / 16000
    sig = 0.3 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.normal(0, 1, t.shape)
    return sig.astype(np.float32)


@pytest.mark.skipif(
    not os.environ.get("STT_WEIGHTS_DIR"),
    reason="real-weights adaptive-draft engagement gate: set "
           "STT_WEIGHTS_DIR (see test_real_weights_accuracy)",
)
def test_real_weights_adaptive_draft_engagement():
    """The shipped ``adaptive`` drafted-partials default only pays off if
    the acceptance EMA clears STT_DRAFT_ENGAGE (0.8) on REAL margins:
    random weights are the chaotic worst case and every driver bench
    record shows ``draft_engaged: false`` (VERDICT r4 weak #3). This gate
    proves the claim the adaptive default rests on — steady
    growing-buffer partial ticks on a genuine checkpoint push the
    hypothetical-acceptance EMA over the engagement bar, so the drafted
    program actually serves in production."""
    from stt_tpu.engine.engine import DecodeRequest, WhisperEngine

    weights = os.environ["STT_WEIGHTS_DIR"]
    audio = _fixture_audio()

    engine = WhisperEngine(
        "tiny", device="cpu", compute_type="bfloat16", max_batch=1,
        weights_path=weights, batch_buckets=(1,),
        draft_mode="adaptive",
    )
    engine.start()
    try:
        n = len(audio)
        # enough observations for the 0.2-alpha EMA to reach 0.8 from a
        # cold start even at ~0.9 per-tick acceptance (12 obs -> 0.84)
        n_ticks = 14
        fr0 = 0.5
        for w in range(n_ticks):
            ln = int(n * (fr0 + (1.0 - fr0) * w / (n_ticks - 1)))
            engine.transcribe_sync(DecodeRequest(
                audio=audio[:ln], language="en", is_final=False,
                session_id="engage_session",
            ))
        stats = dict(engine.draft_stats)
        assert stats["engaged"] is True and stats["ema"] >= engine._draft_engage, (
            "adaptive drafting never engaged on real weights - the "
            f"shipped default cannot pay off: {stats}"
        )
    finally:
        engine.close()


@pytest.mark.skipif(
    not os.environ.get("STT_WEIGHTS_DIR"),
    reason="real-weights partial-window policy gate: set STT_WEIGHTS_DIR "
           "(see test_real_weights_accuracy)",
)
def test_real_weights_partial_window_policy_parity():
    """The shipped trailing-window partial policy (5 s window + committed
    transcript riding each window as sot_prev conditioning — orchestrator
    ``partial_window_bytes`` + decode_scheduler ``schedule_decode``) must
    hold transcript quality on a real checkpoint: commits never retract
    across window ticks, and the VAD-final decode of the full buffer
    still contains the fixture words (the policy may not lose committed
    content relative to the full-window final)."""
    from stt_tpu.config import defaults as cfg_defaults
    from stt_tpu.engine.registry import ModelRegistry
    from stt_tpu.server.component.decode_scheduler import DecodeScheduler

    weights = os.environ["STT_WEIGHTS_DIR"]
    audio = _fixture_audio()
    pcm16 = (np.clip(audio, -1, 1) * 32767).astype(np.int16).tobytes()

    registry = ModelRegistry(engine_defaults={
        "audio_buckets_sec": [5.0, 10.0, 30.0],
        "batch_buckets": [1],
        "prewarm": False,
    })
    registry.load_model("default", {
        "model_size": "tiny", "device": "cpu",
        "compute_type": "bfloat16", "backend": "jax_whisper",
        "weights_path": weights,
    })
    try:
        sched = DecodeScheduler(
            submit_fn=registry.submit_decode, decode_timeout_sec=300.0,
        )
        stream = sched.new_stream()
        stream.set_model_id("default")
        stream.set_session_id("window_policy")
        # the shipped realtime profile: trailing-window conditioning on
        opts = dict(cfg_defaults.DEFAULT_DECODE_PROFILE)
        assert opts.get("condition_on_previous_text"), (
            "shipped realtime profile must condition across windows"
        )
        window_sec = float(cfg_defaults.DEFAULT_PARTIAL_DECODE_WINDOW_SEC)
        window_bytes = max(1, int(window_sec * 16000 * 2))

        committed_seen = [""]
        n = len(pcm16)
        ticks = [int(n * f) & ~1 for f in (0.4, 0.6, 0.8, 1.0)]
        for ln in ticks:
            buf = pcm16[:ln]
            off = 0.0
            if len(buf) > window_bytes:
                off = (len(buf) - window_bytes) / 32000.0
                buf = buf[-window_bytes:]
            stream.schedule_decode(
                buf, 16000, dict(opts), is_final=False, offset_sec=off,
            )
            for _ in stream.emit_ready(block=True):
                pass
            committed = stream._committed
            assert committed.startswith(committed_seen[-1]), (
                "window policy retracted committed text: "
                f"{committed_seen[-1]!r} -> {committed!r}"
            )
            committed_seen.append(committed)
        # the VAD-final decode sees the full buffer regardless of the
        # partial window policy
        stream.schedule_decode(
            pcm16, 16000, dict(opts), is_final=True, offset_sec=0.0,
        )
        finals = [r for r in stream.emit_ready(block=True) if r.is_final]
        assert finals and finals[-1].text.strip()
        expected = os.environ.get("STT_FIXTURE_TEXT", "").strip().lower()
        if expected:
            text = finals[-1].text.strip().lower()
            assert expected in text, (
                f"final under the window policy lost the fixture words: "
                f"expected {expected!r} in {text!r}"
            )
    finally:
        registry.close()


@pytest.mark.skipif(
    not os.environ.get("STT_RUN_DEVICE_GATES"),
    reason="on-device loaded-partial SLO gate: set STT_RUN_DEVICE_GATES=1 "
           "on a TPU host (STT_TEST_PLATFORM=<platform> selects the "
           "backend; cpu hosts report compile-bound numbers)",
)
def test_loaded_partial_p95_on_device():
    """North-star SLO gate on the deployment device: per-request partial
    completion latency with 64 CONCURRENT streaming sessions at the
    shipped policy must meet the p95 budget (BASELINE.json: < 300 ms at
    64 streams; override via STT_PARTIAL_P95_BUDGET_MS). The measured
    condition is the served one — sessions emit partials at the shipped
    cadence with random phases and continuous batching coalesces what
    overlaps (production streams are not phase-locked; the synchronized
    all-64-at-once burst is the adversarial worst case and is recorded
    separately by bench.py as partial_burst_p95_ms). Weights-agnostic:
    random weights decode to max tokens, making this an upper bound on
    the real-checkpoint latency. Mirrors bench.py's
    partial_p95_loaded_ms phase so a deployment can reproduce the
    driver-recorded number in one command."""
    import time as time_mod
    from concurrent import futures as fut_mod

    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("loaded-partial SLO is defined on TPU hardware")

    from stt_tpu.config import defaults as cfg_defaults
    from stt_tpu.engine.engine import DecodeRequest, WhisperEngine

    budget_ms = float(os.environ.get("STT_PARTIAL_P95_BUDGET_MS", "300"))
    streams = int(os.environ.get("STT_PARTIAL_GATE_STREAMS", "64"))
    window_sec = float(cfg_defaults.DEFAULT_PARTIAL_DECODE_WINDOW_SEC)
    interval = float(cfg_defaults.DEFAULT_PARTIAL_DECODE_INTERVAL_SEC)
    weights = os.environ.get("STT_WEIGHTS_DIR") or None

    # the shipped sparse rung list: mid-cadence arrivals coalesce into
    # sub-64 groups and pad to the next rung (a (1, 64)-only bucket list
    # would pad every small group to 64 rows and overload the device)
    rungs = tuple(b for b in (1, 4, 16, 64) if b <= streams) or (1, streams)
    engine = WhisperEngine(
        "small", device="tpu", compute_type="bfloat16",
        max_batch=streams, weights_path=weights,
        audio_buckets_sec=(window_sec, 10.0),
        batch_buckets=rungs,
        # the SHIPPED kernel policy — also what the committed exec-cache
        # artifacts are fingerprinted under, so this gate deserializes in
        # seconds instead of cold-compiling the whole rung matrix
        use_pallas=True,
    )
    engine.start()
    try:
        engine.prewarm(
            bucket_secs=[window_sec], batch_sizes=list(rungs), mode="aot",
            include_drafted=engine._draft_mode != "off",
        )
        # first execution of each loaded program pays deferred
        # upload/finalization on tunneled devices — absorb it here
        engine.prewarm(bucket_secs=[window_sec], batch_sizes=list(rungs))
        rng = np.random.default_rng(7)
        t = np.arange(int(10.0 * 16000)) / 16000
        audio = (
            0.3 * np.sin(2 * np.pi * 220 * t)
            + 0.05 * rng.normal(0, 1, t.shape)
        ).astype(np.float32)
        window_n = int(window_sec * 16000)
        lats: list = []

        def timed(req, sink):
            t0 = time_mod.perf_counter()
            f = engine.submit(req)
            f.add_done_callback(
                lambda _f: sink.append(time_mod.perf_counter() - t0)
            )
            return f

        grow0 = int(0.85 * len(audio))
        # two synchronized warmup ticks: the first executions of the wide
        # plain group and (if adaptive engages) the drafted programs
        for w in range(2):
            win = audio[max(0, grow0 + w * 8000 - window_n):grow0 + w * 8000]
            futs = [
                timed(DecodeRequest(
                    audio=win, language="en", is_final=False,
                    session_id=f"slo_{i}"), [])
                for i in range(streams)
            ]
            fut_mod.wait(futs)
            for f in futs:
                f.result()
        # served condition: shipped cadence, random phases, 10 intervals —
        # the first two are warmup (mirrors bench.py: on tunneled devices
        # the first execution of each drafted sub-64 rung pays deferred
        # program finalization, which belongs to boot, not steady state)
        n_iv, warm_iv = 10, 2
        rng_ph = np.random.default_rng(11)
        phases = rng_ph.uniform(0.0, interval, streams)
        events = sorted(
            (k * interval + phases[i], i, k)
            for k in range(n_iv) for i in range(streams)
        )
        tagged: list = []
        futs = []
        t_start = time_mod.perf_counter()
        for t_ev, i, k in events:
            now = time_mod.perf_counter() - t_start
            if t_ev > now:
                time_mod.sleep(t_ev - now)
            ln = min(len(audio), grow0 + int(t_ev * 16000))
            win = audio[max(0, ln - window_n):ln]
            t0 = time_mod.perf_counter()
            f = engine.submit(DecodeRequest(
                audio=win, language="en", is_final=False,
                session_id=f"slo_{i}"))
            f.add_done_callback(
                lambda _f, k=k, t0=t0: tagged.append(
                    (k, time_mod.perf_counter() - t0))
            )
            futs.append(f)
        fut_mod.wait(futs)
        for f in futs:
            f.result()
        lats = sorted(lat for k, lat in tagged if k >= warm_iv)
        p95 = lats[int(len(lats) * 0.95) - 1] * 1000
        assert p95 < budget_ms, (
            f"served partial p95 {p95:.0f}ms exceeds the {budget_ms:.0f}ms "
            f"budget at {streams} streams (window {window_sec:.0f}s, "
            f"cadence {interval:.1f}s, {len(lats)} samples)"
        )
    finally:
        engine.close()

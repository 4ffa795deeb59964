"""Parallel prefill + partial-draft verification (CPU, micro model).

The drafted greedy decoder (W.greedy_decode_drafted) must be
token-identical to plain greedy for ANY draft — perfect, empty,
adversarial, or truncated — because acceptance re-derives every token
from the model's own masked argmax. Reference role: the speed side of
the streaming partial path (the reference re-decodes each partial from
scratch; see stt_server/backend/component/decode_scheduler semantics in
SURVEY.md §2) — drafting only moves work between the parallel verify
pass and the sequential loop.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stt_tpu.models import whisper as W
from stt_tpu.ops.mel import log_mel_spectrogram

CFG = W.PRESETS["test"]
RNG = np.random.default_rng(7)
MAX_NEW = 12


@pytest.fixture(scope="module")
def params():
    return W.init_params(CFG, seed=0)


@pytest.fixture(scope="module")
def enc_out(params):
    audio = (0.1 * RNG.standard_normal(16000)).astype(np.float32)
    mel = log_mel_spectrogram(jnp.asarray(audio))[None]
    return W.encode(params, mel, CFG.n_audio_head)


def _prompt(batch=1):
    p = np.array([W.build_prompt(CFG, "en")], np.int32)
    return np.tile(p, (batch, 1))


def _greedy(params, enc, batch=1, prefill="parallel", monkeypatch=None):
    """Run greedy through the UNJITTED body so the module-level PREFILL
    policy can be flipped per call (a jitted trace would be cached)."""
    prompt = _prompt(batch)
    enc_b = jnp.tile(enc, (batch, 1, 1))
    fn = W.greedy_decode.__wrapped__
    if monkeypatch is not None:
        monkeypatch.setattr(W, "PREFILL", prefill)
    return fn(
        params, enc_b, jnp.asarray(prompt),
        jnp.full((batch,), prompt.shape[1], jnp.int32),
        None, CFG, CFG.n_text_head, max_new_tokens=MAX_NEW,
    )


def _drafted(params, enc, draft_rows, draft_lens, batch=None):
    batch = batch or len(draft_rows)
    prompt = _prompt(batch)
    enc_b = jnp.tile(enc, (batch, 1, 1))
    width = max((len(d) for d in draft_rows), default=0)
    width = max(width, 1)
    layout = W.token_layout(CFG.n_vocab)
    draft = np.full((batch, width), layout.eot, np.int32)
    for i, d in enumerate(draft_rows):
        draft[i, : len(d)] = d
    return W.greedy_decode_drafted(
        params, enc_b, jnp.asarray(prompt),
        jnp.full((batch,), prompt.shape[1], jnp.int32),
        jnp.asarray(draft), jnp.asarray(np.asarray(draft_lens, np.int32)),
        CFG, CFG.n_text_head, max_new_tokens=MAX_NEW,
    )


# ---------------------------------------------------------------------------
# parallel prefill == sequential prefill
# ---------------------------------------------------------------------------


def test_parallel_prefill_matches_sequential_greedy(
    params, enc_out, monkeypatch
):
    seq = _greedy(params, enc_out, prefill="seq", monkeypatch=monkeypatch)
    par = _greedy(
        params, enc_out, prefill="parallel", monkeypatch=monkeypatch
    )
    assert np.array_equal(np.asarray(seq.tokens), np.asarray(par.tokens))
    assert np.array_equal(np.asarray(seq.lengths), np.asarray(par.lengths))
    np.testing.assert_allclose(
        np.asarray(seq.sum_logprob), np.asarray(par.sum_logprob),
        rtol=0, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(seq.no_speech_prob), np.asarray(par.no_speech_prob),
        rtol=0, atol=1e-5,
    )


def test_parallel_prefill_matches_sequential_long_ctx(
    params, enc_out, monkeypatch
):
    """Conditioning-prefix prompts (the long-final seek loop) are the
    case the parallel prefill exists for: sot_prev + ctx tokens."""
    layout = W.token_layout(CFG.n_vocab)
    ctx = [layout.sot_prev] + list(RNG.integers(10, 200, size=9))
    base = W.build_prompt(CFG, "en")
    prompt = np.asarray([ctx + base], np.int32)
    sot_pos = len(ctx)
    fn = W.greedy_decode.__wrapped__

    outs = {}
    for mode in ("seq", "parallel"):
        monkeypatch.setattr(W, "PREFILL", mode)
        outs[mode] = fn(
            params, enc_out, jnp.asarray(prompt),
            jnp.full((1,), prompt.shape[1], jnp.int32),
            None, CFG, CFG.n_text_head, max_new_tokens=8,
            sot_pos=jnp.asarray(sot_pos, jnp.int32),
        )
    assert np.array_equal(
        np.asarray(outs["seq"].tokens), np.asarray(outs["parallel"].tokens)
    )
    np.testing.assert_allclose(
        np.asarray(outs["seq"].no_speech_prob),
        np.asarray(outs["parallel"].no_speech_prob),
        rtol=0, atol=1e-5,
    )


def test_parallel_prefill_matches_sequential_timestamps(
    params, enc_out, monkeypatch
):
    prompt = np.asarray(
        [W.build_prompt(CFG, "en", without_timestamps=False)], np.int32
    )
    fn = W.greedy_decode_timestamps.__wrapped__
    outs = {}
    for mode in ("seq", "parallel"):
        monkeypatch.setattr(W, "PREFILL", mode)
        outs[mode] = fn(
            params, enc_out, jnp.asarray(prompt),
            jnp.full((1,), prompt.shape[1], jnp.int32),
            None, CFG, CFG.n_text_head, max_new_tokens=10,
        )
    assert np.array_equal(
        np.asarray(outs["seq"].tokens), np.asarray(outs["parallel"].tokens)
    )


def test_parallel_prefill_matches_sequential_beam(
    params, enc_out, monkeypatch
):
    prompt = _prompt(1)
    fn = W.beam_decode.__wrapped__
    outs = {}
    for mode in ("seq", "parallel"):
        monkeypatch.setattr(W, "PREFILL", mode)
        outs[mode] = fn(
            params, enc_out, jnp.asarray(prompt),
            jnp.full((1,), prompt.shape[1], jnp.int32),
            None, CFG, CFG.n_text_head, max_new_tokens=8, beam_size=3,
        )
    assert np.array_equal(
        np.asarray(outs["seq"].tokens), np.asarray(outs["parallel"].tokens)
    )


# ---------------------------------------------------------------------------
# drafted greedy == plain greedy, for any draft
# ---------------------------------------------------------------------------


def _gen_tokens(res, row=0):
    p_len = _prompt().shape[1]
    n_gen = int(res.lengths[row]) - p_len
    return list(np.asarray(res.tokens[row, p_len: p_len + n_gen]))


def _assert_drafted_matches(res, drafted, rows=None):
    rows = rows if rows is not None else range(
        np.asarray(drafted.tokens).shape[0]
    )
    for r in rows:
        assert np.array_equal(
            np.asarray(res.tokens[0]), np.asarray(drafted.tokens[r])
        ), f"row {r} tokens diverge"
        assert int(res.lengths[0]) == int(drafted.lengths[r])
        np.testing.assert_allclose(
            float(res.sum_logprob[0]), float(drafted.sum_logprob[r]),
            rtol=0, atol=1e-3,
        )
        np.testing.assert_allclose(
            float(res.no_speech_prob[0]), float(drafted.no_speech_prob[r]),
            rtol=0, atol=1e-5,
        )


def test_drafted_empty_draft_matches_greedy(params, enc_out):
    res = _greedy(params, enc_out)
    drafted = _drafted(params, enc_out, [[]], [0])
    _assert_drafted_matches(res, drafted)
    assert int(drafted.n_accepted[0]) == 0


def test_drafted_perfect_draft_matches_greedy(params, enc_out):
    res = _greedy(params, enc_out)
    gen = _gen_tokens(res)
    assert gen, "test model should generate at least one token"
    drafted = _drafted(params, enc_out, [gen], [len(gen)])
    _assert_drafted_matches(res, drafted)
    assert int(drafted.n_accepted[0]) == len(gen)


def test_drafted_adversarial_draft_matches_greedy(params, enc_out):
    res = _greedy(params, enc_out)
    garbage = list(RNG.integers(10, 400, size=MAX_NEW))
    drafted = _drafted(params, enc_out, [garbage], [len(garbage)])
    _assert_drafted_matches(res, drafted)


def test_drafted_mid_mutation_accepts_prefix(params, enc_out):
    res = _greedy(params, enc_out)
    gen = _gen_tokens(res)
    if len(gen) < 3:
        pytest.skip("need >= 3 generated tokens to mutate the middle")
    cut = len(gen) // 2
    mutated = list(gen)
    mutated[cut] = (mutated[cut] + 1) % 400 + 10
    drafted = _drafted(params, enc_out, [mutated], [len(mutated)])
    _assert_drafted_matches(res, drafted)
    assert int(drafted.n_accepted[0]) == cut


def test_drafted_mixed_batch_rows_independent(params, enc_out):
    """Rows with different drafts (perfect / empty / garbage) resume at
    different per-row positions and must all converge to greedy."""
    res = _greedy(params, enc_out)
    gen = _gen_tokens(res)
    rows = [gen, [], list(RNG.integers(10, 400, size=6)), gen[:1]]
    drafted = _drafted(
        params, enc_out, rows, [len(r) for r in rows]
    )
    _assert_drafted_matches(res, drafted)


def test_drafted_draft_with_eot_tail(params, enc_out):
    """A draft that includes the eot (a previous partial that ended
    exactly where greedy ends) terminates acceptance at the eot."""
    layout = W.token_layout(CFG.n_vocab)
    res = _greedy(params, enc_out)
    gen = _gen_tokens(res)
    draft = gen + [layout.eot] + [42, 43]
    if len(draft) > MAX_NEW:
        pytest.skip("draft exceeds max_new for this model output")
    drafted = _drafted(params, enc_out, [draft], [len(draft)])
    _assert_drafted_matches(res, drafted)


def test_drafted_truncated_draft(params, enc_out):
    res = _greedy(params, enc_out)
    gen = _gen_tokens(res)
    if len(gen) < 2:
        pytest.skip("need >= 2 generated tokens")
    drafted = _drafted(params, enc_out, [gen[:-1]], [len(gen) - 1])
    _assert_drafted_matches(res, drafted)
    assert int(drafted.n_accepted[0]) == len(gen) - 1


# ---------------------------------------------------------------------------
# engine integration: drafted partial path
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def draft_engine():
    from stt_tpu.engine.engine import WhisperEngine

    eng = WhisperEngine(
        "test",
        device="cpu",
        compute_type="float32",
        audio_buckets_sec=(1.0, 2.0),
        batch_buckets=(1, 2, 4),
        max_decode_tokens=32,
        batch_window_ms=20.0,
        max_batch=4,
        draft_mode="on",
    )
    yield eng
    eng.close()


def _audio(dur=0.8, seed=11):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.standard_normal(int(16000 * dur))).astype(np.float32)


def test_engine_drafted_partials_token_identical(draft_engine):
    from stt_tpu.engine.engine import DecodeRequest

    audio = _audio()
    # session-less request: plain greedy program (the baseline)
    base = draft_engine.transcribe_sync(
        DecodeRequest(audio=audio, language="en")
    )
    # partial 1: drafted group, empty draft
    p1 = draft_engine.transcribe_sync(DecodeRequest(
        audio=audio, language="en", is_final=False, session_id="drafts1",
    ))
    before = dict(draft_engine.draft_stats)
    # partial 2: same session + same audio -> a perfect draft
    p2 = draft_engine.transcribe_sync(DecodeRequest(
        audio=audio, language="en", is_final=False, session_id="drafts1",
    ))
    after = dict(draft_engine.draft_stats)
    texts = lambda out: [s.text for s in out.segments]  # noqa: E731
    assert texts(p1) == texts(base)
    assert texts(p2) == texts(base)
    if p1._n_gen > 0:
        assert after["rows"] == before["rows"] + 1
        assert after["accepted"] > before["accepted"]
        assert after["accepted"] - before["accepted"] == p1._n_gen


def test_engine_final_evicts_draft(draft_engine):
    from stt_tpu.engine.engine import DecodeRequest

    audio = _audio(seed=12)
    sid = "drafts2"
    p1 = draft_engine.transcribe_sync(DecodeRequest(
        audio=audio, language="en", is_final=False, session_id=sid,
    ))
    # precondition: the partial actually stored its generated tokens as
    # the session draft (eviction below would otherwise pass vacuously)
    assert len(draft_engine._draft_get(sid)) == p1._n_gen
    assert p1._n_gen > 0, "fixture audio generated no tokens"
    draft_engine.transcribe_sync(DecodeRequest(
        audio=audio, language="en", is_final=True, session_id=sid,
    ))
    assert len(draft_engine._draft_get(sid)) == 0


def test_engine_drafted_and_plain_batch_split(draft_engine):
    """A drafted partial and a plain final in one window must form two
    groups (different programs) and both succeed."""
    from stt_tpu.engine.engine import DecodeRequest

    audio = _audio(seed=13)
    f1 = draft_engine.submit(DecodeRequest(
        audio=audio, language="en", is_final=False, session_id="drafts3",
    ))
    f2 = draft_engine.submit(DecodeRequest(
        audio=audio, language="en", is_final=True, session_id="drafts4",
    ))
    o1 = f1.result(timeout=120)
    o2 = f2.result(timeout=120)
    assert [s.text for s in o1.segments] == [s.text for s in o2.segments]


def test_engine_drafted_exec_table_roundtrip(tmp_path, monkeypatch):
    """AOT prewarm with include_drafted compiles + persists the drafted
    program; drafted partials then dispatch through the exec table and
    stay token-identical."""
    monkeypatch.setenv("STT_EXEC_CACHE_DIR", str(tmp_path))
    from stt_tpu.engine.engine import DecodeRequest, WhisperEngine

    eng = WhisperEngine(
        "test", device="cpu", compute_type="float32",
        audio_buckets_sec=(1.0,), batch_buckets=(1,),
        max_decode_tokens=32, batch_window_ms=10.0, max_batch=1,
        draft_mode="on",
    )
    try:
        eng.prewarm(
            bucket_secs=[1.0], batch_sizes=[1], mode="aot",
            include_drafted=True,
        )
        dkey = eng._draft_exec_key(1.0, 1)
        assert dkey in eng._serve_exec
        assert (tmp_path / eng._exec_fingerprint() / f"{dkey}.jexec").exists()

        audio = _audio(seed=21)
        base = eng.transcribe_sync(DecodeRequest(audio=audio, language="en"))
        p1 = eng.transcribe_sync(DecodeRequest(
            audio=audio, language="en", is_final=False, session_id="xt1",
        ))
        p2 = eng.transcribe_sync(DecodeRequest(
            audio=audio, language="en", is_final=False, session_id="xt1",
        ))
        assert [s.text for s in p1.segments] == [s.text for s in base.segments]
        assert [s.text for s in p2.segments] == [s.text for s in base.segments]
        if p1._n_gen > 0:
            assert eng.draft_stats["accepted"] >= p1._n_gen
    finally:
        eng.close()


def test_engine_drafted_prefix_skips_exec_table(tmp_path, monkeypatch):
    """A drafted partial carrying a `prefix` option grows p_len while
    lang_pos stays 1 — it must NOT be dispatched through the drafted
    exec-table entry (compiled for the canonical prompt shape). Before
    the p_len guard, the shape-mismatched call raised and permanently
    evicted the SHARED enc/draft entries, degrading every later request
    at that (bucket, batch) to a fresh jit compile."""
    monkeypatch.setenv("STT_EXEC_CACHE_DIR", str(tmp_path))
    from stt_tpu.engine.engine import DecodeRequest, WhisperEngine

    eng = WhisperEngine(
        "test", device="cpu", compute_type="float32",
        audio_buckets_sec=(1.0,), batch_buckets=(1,),
        max_decode_tokens=32, batch_window_ms=10.0, max_batch=1,
        draft_mode="on",
    )
    try:
        eng.prewarm(
            bucket_secs=[1.0], batch_sizes=[1], mode="aot",
            include_drafted=True,
        )
        dkey = eng._draft_exec_key(1.0, 1)
        ekey = eng._enc_exec_key(1.0, 1)
        assert dkey in eng._serve_exec and ekey in eng._serve_exec

        audio = _audio(seed=77)
        sid = "prefix-draft"
        # first partial stores a draft; second partial (with a draft)
        # carries `prefix`, widening the prompt beyond the canonical shape
        eng.transcribe_sync(DecodeRequest(
            audio=audio, language="en", is_final=False, session_id=sid,
        ))
        out = eng.transcribe_sync(DecodeRequest(
            audio=audio, language="en", is_final=False, session_id=sid,
            options={"prefix": "hello"},
        ))
        assert out.segments is not None
        # the shared exec-table entries must survive the prefixed request
        assert dkey in eng._serve_exec, "draft exec entry was evicted"
        assert ekey in eng._serve_exec, "encoder exec entry was evicted"
    finally:
        eng.close()


def test_engine_final_consumes_draft(draft_engine):
    """The utterance-final decode rides the drafted program when the
    session's last partial left a draft — token-identical to the plain
    final, with the draft accepted."""
    from stt_tpu.engine.engine import DecodeRequest

    audio = _audio(seed=31)
    base = draft_engine.transcribe_sync(
        DecodeRequest(audio=audio, language="en", is_final=True)
    )
    sid = "drafts-final"
    p1 = draft_engine.transcribe_sync(DecodeRequest(
        audio=audio, language="en", is_final=False, session_id=sid,
    ))
    before = dict(draft_engine.draft_stats)
    fin = draft_engine.transcribe_sync(DecodeRequest(
        audio=audio, language="en", is_final=True, session_id=sid,
    ))
    after = dict(draft_engine.draft_stats)
    assert [s.text for s in fin.segments] == [s.text for s in base.segments]
    if p1._n_gen > 0:
        assert after["accepted"] - before["accepted"] == p1._n_gen
    # consumed AND evicted
    assert len(draft_engine._draft_get(sid)) == 0


def test_engine_final_without_draft_stays_plain(draft_engine):
    """A final on a session with no stored draft must not pay the
    verify pass (routes through the plain greedy program)."""
    from stt_tpu.engine.engine import DecodeRequest

    before = dict(draft_engine.draft_stats)
    out = draft_engine.transcribe_sync(DecodeRequest(
        audio=_audio(seed=32), language="en", is_final=True,
        session_id="drafts-fresh-final",
    ))
    assert out.segments is not None
    assert dict(draft_engine.draft_stats) == before


def test_ctx_prefix_buckets(draft_engine):
    """Internally-injected GROWING conditioning (_cond_ctx: the
    committed transcript, seek windows) truncates down to bucketed
    lengths so it cannot churn compiled shapes; a user-supplied
    initial_prompt/hotwords keeps every token the whisper budget admits
    (fixed text = one stable shape; dropping a user's hotwords would
    silently regress recognition)."""
    from stt_tpu.engine.engine import DecodeRequest

    tok = draft_engine.tokenizer

    def ctx_len(n_tokens, **extra):
        # build a text that encodes to >= n_tokens, then measure
        text = tok.decode(list(range(100, 100 + n_tokens)))
        req = DecodeRequest(
            audio=_audio(), language="en",
            options={"initial_prompt": text, **extra},
        )
        return len(draft_engine._context_prefix(req))

    budget = draft_engine.config.n_text_ctx // 2 - 1

    # growing internal context: bucketed
    seen = {ctx_len(n, _cond_ctx=True)
            for n in (2, 9, 12, 20, 40, 70, 129, 200)}
    # every observed length is 1 + a bucket (the sot_prev slot) or 0
    allowed = {0} | {1 + b for b in draft_engine._CTX_BUCKETS} | {
        1 + budget
    }
    assert seen <= allowed, (seen, allowed)
    assert ctx_len(2, _cond_ctx=True) == 0   # below smallest bucket: dropped
    assert ctx_len(20, _cond_ctx=True) == 1 + 16  # truncated down to 16

    # user-supplied conditioning: exact token count up to the budget
    for n in (2, 20, 100):
        got = ctx_len(n)
        assert got >= 1 + min(n, budget) - 1, (n, got)  # nothing bucketed away
    assert ctx_len(300) == 1 + budget        # whisper budget still applies


def test_seek_windows_bypass_draft_store(draft_engine):
    """Long-final seek windows must neither consume nor write drafts
    (each window decodes different audio), and the long final evicts
    the session's streaming draft like any final."""
    from stt_tpu.engine.engine import DecodeRequest

    sid = "drafts-long"
    audio = _audio(seed=41)
    draft_engine.transcribe_sync(DecodeRequest(
        audio=audio, language="en", is_final=False, session_id=sid,
    ))
    assert len(draft_engine._draft_get(sid)) >= 0
    before = dict(draft_engine.draft_stats)
    long_audio = _audio(dur=4.5, seed=42)  # > 2s max bucket -> seek loop
    out = draft_engine.transcribe_sync(DecodeRequest(
        audio=long_audio, language="en", is_final=True, session_id=sid,
    ))
    assert out.segments is not None
    # windows carried no drafts: acceptance stats untouched
    assert dict(draft_engine.draft_stats) == before
    # and the long final evicted the stream's draft
    assert len(draft_engine._draft_get(sid)) == 0


def test_engine_drafted_auto_language(draft_engine):
    """Auto-detect rows ride the drafted program too: detection patches
    the prompt's language slot before the verify pass, identically to
    the plain program."""
    from stt_tpu.engine.engine import DecodeRequest

    audio = _audio(seed=51)
    base = draft_engine.transcribe_sync(
        DecodeRequest(audio=audio, language=None)
    )
    sid = "drafts-auto"
    p1 = draft_engine.transcribe_sync(DecodeRequest(
        audio=audio, language=None, is_final=False, session_id=sid,
    ))
    p2 = draft_engine.transcribe_sync(DecodeRequest(
        audio=audio, language=None, is_final=False, session_id=sid,
    ))
    assert p1.info.language == base.info.language
    assert p2.info.language == base.info.language
    assert [s.text for s in p2.segments] == [s.text for s in base.segments]


# ---------------------------------------------------------------------------
# adaptive draft routing (the serving default): plain until the measured
# acceptance EMA clears the engage threshold, with hysteresis
# ---------------------------------------------------------------------------


def _adaptive_engine(**kw):
    from stt_tpu.engine.engine import WhisperEngine

    return WhisperEngine(
        "test", device="cpu", compute_type="float32",
        audio_buckets_sec=(1.0, 2.0), batch_buckets=(1, 2, 4),
        max_decode_tokens=32, batch_window_ms=20.0, max_batch=4,
        draft_mode="adaptive", **kw,
    )


def test_adaptive_starts_plain_and_engages_on_high_acceptance():
    """Adaptive mode routes eligible partials through the PLAIN program
    while the hypothetical acceptance signal (host LCP of consecutive
    partial token streams) accrues; once the EMA clears the engage
    threshold after min-obs observations, ticks ride the drafted
    program (offered > 0)."""
    from stt_tpu.engine.engine import DecodeRequest

    eng = _adaptive_engine()
    audio = _audio(seed=31)
    try:
        sid = "adapt1"

        def tick():
            return eng.transcribe_sync(DecodeRequest(
                audio=audio, language="en", is_final=False, session_id=sid,
            ))

        p1 = tick()
        assert p1._n_gen > 0, "micro model generated nothing"
        # identical audio => identical tokens => hypothetical acceptance
        # 1.0 per observation; min_obs=3 then engages
        for i in range(4):
            tick()
            st = eng.draft_stats
            assert st["offered"] == 0 or st["engaged"], (
                f"drafted program ran before engagement at tick {i}: {st}"
            )
            if st["engaged"]:
                break
        st = dict(eng.draft_stats)
        assert st["engaged"], st
        assert st["hyp_offered"] > 0 and (
            st["hyp_accepted"] == st["hyp_offered"]
        ), st
        before = dict(eng.draft_stats)
        out = tick()  # now routed through the drafted program
        after = dict(eng.draft_stats)
        assert after["offered"] > before["offered"], (before, after)
        assert after["accepted"] > before["accepted"]
        # token-identical output either way
        assert [s.text for s in out.segments] == [
            s.text for s in p1.segments
        ]
    finally:
        eng.close()


def test_adaptive_disengages_on_low_acceptance():
    """Once engaged, garbage drafts (forced via the store) drive the
    live acceptance EMA below the disengage threshold and routing
    returns to the plain program."""
    import numpy as np

    from stt_tpu.engine.engine import DecodeRequest

    eng = _adaptive_engine()
    audio = _audio(seed=32)
    try:
        sid = "adapt2"

        def tick():
            return eng.transcribe_sync(DecodeRequest(
                audio=audio, language="en", is_final=False, session_id=sid,
            ))

        p1 = tick()
        assert p1._n_gen > 1, "need a multi-token generation"
        for _ in range(4):
            tick()
            if eng.draft_stats["engaged"]:
                break
        assert eng.draft_stats["engaged"]
        # force mismatching drafts: live acceptance ~0 per tick
        garbage = np.full(max(2, p1._n_gen), 77, np.int32)
        for _ in range(8):
            eng._draft_put(sid, garbage)
            tick()
            if not eng.draft_stats["engaged"]:
                break
        st = dict(eng.draft_stats)
        assert not st["engaged"], st
        # next tick routes plain again: offered frozen, hyp keeps moving
        before = dict(eng.draft_stats)
        tick()
        tick()
        after = dict(eng.draft_stats)
        assert after["offered"] == before["offered"], (before, after)
        assert after["hyp_offered"] > before["hyp_offered"]
    finally:
        eng.close()


def test_adaptive_mode_off_never_stores_or_routes():
    from stt_tpu.engine.engine import DecodeRequest, WhisperEngine

    eng = WhisperEngine(
        "test", device="cpu", compute_type="float32",
        audio_buckets_sec=(1.0,), batch_buckets=(1,),
        max_decode_tokens=16, batch_window_ms=0.0, max_batch=1,
        draft_mode="off",
    )
    audio = _audio(seed=33)
    try:
        for _ in range(3):
            eng.transcribe_sync(DecodeRequest(
                audio=audio, language="en", is_final=False,
                session_id="off1",
            ))
        st = dict(eng.draft_stats)
        assert st["offered"] == 0 and st["hyp_offered"] == 0, st
        assert len(eng._draft_get("off1")) == 0
    finally:
        eng.close()

"""JAX Whisper model tests on the micro 'test' config (CPU, random weights)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stt_tpu.models import whisper as W
from stt_tpu.ops.mel import log_mel_spectrogram

CFG = W.PRESETS["test"]
RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def params():
    return W.init_params(CFG, seed=0)


@pytest.fixture(scope="module")
def enc_out(params):
    audio = (0.1 * RNG.standard_normal(16000)).astype(np.float32)
    mel = log_mel_spectrogram(jnp.asarray(audio))[None]
    return W.encode(params, mel, CFG.n_audio_head)


def _decode(params, enc, max_new=10, batch=1):
    prompt = np.tile(np.array([W.build_prompt(CFG, "en")], np.int32), (batch, 1))
    cache = W.init_kv_cache(CFG, batch, 48)
    enc_b = jnp.tile(enc, (batch, 1, 1))
    return W.greedy_decode(
        params,
        enc_b,
        jnp.asarray(prompt),
        jnp.full((batch,), prompt.shape[1], jnp.int32),
        cache,
        CFG,
        CFG.n_text_head,
        max_new_tokens=max_new,
    )


def test_encoder_shape_and_determinism(params):
    audio = (0.1 * RNG.standard_normal(32000)).astype(np.float32)
    mel = log_mel_spectrogram(jnp.asarray(audio))[None]
    e1 = W.encode(params, mel, CFG.n_audio_head)
    e2 = W.encode(params, mel, CFG.n_audio_head)
    assert e1.shape == (1, 100, CFG.n_audio_state)
    assert np.array_equal(np.asarray(e1), np.asarray(e2))


def test_greedy_matches_teacher_forced_oracle(params, enc_out):
    """KV-cached while_loop decode must equal step-by-step full forward."""
    res = _decode(params, enc_out, max_new=8)
    layout = W.token_layout(CFG.n_vocab)
    suppress = np.zeros(CFG.n_vocab, np.float32)
    suppress[layout.sot :] = -np.inf
    suppress[layout.eot] = 0.0

    tokens = list(W.build_prompt(CFG, "en"))
    for _ in range(8):
        logits = W.decoder_forward(
            params, jnp.asarray([tokens], jnp.int32), enc_out, CFG.n_text_head
        )
        nxt = int(np.argmax(np.asarray(logits[0, -1]) + suppress))
        tokens.append(nxt)
        if nxt == layout.eot:
            break
    got = np.asarray(res.tokens[0, : len(tokens)])
    assert list(got) == tokens


def test_decode_batch_consistency(params, enc_out):
    single = _decode(params, enc_out, max_new=8, batch=1)
    batched = _decode(params, enc_out, max_new=8, batch=4)
    for row in range(4):
        assert np.array_equal(
            np.asarray(batched.tokens[row]), np.asarray(single.tokens[0])
        )
        assert int(batched.lengths[row]) == int(single.lengths[0])


def test_max_new_tokens_budget(params, enc_out):
    res = _decode(params, enc_out, max_new=5)
    p_len = len(W.build_prompt(CFG, "en"))
    assert int(res.lengths[0]) <= p_len + 5


def test_detect_language_distribution(params, enc_out):
    probs = W.detect_language(params, enc_out, CFG, CFG.n_text_head)
    layout = W.token_layout(CFG.n_vocab)
    assert probs.shape == (1, layout.n_langs)
    assert abs(float(probs.sum()) - 1.0) < 1e-4


def test_token_layout_v2_and_v3():
    v2 = W.token_layout(51865)
    assert (v2.eot, v2.sot) == (50257, 50258)
    assert v2.n_langs == 99
    assert v2.transcribe == 50359
    assert v2.translate == 50358
    assert v2.no_speech == 50362
    assert v2.no_timestamps == 50363
    assert v2.timestamp_begin == 50364
    v3 = W.token_layout(51866)
    assert v3.n_langs == 100
    assert v3.transcribe == 50360
    assert v3.timestamp_begin == 50365


def test_build_prompt(params):
    layout = W.token_layout(CFG.n_vocab)
    p = W.build_prompt(CFG, "ko", task="translate", without_timestamps=True)
    assert p[0] == layout.sot
    assert p[1] == layout.lang_begin + W.WHISPER_LANG_CODES.index("ko")
    assert p[2] == layout.translate
    assert p[3] == layout.no_timestamps
    # unknown language falls back to en
    p2 = W.build_prompt(CFG, "zz")
    assert p2[1] == layout.lang_begin + W.WHISPER_LANG_CODES.index("en")


def test_get_config_aliases():
    assert W.get_config("whisper-small").name == "small"
    assert W.get_config("large-v3").n_mels == 128
    assert W.get_config("tiny.en").name == "tiny"
    with pytest.raises(ValueError):
        W.get_config("enormous")


def test_decoder_forward_shapes(params, enc_out):
    tokens = jnp.asarray([[50258, 50259, 50359, 50363, 100, 200]], jnp.int32)
    logits = W.decoder_forward(params, tokens, enc_out, CFG.n_text_head)
    assert logits.shape == (1, 6, CFG.n_vocab)


# -- beam search --------------------------------------------------------------


def test_beam_k1_matches_greedy():
    """beam_size=1 must reduce exactly to greedy decoding."""
    import jax.numpy as jnp
    from stt_tpu.models.whisper import (
        beam_decode, encode, get_config, greedy_decode, init_kv_cache,
        init_params,
    )
    import numpy as np

    config = get_config("tiny")
    params = init_params(config, seed=3)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.normal(0, 1, (2, config.n_mels, 100)), jnp.float32)
    enc = encode(params, mel, config.n_audio_head)
    prompt = jnp.asarray(
        np.tile([50258, 50259, 50359, 50363], (2, 1)).astype(np.int32)
    )
    plen = jnp.full((2,), 4, jnp.int32)

    g_cache = init_kv_cache(config, 2, 24)
    g = greedy_decode(params, enc, prompt, plen, g_cache, config,
                      config.n_text_head, 16)
    b_cache = init_kv_cache(config, 2, 24)
    b = beam_decode(params, enc, prompt, plen, b_cache, config,
                    config.n_text_head, 16, beam_size=1)
    np.testing.assert_array_equal(np.asarray(g.tokens), np.asarray(b.tokens))
    np.testing.assert_array_equal(np.asarray(g.lengths), np.asarray(b.lengths))


def test_beam_score_not_worse_than_greedy():
    """The selected beam's sum-logprob must be >= greedy's (same budget)."""
    import jax.numpy as jnp
    from stt_tpu.models.whisper import (
        beam_decode, encode, get_config, greedy_decode, init_kv_cache,
        init_params,
    )
    import numpy as np

    config = get_config("tiny")
    params = init_params(config, seed=11)
    rng = np.random.default_rng(11)
    mel = jnp.asarray(rng.normal(0, 1, (1, config.n_mels, 100)), jnp.float32)
    enc = encode(params, mel, config.n_audio_head)
    prompt = jnp.asarray([[50258, 50259, 50359, 50363]], jnp.int32)
    plen = jnp.full((1,), 4, jnp.int32)

    g = greedy_decode(params, enc, prompt, plen,
                      init_kv_cache(config, 1, 20), config,
                      config.n_text_head, 12)
    b = beam_decode(params, enc, prompt, plen,
                    init_kv_cache(config, 3, 20), config,
                    config.n_text_head, 12, beam_size=3)
    g_len = max(1, int(g.lengths[0]) - 4)
    b_len = max(1, int(b.lengths[0]) - 4)
    assert float(b.sum_logprob[0]) / b_len >= float(g.sum_logprob[0]) / g_len - 1e-4


def test_beam_batch_rows_independent():
    """Each batch row's beam search is independent of its neighbors."""
    import jax.numpy as jnp
    from stt_tpu.models.whisper import (
        beam_decode, encode, get_config, init_kv_cache, init_params,
    )
    import numpy as np

    config = get_config("tiny")
    params = init_params(config, seed=5)
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.normal(0, 1, (2, config.n_mels, 100)), jnp.float32)
    enc = encode(params, mel, config.n_audio_head)
    prompt = jnp.asarray(
        np.tile([50258, 50259, 50359, 50363], (2, 1)).astype(np.int32)
    )
    plen = jnp.full((2,), 4, jnp.int32)
    both = beam_decode(params, enc, prompt, plen,
                       init_kv_cache(config, 4, 20), config,
                       config.n_text_head, 12, beam_size=2)
    solo = beam_decode(params, enc[:1], prompt[:1], plen[:1],
                       init_kv_cache(config, 2, 20), config,
                       config.n_text_head, 12, beam_size=2)
    np.testing.assert_array_equal(
        np.asarray(both.tokens)[0], np.asarray(solo.tokens)[0]
    )


# -- timestamp decoding ---------------------------------------------------------


def _ts_setup(seed=21):
    import jax.numpy as jnp
    import numpy as np
    from stt_tpu.models.whisper import (
        encode, get_config, init_kv_cache, init_params, token_layout,
    )

    config = get_config("test")
    layout = token_layout(config.n_vocab)
    params = init_params(config, seed=seed)
    rng = np.random.default_rng(seed)
    mel = jnp.asarray(rng.normal(0, 1, (2, config.n_mels, 100)), jnp.float32)
    enc = encode(params, mel, config.n_audio_head)
    # timestamp-mode prompt: [sot, lang, task] (NO no_timestamps token)
    prompt = jnp.asarray(
        np.tile([layout.sot, layout.lang_begin, layout.transcribe], (2, 1))
        .astype(np.int32)
    )
    return config, layout, params, enc, prompt


def test_timestamp_decode_obeys_grammar():
    import numpy as np
    from stt_tpu.models.whisper import (
        greedy_decode_timestamps, init_kv_cache,
    )

    config, layout, params, enc, prompt = _ts_setup()
    cache = init_kv_cache(config, 2, 40)
    import jax.numpy as jnp
    res = greedy_decode_timestamps(
        params, enc, prompt, jnp.full((2,), 3, jnp.int32), cache,
        config, config.n_text_head, max_new_tokens=30,
    )
    toks = np.asarray(res.tokens)
    ts_begin = layout.timestamp_begin
    for row in range(2):
        gen = [int(t) for t in toks[row, 3:int(res.lengths[row])]]
        assert gen, "no tokens generated"
        # first generated token is a timestamp within the 1s initial cap
        assert gen[0] >= ts_begin
        assert gen[0] <= ts_begin + 50
        # monotonic timestamps; never three in a row
        ts_seen = [t for t in gen if t >= ts_begin]
        assert ts_seen == sorted(ts_seen)
        run = 0
        for t in gen:
            run = run + 1 if t >= ts_begin else 0
            assert run <= 2


def test_timestamp_initial_lone_ts_followed_by_text():
    """openai convention: with <2 generated tokens the penultimate counts
    as a timestamp, so the forced initial <|t|> is followed by TEXT —
    never forced into an immediate pair."""
    import numpy as np
    import jax.numpy as jnp
    from stt_tpu.models.whisper import greedy_decode_timestamps, init_kv_cache

    config, layout, params, enc, prompt = _ts_setup()
    cache = init_kv_cache(config, 2, 40)
    res = greedy_decode_timestamps(
        params, enc, prompt, jnp.full((2,), 3, jnp.int32), cache,
        config, config.n_text_head, max_new_tokens=30,
    )
    toks = np.asarray(res.tokens)
    ts_begin = layout.timestamp_begin
    for row in range(2):
        gen = [int(t) for t in toks[row, 3:int(res.lengths[row])]]
        assert gen[0] >= ts_begin
        if len(gen) > 1:
            assert gen[1] < ts_begin, (
                "second generated token must be text/eot, not a timestamp"
            )


def test_beam_timestamp_grammar():
    """beam search with with_timestamps=True obeys the same timestamp
    grammar as the greedy timestamp decoder (VERDICT: accurate profile +
    timestamps must not silently downgrade to greedy)."""
    import numpy as np
    import jax.numpy as jnp
    from stt_tpu.models.whisper import beam_decode, init_kv_cache

    config, layout, params, enc, prompt = _ts_setup()
    k = 2
    cache = init_kv_cache(config, 2 * k, 40)
    res = beam_decode(
        params, enc, prompt, jnp.full((2,), 3, jnp.int32), cache,
        config, config.n_text_head, max_new_tokens=30, beam_size=k,
        with_timestamps=True,
    )
    toks = np.asarray(res.tokens)
    ts_begin = layout.timestamp_begin
    for row in range(2):
        gen = [int(t) for t in toks[row, 3:int(res.lengths[row])]]
        assert gen, "no tokens generated"
        # first generated token is a timestamp within the 1s initial cap
        assert ts_begin <= gen[0] <= ts_begin + 50
        # monotonic timestamps; never three in a row; lone initial ts
        ts_seen = [t for t in gen if t >= ts_begin]
        assert ts_seen == sorted(ts_seen)
        run = 0
        for t in gen:
            run = run + 1 if t >= ts_begin else 0
            assert run <= 2
        if len(gen) > 1:
            assert gen[1] < ts_begin


def test_beam_pooled_timestamp_grammar():
    """patience > 1 (the pooled beam variant) keeps the timestamp grammar."""
    import numpy as np
    import jax.numpy as jnp
    from stt_tpu.models.whisper import beam_decode, init_kv_cache

    config, layout, params, enc, prompt = _ts_setup(seed=23)
    k = 2
    cache = init_kv_cache(config, 2 * k, 40)
    res = beam_decode(
        params, enc, prompt, jnp.full((2,), 3, jnp.int32), cache,
        config, config.n_text_head, max_new_tokens=30, beam_size=k,
        patience=2.0, with_timestamps=True,
    )
    toks = np.asarray(res.tokens)
    ts_begin = layout.timestamp_begin
    for row in range(2):
        gen = [int(t) for t in toks[row, 3:int(res.lengths[row])]]
        assert gen
        assert gen[0] >= ts_begin
        ts_seen = [t for t in gen if t >= ts_begin]
        assert ts_seen == sorted(ts_seen)
        run = 0
        for t in gen:
            run = run + 1 if t >= ts_begin else 0
            assert run <= 2


def test_no_speech_prob_captured_at_sot_position():
    """whisper reads p(no_speech) from the logits produced AT the sot
    position; with a conditioning prefix ([sot_prev] + tokens) that is
    position len(ctx), not 0 (VERDICT weak #4). Oracle: the teacher-forced
    decoder's softmax at the sot index."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from stt_tpu.models.whisper import (
        decoder_forward, encode, get_config, greedy_decode, init_kv_cache,
        init_params, token_layout,
    )

    config = get_config("test")
    layout = token_layout(config.n_vocab)
    params = init_params(config, seed=9)
    rng = np.random.default_rng(9)
    mel = jnp.asarray(rng.normal(0, 1, (1, config.n_mels, 100)), jnp.float32)
    enc = encode(params, mel, config.n_audio_head)
    # conditioned prompt: [sot_prev, ctx_tok, sot, lang, task, no_ts]
    prompt = jnp.asarray([[
        layout.sot_prev, 123, layout.sot, layout.lang_begin,
        layout.transcribe, layout.no_timestamps,
    ]], jnp.int32)
    plen = jnp.full((1,), 6, jnp.int32)
    sot_pos = 2

    oracle_logits = decoder_forward(params, prompt, enc, config.n_text_head)
    expected = jax.nn.softmax(oracle_logits[:, sot_pos], axis=-1)[
        :, layout.no_speech
    ]
    wrong_pos = jax.nn.softmax(oracle_logits[:, 0], axis=-1)[
        :, layout.no_speech
    ]

    res = greedy_decode(
        params, enc, prompt, plen, init_kv_cache(config, 1, 24), config,
        config.n_text_head, 12, sot_pos=jnp.int32(sot_pos),
    )
    np.testing.assert_allclose(
        np.asarray(res.no_speech_prob), np.asarray(expected), atol=1e-4
    )
    # the two positions genuinely differ on this model — the old hardcoded
    # i == 0 capture would have returned wrong_pos
    assert abs(float(expected[0]) - float(wrong_pos[0])) > 1e-9


def test_split_timestamp_segments():
    from stt_tpu.models.whisper import (
        get_config, split_timestamp_segments, token_layout,
    )

    config = get_config("test")
    layout = token_layout(config.n_vocab)
    tb = layout.timestamp_begin
    # <|0.00|> hello(10,11) <|1.00|><|1.00|> world(12) <|2.00|> eot
    seq = [tb + 0, 10, 11, tb + 50, tb + 50, 12, tb + 100, layout.eot]
    segs = split_timestamp_segments(seq, config, duration=5.0)
    assert segs == [(0.0, 1.0, [10, 11]), (1.0, 2.0, [12])]
    # open trailing segment closes at the audio duration
    seq2 = [tb + 0, 10, layout.eot]
    assert split_timestamp_segments(seq2, config, 3.0) == [(0.0, 3.0, [10])]
    # bare text with no timestamps at all
    assert split_timestamp_segments([10, 11, layout.eot], config, 2.0) == [
        (0.0, 2.0, [10, 11])
    ]


def test_beam_patience_pooled_path():
    """patience > 1 routes through the candidate-pool beam search: the
    result stays well-formed, deterministic, and batch-row independent."""
    import jax.numpy as jnp
    import numpy as np
    from stt_tpu.models.whisper import (
        beam_decode, encode, get_config, init_kv_cache, init_params,
    )

    config = get_config("test")
    params = init_params(config, seed=6)
    rng = np.random.default_rng(6)
    mel = jnp.asarray(rng.normal(0, 1, (2, config.n_mels, 100)), jnp.float32)
    enc = encode(params, mel, config.n_audio_head)
    prompt = jnp.asarray(
        np.tile([50258, 50259, 50359, 50363], (2, 1)).astype(np.int32)
    )
    plen = jnp.full((2,), 4, jnp.int32)

    kwargs = dict(config=config, n_head=config.n_text_head,
                  max_new_tokens=12, beam_size=2)
    p2a = beam_decode(params, enc, prompt, plen,
                      init_kv_cache(config, 4, 20), patience=2.0, **kwargs)
    p2b = beam_decode(params, enc, prompt, plen,
                      init_kv_cache(config, 4, 20), patience=2.0, **kwargs)
    np.testing.assert_array_equal(np.asarray(p2a.tokens),
                                  np.asarray(p2b.tokens))
    assert p2a.tokens.shape == (2, 20)
    lens = np.asarray(p2a.lengths)
    assert ((lens >= 4) & (lens <= 20)).all()
    assert np.isfinite(np.asarray(p2a.sum_logprob)).all()

    # batch-row independence holds in the pooled variant too
    solo = beam_decode(params, enc[:1], prompt[:1], plen[:1],
                       init_kv_cache(config, 2, 20), patience=2.0, **kwargs)
    np.testing.assert_array_equal(
        np.asarray(p2a.tokens)[0], np.asarray(solo.tokens)[0]
    )

    # patience=1.0 still uses the frozen-slot algorithm (same entry point)
    p1 = beam_decode(params, enc, prompt, plen,
                     init_kv_cache(config, 4, 20), patience=1.0, **kwargs)
    assert p1.tokens.shape == (2, 20)


def test_beam_patience_banks_finished_candidates():
    """Force eot early (bias the decoder token embedding toward eot) so
    the pool actually banks finished hypotheses: the winner must then be
    an eot-terminated sequence shorter than the step limit."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from stt_tpu.models.whisper import (
        beam_decode, encode, get_config, init_kv_cache, init_params,
        token_layout,
    )

    config = get_config("test")
    params = init_params(config, seed=7)
    layout = token_layout(config.n_vocab)
    # zero the final layernorm gain and point its bias at the (scaled)
    # eot embedding: the decoder's final hidden state becomes that
    # constant, so eot is the argmax logit at every step
    tok = np.array(params["decoder"]["tok"])  # writable copy
    tok[layout.eot] *= 10.0
    params = dict(params)
    params["decoder"] = dict(params["decoder"])
    params["decoder"]["tok"] = jnp.asarray(tok)
    params["decoder"]["ln"] = {
        "g": jnp.zeros_like(params["decoder"]["ln"]["g"]),
        "b": jnp.asarray(tok[layout.eot]),
    }

    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.normal(0, 1, (1, config.n_mels, 100)), jnp.float32)
    enc = encode(params, mel, config.n_audio_head)
    prompt = jnp.asarray(np.array([[50258, 50259, 50359, 50363]], np.int32))
    plen = jnp.full((1,), 4, jnp.int32)
    out = beam_decode(params, enc, prompt, plen,
                      init_kv_cache(config, 2, 40), config,
                      config.n_text_head, 30, beam_size=2, patience=2.0)
    length = int(np.asarray(out.lengths)[0])
    toks = np.asarray(out.tokens)[0]
    assert length < 34  # finished before exhausting the budget
    assert toks[length] == layout.eot


def test_length_penalty_changes_ranking_only():
    """length_penalty renormalizes final scores (CT2 semantics): with a
    single beam candidate the winning tokens are unchanged; the exponent
    must still be accepted by both beam variants."""
    import jax.numpy as jnp
    import numpy as np
    from stt_tpu.models.whisper import (
        beam_decode, encode, get_config, init_kv_cache, init_params,
    )

    config = get_config("test")
    params = init_params(config, seed=8)
    rng = np.random.default_rng(8)
    mel = jnp.asarray(rng.normal(0, 1, (1, config.n_mels, 100)), jnp.float32)
    enc = encode(params, mel, config.n_audio_head)
    prompt = jnp.asarray(np.array([[50258, 50259, 50359, 50363]], np.int32))
    plen = jnp.full((1,), 4, jnp.int32)
    kwargs = dict(config=config, n_head=config.n_text_head,
                  max_new_tokens=10, beam_size=2)
    base = beam_decode(params, enc, prompt, plen,
                       init_kv_cache(config, 2, 20), **kwargs)
    pen = beam_decode(params, enc, prompt, plen,
                      init_kv_cache(config, 2, 20),
                      length_penalty=0.5, **kwargs)
    assert pen.tokens.shape == base.tokens.shape
    pooled = beam_decode(params, enc, prompt, plen,
                         init_kv_cache(config, 2, 20),
                         patience=2.0, length_penalty=0.5, **kwargs)
    assert pooled.tokens.shape == base.tokens.shape


def test_suppress_blank_blocks_first_step_eot():
    """With weights rigged so eot is always argmax: suppress_blank=True
    forbids finishing at the first generated position (faster_whisper
    semantics), suppress_blank=False allows the empty decode."""
    import jax.numpy as jnp
    import numpy as np
    from stt_tpu.models.whisper import (
        encode, get_config, greedy_decode, init_kv_cache, init_params,
        token_layout,
    )

    config = get_config("test")
    params = init_params(config, seed=9)
    layout = token_layout(config.n_vocab)
    tok = np.array(params["decoder"]["tok"])
    tok[layout.eot] *= 10.0
    params = dict(params)
    params["decoder"] = dict(params["decoder"])
    params["decoder"]["tok"] = jnp.asarray(tok)
    params["decoder"]["ln"] = {
        "g": jnp.zeros_like(params["decoder"]["ln"]["g"]),
        "b": jnp.asarray(tok[layout.eot]),
    }

    rng = np.random.default_rng(9)
    mel = jnp.asarray(rng.normal(0, 1, (1, config.n_mels, 100)), jnp.float32)
    enc = encode(params, mel, config.n_audio_head)
    prompt = jnp.asarray(np.array([[50258, 50259, 50359, 50363]], np.int32))
    plen = jnp.full((1,), 4, jnp.int32)

    allowed = greedy_decode(params, enc, prompt, plen,
                            init_kv_cache(config, 1, 16), config,
                            config.n_text_head, 8, suppress_blank=False)
    assert int(allowed.lengths[0]) == 4  # immediate eot = empty decode

    blocked = greedy_decode(params, enc, prompt, plen,
                            init_kv_cache(config, 1, 16), config,
                            config.n_text_head, 8, suppress_blank=True)
    toks = np.asarray(blocked.tokens)[0]
    assert toks[4] != layout.eot          # first step forced off eot
    assert int(blocked.lengths[0]) == 5   # eot allowed from step two


def test_repetition_penalty_discourages_repeats():
    """Weights rigged so one text token is always argmax: with
    repetition_penalty the second step must pick a different token;
    without it the token repeats."""
    import jax.numpy as jnp
    import numpy as np
    from stt_tpu.models.whisper import (
        encode, get_config, greedy_decode, init_kv_cache, init_params,
    )

    config = get_config("test")
    params = init_params(config, seed=10)
    fav = 42  # arbitrary text token
    tok = np.array(params["decoder"]["tok"])
    tok[fav] *= 10.0
    params = dict(params)
    params["decoder"] = dict(params["decoder"])
    params["decoder"]["tok"] = jnp.asarray(tok)
    params["decoder"]["ln"] = {
        "g": jnp.zeros_like(params["decoder"]["ln"]["g"]),
        "b": jnp.asarray(tok[fav]),
    }

    rng = np.random.default_rng(10)
    mel = jnp.asarray(rng.normal(0, 1, (1, config.n_mels, 100)), jnp.float32)
    enc = encode(params, mel, config.n_audio_head)
    prompt = jnp.asarray(np.array([[50258, 50259, 50359, 50363]], np.int32))
    plen = jnp.full((1,), 4, jnp.int32)

    plain = greedy_decode(params, enc, prompt, plen,
                          init_kv_cache(config, 1, 12), config,
                          config.n_text_head, 6)
    t_plain = np.asarray(plain.tokens)[0, 4:7]
    assert (t_plain == fav).all()  # repeats unchecked

    pen = greedy_decode(params, enc, prompt, plen,
                        init_kv_cache(config, 1, 12), config,
                        config.n_text_head, 6,
                        rep_penalty=jnp.asarray([50.0], jnp.float32))
    t_pen = np.asarray(pen.tokens)[0, 4:7]
    assert t_pen[0] == fav          # first occurrence unpenalized
    assert t_pen[1] != fav          # second occurrence suppressed


def test_no_repeat_ngram_blocks_bigram_loop():
    """Weights rigged to loop one token forever: no_repeat_ngram_size=2
    must ban repeating the (tok, tok) bigram, breaking the loop."""
    import jax.numpy as jnp
    import numpy as np
    from stt_tpu.models.whisper import (
        encode, get_config, greedy_decode, init_kv_cache, init_params,
    )

    config = get_config("test")
    params = init_params(config, seed=12)
    fav = 77
    tok = np.array(params["decoder"]["tok"])
    tok[fav] *= 10.0
    params = dict(params)
    params["decoder"] = dict(params["decoder"])
    params["decoder"]["tok"] = jnp.asarray(tok)
    params["decoder"]["ln"] = {
        "g": jnp.zeros_like(params["decoder"]["ln"]["g"]),
        "b": jnp.asarray(tok[fav]),
    }

    rng = np.random.default_rng(12)
    mel = jnp.asarray(rng.normal(0, 1, (1, config.n_mels, 100)), jnp.float32)
    enc = encode(params, mel, config.n_audio_head)
    prompt = jnp.asarray(np.array([[50258, 50259, 50359, 50363]], np.int32))
    plen = jnp.full((1,), 4, jnp.int32)

    plain = greedy_decode(params, enc, prompt, plen,
                          init_kv_cache(config, 1, 16), config,
                          config.n_text_head, 8)
    t_plain = np.asarray(plain.tokens)[0, 4:10]
    assert (t_plain == fav).all()  # the unconstrained loop

    banned = greedy_decode(params, enc, prompt, plen,
                           init_kv_cache(config, 1, 16), config,
                           config.n_text_head, 8, ngram_n=2)
    t_ban = np.asarray(banned.tokens)[0, 4:10]
    # fav fav establishes the bigram (fav, fav); after that, a third
    # consecutive fav would repeat it and must be banned
    assert t_ban[0] == fav and t_ban[1] == fav
    assert t_ban[2] != fav


# -- reduced-decoder family (large-v3-turbo / distil-whisper) ----------------


def test_reduced_decoder_presets_resolve():
    turbo = W.get_config("large-v3-turbo")
    assert (turbo.n_audio_layer, turbo.n_text_layer) == (32, 4)
    assert turbo.n_mels == 128 and turbo.n_vocab == 51866
    assert W.get_config("turbo").n_text_layer == 4
    assert W.get_config("whisper-large-v3-turbo").n_text_layer == 4
    d3 = W.get_config("distil-large-v3")
    assert (d3.n_audio_layer, d3.n_text_layer, d3.n_mels) == (32, 2, 128)
    d2 = W.get_config("distil-large-v2")
    assert (d2.n_audio_layer, d2.n_text_layer, d2.n_vocab) == (32, 2, 51865)


def test_asymmetric_layer_stacks_decode():
    """Encoder and decoder depths differ in the turbo/distil family —
    init/encode/decode must honor the per-stack layer counts."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG, name="test-turbo", n_audio_layer=3, n_text_layer=1
    )
    params = W.init_params(cfg, seed=7)
    assert params["encoder"]["blocks"]["attn"]["q"]["w"].shape[0] == 3
    assert params["decoder"]["blocks"]["attn"]["q"]["w"].shape[0] == 1
    audio = (0.1 * RNG.standard_normal(16000)).astype(np.float32)
    mel = log_mel_spectrogram(jnp.asarray(audio))[None]
    enc = W.encode(params, mel, cfg.n_audio_head)
    prompt = np.array([W.build_prompt(cfg, "en")], np.int32)
    cache = W.init_kv_cache(cfg, 1, 48)
    tokens, lengths, *_ = W.greedy_decode(
        params, enc, jnp.asarray(prompt),
        jnp.full((1,), prompt.shape[1], jnp.int32),
        cache, cfg, cfg.n_text_head, max_new_tokens=6,
    )
    assert int(lengths[0]) >= 1  # produced tokens without shape errors

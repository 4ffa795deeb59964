"""Tokenizer tests: BPE correctness on a handcrafted vocab + fallback."""

import json

from stt_tpu.models.tokenizer import (
    BPETokenizer,
    FallbackTokenizer,
    load_tokenizer,
)


def make_bpe_dir(tmp_path):
    # minimal byte-level BPE: merges build "he", "ll", "hell", "hello"
    vocab = {}
    # single printable bytes map to themselves in the GPT-2 byte-unicode map
    for i, ch in enumerate("helo wrd!"):
        vocab[ch if ch != " " else "Ġ"] = i  # Ġ = 'Ġ' (space marker)
    vocab.update({"he": 20, "ll": 21, "hell": 22, "hello": 23, "Ġw": 24})
    merges = ["h e", "l l", "he ll", "hell o", "Ġ w"]
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges))
    return tmp_path


def test_bpe_encode_decode_roundtrip(tmp_path):
    tok = BPETokenizer.from_dir(str(make_bpe_dir(tmp_path)), 51865)
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"
    # merges actually applied: "hello" is one token
    assert ids[0] == 23


def test_bpe_decode_skips_specials(tmp_path):
    tok = BPETokenizer.from_dir(str(make_bpe_dir(tmp_path)), 51865)
    ids = tok.encode("hello") + [50257, 50258, 50364]
    assert tok.decode(ids) == "hello"


def test_fallback_deterministic_words():
    tok = FallbackTokenizer(51865)
    a = tok.decode([1000, 2000, 3000])
    b = tok.decode([1000, 2000, 3000])
    assert a == b
    assert len(a.split()) == 3  # space-prefixed pseudo-words


def test_fallback_skips_specials_and_bytes_roundtrip():
    tok = FallbackTokenizer(51865)
    assert tok.decode([50258, 50359, 50363, 50257]) == ""
    ids = tok.encode("hi!")
    assert tok.decode(ids) == "hi!"


def test_fallback_distinct_tokens_distinct_words():
    tok = FallbackTokenizer(51865)
    words = {tok.decode([t]) for t in range(300, 1400, 7)}
    assert len(words) > 140  # near-unique mapping


def test_load_tokenizer_fallback_when_missing(tmp_path):
    tok = load_tokenizer(str(tmp_path), 51865)
    assert isinstance(tok, FallbackTokenizer)
    tok2 = load_tokenizer(None, 51866)
    assert tok2.layout.n_langs == 100


def test_load_tokenizer_bpe_when_present(tmp_path):
    make_bpe_dir(tmp_path)
    tok = load_tokenizer(str(tmp_path), 51865)
    assert isinstance(tok, BPETokenizer)


# -- tiktoken rank tables (openai-whisper assets format) -----------------------


def make_tiktoken_file(tmp_path):
    """A valid rank table: all 256 single bytes (BPE base alphabet), one
    real merge (b'he'), and filler multi-byte tokens up to 50257 entries
    so the special-token ids land exactly at whisper's layout."""
    import base64

    lines = []
    rank = 0
    for b in range(256):
        lines.append(b"%s %d" % (base64.b64encode(bytes([b])), rank))
        rank += 1
    lines.append(b"%s %d" % (base64.b64encode(b"he"), rank))
    he_id = rank
    rank += 1
    while rank < 50257:
        filler = b"\x00\x00" + rank.to_bytes(4, "big")
        lines.append(b"%s %d" % (base64.b64encode(filler), rank))
        rank += 1
    path = tmp_path / "multilingual.tiktoken"
    path.write_bytes(b"\n".join(lines) + b"\n")
    return str(path), he_id


def test_tiktoken_loader_roundtrip_and_merges(tmp_path):
    from stt_tpu.models.tokenizer import TiktokenTokenizer

    path, he_id = make_tiktoken_file(tmp_path)
    tok = TiktokenTokenizer(path, 51865)
    ids = tok.encode(" hello world!")
    assert tok.decode(ids) == " hello world!"
    # the rank table's merge is applied: "he" encodes as ONE token
    assert he_id in tok.encode("hello")
    # specials/timestamps filtered on decode
    assert tok.decode(ids + [50257, 50258, 50364]) == " hello world!"


def test_load_tokenizer_finds_tiktoken_in_dir(tmp_path):
    from stt_tpu.models.tokenizer import TiktokenTokenizer

    make_tiktoken_file(tmp_path)
    tok = load_tokenizer(str(tmp_path), 51865)
    assert isinstance(tok, TiktokenTokenizer)
    # direct file path works too
    tok2 = load_tokenizer(str(tmp_path / "multilingual.tiktoken"), 51865)
    assert isinstance(tok2, TiktokenTokenizer)


# -- HF fast format (tokenizer.json) -------------------------------------------


def make_hf_tokenizer_json(tmp_path):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        special_tokens=[],
    )
    tok.train_from_iterator(
        [" hello world", " the quick brown fox", " hello there"], trainer
    )
    path = tmp_path / "tokenizer.json"
    tok.save(str(path))
    return str(path)


def test_hf_tokenizer_json_roundtrip(tmp_path):
    from stt_tpu.models.tokenizer import HFTokenizer

    path = make_hf_tokenizer_json(tmp_path)
    tok = HFTokenizer(path, 51865)
    ids = tok.encode(" hello world")
    assert tok.decode(ids) == " hello world"
    assert tok.decode(ids + [50257, 50363]) == " hello world"


def test_load_tokenizer_prefers_hf_fast_format(tmp_path):
    """Precedence in a checkpoint dir: tokenizer.json wins over
    vocab.json/merges.txt and tiktoken tables."""
    from stt_tpu.models.tokenizer import HFTokenizer

    make_bpe_dir(tmp_path)
    make_tiktoken_file(tmp_path)
    make_hf_tokenizer_json(tmp_path)
    tok = load_tokenizer(str(tmp_path), 51865)
    assert isinstance(tok, HFTokenizer)


def test_load_tokenizer_corrupt_file_falls_back(tmp_path):
    (tmp_path / "tokenizer.json").write_text("{not json")
    tok = load_tokenizer(str(tmp_path), 51865)
    assert isinstance(tok, FallbackTokenizer)


def test_require_real_hard_fails_without_vocab(tmp_path, monkeypatch):
    """Real weights + no vocab must raise at load, not warn (a production
    misconfiguration would otherwise serve confidently wrong text)."""
    import pytest

    monkeypatch.delenv("STT_ALLOW_FALLBACK_TOKENIZER", raising=False)
    with pytest.raises(FileNotFoundError):
        load_tokenizer(str(tmp_path), 51865, require_real=True)
    # corrupt vocab with require_real also raises (not silently fallback)
    (tmp_path / "tokenizer.json").write_text("{not json")
    with pytest.raises(Exception):
        load_tokenizer(str(tmp_path), 51865, require_real=True)


def test_require_real_env_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("STT_ALLOW_FALLBACK_TOKENIZER", "1")
    tok = load_tokenizer(str(tmp_path), 51865, require_real=True)
    assert isinstance(tok, FallbackTokenizer)


def test_engine_hard_fails_real_weights_no_vocab(tmp_path, monkeypatch):
    """The engine ctor surfaces the tokenizer hard-fail when weights_path
    is set and the checkpoint dir carries no vocab files."""
    import pytest

    from stt_tpu.models.whisper import get_config, init_params
    from stt_tpu.parallel.checkpoint import export_hf_safetensors
    from stt_tpu.engine.engine import WhisperEngine

    monkeypatch.delenv("STT_ALLOW_FALLBACK_TOKENIZER", raising=False)
    config = get_config("test")
    params = init_params(config, seed=1)
    ckpt = tmp_path / "ckpt"
    export_hf_safetensors(str(ckpt), params, config)
    with pytest.raises(FileNotFoundError):
        WhisperEngine(
            "test", device="cpu", compute_type="float32",
            weights_path=str(ckpt),
        )


def test_engine_uses_weights_dir_for_tokenizer(tmp_path):
    """A checkpoint dir with tokenizer files yields a REAL tokenizer even
    when tokenizer_path is not given (HF checkpoints ship both)."""
    from stt_tpu.models.tokenizer import HFTokenizer
    from stt_tpu.models.whisper import get_config, init_params
    from stt_tpu.parallel.checkpoint import export_hf_safetensors
    from stt_tpu.engine.engine import WhisperEngine

    config = get_config("test")
    params = init_params(config, seed=1)
    ckpt = tmp_path / "ckpt"
    export_hf_safetensors(str(ckpt), params, config)
    make_hf_tokenizer_json(ckpt)
    eng = WhisperEngine(
        "test", device="cpu", compute_type="float32",
        weights_path=str(ckpt),
    )
    assert isinstance(eng.tokenizer, HFTokenizer)
    eng.close()

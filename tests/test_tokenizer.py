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

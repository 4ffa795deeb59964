"""Whisper text tokenizer: byte-level BPE with a hermetic fallback.

Real checkpoints pair with a GPT-2-style byte-level BPE (``vocab.json`` +
``merges.txt`` in an HF tokenizer directory). In a zero-egress build those
files may be absent, so :class:`FallbackTokenizer` provides a deterministic
id<->text mapping good enough for every control-plane behavior the server
tests (commit/unstable prefix logic, transcript plumbing, logging): ids map
to stable pseudo-words, so equal token ids always produce equal text.

The reference delegates tokenization to its backends (faster-whisper /
openai-whisper internals); here it is first-party because the decode loop is
first-party.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Dict, List, Optional, Sequence

from .whisper import TokenLayout, token_layout


@lru_cache()
def _byte_unicode_map() -> Dict[int, str]:
    """GPT-2's reversible bytes<->unicode mapping."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class BPETokenizer:
    """Byte-level BPE over a local vocab.json + merges.txt pair."""

    def __init__(self, vocab: Dict[str, int], merges: List[tuple], n_vocab: int):
        self.layout: TokenLayout = token_layout(n_vocab)
        self._encoder = vocab
        self._decoder = {v: k for k, v in vocab.items()}
        self._bpe_ranks = {pair: i for i, pair in enumerate(merges)}
        b2u = _byte_unicode_map()
        self._b2u = b2u
        self._u2b = {u: b for b, u in b2u.items()}
        self._cache: Dict[str, List[str]] = {}

    @classmethod
    def from_dir(cls, path: str, n_vocab: int) -> "BPETokenizer":
        with open(os.path.join(path, "vocab.json"), encoding="utf-8") as f:
            vocab = json.load(f)
        merges: List[tuple] = []
        merges_path = os.path.join(path, "merges.txt")
        with open(merges_path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#version"):
                    continue
                a, _, b = line.partition(" ")
                merges.append((a, b))
        return cls(vocab, merges, n_vocab)

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = list(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self._bpe_ranks.get(p, float("inf")))
            if best not in self._bpe_ranks:
                break
            merged: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and (word[i], word[i + 1]) == best:
                    merged.append(word[i] + word[i + 1])
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        self._cache[token] = word
        return word

    def encode(self, text: str) -> List[int]:
        mapped = "".join(self._b2u[b] for b in text.encode("utf-8"))
        out: List[int] = []
        for piece in self._bpe(mapped):
            if piece in self._encoder:
                out.append(self._encoder[piece])
            else:
                out.extend(self._encoder[c] for c in piece if c in self._encoder)
        return out

    def decode(self, tokens: Sequence[int]) -> str:
        pieces = [
            self._decoder[t]
            for t in tokens
            if t < self.layout.eot and t in self._decoder
        ]
        text = "".join(pieces)
        data = bytes(self._u2b[c] for c in text if c in self._u2b)
        return data.decode("utf-8", errors="replace")


_CONSONANTS = "bcdfghjklmnpqrstvwz"
_VOWELS = "aeiou"


class FallbackTokenizer:
    """Deterministic id<->pseudo-text mapping for weight-free operation.

    Non-special ids render as stable space-prefixed syllable words (so the
    committed/unstable transcript machinery sees realistic word boundaries);
    encode() maps bytes onto low ids, making encode(decode(x)) stable for
    the byte range.
    """

    def __init__(self, n_vocab: int):
        self.layout: TokenLayout = token_layout(n_vocab)

    def _word(self, token: int) -> str:
        syllables = []
        value = token
        for _ in range(2 + token % 2):
            c = _CONSONANTS[value % len(_CONSONANTS)]
            value //= len(_CONSONANTS)
            v = _VOWELS[value % len(_VOWELS)]
            value //= len(_VOWELS)
            syllables.append(c + v)
        return " " + "".join(syllables)

    def encode(self, text: str) -> List[int]:
        return [b for b in text.encode("utf-8")]

    def decode(self, tokens: Sequence[int]) -> str:
        parts: List[str] = []
        for t in tokens:
            t = int(t)
            if t >= self.layout.eot:
                continue  # specials/timestamps render as nothing
            if t < 256:
                try:
                    parts.append(bytes([t]).decode("latin-1"))
                except ValueError:  # pragma: no cover
                    continue
            else:
                parts.append(self._word(t))
        return "".join(parts)


def load_tokenizer(path: Optional[str], n_vocab: int):
    """BPE tokenizer from a local dir when present, else the fallback."""
    if path and os.path.exists(os.path.join(path, "vocab.json")):
        return BPETokenizer.from_dir(path, n_vocab)
    return FallbackTokenizer(n_vocab)


__all__ = ["BPETokenizer", "FallbackTokenizer", "load_tokenizer"]

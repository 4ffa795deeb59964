"""Word-level timestamps via cross-attention DTW (openai timing.py
semantics; reference ``stt_server/model/backends/torch_whisper.py:78-110``
maps the option, faster_whisper implements the same DTW alignment).

Pipeline (host-side, numpy — the device half is
:func:`stt_tpu.models.whisper.cross_attention_weights`):

1. select the generated TEXT token positions of the sequence,
2. z-normalize each head's attention over the token axis, median-filter
   along the audio axis, average heads -> one (T_text, T_audio) matrix,
3. monotonic DTW over ``-matrix`` -> a token->frame alignment path
   (each audio frame = 0.02 s at the encoder's 50 Hz output),
4. token jump-times -> word boundaries by regrouping byte-level BPE
   pieces on leading spaces (per-token fallback for unsegmented scripts).
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import numpy as np

AUDIO_TIME_PER_FRAME = 0.02  # encoder output: 50 frames/sec


class WordTiming(NamedTuple):
    word: str
    start: float
    end: float


def median_filter(x: np.ndarray, width: int = 7) -> np.ndarray:
    """Median filter along the last axis with edge padding (openai's
    medfilt; width must be odd)."""
    if width <= 1 or x.shape[-1] <= width:
        return x
    half = width // 2
    padded = np.concatenate(
        [x[..., :1].repeat(half, -1), x, x[..., -1:].repeat(half, -1)],
        axis=-1,
    )
    windows = np.lib.stride_tricks.sliding_window_view(padded, width, -1)
    return np.median(windows, axis=-1)


def dtw_path(cost: np.ndarray):
    """Monotonic DTW over a (N, M) cost matrix; steps (1,0), (0,1), (1,1).
    Returns (text_indices, time_indices) of the optimal path."""
    n, m = cost.shape
    acc = np.full((n + 1, m + 1), np.inf, np.float64)
    acc[0, 0] = 0.0
    trace = np.zeros((n + 1, m + 1), np.int8)
    for i in range(1, n + 1):
        row_cost = cost[i - 1]
        for j in range(1, m + 1):
            c0 = acc[i - 1, j - 1]
            c1 = acc[i - 1, j]
            c2 = acc[i, j - 1]
            if c0 <= c1 and c0 <= c2:
                acc[i, j] = c0 + row_cost[j - 1]
                trace[i, j] = 0
            elif c1 <= c2:
                acc[i, j] = c1 + row_cost[j - 1]
                trace[i, j] = 1
            else:
                acc[i, j] = c2 + row_cost[j - 1]
                trace[i, j] = 2
    i, j = n, m
    text_idx: List[int] = []
    time_idx: List[int] = []
    while i > 0 and j > 0:
        text_idx.append(i - 1)
        time_idx.append(j - 1)
        t = trace[i, j]
        if t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(text_idx[::-1]), np.asarray(time_idx[::-1])


def _token_jump_times(
    matrix: np.ndarray, n_frames: int
) -> np.ndarray:
    """(T_text, T_audio) attention matrix -> per-token start times.

    Returns (T_text + 1,) seconds: entry t is when token t begins; the
    final entry is the end of the last token."""
    text_idx, time_idx = dtw_path(-matrix[:, :n_frames].astype(np.float64))
    n_tokens = matrix.shape[0]
    jumps = np.zeros(n_tokens + 1, np.float64)
    prev_t = -1
    for ti, fi in zip(text_idx, time_idx):
        if ti != prev_t:
            jumps[ti] = fi * AUDIO_TIME_PER_FRAME
            prev_t = ti
    jumps[n_tokens] = (
        (time_idx[-1] + 1) * AUDIO_TIME_PER_FRAME if len(time_idx)
        else n_frames * AUDIO_TIME_PER_FRAME
    )
    # enforce monotonicity (DTW can revisit a token row only forward, but
    # unvisited rows keep 0 — carry forward)
    for t in range(1, n_tokens + 1):
        if jumps[t] < jumps[t - 1]:
            jumps[t] = jumps[t - 1]
    return jumps


def group_word_tokens(
    token_ids: Sequence[int], tokenizer
) -> List[List[int]]:
    """Group byte-level BPE token indices into words: a token whose text
    starts with a space (or an opening punctuation boundary) begins a new
    word. Scripts without spaces fall back to one word per token (openai
    split_tokens_on_unicode behavior for CJK)."""
    groups: List[List[int]] = []
    any_space = False
    for idx, tok in enumerate(token_ids):
        piece = tokenizer.decode([int(tok)])
        starts_word = piece.startswith(" ") or not groups
        if piece.startswith(" "):
            any_space = True
        if starts_word:
            groups.append([idx])
        else:
            groups[-1].append(idx)
    if not any_space and groups:
        # unsegmented script: token-per-word
        return [[i] for g in groups for i in g]
    return groups


def word_alignments(
    weights: np.ndarray,
    token_ids: Sequence[int],
    token_positions: Sequence[int],
    tokenizer,
    duration: float,
    median_width: int = 7,
) -> List[WordTiming]:
    """Align generated text tokens to audio and group into timed words.

    weights: (A, T_seq, T_audio) selected attention heads (flattened
    layersxheads) for ONE sequence. token_ids/token_positions: the text
    tokens and their positions within T_seq. duration: real audio seconds
    (frames beyond it are padding).
    """
    if not len(token_ids):
        return []
    n_frames = max(1, min(
        int(round(duration / AUDIO_TIME_PER_FRAME)), weights.shape[-1]
    ))
    w = weights[:, list(token_positions), :].astype(np.float64)
    mean = w.mean(axis=1, keepdims=True)
    std = w.std(axis=1, keepdims=True) + 1e-9
    w = (w - mean) / std
    w = median_filter(w, median_width)
    matrix = w.mean(axis=0)                       # (T_text, T_audio)
    jumps = _token_jump_times(matrix, n_frames)

    words: List[WordTiming] = []
    for group in group_word_tokens(token_ids, tokenizer):
        text = tokenizer.decode([int(token_ids[i]) for i in group]).strip()
        if not text:
            continue
        start = float(jumps[group[0]])
        end = float(jumps[group[-1] + 1])
        words.append(WordTiming(
            text,
            max(0.0, min(start, duration)),
            max(0.0, min(max(end, start), duration)),
        ))
    return words


__all__ = [
    "AUDIO_TIME_PER_FRAME",
    "WordTiming",
    "dtw_path",
    "group_word_tokens",
    "median_filter",
    "word_alignments",
]

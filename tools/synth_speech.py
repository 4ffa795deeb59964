"""Formant-synthesized English-like speech (Klatt-style source-filter).

The reference validates endpointing on a recorded fixture
(``stt_client/assets/hello.wav``). This build's image has zero egress and
no TTS, so a recorded fixture cannot be obtained; this module synthesizes
the closest physically-motivated substitute: a glottal pulse train driven
through cascaded time-varying formant resonators, with fricative noise,
plosive closures/bursts, word gaps, and a declining pitch contour with
jitter. The result has real speech's temporal and spectral structure
(harmonic voiced segments with moving formants, broadband obstruents,
sub-second intra-utterance pauses) rather than a steady harmonic tone.

Deterministic: same seed -> identical samples. Used by the VAD
endpointing tests (tests/test_vad_speech.py) and the committed fixture
``tests/fixtures/speech_hello.wav`` (regenerate with
``python tools/synth_speech.py tests/fixtures/speech_hello.wav``).
"""

from __future__ import annotations

import argparse
import wave
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

SR = 16000

# Formant targets (Hz): Peterson & Barney-style male averages.
# (F1, F2, F3), voicing in [0,1], relative amplitude.
_PHONES = {
    # vowels
    "AA": ((730, 1090, 2440), 1.0, 1.00),
    "AE": ((660, 1720, 2410), 1.0, 1.00),
    "AH": ((640, 1190, 2390), 1.0, 0.95),
    "EH": ((530, 1840, 2480), 1.0, 0.95),
    "IY": ((270, 2290, 3010), 1.0, 0.85),
    "IH": ((390, 1990, 2550), 1.0, 0.90),
    "OW": ((570, 840, 2410), 1.0, 0.95),
    "UW": ((300, 870, 2240), 1.0, 0.85),
    "ER": ((490, 1350, 1690), 1.0, 0.90),
    # sonorants
    "L": ((360, 1300, 2700), 1.0, 0.65),
    "W": ((300, 610, 2200), 1.0, 0.60),
    "R": ((310, 1060, 1380), 1.0, 0.65),
    "Y": ((270, 2100, 3000), 1.0, 0.60),
    "M": ((250, 1000, 2200), 1.0, 0.50),
    "N": ((250, 1700, 2600), 1.0, 0.50),
    # unvoiced fricatives / aspiration (noise through the cascade)
    "S": ((4500, 6000, 7200), 0.0, 0.30),
    "SH": ((2200, 4200, 6200), 0.0, 0.35),
    "F": ((1400, 3500, 6000), 0.0, 0.15),
    "H": ((600, 1500, 2500), 0.0, 0.20),
    # voiced fricative
    "Z": ((4300, 5800, 7000), 0.5, 0.30),
    "V": ((1000, 2200, 4500), 0.6, 0.25),
    # silence
    "_": ((500, 1500, 2500), 0.0, 0.0),
}

# Plosives: (closure_sec, burst_formants, voiced)
_STOPS = {
    "T": (0.050, (4200, 5500, 7000), False),
    "K": (0.050, (1800, 3000, 4500), False),
    "P": (0.050, (800, 2000, 4000), False),
    "D": (0.025, (4200, 5500, 7000), True),
    "G": (0.025, (1800, 3000, 4500), True),
    "B": (0.025, (800, 2000, 4000), True),
}

Phone = Tuple[str, float]  # (name, duration_sec)

# "hello how are you today" — phone sequence per word.
HELLO_WORDS: List[List[Phone]] = [
    [("H", 0.06), ("EH", 0.09), ("L", 0.07), ("OW", 0.16)],
    [("H", 0.06), ("AA", 0.12), ("UW", 0.08)],
    [("AA", 0.11), ("R", 0.09)],
    [("Y", 0.06), ("UW", 0.16)],
    [("T", 0.0), ("AH", 0.07), ("D", 0.0), ("EH", 0.09), ("IY", 0.13)],
]


@dataclass
class _Seg:
    formants: Tuple[float, float, float]
    voiced: float
    amp: float
    dur: float


def _expand(words: Sequence[Sequence[Phone]], gap_sec: float) -> List[_Seg]:
    segs: List[_Seg] = []
    for wi, word in enumerate(words):
        if wi:
            segs.append(_Seg((500, 1500, 2500), 0.0, 0.0, gap_sec))
        for name, dur in word:
            if name in _STOPS:
                closure, burst_f, voiced = _STOPS[name]
                segs.append(_Seg(burst_f, 0.0, 0.0, closure))  # closure
                segs.append(
                    _Seg(burst_f, 0.3 if voiced else 0.0, 0.45, 0.015)
                )  # burst
            else:
                f, v, a = _PHONES[name]
                segs.append(_Seg(f, v, a, dur))
    return segs


def _resonator_coeffs(freq: float, bw: float):
    """Two-pole resonator (Klatt): y[n] = A x[n] + B y[n-1] + C y[n-2]."""
    r = np.exp(-np.pi * bw / SR)
    c = -(r * r)
    b = 2.0 * r * np.cos(2.0 * np.pi * freq / SR)
    a = 1.0 - b - c
    return a, b, c


def _cascade_filter(source: np.ndarray, tracks: np.ndarray,
                    bws=(90.0, 110.0, 170.0), block: int = 80) -> np.ndarray:
    """Run ``source`` through 3 cascaded resonators whose centre frequencies
    follow ``tracks`` (n, 3), updating coefficients every ``block`` samples
    (5 ms) with filter state carried across blocks."""
    from scipy.signal import lfilter

    n = len(source)
    out = source.copy()
    # zi state per resonator (direct-form II transposed, order 2)
    state = [np.zeros(2) for _ in range(3)]
    for start in range(0, n, block):
        end = min(start + block, n)
        freqs = tracks[(start + end) // 2]
        seg = out[start:end]
        for fi in range(3):
            a, b, c = _resonator_coeffs(freqs[fi], bws[fi])
            seg, state[fi] = lfilter([a], [1.0, -b, -c], seg, zi=state[fi])
        out[start:end] = seg
    return out


def synthesize(words: Sequence[Sequence[Phone]] = HELLO_WORDS,
               *, f0_start: float = 135.0, f0_end: float = 95.0,
               gap_sec: float = 0.12, lead_sec: float = 0.35,
               tail_sec: float = 1.2, noise_floor: float = 0.0015,
               level: float = 0.35, seed: int = 11):
    """Render an utterance; returns (float32 samples, info dict).

    info: speech_start/speech_end (sec into the file), duration.
    """
    rng = np.random.default_rng(seed)
    segs = _expand(words, gap_sec)
    total = sum(s.dur for s in segs)
    n = int(round(total * SR))

    # per-sample targets
    tracks = np.empty((n, 3))
    voiced = np.empty(n)
    amp = np.empty(n)
    pos = 0
    for s in segs:
        ln = int(round(s.dur * SR))
        ln = min(ln, n - pos)
        tracks[pos:pos + ln] = s.formants
        voiced[pos:pos + ln] = s.voiced
        amp[pos:pos + ln] = s.amp
        pos += ln
    tracks[pos:] = segs[-1].formants
    voiced[pos:] = 0.0
    amp[pos:] = 0.0

    # coarticulation: smooth formant tracks and envelopes (~24 ms box)
    k = int(0.024 * SR)
    kernel = np.ones(k) / k
    for j in range(3):
        tracks[:, j] = np.convolve(tracks[:, j], kernel, mode="same")
    amp = np.convolve(amp, kernel, mode="same")
    voiced = np.convolve(voiced, kernel, mode="same")

    # glottal source: impulse train at f0(t) with jitter, -12 dB/oct shaping
    t = np.arange(n) / SR
    f0 = f0_start + (f0_end - f0_start) * (t / max(t[-1], 1e-9))
    f0 = f0 * (1.0 + 0.02 * np.sin(2 * np.pi * 5.1 * t))  # vibrato
    f0 = f0 * (1.0 + 0.01 * rng.standard_normal(n))       # jitter
    phase = np.cumsum(f0 / SR)
    pulses = np.diff(np.floor(phase), prepend=0.0)
    from scipy.signal import lfilter

    alpha = np.exp(-2 * np.pi * 250.0 / SR)
    glottal = pulses
    for _ in range(2):  # two one-pole lowpasses: -12 dB/oct source slope
        glottal = lfilter([1.0 - alpha], [1.0, -alpha], glottal)
    glottal /= max(np.abs(glottal).max(), 1e-9)

    noise = rng.standard_normal(n)
    source = amp * (voiced * glottal + (1.0 - voiced) * 0.25 * noise
                    + voiced * 0.03 * noise)  # breathiness

    speech = _cascade_filter(source.astype(np.float64), tracks)
    speech = np.diff(speech, prepend=0.0)  # lip radiation (+6 dB/oct)
    # impose the target amplitude envelope: cascaded resonator gain varies
    # wildly with centre frequency (a 7 kHz burst resonator has ~40 dB more
    # passband gain than an F1 resonator), so rescale to the phone envelope
    # rather than trusting filter gains — keeps spectra, fixes dynamics
    env = np.sqrt(np.convolve(speech**2, kernel, mode="same")) + 1e-9
    speech = speech * (level * amp / env)
    peak = max(np.abs(speech).max(), 1e-9)
    if peak > 1.0:
        speech = speech / peak

    lead = int(lead_sec * SR)
    tail = int(tail_sec * SR)
    sig = np.concatenate([np.zeros(lead), speech, np.zeros(tail)])
    sig += noise_floor * rng.standard_normal(len(sig))  # room noise
    info = {
        "speech_start": lead / SR,
        "speech_end": (lead + n) / SR,
        "duration": len(sig) / SR,
        "sample_rate": SR,
    }
    return sig.astype(np.float32), info


def write_wav(path: str, samples: np.ndarray, sr: int = SR) -> None:
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("out", help="output WAV path")
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--tail", type=float, default=1.2)
    args = ap.parse_args()
    sig, info = synthesize(seed=args.seed, tail_sec=args.tail)
    write_wav(args.out, sig)
    print(f"wrote {args.out}: {info}")


if __name__ == "__main__":
    main()

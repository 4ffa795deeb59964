"""Generate demo WAV fixtures (no binary assets in the repo; the reference
ships stt_client/assets/hello.wav — we synthesize equivalents).

Usage: python tools/make_demo_audio.py [out.wav] [--seconds 3] [--kind speechy]
"""

from __future__ import annotations

import argparse
import wave

import numpy as np


def speechy(seconds: float, sr: int = 16000) -> np.ndarray:
    """Formant-ish bursts separated by pauses — trips VAD like speech."""
    rng = np.random.default_rng(7)
    total = int(sr * seconds)
    sig = np.zeros(total)
    t = 0
    while t < total:
        burst = int(sr * rng.uniform(0.25, 0.7))
        n = min(burst, total - t)
        tt = np.arange(n) / sr
        f0 = rng.uniform(110, 220)
        burst_sig = (
            0.4 * np.sin(2 * np.pi * f0 * tt)
            + 0.2 * np.sin(2 * np.pi * f0 * 2.1 * tt)
            + 0.08 * rng.normal(0, 1, n)
        ) * np.hanning(n)
        sig[t:t + n] = burst_sig
        t += n + int(sr * rng.uniform(0.1, 0.4))
    return sig


def tone(seconds: float, sr: int = 16000) -> np.ndarray:
    t = np.arange(int(sr * seconds)) / sr
    return 0.3 * np.sin(2 * np.pi * 220 * t)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("out", nargs="?", default="demo.wav")
    parser.add_argument("--seconds", type=float, default=3.0)
    parser.add_argument("--kind", choices=("speechy", "tone"), default="speechy")
    parser.add_argument("--sample-rate", type=int, default=16000)
    args = parser.parse_args()
    sig = (speechy if args.kind == "speechy" else tone)(
        args.seconds, args.sample_rate
    )
    pcm = (np.clip(sig, -1, 1) * 32767).astype(np.int16)
    with wave.open(args.out, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(args.sample_rate)
        wf.writeframes(pcm.tobytes())
    print(f"wrote {args.out}: {args.seconds}s {args.kind} @ {args.sample_rate}Hz")


if __name__ == "__main__":
    main()

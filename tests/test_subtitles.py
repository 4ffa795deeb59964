"""SRT/WebVTT subtitle exporter tests (pure formatting, no device).

Covers the exporter the batch client's ``--srt``/``--vtt`` flags use.
Reference role: segment-time presentation, the file-export counterpart
of ``/root/reference/examples/ui/subtitles.html``.
"""

from stt_tpu.gen import stt_pb2
from stt_tpu.utils.subtitles import (
    MIN_CUE_SEC,
    cues_from_results,
    render_srt,
    render_vtt,
)


def test_srt_block_layout():
    out = render_srt([(0.0, 1.5, "hello"), (2.25, 4.0, "world")])
    assert out == (
        "1\n00:00:00,000 --> 00:00:01,500\nhello\n"
        "\n"
        "2\n00:00:02,250 --> 00:00:04,000\nworld\n"
    )


def test_vtt_header_and_dot_separator():
    out = render_vtt([(0.5, 1.0, "hi")])
    assert out.startswith("WEBVTT\n")
    assert "00:00:00.500 --> 00:00:01.000\nhi\n" in out


def test_timestamp_hours_and_ms_rounding():
    # 1h 2m 3.9996s rounds to 04,000; hours field carries past 59:59
    out = render_srt([(3723.9996, 7325.0011, "x")])
    assert "01:02:04,000 --> 02:02:05,001" in out


def test_empty_text_cues_dropped_and_numbering_stays_dense():
    out = render_srt([(0, 1, "a"), (1, 2, "   "), (2, 3, "b")])
    assert "1\n" in out and "2\n00:00:02,000" in out
    assert "3\n" not in out


def test_degenerate_and_negative_times_clamped():
    out = render_srt([(-0.5, -1.0, "neg"), (2.0, 1.0, "inv")])
    # negative start clamps to zero; inverted end clamps to start + floor
    assert out.splitlines()[1].startswith("00:00:00,000 --> 00:00:00,")
    assert "00:00:02,000 --> 00:00:02,001" in out
    assert MIN_CUE_SEC > 0


def test_cues_from_results_keeps_finals_only():
    results = [
        stt_pb2.STTResult(text="part", is_final=False, start_sec=0,
                          end_sec=1),
        stt_pb2.STTResult(text="final one", is_final=True, start_sec=0,
                          end_sec=1.2),
        stt_pb2.STTResult(text="", is_final=True, start_sec=1.2,
                          end_sec=1.3),
        stt_pb2.STTResult(text="final two", is_final=True, start_sec=1.5,
                          end_sec=2.0),
    ]
    cues = cues_from_results(results)
    assert [c[2] for c in cues] == ["final one", "final two"]
    assert cues[0][:2] == (0.0, 1.2)


def test_unicode_text_roundtrip():
    out = render_vtt([(0, 1, "こんにちは、世界。")])
    assert "こんにちは、世界。" in out

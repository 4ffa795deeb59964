"""Logging tests: session-id contextvar, queue handlers, transcript sink
(reference tests/test_logging.py)."""

import logging
import time

from stt_tpu.utils.logging import (
    LOGGER,
    TRANSCRIPT_LOGGER,
    configure_logging,
    set_session_id,
)


def _drain():
    # queue handlers flush asynchronously; give the listener a beat
    time.sleep(0.15)


def test_session_id_injected_into_records(tmp_path):
    log_file = tmp_path / "app.log"
    configure_logging(level="INFO", log_file=str(log_file))
    set_session_id("sess-xyz")
    LOGGER.info("hello with session")
    set_session_id(None)
    LOGGER.info("hello without session")
    _drain()
    text = log_file.read_text()
    assert "[sess-xyz]" in text
    assert "hello with session" in text
    # cleared contextvar renders the placeholder
    assert "[-]" in text


def test_transcript_logger_separate_sink(tmp_path):
    log_file = tmp_path / "app.log"
    transcript_file = tmp_path / "transcripts.log"
    configure_logging(
        level="INFO",
        log_file=str(log_file),
        log_transcripts=True,
        transcript_file=str(transcript_file),
    )
    TRANSCRIPT_LOGGER.info("session_id=s1 final result='secret words'")
    LOGGER.info("operational line")
    _drain()
    assert "secret words" in transcript_file.read_text()
    # transcripts never leak into the main log
    assert "secret words" not in log_file.read_text()


def test_reconfigure_idempotent(tmp_path):
    for _ in range(3):
        configure_logging(level="DEBUG", log_file=str(tmp_path / "x.log"))
    LOGGER.debug("still alive")
    _drain()
    assert "still alive" in (tmp_path / "x.log").read_text()
    root = logging.getLogger("stt_tpu")
    assert len(root.handlers) <= 2

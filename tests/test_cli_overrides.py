"""CLI override contract: flags land on the right ServerConfig fields and
tri-state booleans fall through to YAML when unset (reference
tests/test_config_mapping_contract.py CLI half)."""

import tempfile
from pathlib import Path

import yaml

from stt_tpu.server.main import configure_from_args, parse_args


def _config_for(argv, yaml_payload=None):
    if yaml_payload is not None:
        with tempfile.NamedTemporaryFile(
            "w", suffix=".yaml", delete=False
        ) as fh:
            yaml.safe_dump(yaml_payload, fh)
            argv = ["--config", fh.name, *argv]
    return configure_from_args(parse_args(argv))


def test_simple_flag_mapping():
    cfg = _config_for([
        "--model", "base", "--model-backend", "fake", "--device", "cpu",
        "--port", "12345", "--metrics-port", "9000", "--ws-port", "0",
        "--max-sessions", "7", "--decode-timeout", "12.5",
        "--vad-silence", "0.3", "--vad-threshold", "0.9",
        "--speech-threshold", "0.05", "--sample-rate", "8000",
        "--log-level", "DEBUG", "--tpu-mesh-shape", "2x4",
    ])
    assert cfg.model == "base"
    assert cfg.model_backend == "fake"
    assert cfg.device == "cpu"
    assert cfg.port == 12345
    assert cfg.metrics_port == 9000
    assert cfg.ws_port == 0
    assert cfg.max_sessions == 7
    assert cfg.decode_timeout_sec == 12.5
    assert cfg.vad_silence == 0.3
    assert cfg.vad_threshold == 0.9
    assert cfg.speech_rms_threshold == 0.05
    assert cfg.sample_rate == 8000
    assert cfg.log_level == "DEBUG"
    assert cfg.tpu_mesh_shape == "2x4"


def test_tristate_bool_unset_falls_through_to_yaml():
    payload = {"logging": {"log_transcripts": True},
               "auth": {"require_api_key": True}}
    cfg = _config_for([], yaml_payload=payload)
    assert cfg.log_transcripts is True
    assert cfg.require_api_key is True


def test_tristate_bool_cli_overrides_yaml():
    payload = {"logging": {"log_transcripts": True}}
    cfg = _config_for(["--no-log-transcripts"], yaml_payload=payload)
    assert cfg.log_transcripts is False
    cfg2 = _config_for(["--log-transcripts"])
    assert cfg2.log_transcripts is True


def test_language_last_occurrence_wins():
    cfg = _config_for(["--language", "en", "--language", "ko"])
    assert cfg.language == "ko"


def test_cli_model_override_invalidates_yaml_load_profile():
    payload = {"model": {"name": "small", "backend": "jax_whisper"}}
    cfg = _config_for(["--model", "tiny", "--model-backend", "fake"],
                      yaml_payload=payload)
    # the synthesized default profile must reflect the CLI values
    from stt_tpu.config.loader import ensure_default_model_load_profile
    ensure_default_model_load_profile(cfg)
    profile = cfg.model_load_profiles[cfg.default_model_load_profile]
    assert profile["model_size"] == "tiny"
    assert profile["backend"] == "fake"


def test_transcript_log_file_enables_transcripts():
    cfg = _config_for(["--transcript-log-file", "/tmp/t.log"])
    assert cfg.log_transcripts is True
    assert cfg.transcript_log_file == "/tmp/t.log"

"""Config loader + mapping contract tests.

The mapping contract (every YAML key in SECTION_MAP targets a real
ServerConfig field, and YAML overrides land) mirrors the reference's
``tests/test_config_mapping_contract.py:12-110``.
"""

import dataclasses

import yaml

from stt_tpu.config import (
    SECTION_MAP,
    ServerConfig,
    load_config,
    parse_mesh_shape,
)


def test_section_map_targets_real_fields():
    field_names = {f.name for f in dataclasses.fields(ServerConfig)}
    for section, mapping in SECTION_MAP.items():
        for yaml_key, attr in mapping.items():
            assert attr in field_names, (
                f"{section}.{yaml_key} -> {attr} is not a ServerConfig field"
            )


def test_defaults_without_files(tmp_path):
    cfg = load_config(tmp_path / "nope.yaml", tmp_path / "nope2.yaml")
    assert cfg.port == 50051
    assert cfg.max_sessions == 4
    assert cfg.vad_silence == 0.8
    assert cfg.model_backend == "jax_whisper"
    # default model load profile synthesized from flat fields
    assert cfg.default_model_load_profile in cfg.model_load_profiles
    prof = cfg.model_load_profiles[cfg.default_model_load_profile]
    assert prof["model_size"] == cfg.model
    assert prof["backend"] == "jax_whisper"


def test_yaml_overrides_apply(tmp_path):
    server_yaml = tmp_path / "server.yaml"
    server_yaml.write_text(
        yaml.safe_dump(
            {
                "server": {
                    "port": 6000,
                    "max_sessions": 9,
                    "session_timeout_sec": 12,
                    "decode_batch_window_ms": 2,
                },
                "vad": {"silence": 0.3, "threshold": 0.7},
                "tpu": {"mesh_shape": "4x2", "max_decode_tokens": 128},
            }
        )
    )
    cfg = load_config(server_yaml, tmp_path / "none.yaml")
    assert cfg.port == 6000
    assert cfg.max_sessions == 9
    assert cfg.session_timeout_sec == 12
    assert cfg.decode_batch_window_ms == 2
    assert cfg.vad_silence == 0.3
    assert cfg.vad_threshold == 0.7
    assert cfg.tpu_mesh_shape == "4x2"
    assert cfg.tpu_max_decode_tokens == 128


def test_model_yaml_profiles(tmp_path):
    model_yaml = tmp_path / "model.yaml"
    model_yaml.write_text(
        yaml.safe_dump(
            {
                "model": {
                    "backend": "fake",
                    "name": "tiny",
                    "pool_size": 2,
                    "decode_profiles": {
                        "realtime": {"beam_size": 1},
                        "accurate": {"beam_size": 5},
                    },
                    "model_load_profiles": {
                        "default": {"model_size": "tiny", "backend": "fake"},
                        "big": {"model_size": "large-v3", "backend": "jax_whisper"},
                    },
                }
            }
        )
    )
    cfg = load_config(tmp_path / "none.yaml", model_yaml)
    assert cfg.model_backend == "fake"
    assert cfg.model == "tiny"
    assert cfg.model_pool_size == 2
    assert set(cfg.decode_profiles) == {"realtime", "accurate"}
    assert cfg.decode_profiles["accurate"]["beam_size"] == 5
    assert set(cfg.model_load_profiles) == {"default", "big"}


def test_shipped_yaml_files_load():
    cfg = load_config()
    assert cfg.max_sessions == 50
    assert cfg.vad_silence == 0.5
    assert "realtime" in cfg.decode_profiles
    assert "accurate" in cfg.decode_profiles


def test_none_values_do_not_override(tmp_path):
    server_yaml = tmp_path / "server.yaml"
    server_yaml.write_text(yaml.safe_dump({"server": {"port": None}}))
    cfg = load_config(server_yaml, tmp_path / "none.yaml")
    assert cfg.port == 50051


def test_parse_mesh_shape():
    assert parse_mesh_shape("1x1") == (1, 1)
    assert parse_mesh_shape("4x2") == (4, 2)
    assert parse_mesh_shape("8") == (8, 1)
    assert parse_mesh_shape("2*4") == (2, 4)


def test_languages_registry():
    from stt_tpu.config import SupportedLanguages

    langs = SupportedLanguages()
    codes = langs.get_codes()
    assert codes and len(codes) == 100
    assert "ko" in codes and "en" in codes and "yue" in codes
    assert langs.get_name("ko") == "Korean"
    assert langs.get_name("EN") == "English"
    assert langs.get_name("zz") == ""
    assert langs.get_name("") == ""

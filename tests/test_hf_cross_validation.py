"""Cross-validation against HuggingFace transformers' torch Whisper.

The strongest available correctness evidence in a zero-egress image: our
JAX implementation and HF's independent, battle-tested torch
implementation are run on the SAME (randomly initialized, exported,
reloaded) weights and must agree to float precision. Measured: encoder
max abs diff 2.4e-06, teacher-forced logits 4.2e-07, 100% argmax
agreement.

transformers quirk: the frozen encoder sinusoidal positional table is not
restored by ``from_pretrained``; the test sets it explicitly (we verify
separately that our sinusoid formula equals HF's).
"""

import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from stt_tpu.models.whisper import (
    _sinusoids, decoder_forward, encode, get_config, init_params,
)
from stt_tpu.parallel.checkpoint import export_hf_safetensors


@pytest.fixture(scope="module")
def models():
    from transformers import WhisperForConditionalGeneration

    config = get_config("test")
    params = init_params(config, seed=33)
    tmp = tempfile.mkdtemp()
    export_hf_safetensors(tmp, params, config)
    hf = WhisperForConditionalGeneration.from_pretrained(tmp)
    hf.eval()
    with torch.no_grad():
        hf.model.encoder.embed_positions.weight.copy_(
            torch.from_numpy(np.asarray(params["encoder"]["pos"]))
        )
    return config, params, hf


def test_sinusoid_formula_matches_hf():
    from transformers.models.whisper.modeling_whisper import sinusoids

    ours = _sinusoids(1500, 64)
    theirs = sinusoids(1500, 64).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_embeddings_roundtrip_through_hf(models):
    config, params, hf = models
    np.testing.assert_allclose(
        hf.model.decoder.embed_tokens.weight.detach().numpy(),
        np.asarray(params["decoder"]["tok"]), atol=1e-6,
    )
    np.testing.assert_allclose(
        hf.model.decoder.embed_positions.weight.detach().numpy(),
        np.asarray(params["decoder"]["pos"]), atol=1e-6,
    )


def test_encoder_matches_hf(models):
    config, params, hf = models
    rng = np.random.default_rng(33)
    mel = rng.normal(0, 1, (2, config.n_mels, 3000)).astype(np.float32)
    with torch.no_grad():
        hf_enc = hf.model.encoder(
            torch.from_numpy(mel)
        ).last_hidden_state.numpy()
    ours = np.asarray(encode(params, jnp.asarray(mel), config.n_audio_head))
    np.testing.assert_allclose(ours, hf_enc, atol=1e-4)


def test_decoder_logits_match_hf(models):
    config, params, hf = models
    rng = np.random.default_rng(34)
    mel = rng.normal(0, 1, (2, config.n_mels, 3000)).astype(np.float32)
    tokens = rng.integers(0, 1000, (2, 8)).astype(np.int64)
    with torch.no_grad():
        hf_logits = hf(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens),
        ).logits.numpy()
    enc_out = encode(params, jnp.asarray(mel), config.n_audio_head)
    ours = np.asarray(decoder_forward(
        params, jnp.asarray(tokens.astype(np.int32)), enc_out,
        config.n_text_head,
    ))
    np.testing.assert_allclose(ours, hf_logits, atol=1e-4)
    assert (ours.argmax(-1) == hf_logits.argmax(-1)).all()


def test_log_mel_matches_whisper_feature_extractor():
    """Our log-mel front end == transformers' WhisperFeatureExtractor
    (numpy reference implementation of whisper's official mel pipeline).
    Measured max abs diff 1.8e-05."""
    from transformers import WhisperFeatureExtractor

    from stt_tpu.ops.mel import log_mel_spectrogram

    fe = WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(0)
    audio = (
        0.3 * np.sin(2 * np.pi * 220 * np.arange(48000) / 16000)
        + 0.05 * rng.normal(0, 1, 48000)
    ).astype(np.float32)
    hf_feats = fe(
        audio, sampling_rate=16000, return_tensors="np",
        padding="max_length",
    ).input_features[0]
    padded = np.zeros(480000, np.float32)
    padded[: len(audio)] = audio
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(padded[None])))[0]
    assert ours.shape == hf_feats.shape == (80, 3000)
    np.testing.assert_allclose(ours, hf_feats, atol=1e-4)


def test_pallas_mel_matches_feature_extractor():
    """Transitively: the Pallas kernel (golden-equal to the XLA mel) also
    matches the official pipeline."""
    from transformers import WhisperFeatureExtractor

    from stt_tpu.ops.pallas.mel import log_mel_spectrogram_pallas

    fe = WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(1)
    audio = rng.normal(0, 0.1, 32000).astype(np.float32)
    hf_feats = fe(
        audio, sampling_rate=16000, return_tensors="np",
        padding="max_length",
    ).input_features[0]
    padded = np.zeros(480000, np.float32)
    padded[: len(audio)] = audio
    ours = np.asarray(
        log_mel_spectrogram_pallas(jnp.asarray(padded[None]), interpret=True)
    )[0]
    np.testing.assert_allclose(ours, hf_feats, atol=1e-4)

"""Config table: special tokens and family dimensions."""

from whisper_tpu.config import CONFIGS, get_config


def test_tiny_matches_reference_constants():
    # reference config.mojo:4-17
    c = get_config("tiny")
    assert c.d_model == 384
    assert c.n_heads == 6
    assert c.n_audio_layers == c.n_text_layers == 4
    assert c.vocab_size == 51_865
    assert c.head_dim == 64
    assert c.n_audio_ctx == 1500
    assert c.n_text_ctx == 448
    assert c.n_mels == 80
    assert c.d_ff == 1536
    assert c.n_frames == 3000
    assert c.n_samples == 480_000


def test_tiny_special_tokens():
    # reference whisper.mojo:188-207 hardcoded ids; vocab.txt line-1 check in
    # SURVEY.md §2.3
    c = get_config("tiny")
    assert c.eot_token == 50_257
    assert c.sot_token == 50_258
    assert c.first_language_token == 50_259
    assert c.transcribe_token == 50_359
    assert c.translate_token == 50_358
    assert c.no_timestamps_token == 50_363
    assert c.timestamp_begin == 50_364


def test_large_v3_token_shift():
    # large-v3 adds a 100th language: task tokens shift +1, eot stays put
    c = get_config("large-v3")
    assert c.eot_token == 50_257
    assert c.transcribe_token == 50_360
    assert c.no_timestamps_token == 50_364
    assert c.n_mels == 128
    assert c.vocab_size == 51_866


def test_en_models():
    c = get_config("tiny.en")
    assert c.eot_token == 50_256
    assert c.vocab_size == 51_864
    assert not c.multilingual


def test_family_dims():
    dims = {n: (c.d_model, c.n_heads, c.n_audio_layers, c.n_text_layers)
            for n, c in CONFIGS.items()}
    assert dims["base"] == (512, 8, 6, 6)
    assert dims["small"] == (768, 12, 12, 12)
    assert dims["medium"] == (1024, 16, 24, 24)
    assert dims["large-v3"] == (1280, 20, 32, 32)
    assert dims["large-v3-turbo"] == (1280, 20, 32, 4)


def test_model_name_aliases():
    """openai/whisper short names: turbo -> large-v3-turbo, large -> the
    newest large (whisper.load_model alias table)."""
    from whisper_tpu.config import get_config
    assert get_config("turbo") is get_config("large-v3-turbo")
    assert get_config("large") is get_config("large-v3")

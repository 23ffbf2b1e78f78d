"""Step-Audio-2 FULL pipeline e2e on tiny shapes: speech in (mel -> S3
codes), understanding (encoder -> adaptor -> LLM respond), think/tool
postprocessing, and speech out (flow mel -> HiFiGAN wav)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models import funasr_nano, hifigan, paraformer
from ominix_mlx_tpu.models import step_audio2 as sa
from ominix_mlx_tpu.models.base import TransformerConfig


def _pipeline():
    ecfg = paraformer.ParaformerConfig(
        n_mels=8, lfr_m=3, lfr_n=2, encoder_dim=16, encoder_layers=1,
        encoder_heads=2, encoder_ffn_dim=24, decoder_layers=1,
        decoder_dim=16, decoder_heads=2, decoder_ffn_dim=24, vocab_size=32)
    lcfg = TransformerConfig(
        vocab_size=64, hidden_size=32, num_layers=1, num_heads=2,
        num_kv_heads=1, head_dim=16, intermediate_size=48,
        tie_word_embeddings=True)
    acfg = funasr_nano.AdaptorConfig(in_dim=16, hidden=24, out_dim=32,
                                     layers=1, heads=2, downsample=2)
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    asr = funasr_nano.FunASRNano(
        enc_params=paraformer.init_params(ecfg, ks[0]), enc_cfg=ecfg,
        adaptor_params=funasr_nano.init_adaptor(acfg, ks[1]),
        adaptor_cfg=acfg,
        lm_params=__import__(
            "ominix_mlx_tpu.models.base", fromlist=["base"]).init_params(
                lcfg, ks[2], jnp.float32),
        lm_cfg=lcfg)
    fcfg = sa.FlowConfig(token_vocab=6561, token_dim=8, mel_dim=6,
                         hidden=16, layers=1, num_steps=2)
    hcfg = hifigan.HiFiGANConfig(in_dim=6, upsample_initial_channel=8,
                                 upsample_rates=(4,),
                                 upsample_kernel_sizes=(8,),
                                 resblock_kernel_sizes=(3,),
                                 resblock_dilations=((1,),))
    scfg = sa.S3Config(mel_dim=8, hidden_dim=16, ffn_dim=24, num_heads=2,
                       num_blocks=1, fsmn_kernel_size=5)
    return sa.Pipeline(
        asr=asr,
        flow_params=sa.init_flow(fcfg, ks[3]), flow_cfg=fcfg,
        hifi_params=hifigan.init_params(hcfg, ks[4]), hifi_cfg=hcfg,
        s3_params=sa.init_s3(scfg, ks[5]), s3_cfg=scfg,
        mode="with_think")


@pytest.mark.slow
def test_full_speech_to_speech_path():
    pipe = _pipeline()
    ecfg = pipe.asr.enc_cfg

    # --- speech in: features + S3 codes
    T = 40
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, T, 8))
    codes = pipe.tokenize_speech(mel)
    assert codes.shape[0] == 1 and int(codes.max()) < 6561

    # --- understanding: LFR feats -> respond tokens
    feats = jax.random.normal(jax.random.PRNGKey(2),
                              (1, 10, ecfg.input_dim))
    toks = pipe.respond_tokens(feats, [1, 2], [3], max_tokens=4)
    assert 1 <= len(toks) <= 4 and all(0 <= t < 64 for t in toks)

    # --- postprocess: think stripping
    text, calls = pipe.postprocess("<think>internal</think>hello")
    assert text.strip() == "hello" and calls == []

    # --- speech out: codes -> flow mel -> wav
    wav = pipe.speak(jnp.asarray([[1, 2, 3, 4]]))
    assert wav.ndim == 1 and len(wav) == 4 * 4    # upsample 4x
    assert np.all(np.isfinite(wav))


@pytest.mark.slow
def test_tool_mode_postprocess():
    pipe = _pipeline()
    pipe.mode = "with_tools"
    text, calls = pipe.postprocess(
        '<tool_call>{"name": "search", "arguments": {"q": "x"}}</tool_call>'
        "done")
    assert calls and calls[0]["name"] == "search"
    assert "done" in text

"""Smoke + property tests for the remaining model families: funasr-nano,
HiFiGAN, step-audio2 (flow TTS + tool parsing), GPT-SoVITS T2S,
DeepSeek-OCR2."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ominix_mlx_tpu.models import (deepseek_ocr2, funasr_nano, gpt_sovits,
                                   hifigan, moe, paraformer, step_audio2, vit)
from ominix_mlx_tpu.models import base, qwen3_moe
from ominix_mlx_tpu.models.base import TransformerConfig

LM = TransformerConfig(
    vocab_size=64, hidden_size=32, num_layers=1, num_heads=2,
    num_kv_heads=1, head_dim=16, intermediate_size=48,
    tie_word_embeddings=True)


@pytest.mark.slow
def test_funasr_nano_pipeline():
    enc_cfg = paraformer.ParaformerConfig(
        n_mels=8, lfr_m=2, encoder_dim=16, encoder_layers=2, encoder_heads=2,
        encoder_ffn_dim=24, sanm_kernel_size=3, decoder_layers=1,
        decoder_dim=16, decoder_heads=2, decoder_ffn_dim=24, vocab_size=32)
    acfg = funasr_nano.AdaptorConfig(in_dim=16, hidden=24, out_dim=32,
                                     layers=1, heads=2, downsample=2)
    m = funasr_nano.FunASRNano(
        enc_params=paraformer.init_params(enc_cfg, jax.random.PRNGKey(0)),
        enc_cfg=enc_cfg,
        adaptor_params=funasr_nano.init_adaptor(acfg, jax.random.PRNGKey(1)),
        adaptor_cfg=acfg,
        lm_params=base.init_params(LM, jax.random.PRNGKey(2), jnp.float32),
        lm_cfg=LM)
    feats = jax.random.normal(jax.random.PRNGKey(3), (1, 12, 16))
    emb = m.encode(feats)
    assert emb.shape == (1, 6, 32)
    toks = m.transcribe_tokens(feats, [1, 2], [3], max_tokens=4)
    assert len(toks) == 4


@pytest.mark.slow
def test_hifigan_upsample_factor():
    cfg = hifigan.HiFiGANConfig(in_dim=8, upsample_initial_channel=16,
                                upsample_rates=(2, 2),
                                upsample_kernel_sizes=(4, 4),
                                resblock_kernel_sizes=(3,),
                                resblock_dilations=((1, 2),))
    p = hifigan.init_params(cfg, jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 10, 8))
    wav = hifigan.vocode(p, cfg, mel)
    assert wav.shape == (1, 40)
    assert float(jnp.abs(wav).max()) <= 1.0


def test_step_audio2_tool_parsing_and_flow():
    text = 'say <tool_call>{"name": "web", "arguments": {"q": "x"}}</tool_call> done'
    calls, clean = step_audio2.parse_tool_calls(text)
    assert calls == [{"name": "web", "arguments": {"q": "x"}}]
    assert "tool_call" not in clean

    fcfg = step_audio2.FlowConfig(token_vocab=16, token_dim=8, mel_dim=6,
                                  hidden=16, layers=1, num_steps=3)
    p = step_audio2.init_flow(fcfg, jax.random.PRNGKey(0))
    mel = step_audio2.flow_decode(p, fcfg, jnp.asarray([[1, 2, 3, 4]]))
    assert mel.shape == (1, 4, 6)
    assert np.isfinite(np.asarray(mel)).all()


def test_t2s_generation_and_eos():
    tcfg = gpt_sovits.T2SConfig(
        phoneme_vocab=40, semantic_vocab=1025, bert_dim=16,
        transformer=TransformerConfig(
            vocab_size=1025, hidden_size=32, num_layers=1, num_heads=2,
            num_kv_heads=2, head_dim=16, intermediate_size=48))
    params = gpt_sovits.init_t2s(tcfg, jax.random.PRNGKey(0))
    vc = gpt_sovits.VoiceCloner(params, tcfg)
    vc.set_reference_semantics(np.asarray([5, 9, 2]))
    phones = gpt_sovits.english_g2p("hi there")
    sem = vc.synthesize_semantics(phones, key=jax.random.PRNGKey(1),
                                  max_tokens=8)
    assert len(sem) <= 8 and all(0 <= s < 1024 for s in sem)


@pytest.mark.slow
def test_deepseek_ocr2_splice():
    vcfg = vit.ViTConfig(image_size=28, patch_size=14, hidden_size=16,
                         num_layers=1, num_heads=2, mlp_dim=24,
                         has_cls_token=False)
    lm_cfg = base.TransformerConfig(
        vocab_size=64, hidden_size=32, num_layers=1, num_heads=2,
        num_kv_heads=1, head_dim=16, intermediate_size=48,
        tie_word_embeddings=True,
        moe=moe.MoEConfig(num_experts=2, top_k=1, moe_intermediate_size=16))
    lm_params = qwen3_moe.init_params(lm_cfg, jax.random.PRNGKey(0),
                                      jnp.float32)
    m = deepseek_ocr2.DeepSeekOCR2(
        vision_params=vit.init_params(vcfg, jax.random.PRNGKey(1)),
        vision_cfg=vcfg,
        projector={"fc1": {"w": jax.random.normal(jax.random.PRNGKey(2), (24, 16)) * 0.1},
                   "fc2": {"w": jax.random.normal(jax.random.PRNGKey(3), (32, 24)) * 0.1}},
        lm_params=lm_params, lm_cfg=lm_cfg)
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 28, 28, 3)),
                      jnp.float32)
    toks = m.ocr_tokens(img, [1, 2, 3], image_token_pos=1, max_tokens=4)
    assert len(toks) == 4 and all(0 <= t < 64 for t in toks)


@pytest.mark.slow
def test_hubert_frontend_and_codes():
    from ominix_mlx_tpu.models import hubert

    cfg = hubert.HubertConfig(hidden_size=32, num_layers=2, num_heads=2,
                              ffn_dim=48, conv_pos_kernel=8,
                              conv_pos_groups=2, conv_dim=512)
    params = hubert.init_params(cfg, jax.random.PRNGKey(0))
    wav = jax.random.normal(jax.random.PRNGKey(1), (1, 3200))  # 0.2s @16k
    feats = hubert.encode(params, cfg, wav)
    assert feats.shape[0] == 1 and feats.shape[2] == 32
    assert 8 <= feats.shape[1] <= 10   # ~320x downsampling
    cb = jax.random.normal(jax.random.PRNGKey(2), (16, 32))
    codes = hubert.semantic_codes(feats, cb)
    assert codes.shape == feats.shape[:2]
    assert int(codes.max()) < 16


def test_bert_hf_parity():
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFBertConfig, BertModel

    from ominix_mlx_tpu.models import bert
    from ominix_mlx_tpu.utils.loading import torch_to_jnp

    d = dict(vocab_size=64, hidden_size=32, num_hidden_layers=2,
             num_attention_heads=2, intermediate_size=48,
             max_position_embeddings=32, type_vocab_size=2)
    torch.manual_seed(0)
    hf = BertModel(HFBertConfig(**d), add_pooling_layer=False).eval()
    cfg = bert.BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                          num_heads=2, intermediate_size=48, max_position=32)
    flat = {k: torch_to_jnp(v) for k, v in hf.state_dict().items()}
    params = bert.params_from_hf(flat, cfg)
    toks = np.array([[2, 5, 9, 11]])
    with torch.no_grad():
        want = hf(torch.tensor(toks)).last_hidden_state.numpy()
    got = bert.encode(params, cfg, jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_s3_tokenizer_encode():
    """S3 tokenizer: mel -> 25Hz discrete codes (reference
    s3tokenizer_mlx.rs); codes in [0, levels^2)."""
    scfg = step_audio2.S3Config(mel_dim=16, hidden_dim=32, ffn_dim=64,
                                num_heads=4, num_blocks=2,
                                fsmn_kernel_size=5, output_dim=8,
                                quant_levels=81)
    p = step_audio2.init_s3(scfg, jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 20, 16))
    codes = step_audio2.s3_encode(p, scfg, mel)
    assert codes.shape == (1, 10)                 # stride-2 subsample
    c = np.asarray(codes)
    assert (c >= 0).all() and (c < 81 * 81).all()


@pytest.mark.slow
def test_s3_quantization_is_deterministic_and_bounded():
    scfg = step_audio2.S3Config(mel_dim=8, hidden_dim=16, ffn_dim=32,
                                num_heads=2, num_blocks=1,
                                fsmn_kernel_size=3)
    p = step_audio2.init_s3(scfg, jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8)) * 10
    c1 = step_audio2.s3_encode(p, scfg, mel)
    c2 = step_audio2.s3_encode(p, scfg, mel)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_funasr_checkpoint_name_maps_roundtrip():
    """Build a flat dict with the on-disk names and check the loader
    reproduces a tree the forward pass accepts (seam test for real
    checkpoints, reference model.rs:349-375)."""
    cfg = funasr_nano.paraformer.ParaformerConfig(
        n_mels=8, lfr_m=1, lfr_n=1, encoder_dim=16, encoder_layers=2,
        encoder_heads=2, encoder_ffn_dim=32, sanm_kernel_size=3,
        decoder_dim=16, decoder_layers=1, decoder_ffn_dim=32, vocab_size=32)
    rng = np.random.default_rng(0)

    def lin(d_in, d_out):
        return {"weight": jnp.asarray(rng.normal(size=(d_out, d_in)),
                                      jnp.float32),
                "bias": jnp.zeros((d_out,), jnp.float32)}

    flat = {}
    for name, prefix in [("encoder.encoders0.0", cfg.input_dim),
                         ("encoder.encoders.0", cfg.encoder_dim)]:
        d = cfg.encoder_dim
        for k, v in lin(prefix, 3 * d).items():
            flat[f"{name}.self_attn.linear_q_k_v.{k}"] = v
        for k, v in lin(d, d).items():
            flat[f"{name}.self_attn.linear_out.{k}"] = v
        flat[f"{name}.self_attn.fsmn_block.weight"] = jnp.asarray(
            rng.normal(size=(d, 1, cfg.sanm_kernel_size)), jnp.float32)
        for k, v in lin(d, cfg.encoder_ffn_dim).items():
            flat[f"{name}.feed_forward.w_1.{k}"] = v
        for k, v in lin(cfg.encoder_ffn_dim, d).items():
            flat[f"{name}.feed_forward.w_2.{k}"] = v
        for nn_ in ("norm1", "norm2"):
            flat[f"{name}.{nn_}.weight"] = jnp.ones((d if name.endswith("encoders.0") or nn_ != "norm1" else prefix,), jnp.float32)
            flat[f"{name}.{nn_}.bias"] = jnp.zeros_like(flat[f"{name}.{nn_}.weight"])
    # norm1 of the first layer operates on the input dim
    flat["encoder.encoders0.0.norm1.weight"] = jnp.ones((cfg.input_dim,), jnp.float32)
    flat["encoder.encoders0.0.norm1.bias"] = jnp.zeros((cfg.input_dim,), jnp.float32)
    flat["encoder.after_norm.weight"] = jnp.ones((cfg.encoder_dim,), jnp.float32)
    flat["encoder.after_norm.bias"] = jnp.zeros((cfg.encoder_dim,), jnp.float32)

    enc = funasr_nano.encoder_params_from_flat(flat, cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.input_dim))
    out = funasr_nano.paraformer.encode(enc, cfg, feats)
    assert out.shape == (1, 6, cfg.encoder_dim)
    assert np.isfinite(np.asarray(out)).all()
    # alias normalization
    assert funasr_nano.map_checkpoint_key("x.attn.qkv.weight") \
        == "x.self_attn.linear_q_k_v.weight"


def test_long_audio_chunking_seams():
    """Chunk boundary behavior (reference model.rs:496-515): full cover,
    overlap step, sub-100ms tail dropped."""
    r = funasr_nano.chunk_ranges(16000 * 70, 16000, 30.0)
    assert r == [(0, 480000), (480000, 960000), (960000, 1120000)]
    r = funasr_nano.chunk_ranges(16000 * 60, 16000, 30.0, overlap_secs=5.0)
    assert r[0] == (0, 480000) and r[1][0] == 400000
    # 50ms tail is dropped
    r = funasr_nano.chunk_ranges(16000 * 30 + 800, 16000, 30.0)
    assert len(r) == 1


@pytest.mark.slow
def test_funasr_nano_transcribe_facade():
    """CLI/server-contract methods (reference transcribe model.rs:377,
    transcribe_long model.rs:388-459): transcribe(samples, rate) and
    transcribe_long(samples, rate) run end-to-end from raw samples without
    a tokenizer (ids joined as text)."""
    enc_cfg = paraformer.ParaformerConfig(
        n_mels=8, lfr_m=2, encoder_dim=16, encoder_layers=2, encoder_heads=2,
        encoder_ffn_dim=24, sanm_kernel_size=3, decoder_layers=1,
        decoder_dim=16, decoder_heads=2, decoder_ffn_dim=24, vocab_size=32)
    acfg = funasr_nano.AdaptorConfig(in_dim=16, hidden=24, out_dim=32,
                                     layers=1, heads=2, downsample=2)
    m = funasr_nano.FunASRNano(
        enc_params=paraformer.init_params(enc_cfg, jax.random.PRNGKey(0)),
        enc_cfg=enc_cfg,
        adaptor_params=funasr_nano.init_adaptor(acfg, jax.random.PRNGKey(1)),
        adaptor_cfg=acfg,
        lm_params=base.init_params(LM, jax.random.PRNGKey(2), jnp.float32),
        lm_cfg=LM)
    samples = np.sin(np.linspace(0, 440 * 2 * np.pi, 8000)).astype(np.float32)
    text = m.transcribe(samples, 16000, max_tokens=4)
    assert isinstance(text, str) and len(text.split()) == 4
    # long path: 1.5s chunks over 3s of audio -> 2 chunks joined
    long_text = m.transcribe_long(np.tile(samples, 6), 16000,
                                  chunk_secs=1.5, max_tokens=2, sep=" | ")
    assert isinstance(long_text, str) and " | " in long_text


def test_visual_flow_mask_semantics():
    """Image tokens bidirectional; queries see all images + causal among
    queries; images never see queries (qwen2_encoder.rs mask builder)."""
    m = np.asarray(deepseek_ocr2.visual_flow_mask(3, 2))
    assert (m[:3, :3] == 0).all()            # img <-> img
    assert (m[:3, 3:] < -1e8).all()          # img -/-> query
    assert (m[3:, :3] == 0).all()            # query -> img
    assert m[3, 3] == 0 and m[3, 4] < -1e8   # causal among queries
    assert m[4, 3] == 0 and m[4, 4] == 0


@pytest.mark.slow
def test_visual_flow_encode_compresses():
    """SAM-grid features -> n_query compressed features; query bank picked
    by grid size; image-token content influences the output."""
    fcfg = deepseek_ocr2.visual_flow_config(hidden=32, layers=2)
    params = {
        "layers": [base.init_params(fcfg, jax.random.PRNGKey(i),
                                    jnp.float32)["layers"][0]
                   for i in range(2)],
        "norm": jnp.ones((32,)),
        "query_768": jax.random.normal(jax.random.PRNGKey(7), (4, 32)) * 0.1,
        "query_1024": jax.random.normal(jax.random.PRNGKey(8), (6, 32)) * 0.1,
    }
    feats = jax.random.normal(jax.random.PRNGKey(9), (1, 3, 3, 32)) * 0.1
    out = deepseek_ocr2.visual_flow_encode(params, fcfg, feats)
    assert out.shape == (1, 4, 32)           # 9 <= 144 -> query_768 bank
    out2 = deepseek_ocr2.visual_flow_encode(params, fcfg, feats * 3.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    big = jax.random.normal(jax.random.PRNGKey(10), (1, 200, 32)) * 0.1
    assert deepseek_ocr2.visual_flow_encode(params, fcfg, big).shape \
        == (1, 6, 32)


class _CharTok:
    eos_token_id = 1

    def encode(self, text, add_special_tokens=True):
        return [2 + (ord(c) % 60) for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(map(str, ids))


@pytest.mark.slow
def test_deepseek_ocr2_ocr_facade():
    """ocr(image, prompt) -> str end-to-end: tokenize_prompt builds the
    <|User|> conversation with IMAGE_TOKEN slots, embeddings overwrite the
    slots (+ view separator), MoE decode runs (lib.rs:522, :791-869)."""
    vcfg = vit.ViTConfig(image_size=28, patch_size=14, hidden_size=16,
                         num_layers=1, num_heads=2, mlp_dim=24,
                         has_cls_token=False)
    lm_cfg = base.TransformerConfig(
        vocab_size=deepseek_ocr2.IMAGE_TOKEN_ID + 2, hidden_size=32,
        num_layers=1, num_heads=2, num_kv_heads=1, head_dim=16,
        intermediate_size=48, tie_word_embeddings=True,
        moe=moe.MoEConfig(num_experts=2, top_k=1, moe_intermediate_size=16))
    lm_params = qwen3_moe.init_params(lm_cfg, jax.random.PRNGKey(0),
                                      jnp.float32)
    m = deepseek_ocr2.DeepSeekOCR2(
        vision_params=vit.init_params(vcfg, jax.random.PRNGKey(1)),
        vision_cfg=vcfg,
        projector={"w": jax.random.normal(jax.random.PRNGKey(2),
                                          (32, 16)) * 0.1},
        lm_params=lm_params, lm_cfg=lm_cfg,
        view_separator=jax.random.normal(jax.random.PRNGKey(3), (32,)) * 0.1,
        tokenizer=_CharTok())
    # vit 28/14 -> 2x2=4 patches; n_image_tokens property assumes SAM
    # geometry, so drive via ocr_tokens through tokenize_prompt directly
    ids = deepseek_ocr2.tokenize_prompt(_CharTok(), "Free OCR.", 4)
    assert ids.count(deepseek_ocr2.IMAGE_TOKEN_ID) == 5
    assert ids[0] == deepseek_ocr2.BOS_TOKEN_ID
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 28, 28, 3)),
                      jnp.float32)
    toks = m.ocr_tokens(img, ids, max_tokens=4,
                        stop_tokens=(deepseek_ocr2.EOS_TOKEN_ID,))
    assert len(toks) <= 4 and all(0 <= t < lm_cfg.vocab_size for t in toks)


def test_deepseek_ocr2_loader_shapes():
    """load_model name map: build a flat dict with the HF names and check
    the trees assemble (lib.rs:946-1070 layout) without a checkpoint."""
    fcfg = deepseek_ocr2.visual_flow_config(hidden=32, layers=1)
    lp = base.init_params(fcfg, jax.random.PRNGKey(0), jnp.float32)
    flat = {}
    l0 = lp["layers"][0]
    pre = "model.qwen2_model.model.model.layers.0"
    flat[f"{pre}.input_layernorm.weight"] = l0["input_layernorm"]
    flat[f"{pre}.post_attention_layernorm.weight"] = \
        l0["post_attention_layernorm"]
    for n in ("q_proj", "k_proj", "v_proj", "o_proj",
              "gate_proj", "up_proj", "down_proj"):
        flat[f"{pre}.self_attn.{n}.weight" if "proj" in n and n[0] in "qkvo"
             else f"{pre}.mlp.{n}.weight"] = l0[n]["w"]
    flat["model.qwen2_model.model.model.norm.weight"] = jnp.ones((32,))
    flat["model.qwen2_model.query_768.weight"] = jnp.zeros((4, 32))
    flat["model.qwen2_model.query_1024.weight"] = jnp.zeros((6, 32))
    fp = deepseek_ocr2.flow_params_from_flat(flat)
    assert len(fp["layers"]) == 1 and fp["query_768"].shape == (4, 32)


def test_deepseek_ocr2_lm_loader_and_forward():
    """lm_params_from_flat assembles the deepseek-MoE decoder from HF
    names (dense first-k layer + routed/shared experts) and it runs."""
    cfg = deepseek_ocr2.config_from_hf(dict(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2,
        intermediate_size=48, n_routed_experts=4, num_experts_per_tok=2,
        n_shared_experts=1, moe_intermediate_size=16,
        first_k_dense_replace=1))
    rng = np.random.default_rng(0)

    def lin(shape):
        return jnp.asarray(rng.normal(0, 0.05, shape), jnp.float32)

    flat = {"model.embed_tokens.weight": lin((64, 32)),
            "model.norm.weight": jnp.ones((32,))}
    for i in range(2):
        p = f"model.layers.{i}"
        flat[f"{p}.input_layernorm.weight"] = jnp.ones((32,))
        flat[f"{p}.post_attention_layernorm.weight"] = jnp.ones((32,))
        hd = 16
        flat[f"{p}.self_attn.q_proj.weight"] = lin((2 * hd, 32))
        flat[f"{p}.self_attn.k_proj.weight"] = lin((2 * hd, 32))
        flat[f"{p}.self_attn.v_proj.weight"] = lin((2 * hd, 32))
        flat[f"{p}.self_attn.o_proj.weight"] = lin((32, 2 * hd))
        if i == 0:                                   # dense first layer
            for n, sh in (("gate_proj", (48, 32)), ("up_proj", (48, 32)),
                          ("down_proj", (32, 48))):
                flat[f"{p}.mlp.{n}.weight"] = lin(sh)
        else:
            flat[f"{p}.mlp.gate.weight"] = lin((4, 32))
            for e in range(4):
                for n, sh in (("gate_proj", (16, 32)), ("up_proj", (16, 32)),
                              ("down_proj", (32, 16))):
                    flat[f"{p}.mlp.experts.{e}.{n}.weight"] = lin(sh)
            for n, sh in (("gate_proj", (16, 32)), ("up_proj", (16, 32)),
                          ("down_proj", (32, 16))):
                flat[f"{p}.mlp.shared_experts.{n}.weight"] = lin(sh)
    params = deepseek_ocr2.lm_params_from_flat(flat, cfg, first_k_dense=1)
    assert "moe" in params["layers"][1] and "moe" not in params["layers"][0]
    cache = base.init_cache(cfg, 1, 16, jnp.float32)
    logits, _ = base.forward(params, cfg, jnp.asarray([[1, 2, 3]]), cache)
    assert logits.shape == (1, 3, 64)
    assert np.isfinite(np.asarray(logits)).all()

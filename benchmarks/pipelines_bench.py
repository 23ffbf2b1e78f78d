"""Non-LLM pipeline benchmarks on the real TPU vs BASELINE.md:

  paraformer ASR        vs 18x real-time        (README.md:583)
  qwen3-asr 0.6B        vs 50x real-time        (README.md:585)
  qwen3-tts 1.7B talker vs 35 ms/frame @ 12Hz   (README.md:586)
  flux-klein 1024px     vs ~5 s/image           (README.md:589)

Random weights (throughput is weight-value independent); real model-sized
configs. Prints one JSON line per metric. Timing fetches values (the
device tunnel makes block_until_ready a no-op) and uses min-of-N.

Usage: python benchmarks/pipelines_bench.py [--only paraformer,asr,tts,flux]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, n=4):
    fn()  # compile + warm
    return min(min(fn() for _ in range(2)) for _ in range(max(1, n // 2)))


def emit(metric, value, unit, vs_baseline):
    print(json.dumps({"metric": metric, "value": round(value, 4),
                      "unit": unit, "vs_baseline": round(vs_baseline, 3)}),
          flush=True)


def bench_paraformer():
    from ominix_mlx_tpu.models import paraformer as pf

    cfg = pf.ParaformerConfig()            # Paraformer-large
    params = pf.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    audio_s = 30.0
    frames = int(audio_s * 100 / cfg.lfr_n)          # 10ms hop, LFR stride 6
    feats = jax.random.normal(jax.random.PRNGKey(1),
                              (1, frames, cfg.input_dim), jnp.bfloat16)
    # params as an ARGUMENT, not a closure capture: closed-over arrays are
    # baked into the lowering as constants (GBs -> pathological compiles)
    run = jax.jit(lambda p, f: pf.transcribe_logits(p, cfg, f)[0].sum())

    def once():
        t0 = time.perf_counter()
        float(run(params, feats))
        return time.perf_counter() - t0

    t = _timeit(once)
    rtf = t / audio_s
    emit("paraformer_large_rtf", rtf, "rtf(lower=better)",
         (1 / 18.0) / rtf)                # >1 means faster than reference


def bench_qwen3_asr(size: str = "0.6b"):
    from ominix_mlx_tpu.models import qwen3_asr as qa
    from ominix_mlx_tpu.models import base

    ecfg = qa.AudioEncoderConfig()
    if size == "1.7b":                     # Qwen3-1.7B decoder
        lcfg = base.TransformerConfig(
            vocab_size=151936, hidden_size=2048, num_layers=28, num_heads=16,
            num_kv_heads=8, head_dim=128, intermediate_size=6144,
            use_qk_norm=True, tie_word_embeddings=True)
    else:
        lcfg = base.TransformerConfig(     # Qwen3-0.6B decoder
            vocab_size=151936, hidden_size=1024, num_layers=28, num_heads=16,
            num_kv_heads=8, head_dim=128, intermediate_size=3072,
            use_qk_norm=True, tie_word_embeddings=True)
    eparams = qa.init_encoder_params(ecfg, jax.random.PRNGKey(0), jnp.bfloat16)
    lparams = base.init_params(lcfg, jax.random.PRNGKey(1), jnp.bfloat16)
    audio_s = 30.0
    n_mel = int(audio_s * 100)                        # 10ms hop
    C = ecfg.chunk_frames
    mel = jax.random.normal(jax.random.PRNGKey(2),
                            (ecfg.num_mel_bins, n_mel + (-n_mel) % C),
                            jnp.bfloat16)
    n_dec = 64                                        # ~typical transcript

    # three separate jits (encode / prefill / decode-scan): one fused
    # program at this size stalls the remote compile service for 30+ min
    @jax.jit
    def enc(ep, mel):
        return qa.encode(ep, ecfg, mel, n_mel)        # [T', 2048]

    @jax.jit
    def prefill(lp, emb, cache):
        logits, cache = base.forward_embeds(lp, lcfg, emb, cache)
        return jnp.argmax(logits[:, -1:], -1).astype(jnp.int32), cache

    @jax.jit
    def decode(lp, tok, cache):
        def step(carry, _):
            tok, cache = carry
            lg, cache = base.forward(lp, lcfg, tok, cache)
            return (jnp.argmax(lg[:, -1:], -1).astype(jnp.int32), cache), tok
        (_, _), toks = jax.lax.scan(step, (tok, cache), length=n_dec)
        return toks.sum()

    def once():
        t0 = time.perf_counter()
        feats = enc(eparams, mel)
        emb = feats[None, :, :lcfg.hidden_size]       # splice stand-in
        cache = base.init_cache(lcfg, 1, emb.shape[1] + n_dec + 8,
                                jnp.bfloat16)
        tok, cache = prefill(lparams, emb, cache)
        float(decode(lparams, tok, cache))
        return time.perf_counter() - t0

    t = _timeit(once)
    rtf = t / audio_s
    if size == "1.7b":                     # reference: 30x RT (README:584)
        emit("qwen3_asr_1p7b_rtf", rtf, "rtf(lower=better)", (1 / 30.0) / rtf)
    else:                                  # reference: 50x RT (README:585)
        emit("qwen3_asr_0p6b_rtf", rtf, "rtf(lower=better)", (1 / 50.0) / rtf)


def bench_qwen3_tts():
    from ominix_mlx_tpu.models import qwen3_tts as qt
    from ominix_mlx_tpu.models import base
    from ominix_mlx_tpu.nn.layers import embedding

    tcfg = qt.TalkerConfig(transformer=base.TransformerConfig(
        vocab_size=3072, hidden_size=2048, num_layers=28, num_heads=16,
        num_kv_heads=8, head_dim=128, intermediate_size=6144,
        use_qk_norm=True))                 # Qwen3-TTS 1.7B talker body
    tp = qt.init_params(tcfg, jax.random.PRNGKey(0), jnp.bfloat16)

    import functools

    text_tok = jnp.asarray([tcfg.tts_pad_token_id % 3072], jnp.int32)

    @functools.partial(jax.jit, static_argnums=(3,))
    def run(tp, cache, codes0, n):
        def step(carry, _):
            codes, cache = carry
            te = embedding(tp["text_embedding"], text_tok[:, None])
            te = qt.text_projection(tp["text_projection"], te)
            c0 = embedding(tp["codec_embedding"], codes[:, :1])
            rest = sum(tp["code_predictor"]["codec_embeddings"][g]
                       [codes[:, g + 1]][:, None]
                       for g in range(tcfg.num_code_groups - 1))
            emb = te + c0 + rest.astype(te.dtype)
            logits, hidden, cache = qt.talker_step(tp, tcfg, emb, cache)
            code0 = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            c0e = embedding(tp["codec_embedding"], code0[:, None])
            codes_rest = qt.predict_codes(tp["code_predictor"], tcfg,
                                          hidden[:, -1:], c0e)
            codes = jnp.concatenate([code0[:, None], codes_rest], 1)
            return (codes, cache), code0
        (_, _), c = jax.lax.scan(step, (codes0, cache), length=n)
        return c.sum()

    def frames_loop(n):
        cache = base.init_cache(tcfg.transformer, 1, 16 + 64, jnp.bfloat16)
        codes0 = jnp.full((1, tcfg.num_code_groups), 5, jnp.int32)
        t0 = time.perf_counter()
        float(run(tp, cache, codes0, n))
        return time.perf_counter() - t0

    # difference quotient: per-frame marginal cost
    f = lambda n: (lambda: frames_loop(n))
    _timeit(f(16), 2)
    _timeit(f(64), 2)
    t16 = _timeit(f(16), 2)
    t64 = _timeit(f(64), 2)
    ms_per_frame = (t64 - t16) / (64 - 16) * 1e3
    emit("qwen3_tts_1p7b_ms_per_frame", ms_per_frame, "ms/frame",
         35.0 / ms_per_frame)


def bench_qwen3_tts_e2e():
    """END-TO-END TTS real-time factor: text prefill + autoregressive frame
    generation (talker + 16-group code predictor) + codec decode to a
    24kHz waveform, divided by the audio seconds produced. Reference
    headline is 2.3x real-time end-to-end (BASELINE.md per-stage table),
    i.e. RTF 0.435."""
    import functools

    from ominix_mlx_tpu.models import base
    from ominix_mlx_tpu.models import qwen3_tts as qt
    from ominix_mlx_tpu.nn.layers import embedding

    tcfg = qt.TalkerConfig(transformer=base.TransformerConfig(
        vocab_size=3072, hidden_size=2048, num_layers=28, num_heads=16,
        num_kv_heads=8, head_dim=128, intermediate_size=6144,
        use_qk_norm=True))                 # Qwen3-TTS 1.7B talker body
    tp = qt.init_params(tcfg, jax.random.PRNGKey(0), jnp.bfloat16)
    # production-geometry codec decoder: 12.5Hz frames -> 1920 samples
    # (2 * 8*5*4*3) = 24kHz; 512-d core, 4 pre-transformer layers
    dec, dcfg = qt.init_codec(jax.random.PRNGKey(1), frame_dim=512,
                              n_transformer=4, num_heads=8,
                              up_strides=(2,), dec_strides=(8, 5, 4, 3),
                              codec_vocab=2048, dtype=jnp.bfloat16)

    N_FRAMES = 60                           # 4.8 s of audio
    PREFILL = 32                            # text prompt tokens
    text_tok = jnp.asarray([tcfg.tts_pad_token_id % 3072], jnp.int32)

    @jax.jit
    def prefill(tp, cache):
        emb = qt.text_projection(
            tp["text_projection"],
            embedding(tp["text_embedding"],
                      jnp.ones((1, PREFILL), jnp.int32)))
        _, _, cache = qt.talker_step(tp, tcfg, emb, cache)
        return cache

    @functools.partial(jax.jit, static_argnums=(3,))
    def frames(tp, cache, codes0, n):
        def step(carry, _):
            codes, cache = carry
            te = embedding(tp["text_embedding"], text_tok[:, None])
            te = qt.text_projection(tp["text_projection"], te)
            c0 = embedding(tp["codec_embedding"], codes[:, :1])
            rest = sum(tp["code_predictor"]["codec_embeddings"][g]
                       [codes[:, g + 1]][:, None]
                       for g in range(tcfg.num_code_groups - 1))
            emb = te + c0 + rest.astype(te.dtype)
            logits, hidden, cache = qt.talker_step(tp, tcfg, emb, cache)
            code0 = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            c0e = embedding(tp["codec_embedding"], code0[:, None])
            codes_rest = qt.predict_codes(tp["code_predictor"], tcfg,
                                          hidden[:, -1:], c0e)
            codes = jnp.concatenate([code0[:, None], codes_rest], 1)
            return (codes, cache), codes
        (_, _), cs = jax.lax.scan(step, (codes0, cache), length=n)
        return cs[:, 0]                     # [n, 16]

    decode = jax.jit(lambda dec, codes: qt.codec_decode(dec, codes, dcfg))

    def e2e():
        cache = base.init_cache(tcfg.transformer, 1,
                                PREFILL + N_FRAMES + 8, jnp.bfloat16)
        codes0 = jnp.full((1, tcfg.num_code_groups), 5, jnp.int32)
        t0 = time.perf_counter()
        cache = prefill(tp, cache)
        codes = frames(tp, cache, codes0, N_FRAMES) % 2048
        wav = decode(dec, codes.astype(jnp.int32))
        float(wav[-1])
        return time.perf_counter() - t0

    e2e()                                   # compile
    t = _timeit(e2e, 3)
    audio_s = N_FRAMES * 1920 / 24000.0
    rtf = t / audio_s
    emit("qwen3_tts_e2e_rtf", rtf, "rtf(lower=better)", (1 / 2.3) / rtf)


def bench_flux_klein():
    from ominix_mlx_tpu.models import flux_klein as fk
    from ominix_mlx_tpu.models.dit import vae

    cfg = fk.FluxKleinConfig()
    vcfg = vae.VAEConfig()
    params = fk.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    vparams = vae.init_decoder(vcfg, jax.random.PRNGKey(1), jnp.bfloat16)
    txt = jax.random.normal(jax.random.PRNGKey(2), (1, 256, cfg.txt_embed_dim),
                            jnp.bfloat16)

    def once():
        t0 = time.perf_counter()
        img = fk.generate_image(params, cfg, vparams, vcfg, txt,
                                height=1024, width=1024, num_steps=4)
        float(img[0, 0, 0, 0])
        return time.perf_counter() - t0

    t = _timeit(once, 3)
    emit("flux_klein_1024px_s_per_image", t, "s/image", 5.0 / t)


def bench_sovits():
    """GPT-SoVITS voice-clone synthesis RTF vs the reference's 4x real-time
    (README.md:587): T2S AR semantics (host loop, EOS-capable) + VITS
    decode, full production sizes, random weights."""
    import numpy as np

    from ominix_mlx_tpu.models import gpt_sovits as gs
    from ominix_mlx_tpu.models import vits

    tcfg = gs.T2SConfig()
    vcfg = vits.VITSConfig()
    cloner = gs.VoiceCloner(
        t2s_params=gs.init_t2s(tcfg, jax.random.PRNGKey(0), jnp.bfloat16),
        t2s_cfg=tcfg,
        vits_params=vits.init_params(vcfg, jax.random.PRNGKey(1),
                                     jnp.bfloat16),
        vits_cfg=vcfg)
    cloner.set_reference_semantics(np.arange(50) % 1024)
    cloner.set_reference_spec(np.abs(np.random.default_rng(0).normal(
        size=(64, vcfg.spec_channels))).astype(np.float32))
    phonemes = [int(x) for x in np.arange(64) % tcfg.phoneme_vocab]

    def once():
        t0 = time.perf_counter()
        wav = cloner.synthesize(phonemes, max_tokens=100)
        dt = time.perf_counter() - t0
        audio_s = max(len(wav), 1) / 32000.0
        return dt, audio_s

    once()
    dt, audio_s = min((once() for _ in range(2)), key=lambda x: x[0])
    rtf = dt / audio_s
    emit("gpt_sovits_clone_rtf", rtf, "rtf(lower=better)", 0.25 / rtf)


def bench_sala_w8():
    """MiniCPM-SALA-9B-class hybrid at w8a8 vs the reference's 28 tok/s
    8-bit number (README.md:581). Quantized weights are built directly in
    the packed kernel layout from the init tree's SHAPES (jax.eval_shape)
    — materializing 9B dense params first would OOM the chip."""
    from ominix_mlx_tpu.core.quant import QuantizedTensor
    from ominix_mlx_tpu.models import minicpm_sala as mc
    from ominix_mlx_tpu.ops.quant_matmul import prepare

    cfg = mc.MiniCPMConfig(
        vocab_size=73448, hidden_size=4096, num_layers=32, num_heads=32,
        num_kv_heads=2, head_dim=128, intermediate_size=11264,
        mixer_types=tuple(("lightning-attn" if i % 4 != 3 else "minicpm4")
                          for i in range(32)))
    gs = 64
    shapes = jax.eval_shape(
        lambda: mc.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16))
    kit = iter(jax.random.split(jax.random.PRNGKey(1), 4096))

    def eligible(s):
        return (len(s.shape) == 2 and s.shape[0] % 128 == 0
                and s.shape[1] % 128 == 0 and s.shape[1] % gs == 0
                and min(s.shape) >= 256)

    def build(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "w" and hasattr(v, "shape") and eligible(v):
                    N, K = v.shape
                    out[k] = prepare(QuantizedTensor(
                        q=jax.random.randint(next(kit), (N, K), -127, 128,
                                             jnp.int8),
                        scales=jnp.full((N, K // gs), (K ** -0.5) / 127,
                                        jnp.bfloat16),
                        biases=jnp.zeros((N, K // gs), jnp.bfloat16),
                        group_size=gs, bits=8))
                else:
                    out[k] = build(v)
            return out
        if isinstance(node, list):
            return [build(v) for v in node]
        if hasattr(node, "shape"):
            return (jax.random.normal(next(kit), node.shape, node.dtype)
                    * 0.02)
        return node

    params = build(shapes)

    @jax.jit
    def decode_n(params, cache, tok):
        def step(carry, _):
            tok, cache = carry
            logits, cache = mc.forward(params, cfg, tok, cache)
            return (jnp.argmax(logits[:, -1:], -1).astype(jnp.int32),
                    cache), logits.sum()
        (_, _), outs = jax.lax.scan(step, (tok, cache), length=128)
        return outs.sum()

    def once():
        cache = mc.init_cache(cfg, 1, 1024, jnp.bfloat16)
        t0 = time.perf_counter()
        float(decode_n(params, cache, jnp.ones((1, 1), jnp.int32)))
        return time.perf_counter() - t0

    once()
    t = min(once() for _ in range(2))
    tps = 128 / t
    emit("minicpm_sala_9b_w8a8_decode", tps, "tokens/sec", tps / 28.0)


def bench_moxin_decoder():
    """Moxin-7B VLM decode vs the reference's 30 tok/s 8-bit (README:582):
    the VLM decoder IS Mistral-7B (vision towers run once at prefill), so
    steady-state decode is the Mistral w8a8 stream."""
    from ominix_mlx_tpu.core.generate import Engine
    from ominix_mlx_tpu.core.sampling import SamplerConfig
    from ominix_mlx_tpu.models import base

    cfg = base.TransformerConfig(
        vocab_size=32000, hidden_size=4096, num_layers=32, num_heads=32,
        num_kv_heads=8, head_dim=128, intermediate_size=14336,
        rope_theta=1000000.0, tie_word_embeddings=False)
    params = base.init_quantized_params(cfg, jax.random.PRNGKey(0), 64, 8)
    params = base.fuse_layer_projections(params)
    engine = Engine(lambda p, t, c: base.forward(p, cfg, t, c), params)
    prompt = jnp.ones((1, 128), jnp.int32)

    def run(n):
        cache = base.init_cache(cfg, 1, 1024, jnp.bfloat16)
        t0 = time.perf_counter()
        toks, _ = engine.generate_scan(prompt, cache, max_tokens=n)
        int(toks[0, -1])
        return time.perf_counter() - t0

    run(128)
    run(512)
    t_short = min(run(128) for _ in range(2))
    t_long = min(run(512) for _ in range(2))
    tps = 384 / (t_long - t_short)
    emit("moxin_vlm_decoder_w8a8", tps, "tokens/sec", tps / 30.0)


def bench_moe_w4():
    """MoE decode through gather_qmm + sorted dispatch (VERDICT r4 #4):
    DeepSeek-OCR2's 3B-A570M MoE decoder (64 experts top-6 + 2 shared,
    deepseek-ocr2-mlx lib.rs:59-130) at 4-bit — the largest MoE family
    here that fits one 16GB v5e chip quantized (GLM-4.7-Flash/Qwen3-30B
    at w4 are ~17GB and need the 2-chip EP sharding, dryrun-verified).
    Reference MoE decode class: 25-45 tok/s (README.md:580)."""
    from ominix_mlx_tpu.core.generate import Engine
    from ominix_mlx_tpu.models import base, deepseek_ocr2 as do
    from ominix_mlx_tpu.models.moe import init_moe_params

    cfg = do.config_from_hf({})
    key = jax.random.PRNGKey(0)
    params = base.init_params(cfg, key, jnp.bfloat16)
    ks = iter(jax.random.split(jax.random.PRNGKey(1), cfg.num_layers * 4))
    for i, lp in enumerate(params["layers"]):
        if i == 0:
            continue                      # first_k_dense=1: layer 0 dense
        moe = init_moe_params(next(ks), cfg.hidden_size, cfg.moe,
                              jnp.bfloat16)
        I = cfg.moe.moe_intermediate_size * cfg.moe.n_shared_experts
        s = cfg.hidden_size ** -0.5
        moe["shared_expert"] = {
            n: {"w": jax.random.uniform(next(ks), shape, jnp.bfloat16,
                                        -s, s)}
            for n, shape in (("gate_proj", (I, cfg.hidden_size)),
                             ("up_proj", (I, cfg.hidden_size)),
                             ("down_proj", (cfg.hidden_size, I)))}
        for n in ("gate_proj", "up_proj", "down_proj"):
            del lp[n]
        lp["moe"] = moe
    params = base.quantize_params(params, 64, 4)
    params = base.fuse_layer_projections(params)
    engine = Engine(lambda p, t, c: base.forward(p, cfg, t, c), params)
    prompt = jnp.ones((1, 64), jnp.int32)

    def run(n):
        cache = base.init_cache(cfg, 1, 640, jnp.bfloat16)
        t0 = time.perf_counter()
        toks, _ = engine.generate_scan(prompt, cache, max_tokens=n)
        int(toks[0, -1])
        return time.perf_counter() - t0

    run(64)
    run(256)
    t_short = min(run(64) for _ in range(2))
    t_long = min(run(256) for _ in range(2))
    tps = 192 / (t_long - t_short)
    emit("deepseek_ocr2_moe_w4_decode", tps, "tokens/sec", tps / 45.0)


def bench_zimage():
    """Z-Image Turbo 1024px 9-step vs the reference's ~3 s/image
    (README.md:588; conditions unstated there — this measures the full
    1024px 9-step pipeline)."""
    from ominix_mlx_tpu.models import zimage as zi
    from ominix_mlx_tpu.models.dit import vae

    cfg = zi.ZImageConfig()
    # Z-Image latents are 16-channel (FLUX.1-style VAE head)
    vcfg = vae.VAEConfig(z_channels=cfg.in_channels)
    # The 6B DiT runs w8 (channelwise int8, pure XLA int8 MXU): bf16
    # params alone are ~12GB and the 1024px forward needs ~5GB of temps —
    # 17.12G vs the chip's 15.75G (measured AOT OOM, r5). The reference
    # runs Z-Image in "8GB" (README.md:588), i.e. quantized, so w8 is the
    # parity condition, and channel8 prefill-shape matmuls measured
    # neutral-or-better vs bf16 (docs/performance.md). Init + quantize in
    # ONE jit so XLA frees each bf16 leaf right after quantizing — the
    # bf16 and int8 trees never coexist in HBM (no CPU backend exists
    # under the axon platform to stage through).
    from ominix_mlx_tpu.core.quant import quantize_tree

    @jax.jit
    def init_q(key):
        p = zi.init_params(cfg, key, jnp.bfloat16)
        return quantize_tree(p, scheme="channel8", min_dim=512)

    params = init_q(jax.random.PRNGKey(0))
    vparams = vae.init_decoder(vcfg, jax.random.PRNGKey(1), jnp.bfloat16)
    cap = jax.random.normal(jax.random.PRNGKey(2), (1, 128, cfg.cap_feat_dim),
                            jnp.bfloat16)

    # compose from per-step + VAE jits: the full 9-step program crashes
    # the remote compile helper at this model size
    from ominix_mlx_tpu.models.zimage import coordinate_grid

    vf = 2 ** (len(vcfg.ch_mult) - 1)
    lh = lw = 1024 // vf
    ph = pw = lh // cfg.patch_size
    x_pos = jnp.asarray(np.broadcast_to(
        coordinate_grid((1, ph, pw)), (1, ph * pw, 3)))
    cap_pos = jnp.asarray(np.broadcast_to(
        coordinate_grid((cap.shape[1], 1, 1), start=(1, 0, 0)),
        (1, cap.shape[1], 3)))
    z = jax.random.normal(jax.random.PRNGKey(3),
                          (1, ph * pw, cfg.patch_channels), jnp.float32)

    # ONE step per jit: a 4-step lax.scan version OOMed at compile (r5:
    # 17.12G vs 15.75G HBM — the while loop double-buffers its temps on
    # top of the ~12GB bf16 params); the per-step dispatch (~25ms through
    # the tunnel) is accounted by timing the call including the fetch
    @jax.jit
    def step1(params, z, cap):
        v = zi.forward(params, cfg, z.astype(cap.dtype),
                       jnp.full((1,), 0.5), cap, x_pos, cap_pos)
        return z - 0.1 * v.astype(z.dtype)

    @jax.jit
    def vae_dec(vparams, lat):
        return vae.decode(vparams, vcfg, lat).sum()

    from ominix_mlx_tpu.models.flux_klein import unpack_latent

    def t_steps():
        t0 = time.perf_counter()
        zz = z
        for _ in range(3):
            zz = step1(params, zz, cap)
        float(zz.sum())
        return time.perf_counter() - t0

    lat = unpack_latent(z, ph, pw, cfg.in_channels, cfg.patch_size)

    def t_vae():
        t0 = time.perf_counter()
        float(vae_dec(vparams, lat))
        return time.perf_counter() - t0

    ts = _timeit(t_steps, 3)
    tv = _timeit(t_vae, 3)
    t = ts / 3 * 9 + tv
    emit("zimage_1024px_s_per_image", t, "s/image", 3.0 / t)


BENCHES = {"paraformer": bench_paraformer, "asr": bench_qwen3_asr,
           "asr17": lambda: bench_qwen3_asr("1.7b"),
           "tts": bench_qwen3_tts, "tts_e2e": bench_qwen3_tts_e2e,
           "flux": bench_flux_klein,
           "sovits": bench_sovits, "sala8": bench_sala_w8,
           "moxin": bench_moxin_decoder, "zimage": bench_zimage,
           "moe4": bench_moe_w4}


def main():
    """Each metric in its own subprocess: model buffers don't free within a
    process (jit caches pin them) and the device tunnel needs ~100s between
    clients before HBM is reusable (CLAUDE.md round-2 notes)."""
    import os
    import subprocess

    ap = argparse.ArgumentParser()
    ap.add_argument("--only",
                    default="paraformer,asr,tts,tts_e2e,flux,sovits,sala8")
    ap.add_argument("--one", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.one:
        try:
            BENCHES[args.one]()
        except Exception as e:
            print(json.dumps({"metric": args.one, "error":
                              f"{type(e).__name__}: {e}"[:300]}), flush=True)
        return

    names = args.only.split(",")
    for i, name in enumerate(names):
        if i:
            time.sleep(100)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        for ln in lines:
            print(ln, flush=True)
        if not lines:
            print(json.dumps({"metric": name,
                              "error": r.stderr.strip()[-300:]}), flush=True)


if __name__ == "__main__":
    main()

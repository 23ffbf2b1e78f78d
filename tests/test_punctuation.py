"""CT-Transformer punctuation: segmentation semantics, reconstruction
rules, and the e2e jitted model on random weights + a name-map unit test."""

import jax
import jax.numpy as jnp
import numpy as np

from ominix_mlx_tpu.models import punctuation as punc


def test_segment_text():
    assert punc.segment_text("你好世界") == ["你", "好", "世", "界"]
    assert punc.segment_text("hello world") == ["hello", "world"]
    assert punc.segment_text("我用hello测试") == ["我", "用", "hello", "测",
                                                  "试"]


def test_ensure_sentence_ending():
    assert punc.ensure_sentence_ending("你好") == "你好。"
    assert punc.ensure_sentence_ending("你好，") == "你好。"
    assert punc.ensure_sentence_ending("hello") == "hello."
    assert punc.ensure_sentence_ending("done.") == "done."
    assert punc.ensure_sentence_ending("好。") == "好。"


def _tiny():
    cfg = punc.PunctuationConfig(vocab_size=64, hidden=32, layers=2,
                                 heads=2, ffn=48)
    params = punc.init_params(cfg, jax.random.PRNGKey(0))
    vocab = {ch: i + 2 for i, ch in enumerate("你好世界测试helowrd")}
    return punc.PunctuationModel(params, cfg, vocab, unk_id=0)


def test_punctuate_end_to_end():
    m = _tiny()
    out = m.punctuate("你好世界hello world你好")
    # every input token survives in order; ends with sentence punctuation
    stripped = "".join(c for c in out if c not in "，。？、 .")
    assert stripped == "你好世界helloworld你好"
    assert out.endswith(("。", ".", "？", "?"))
    assert m.punctuate("") == ""


def test_ascii_words_keep_spaces():
    m = _tiny()
    out = m.punctuate("hello world")
    assert "hello" in out and "world" in out
    i, j = out.index("hello") + 5, out.index("world")
    assert " " in out[i:j + 1] or out[i] == " "


def test_params_from_flat_name_map():
    cfg = punc.PunctuationConfig(vocab_size=16, hidden=8, layers=1,
                                 heads=2, ffn=12)
    rng = np.random.default_rng(0)

    def t(*shape):
        return rng.normal(size=shape).astype(np.float32)

    flat = {
        "embed.0.weight": t(16, 8),
        "encoder.encoders.0.self_attn.linear_q_k_v.weight": t(24, 8),
        "encoder.encoders.0.self_attn.linear_q_k_v.bias": t(24),
        "encoder.encoders.0.self_attn.linear_out.weight": t(8, 8),
        "encoder.encoders.0.self_attn.linear_out.bias": t(8),
        "encoder.encoders.0.self_attn.fsmn_block.weight": t(8, 1, 11),
        "encoder.encoders.0.norm1.weight": t(8),
        "encoder.encoders.0.norm1.bias": t(8),
        "encoder.encoders.0.norm2.weight": t(8),
        "encoder.encoders.0.norm2.bias": t(8),
        "encoder.encoders.0.feed_forward.w_1.weight": t(12, 8),
        "encoder.encoders.0.feed_forward.w_1.bias": t(12),
        "encoder.encoders.0.feed_forward.w_2.weight": t(8, 12),
        "encoder.encoders.0.feed_forward.w_2.bias": t(8),
        "encoder.after_norm.weight": t(8),
        "encoder.after_norm.bias": t(8),
        "decoder.weight": t(6, 8),
        "decoder.bias": t(6),
    }
    params = punc.params_from_flat(flat, cfg)
    assert len(params["layers"]) == 1
    assert params["layers"][0]["self_attn"]["fsmn_block"]["w"].shape \
        == (8, 11, 1)
    logits = punc.forward(params, cfg, jnp.ones((1, 5), jnp.int32))
    assert logits.shape == (1, 5, 6)
    assert np.all(np.isfinite(np.asarray(logits)))

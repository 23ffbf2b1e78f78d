"""Synthetic checkpoint name-map round trips (VERDICT r3 item 8).

The reference loads real torch checkpoints for these families
(speaker_encoder.rs, s3tokenizer_mlx.rs:345-415, sam loading in
deepseek-ocr, FunASR punc.pt); with no egress the name maps were untested.
These tests exercise each ``params_from_flat`` name-for-name: build a flat
state-dict with the PUBLISHED tensor names and torch layouts from an
init_params tree, load it through the map, and require the exact tree back
(transposes are bit-exact inverses).
"""

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{k}.")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten(v, f"{prefix}{i}.")
    else:
        yield prefix[:-1], tree


def assert_tree_equal(got, want):
    g, w = dict(_flatten(got)), dict(_flatten(want))
    assert set(g) == set(w), (sorted(set(w) - set(g))[:5],
                              sorted(set(g) - set(w))[:5])
    for k in w:
        np.testing.assert_array_equal(np.asarray(g[k]), np.asarray(w[k]),
                                      err_msg=k)


def _t(w):
    """ours conv1d [out, k, in] -> torch [out, in, k]."""
    return np.asarray(w).transpose(0, 2, 1)


def test_speaker_encoder_name_map():
    from ominix_mlx_tpu.models import speaker_encoder as se

    cfg = se.SpeakerEncoderConfig(
        mel_dim=8, enc_dim=16, enc_channels=(12, 12, 12, 12, 24),
        enc_kernel_sizes=(5, 3, 3, 3, 1), enc_dilations=(1, 2, 3, 4, 1),
        enc_attention_channels=6, enc_res2net_scale=4)
    p0 = se.init_params(cfg, jax.random.PRNGKey(0))
    flat = {}

    def put(name, p):
        flat[f"speaker_encoder.{name}.weight"] = _t(p["w"])
        if "b" in p:
            flat[f"speaker_encoder.{name}.bias"] = np.asarray(p["b"])

    put("blocks.0.conv", p0["tdnn0"])
    for bi, bp in enumerate(p0["blocks"], start=1):
        put(f"blocks.{bi}.tdnn1.conv", bp["tdnn1"])
        for j, rp in enumerate(bp["res2net"]["blocks"]):
            put(f"blocks.{bi}.res2net_block.blocks.{j}.conv", rp)
        put(f"blocks.{bi}.tdnn2.conv", bp["tdnn2"])
        put(f"blocks.{bi}.se_block.conv1", bp["se"]["conv1"])
        put(f"blocks.{bi}.se_block.conv2", bp["se"]["conv2"])
    put("mfa.conv", p0["mfa"])
    put("asp.tdnn.conv", p0["asp"]["tdnn"])
    put("asp.conv", p0["asp"]["conv"])
    put("fc", p0["fc"])

    assert_tree_equal(se.params_from_flat(flat, cfg), p0)


def test_punctuation_name_map():
    from ominix_mlx_tpu.models import punctuation as pu

    cfg = pu.PunctuationConfig(vocab_size=50, hidden=16, ffn=32, layers=2,
                               heads=2, num_classes=6, sanm_kernel=5)
    p0 = pu.init_params(cfg, jax.random.PRNGKey(0))
    flat = {"embed.0.weight": np.asarray(p0["embed"])}

    def lin(name, p):
        flat[f"{name}.weight"] = np.asarray(p["w"])
        if "b" in p:
            flat[f"{name}.bias"] = np.asarray(p["b"])

    def nrm(name, p):
        flat[f"{name}.weight"] = np.asarray(p["w"])
        flat[f"{name}.bias"] = np.asarray(p["b"])

    for i, lp in enumerate(p0["layers"]):
        pre = f"encoder.encoders.{i}"
        nrm(f"{pre}.norm1", lp["norm1"])
        nrm(f"{pre}.norm2", lp["norm2"])
        lin(f"{pre}.self_attn.linear_q_k_v", lp["self_attn"]["linear_q_k_v"])
        lin(f"{pre}.self_attn.linear_out", lp["self_attn"]["out_proj"])
        # ours [d, k, 1] <- torch [d, 1, k] (loader transposes (0, 2, 1))
        flat[f"{pre}.self_attn.fsmn_block.weight"] = np.asarray(
            lp["self_attn"]["fsmn_block"]["w"]).transpose(0, 2, 1)
        lin(f"{pre}.feed_forward.w_1", lp["ffn_up"])
        lin(f"{pre}.feed_forward.w_2", lp["ffn_down"])
    nrm("encoder.after_norm", p0["after_norm"])
    lin("decoder", p0["classifier"])

    assert_tree_equal(pu.params_from_flat(flat, cfg), p0)


def test_sam_vit_name_map():
    from ominix_mlx_tpu.models import sam_vit as sv

    cfg = sv.SamViTConfig(img_size=32, patch_size=8, embed_dim=16, depth=2,
                          num_heads=2, mlp_ratio=2.0, out_chans=8,
                          window_size=2, global_attn_indexes=(1,),
                          adapter_chans=12)
    p0 = sv.init_params(cfg, jax.random.PRNGKey(0))
    flat = {}
    pre = "vision_model"

    def t4(w):       # ours [out, kh, kw, in] -> torch [out, in, kh, kw]
        return np.asarray(w).transpose(0, 3, 1, 2)

    def lin(name, p):
        flat[f"{name}.weight"] = np.asarray(p["w"])
        if "b" in p:
            flat[f"{name}.bias"] = np.asarray(p["b"])

    def nrm(name, p):
        flat[f"{name}.weight"] = np.asarray(p["w"])
        flat[f"{name}.bias"] = np.asarray(p["b"])

    flat[f"{pre}.patch_embed.proj.weight"] = t4(p0["patch_embed"]["w"])
    flat[f"{pre}.patch_embed.proj.bias"] = np.asarray(p0["patch_embed"]["b"])
    flat[f"{pre}.pos_embed"] = np.asarray(p0["pos_embed"])
    for i, bp in enumerate(p0["blocks"]):
        nrm(f"{pre}.blocks.{i}.norm1", bp["norm1"])
        nrm(f"{pre}.blocks.{i}.norm2", bp["norm2"])
        lin(f"{pre}.blocks.{i}.attn.qkv", bp["attn"]["qkv"])
        lin(f"{pre}.blocks.{i}.attn.proj", bp["attn"]["proj"])
        flat[f"{pre}.blocks.{i}.attn.rel_pos_h"] = np.asarray(
            bp["attn"]["rel_pos_h"])
        flat[f"{pre}.blocks.{i}.attn.rel_pos_w"] = np.asarray(
            bp["attn"]["rel_pos_w"])
        lin(f"{pre}.blocks.{i}.mlp.lin1", bp["mlp_fc1"])
        lin(f"{pre}.blocks.{i}.mlp.lin2", bp["mlp_fc2"])
    flat[f"{pre}.neck.0.weight"] = t4(p0["neck0"]["w"])
    nrm(f"{pre}.neck.1", p0["neck_ln0"])
    flat[f"{pre}.neck.2.weight"] = t4(p0["neck1"]["w"])
    nrm(f"{pre}.neck.3", p0["neck_ln1"])
    flat[f"{pre}.net_2.weight"] = t4(p0["net2"]["w"])
    flat[f"{pre}.net_2.bias"] = np.asarray(p0["net2"]["b"])
    flat[f"{pre}.net_3.weight"] = t4(p0["net3"]["w"])
    flat[f"{pre}.net_3.bias"] = np.asarray(p0["net3"]["b"])

    assert_tree_equal(sv.params_from_flat(flat, cfg), p0)


def test_s3_tokenizer_name_map():
    from ominix_mlx_tpu.models import step_audio2 as sa

    cfg = sa.S3Config(mel_dim=8, hidden_dim=16, ffn_dim=32, num_blocks=2,
                      num_heads=2, fsmn_kernel_size=5, output_dim=12)
    p0 = sa.init_s3(cfg, jax.random.PRNGKey(0))
    flat = {}

    def conv(name, p):
        flat[f"{name}.weight"] = _t(p["w"])
        if "b" in p:
            flat[f"{name}.bias"] = np.asarray(p["b"])

    def lin(name, p):
        flat[f"{name}.weight"] = np.asarray(p["w"])
        if "b" in p:
            flat[f"{name}.bias"] = np.asarray(p["b"])

    def nrm(name, p):
        flat[f"{name}.weight"] = np.asarray(p["w"])
        flat[f"{name}.bias"] = np.asarray(p["b"])

    conv("input_conv1", p0["input_conv1"])
    conv("input_conv2", p0["input_conv2"])
    for i, bp in enumerate(p0["blocks"]):
        nrm(f"blocks.{i}.norm1", bp["norm1"])
        nrm(f"blocks.{i}.norm2", bp["norm2"])
        lin(f"blocks.{i}.attn.q_proj", bp["q_proj"])
        lin(f"blocks.{i}.attn.k_proj", bp["k_proj"])
        lin(f"blocks.{i}.attn.v_proj", bp["v_proj"])
        conv(f"blocks.{i}.attn.fsmn", bp["fsmn"])
        lin(f"blocks.{i}.attn.out_proj", bp["out_proj"])
        lin(f"blocks.{i}.ffn.up_proj", bp["ffn_up"])
        lin(f"blocks.{i}.ffn.down_proj", bp["ffn_down"])
    lin("output_proj", p0["output_proj"])

    assert_tree_equal(sa.s3_params_from_flat(flat, cfg), p0)


def test_vits_name_map():
    """flat_from_params -> params_from_flat over the full VITS tree (the
    ONNX-export path shares flat_from_params; see also
    test_vits.test_vits_onnx_export_import_forward_parity)."""
    from ominix_mlx_tpu.models import vits

    cfg = vits.VITSConfig(
        spec_channels=33, inter_channels=16, hidden_channels=16,
        filter_channels=32, n_heads=2, n_layers=2, n_symbols=20, ssl_dim=24,
        codebook_size=32, gin_channels=16, upsample_initial_channel=32,
        upsample_rates=(4,), upsample_kernel_sizes=(8,),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        flow_layers=2, wn_layers=2, wn_kernel=5)
    p0 = vits.init_params(cfg, jax.random.PRNGKey(0))
    p1 = vits.params_from_flat(vits.flat_from_params(p0, cfg), cfg)
    # mapped tree differs from init only in known ways: no mrte.ge_proj
    # (no published torch name) and zero attention biases materialized
    g, w = dict(_flatten(p1)), dict(_flatten(p0))
    extra = {k for k in g if k not in w}
    missing = {k for k in w if k not in g}
    assert all(k.endswith(("q_b", "k_b", "v_b", "o_b")) for k in extra), extra
    assert all(".mrte.ge_proj." in k for k in missing), missing
    for k in set(g) & set(w):
        np.testing.assert_array_equal(np.asarray(g[k]), np.asarray(w[k]),
                                      err_msg=k)

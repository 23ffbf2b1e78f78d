"""Checkpoint conversion: torch .bin -> safetensors (with renames and bf16
round-trip), the reference's ``convert`` feature (mlx-rs-core convert.rs)."""

import os

import numpy as np


def test_convert_torch_checkpoint_roundtrip(tmp_path):
    import torch

    from ominix_mlx_tpu.utils.convert import convert_torch_checkpoint

    sd = {
        "encoder.w": torch.arange(12, dtype=torch.float32).reshape(3, 4),
        "encoder.b": torch.ones(3, dtype=torch.bfloat16) * 1.5,
        "drop.me": torch.zeros(2),
    }
    src = tmp_path / "model.bin"
    torch.save(sd, src)
    out = tmp_path / "out"

    def rename(n):
        if n == "drop.me":
            return None
        return n.replace("encoder.", "enc.")

    convert_torch_checkpoint(str(src), str(out), rename=rename)
    from safetensors import safe_open

    with safe_open(os.path.join(out, "model.safetensors"), "np") as f:
        names = set(f.keys())
        assert names == {"enc.w", "enc.b"}, names
        np.testing.assert_array_equal(
            f.get_tensor("enc.w"),
            np.arange(12, dtype=np.float32).reshape(3, 4))
        b = f.get_tensor("enc.b")
        assert str(b.dtype) == "bfloat16" and float(b[0]) == 1.5


def test_convert_paraformer_rename():
    from ominix_mlx_tpu.utils.convert import paraformer_rename

    assert paraformer_rename("encoder.encoders.5.x") == "layers.5.x"
    assert paraformer_rename("decoder.output_layer.weight") == \
        "output_layer.weight"
    assert paraformer_rename("untouched.name") == "untouched.name"


def test_verify_checkpoint_roundtrip(tmp_path):
    """The --verify parity harness end-to-end (VERDICT r4 #8): save a tiny
    random HF qwen3 checkpoint to disk, run verify_checkpoint through the
    registry name map, and require logit parity vs transformers."""
    import torch
    from transformers import Qwen3Config
    from transformers.models.qwen3 import Qwen3ForCausalLM

    from ominix_mlx_tpu.utils.verify import verify_checkpoint

    hf_cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=True)
    torch.manual_seed(0)
    hf = Qwen3ForCausalLM(hf_cfg).eval()
    d = tmp_path / "tiny-qwen3"
    hf.save_pretrained(d, safe_serialization=True)

    res = verify_checkpoint(str(d))
    assert res["status"] == "parity_ok", res

    # skip-guard: absent checkpoint must skip, never raise
    res = verify_checkpoint(str(tmp_path / "nope"))
    assert res["status"] == "skipped"

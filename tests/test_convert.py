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

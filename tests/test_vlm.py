"""VLM tests: ViT tower shapes (CLS/registers stripped), dual-tower fusion,
end-to-end image+text generation on a tiny assembly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ominix_mlx_tpu.models import moxin_vlm, vit


def test_vit_patch_tokens():
    cfg = vit.ViTConfig(image_size=28, patch_size=14, hidden_size=32,
                        num_layers=2, num_heads=2, mlp_dim=48,
                        has_cls_token=True, num_registers=3, layer_scale=True)
    params = vit.init_params(cfg, jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
    out = vit.encode(params, cfg, img)
    assert out.shape == (2, 4, 32)   # 2x2 patches, CLS+registers stripped
    assert np.isfinite(np.asarray(out)).all()


def test_vit_no_cls():
    cfg = vit.ViTConfig(image_size=28, patch_size=14, hidden_size=24,
                        num_layers=1, num_heads=2, mlp_dim=32,
                        has_cls_token=False)
    params = vit.init_params(cfg, jax.random.PRNGKey(0))
    out = vit.encode(params, cfg, jnp.ones((1, 28, 28, 3)))
    assert out.shape == (1, 4, 24)


@pytest.mark.slow
def test_moxin_generate():
    m = moxin_vlm.init_tiny(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 28, 28, 3)),
                      jnp.float32)
    feats = m.encode_image(img)
    assert feats.shape == (1, 4, 48)
    toks = m.generate(img, [1, 2, 3], max_tokens=5)
    assert len(toks) == 5 and all(0 <= t < 64 for t in toks)
    toks2 = m.generate(img, [1, 2, 3], max_tokens=5)
    assert toks == toks2


def test_sam_vit_window_partition_roundtrip():
    from ominix_mlx_tpu.models import sam_vit
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 12, 8))
    w, pad = sam_vit._window_partition(x, 4)
    assert w.shape == (2 * 3 * 3, 4, 4, 8)
    back = sam_vit._window_unpartition(w, 4, pad, (10, 12))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


@pytest.mark.slow
def test_sam_vit_encode_shapes():
    """SAM ViT-B structure at toy size: windowed + global blocks + neck +
    OCR downsample (reference vision.rs:1-611)."""
    from ominix_mlx_tpu.models import sam_vit
    cfg = sam_vit.SamViTConfig(
        img_size=64, patch_size=16, embed_dim=32, depth=3, num_heads=2,
        window_size=2, global_attn_indexes=(1,), out_chans=16)
    p = sam_vit.init_params(cfg, jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = sam_vit.encode(p, cfg, img)
    # 64/16 = 4 grid; two stride-2 adapter convs -> 1x1
    assert out.shape == (1, 1, 1, 16 * 4)
    assert np.isfinite(np.asarray(out)).all()


def test_pdf_embedded_image_extraction():
    """Pure-python PDF fallback: a synthetic PDF with one embedded JPEG
    page extracts as an RGB image (reference pdf.rs behavior)."""
    import io
    from PIL import Image
    from ominix_mlx_tpu.utils import pdf

    img = Image.fromarray(
        (np.random.default_rng(0).uniform(0, 255, (64, 48, 3))
         ).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    jpeg = buf.getvalue()
    fake = (b"%PDF-1.4\n1 0 obj\n<< /Subtype /Image /Width 48 /Height 64 "
            b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode "
            b"/Length " + str(len(jpeg)).encode() + b" >>\nstream\n"
            + jpeg + b"\nendstream\nendobj\n%%EOF")
    assert pdf.is_pdf(fake)
    pages = pdf.render_pdf_pages(fake)
    assert len(pages) == 1
    assert pages[0].image.shape == (64, 48, 3)


def test_dinov2_hf_parity():
    """Our ViT == HF Dinov2 (with registers when available) on random
    weights — the vision-tower parity the LLM families already have."""
    torch = pytest.importorskip("torch")
    import transformers
    kw = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
              intermediate_size=64, image_size=28, patch_size=14,
              layerscale_value=0.1)
    try:
        from transformers import (Dinov2WithRegistersConfig,
                                  Dinov2WithRegistersModel)
        hf = Dinov2WithRegistersModel(
            Dinov2WithRegistersConfig(num_register_tokens=2, **kw)).eval()
        n_reg = 2
    except ImportError:
        from transformers import Dinov2Config, Dinov2Model
        hf = Dinov2Model(Dinov2Config(**kw)).eval()
        n_reg = 0
    cfg = vit.ViTConfig(image_size=28, patch_size=14, hidden_size=32,
                        num_layers=2, num_heads=2, mlp_dim=64,
                        has_cls_token=True, num_registers=n_reg,
                        layer_scale=True)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = vit.params_from_hf_dinov2(sd, cfg)
    img = np.random.default_rng(0).normal(size=(1, 28, 28, 3)).astype("f4")
    with torch.no_grad():
        want = hf(torch.from_numpy(img.transpose(0, 3, 1, 2))
                  ).last_hidden_state.numpy()
    got = vit.encode(params, cfg, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got), want[:, 1 + n_reg:],
                               rtol=2e-4, atol=2e-4)


def test_siglip_hf_parity():
    torch = pytest.importorskip("torch")
    from transformers import SiglipVisionConfig, SiglipVisionModel
    hf = SiglipVisionModel(SiglipVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=28, patch_size=14)).eval()
    cfg = vit.ViTConfig(image_size=28, patch_size=14, hidden_size=32,
                        num_layers=2, num_heads=2, mlp_dim=64,
                        has_cls_token=False, num_registers=0,
                        hidden_act="gelu_pytorch_tanh")
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = vit.params_from_hf_siglip(sd, cfg)
    img = np.random.default_rng(1).normal(size=(1, 28, 28, 3)).astype("f4")
    with torch.no_grad():
        want = hf(torch.from_numpy(img.transpose(0, 3, 1, 2))
                  ).last_hidden_state.numpy()
    got = vit.encode(params, cfg, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)

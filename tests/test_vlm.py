"""VLM tests: ViT tower shapes (CLS/registers stripped), dual-tower fusion,
end-to-end image+text generation on a tiny assembly."""

import jax
import jax.numpy as jnp
import numpy as np

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

"""HF transformers logit-parity tests for each LLM family (the reference's
cross-impl parity methodology, SURVEY.md §4). Random weights, tiny configs,
fp32 CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ominix_mlx_tpu.models import base, glm4, mixtral, qwen3_moe
from ominix_mlx_tpu.utils.loading import torch_to_jnp

TOKENS = np.array([[5, 17, 99, 3, 42, 7, 18, 1]])


def flat_from_hf(hf_model):
    return {k: torch_to_jnp(v).astype(jnp.float32)
            for k, v in hf_model.state_dict().items()}


def check_parity(fwd, params, cfg, hf, rtol=3e-3, atol=3e-3, n_kv=None):
    with torch.no_grad():
        want = hf(torch.tensor(TOKENS)).logits.numpy()
    cache = base.init_cache(cfg, 1, 16, jnp.float32)
    got, _ = fwd(params, cfg, jnp.asarray(TOKENS), cache)
    np.testing.assert_allclose(np.asarray(got), want, rtol=rtol, atol=atol)


def test_mixtral_parity():
    from transformers import MixtralConfig
    from transformers.models.mixtral import MixtralForCausalLM

    d = dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2,
             intermediate_size=96, num_local_experts=4,
             num_experts_per_tok=2, model_type="mixtral")
    torch.manual_seed(0)
    hf = MixtralForCausalLM(MixtralConfig(**d)).eval()
    cfg = mixtral.config_from_hf(hf.config.to_dict())
    params = mixtral.params_from_flat(flat_from_hf(hf), cfg)
    check_parity(base.forward, params, cfg, hf)


def test_qwen3_moe_parity():
    from transformers import Qwen3MoeConfig
    from transformers.models.qwen3_moe import Qwen3MoeForCausalLM

    d = dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2, head_dim=16,
             intermediate_size=96, moe_intermediate_size=48,
             num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
             decoder_sparse_step=1, mlp_only_layers=[],
             tie_word_embeddings=True)
    torch.manual_seed(0)
    hf = Qwen3MoeForCausalLM(Qwen3MoeConfig(**d)).eval()
    raw = hf.config.to_dict() | {"model_type": "qwen3_moe"}
    cfg = qwen3_moe.config_from_hf(raw)
    params = qwen3_moe.params_from_flat(flat_from_hf(hf), cfg, raw)
    check_parity(base.forward, params, cfg, hf)


def test_glm4_parity():
    try:
        from transformers import Glm4Config
        from transformers.models.glm4 import Glm4ForCausalLM
    except ImportError:
        pytest.skip("transformers lacks glm4")

    d = dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2,
             intermediate_size=96, partial_rotary_factor=0.5,
             attention_bias=True, head_dim=16, pad_token_id=0)
    torch.manual_seed(0)
    hf = Glm4ForCausalLM(Glm4Config(**d)).eval()
    cfg = glm4.config_from_hf(hf.config.to_dict() | {"model_type": "glm4"})
    params = glm4.params_from_flat(flat_from_hf(hf), cfg)
    check_parity(base.forward, params, cfg, hf)


def test_mistral_sliding_window_masks_far_context():
    """With window w, a query must not attend beyond w positions back."""
    from ominix_mlx_tpu.core.attention import causal_mask

    m = causal_mask(1, 32, jnp.int32(20), window=4)
    ok = np.asarray(m)[0] == 0
    assert ok[17:21].all() and not ok[:17].any()

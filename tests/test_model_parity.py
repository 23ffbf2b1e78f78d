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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_glm4_moe_parity():
    from transformers import Glm4MoeConfig
    from transformers.models.glm4_moe import Glm4MoeForCausalLM

    from ominix_mlx_tpu.models import glm4_moe

    d = dict(vocab_size=128, hidden_size=64, num_hidden_layers=3,
             num_attention_heads=4, num_key_value_heads=2, head_dim=16,
             intermediate_size=96, moe_intermediate_size=32,
             n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
             first_k_dense_replace=1, norm_topk_prob=True,
             routed_scaling_factor=1.5, n_group=2, topk_group=1,
             partial_rotary_factor=0.5, use_qk_norm=True, pad_token_id=0)
    torch.manual_seed(0)
    hf = Glm4MoeForCausalLM(Glm4MoeConfig(**d)).eval()
    raw = hf.config.to_dict() | {"model_type": "glm4_moe"}
    cfg = glm4_moe.config_from_hf(raw)
    params = glm4_moe.params_from_flat(flat_from_hf(hf), cfg, raw)
    check_parity(base.forward, params, cfg, hf)


def test_deepseek_v3_mla_parity():
    """Absorbed MLA must match HF's non-absorbed DeepseekV3 exactly."""
    from transformers import DeepseekV3Config
    from transformers.models.deepseek_v3 import DeepseekV3ForCausalLM

    from ominix_mlx_tpu.models import deepseek_v3 as ds

    d = dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=4,
             intermediate_size=96, moe_intermediate_size=32,
             n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
             first_k_dense_replace=1, norm_topk_prob=True,
             routed_scaling_factor=2.0, n_group=2, topk_group=1,
             q_lora_rank=32, kv_lora_rank=32, qk_nope_head_dim=16,
             qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
             rope_interleave=True, pad_token_id=0)
    torch.manual_seed(0)
    hf = DeepseekV3ForCausalLM(DeepseekV3Config(**d)).eval()
    raw = hf.config.to_dict() | {"model_type": "deepseek_v3"}
    cfg = ds.config_from_hf(raw)
    params = ds.params_from_flat(flat_from_hf(hf), cfg, raw)
    with torch.no_grad():
        want = hf(torch.tensor(TOKENS)).logits.numpy()
    cache = ds.init_cache(cfg, 1, 16, jnp.float32)
    got, _ = base.forward(params, cfg, jnp.asarray(TOKENS), cache)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-3, atol=3e-3)


@pytest.mark.slow
def test_qwen3_next_hybrid_parity():
    """GatedDeltaNet + gated attention hybrid vs HF Qwen3Next."""
    from transformers import Qwen3NextConfig
    from transformers.models.qwen3_next import Qwen3NextForCausalLM

    from ominix_mlx_tpu.models import qwen3_next as qn

    d = dict(vocab_size=128, hidden_size=32, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2, head_dim=16,
             intermediate_size=64, moe_intermediate_size=16, num_experts=4,
             num_experts_per_tok=2, shared_expert_intermediate_size=32,
             norm_topk_prob=True, decoder_sparse_step=1, mlp_only_layers=[],
             linear_num_value_heads=4, linear_num_key_heads=2,
             linear_key_head_dim=8, linear_value_head_dim=8,
             linear_conv_kernel_dim=3,
             layer_types=["linear_attention", "full_attention"],
             partial_rotary_factor=0.25, pad_token_id=0)
    torch.manual_seed(0)
    hf = Qwen3NextForCausalLM(Qwen3NextConfig(**d)).eval()
    raw = hf.config.to_dict() | {"model_type": "qwen3_next"}
    cfg = qn.config_from_hf(raw)
    params = qn.params_from_flat(flat_from_hf(hf), cfg, raw)
    with torch.no_grad():
        want = hf(torch.tensor(TOKENS)).logits.numpy()
    cache = qn.init_cache(cfg, 1, 16, jnp.float32)
    got, _ = base.forward(params, cfg, jnp.asarray(TOKENS), cache)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_qwen3_next_prefill_decode_consistency():
    """Hybrid recurrent state: one-shot prefill must equal token-by-token
    (guards against padded-bucketing corrupting the deltanet state)."""
    from ominix_mlx_tpu.models import qwen3_next as qn
    from transformers import Qwen3NextConfig
    from transformers.models.qwen3_next import Qwen3NextForCausalLM

    d = dict(vocab_size=128, hidden_size=32, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2, head_dim=16,
             intermediate_size=64, moe_intermediate_size=16, num_experts=4,
             num_experts_per_tok=2, shared_expert_intermediate_size=32,
             norm_topk_prob=True, decoder_sparse_step=1, mlp_only_layers=[],
             linear_num_value_heads=4, linear_num_key_heads=2,
             linear_key_head_dim=8, linear_value_head_dim=8,
             linear_conv_kernel_dim=3,
             layer_types=["linear_attention", "full_attention"],
             partial_rotary_factor=0.25, pad_token_id=0)
    torch.manual_seed(1)
    hf = Qwen3NextForCausalLM(Qwen3NextConfig(**d)).eval()
    raw = hf.config.to_dict() | {"model_type": "qwen3_next"}
    cfg = qn.config_from_hf(raw)
    params = qn.params_from_flat(flat_from_hf(hf), cfg, raw)
    toks = jnp.asarray(TOKENS)
    c1 = qn.init_cache(cfg, 1, 16, jnp.float32)
    full, _ = base.forward(params, cfg, toks, c1)
    c2 = qn.init_cache(cfg, 1, 16, jnp.float32)
    outs = []
    for t in range(toks.shape[1]):
        lg, c2 = base.forward(params, cfg, toks[:, t:t + 1], c2)
        outs.append(lg[:, 0])
    got = jnp.stack(outs, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


def test_qwen2_parity():
    """Qwen2 (q/k/v bias, no QK-norm) through the same base decoder."""
    from transformers import Qwen2Config
    from transformers.models.qwen2 import Qwen2ForCausalLM

    d = dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2,
             intermediate_size=96, tie_word_embeddings=True)
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(Qwen2Config(**d)).eval()
    cfg = base.TransformerConfig.from_hf(
        hf.config.to_dict() | {"model_type": "qwen2"})
    assert cfg.attention_bias and not cfg.use_qk_norm
    params = base.params_from_flat(flat_from_hf(hf), cfg)
    check_parity(base.forward, params, cfg, hf)


def test_mistral_parity():
    from transformers import MistralConfig
    from transformers.models.mistral import MistralForCausalLM

    from ominix_mlx_tpu.models import mistral

    d = dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2,
             intermediate_size=96, sliding_window=None)
    torch.manual_seed(0)
    hf = MistralForCausalLM(MistralConfig(**d)).eval()
    cfg = mistral.config_from_hf(hf.config.to_dict() | {"model_type": "mistral"})
    params = base.params_from_flat(flat_from_hf(hf), cfg)
    check_parity(base.forward, params, cfg, hf)

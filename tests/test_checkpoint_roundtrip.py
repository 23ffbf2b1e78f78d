"""End-to-end checkpoint path: write a real on-disk checkpoint (sharded
safetensors + config.json + tokenizer.json), load through the registry, and
generate — the exact path a user's HF checkpoint takes. Also covers the
quantized-checkpoint (MLX layout) save/load round trip (the reference's
save_quantized flow, minicpm examples/save_quantized.rs)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ominix_mlx_tpu.core.generate import Engine
from ominix_mlx_tpu.models import base, registry
from ominix_mlx_tpu.models.base import TransformerConfig
from ominix_mlx_tpu.utils.loading import save_safetensors

CFG_JSON = {
    "model_type": "qwen3", "vocab_size": 64, "hidden_size": 32,
    "num_hidden_layers": 2, "num_attention_heads": 2,
    "num_key_value_heads": 1, "head_dim": 16, "intermediate_size": 48,
    "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
    "tie_word_embeddings": True,
}


def _hf_flat(params):
    """Emit HF tensor names from our tree (inverse of params_from_flat)."""
    flat = {"model.embed_tokens.weight": params["embed"],
            "model.norm.weight": params["norm"]}
    for i, lp in enumerate(params["layers"]):
        p = f"model.layers.{i}"
        flat[f"{p}.input_layernorm.weight"] = lp["input_layernorm"]
        flat[f"{p}.post_attention_layernorm.weight"] = \
            lp["post_attention_layernorm"]
        for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
            flat[f"{p}.self_attn.{n}.weight"] = lp[n]["w"]
        for n in ("gate_proj", "up_proj", "down_proj"):
            flat[f"{p}.mlp.{n}.weight"] = lp[n]["w"]
        flat[f"{p}.self_attn.q_norm.weight"] = lp["q_norm"]
        flat[f"{p}.self_attn.k_norm.weight"] = lp["k_norm"]
    return flat


def _write_tokenizer(d):
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {chr(97 + i): i for i in range(26)}
    vocab.update({"<eos>": 26, "hi": 27, "there": 28})
    tok = Tokenizer(BPE(vocab=vocab, merges=[], unk_token=None))
    tok.pre_tokenizer = Whitespace()
    tok.save(os.path.join(d, "tokenizer.json"))
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"eos_token": "<eos>"}, f)


@pytest.fixture
def checkpoint_dir(tmp_path):
    d = str(tmp_path / "tiny-qwen3")
    os.makedirs(d)
    cfg = TransformerConfig.from_hf(CFG_JSON)
    params = base.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    flat = _hf_flat(params)
    # two shards + index, exercising the sharded loader
    names = sorted(flat)
    half = len(names) // 2
    save_safetensors(os.path.join(d, "model-00001-of-00002.safetensors"),
                     {k: flat[k] for k in names[:half]})
    save_safetensors(os.path.join(d, "model-00002-of-00002.safetensors"),
                     {k: flat[k] for k in names[half:]})
    with open(os.path.join(d, "model.safetensors.index.json"), "w") as f:
        json.dump({"weight_map": {
            k: ("model-00001-of-00002.safetensors" if k in names[:half]
                else "model-00002-of-00002.safetensors") for k in names}}, f)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(CFG_JSON, f)
    _write_tokenizer(d)
    return d, params, cfg


def test_load_and_generate_from_disk(checkpoint_dir):
    d, orig_params, cfg = checkpoint_dir
    mod, params, lcfg = registry.load_model(d)
    tokens = jnp.asarray([[1, 5, 9]])
    c1 = base.init_cache(cfg, 1, 16, jnp.float32)
    want, _ = base.forward(orig_params, cfg, tokens, c1)
    c2 = mod.init_cache(lcfg, 1, 16, jnp.float32)
    got, _ = mod.forward(params, lcfg, tokens, c2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tokenizer_and_server_from_disk(checkpoint_dir):
    d, _, _ = checkpoint_dir
    from ominix_mlx_tpu.utils.tokenizer import Tokenizer

    tok = Tokenizer(d)
    ids = tok.encode("hi there", add_special_tokens=False)
    assert tok.decode(ids).replace(" ", "") == "hithere"
    assert tok.eos_token_id == 26

    from ominix_mlx_tpu.serving.server import LoadedModel, Server
    srv = Server(port=18733)
    srv.models["tiny"] = LoadedModel("tiny", d)
    out = srv.chat_completion({
        "model": "tiny", "max_tokens": 4,
        "messages": [{"role": "user", "content": "hi there"}]})
    assert out["usage"]["completion_tokens"] >= 1


def test_quantized_checkpoint_roundtrip(checkpoint_dir):
    """Quantize -> save in MLX layout -> reload via the qcfg path."""
    d, orig_params, cfg = checkpoint_dir
    from ominix_mlx_tpu.core import quant
    from ominix_mlx_tpu.utils.loading import load_safetensors

    flat = _hf_flat(orig_params)
    qflat = {}
    for k, v in flat.items():
        if k.endswith("proj.weight") and v.ndim == 2:
            packed, scales, biases = quant.quantize(v, 16, 8)
            base_name = k[: -len(".weight")]
            qflat[k] = packed
            qflat[base_name + ".scales"] = scales
            qflat[base_name + ".biases"] = biases
        else:
            qflat[k] = v
    qd = d + "-q8"
    os.makedirs(qd)
    save_safetensors(os.path.join(qd, "model.safetensors"), qflat)
    cfgq = dict(CFG_JSON) | {"quantization": {"group_size": 16, "bits": 8}}
    with open(os.path.join(qd, "config.json"), "w") as f:
        json.dump(cfgq, f)
    _write_tokenizer(qd)

    mod, params, lcfg = registry.load_model(qd)
    tokens = jnp.asarray([[1, 5, 9]])
    c1 = base.init_cache(cfg, 1, 16, jnp.float32)
    want, _ = base.forward(orig_params, cfg, tokens, c1)
    c2 = mod.init_cache(lcfg, 1, 16, jnp.float32)
    got, _ = mod.forward(params, lcfg, tokens, c2)
    corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(want).ravel())[0, 1]
    assert corr > 0.99, corr


def test_save_quantized_tool_roundtrip(checkpoint_dir):
    """utils.convert.save_quantized: dir -> quantized dir -> load/serve
    (the user-facing counterpart of the hand-rolled layout test above)."""
    d, orig_params, cfg = checkpoint_dir
    from ominix_mlx_tpu.utils.convert import save_quantized

    qd = d + "-tool-q8"
    n_q = save_quantized(d, qd, bits=8, group_size=16)
    assert n_q >= 7 * 2 + 1            # per-layer projections + embed
    assert os.path.exists(os.path.join(qd, "tokenizer.json"))
    with open(os.path.join(qd, "config.json")) as f:
        assert json.load(f)["quantization"] == {"group_size": 16, "bits": 8}

    mod, params, lcfg = registry.load_model(qd)
    tokens = jnp.asarray([[1, 5, 9]])
    c1 = base.init_cache(cfg, 1, 16, jnp.float32)
    want, _ = base.forward(orig_params, cfg, tokens, c1)
    c2 = mod.init_cache(lcfg, 1, 16, jnp.float32)
    got, _ = mod.forward(params, lcfg, tokens, c2)
    corr = np.corrcoef(np.asarray(got).ravel(),
                       np.asarray(want).ravel())[0, 1]
    assert corr > 0.99, corr


def test_save_quantized_neutralizes_stale_index(checkpoint_dir):
    """Quantizing a SHARDED checkpoint into a dir that already holds a
    multi-shard index must leave a loadable result: the index is always
    rewritten (the loader prefers it), so stale shard files are ignored."""
    import shutil

    d, orig_params, cfg = checkpoint_dir
    from ominix_mlx_tpu.utils.convert import save_quantized

    qd = d + "-inplace"
    shutil.copytree(d, qd)        # qd now holds 2 shards + their index
    save_quantized(qd, qd, bits=8, group_size=16)
    with open(os.path.join(qd, "model.safetensors.index.json")) as f:
        files = set(json.load(f)["weight_map"].values())
    assert files == {"model.safetensors"}, files
    mod, params, lcfg = registry.load_model(qd)
    tokens = jnp.asarray([[1, 5, 9]])
    c1 = base.init_cache(cfg, 1, 16, jnp.float32)
    want, _ = base.forward(orig_params, cfg, tokens, c1)
    c2 = mod.init_cache(lcfg, 1, 16, jnp.float32)
    got, _ = mod.forward(params, lcfg, tokens, c2)
    corr = np.corrcoef(np.asarray(got).ravel(),
                       np.asarray(want).ravel())[0, 1]
    assert corr > 0.99, corr


@pytest.mark.slow
def test_generate_cli_end_to_end(checkpoint_dir):
    """Drive examples/generate.py exactly as a user would (subprocess)."""
    import subprocess
    import sys as _sys

    d, _, _ = checkpoint_dir
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [_sys.executable, "examples/generate.py", "--model", d,
         "--prompt", "hi there", "--max-tokens", "6"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    import re
    assert re.search(r"decode \d+ tok", r.stderr), r.stderr[-800:]


@pytest.mark.slow
def test_generate_cli_speculative(checkpoint_dir):
    """--draft-model path: self-draft speculative decode via the CLI."""
    import subprocess
    import sys as _sys

    d, _, _ = checkpoint_dir
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [_sys.executable, "examples/generate.py", "--model", d,
         "--draft-model", d, "--prompt", "hi there", "--max-tokens", "6"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "speculative:" in r.stderr
    # self-draft: acceptance must be 1.00
    assert "acceptance 1.00" in r.stderr, r.stderr[-400:]

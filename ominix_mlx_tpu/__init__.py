"""ominix_mlx_tpu: TPU-native multimodal inference framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
OminiX-MLX reference stack (Rust + Apple MLX): dense/MoE/hybrid LLMs, VLM/OCR,
ASR, TTS/voice-cloning, and flow-matching DiT image generation, behind a
uniform public API (``load_model`` -> ``generate`` / ``transcribe`` /
``synthesize`` / ``generate_image``), scaled over TPU meshes with GSPMD.

Layering (TPU-native equivalent of reference README.md:39-107):

    CLI / HTTP server          (ominix_mlx_tpu.serving)
    model families             (ominix_mlx_tpu.models)
    shared inference core      (ominix_mlx_tpu.core: cache, rope, attention,
                                samplers, generate engine, quantization)
    kernels                    (ominix_mlx_tpu.ops: Pallas flash-attention,
                                quantized matmul, fused ops; XLA fallbacks)
    parallelism                (ominix_mlx_tpu.parallel: mesh, shardings,
                                collectives -- new design, no ref counterpart)
    JAX / XLA / TPU
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Honor an explicitly-set JAX_PLATFORMS: some environments pin the
    # platform via sitecustomize AFTER jax reads the env var, which makes
    # `JAX_PLATFORMS=cpu python examples/generate.py` silently run on the
    # hardware plugin anyway (and hang when the device tunnel is down).
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass  # already initialized with the same value, or unknown name

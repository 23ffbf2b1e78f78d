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

"""neko_tpu: a TPU-native (JAX/XLA/Pallas/pjit) generalist-agent framework.

Re-implements the capabilities of ManifoldRG/NEKO (a Gato-style multimodal
transformer trained on control trajectories, text, captioning and VQA) with a
TPU-first architecture: host-side packing to static shapes, one pjit-compiled
train step over a ('data', 'model') device mesh, bf16 compute, Pallas flash
attention, and KV-cache autoregressive decode.
"""

from neko_tpu.config import ModelConfig, TokenSpace

__version__ = "0.1.0"

__all__ = ["ModelConfig", "TokenSpace", "__version__"]

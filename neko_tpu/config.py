"""Model / token-space configuration for the NEKO-TPU framework.

The token-space layout mirrors the reference vocabulary contract
(/root/reference/gato/policy/gato_policy.py:60-76): a single shared vocabulary
ordered text -> continuous -> discrete.  We additionally reserve one extra
embedding row for the learned separator token so the packed token-id stream can
encode every non-patch position (the reference instead keeps a separate
`separator_token` Parameter and splices its embedding in python,
gato_policy.py:124,343-345).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

# GPT-2 BPE vocabulary size (reference: AutoTokenizer('gpt2').vocab_size).
DEFAULT_TEXT_TOKENS = 50257


@dataclasses.dataclass(frozen=True)
class TokenSpace:
    """Shared multimodal token id layout.

    ids [0, text_tokens)                                -> text BPE
    ids [text_tokens, text_tokens+continuous_tokens)    -> continuous bins
    ids [.., +discrete_tokens)                          -> discrete bins
    id  vocab_size                                      -> separator (embed only)
    """

    text_tokens: int = DEFAULT_TEXT_TOKENS
    continuous_tokens: int = 1024
    discrete_tokens: int = 1024

    @property
    def vocab_size(self) -> int:
        return self.text_tokens + self.continuous_tokens + self.discrete_tokens

    @property
    def separator_id(self) -> int:
        # One past the predictable vocabulary; has an embedding row but the LM
        # head never scores it (head output dim == vocab_size).
        return self.vocab_size

    @property
    def embed_rows(self) -> int:
        return self.vocab_size + 1

    @property
    def continuous_start(self) -> int:
        return self.text_tokens

    @property
    def discrete_start(self) -> int:
        return self.text_tokens + self.continuous_tokens

    def start(self, kind: str) -> int:
        return {
            "text": 0,
            "continuous": self.continuous_start,
            "discrete": self.discrete_start,
        }[kind]

    def end(self, kind: str) -> int:
        """Inclusive end id per modality (reference `token_ends`)."""
        return {
            "text": self.text_tokens - 1,
            "continuous": self.continuous_start + self.continuous_tokens - 1,
            "discrete": self.discrete_start + self.discrete_tokens - 1,
        }[kind]


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters (reference: gato_policy.py:19-149)."""

    embed_dim: int = 768
    layers: int = 8
    heads: int = 24
    dropout: float = 0.1
    activation_fn: str = "gelu"  # 'gelu' or 'geglu'
    # observation-prediction loss: Gato (and the reference,
    # gato_policy.py:301,312) mask observation tokens OUT of the loss;
    # True additionally trains next-token CE on continuous/discrete obs
    # tokens — the RoboCat recipe (predict future observations, e.g. VQ
    # image codes) the reference's wishlist gestures at.  Images (patch
    # embeddings) are never targets — they are not tokens.
    observation_loss: bool = False
    # stochastic depth (drop-path): MAX residual-branch drop rate, ramped
    # linearly over depth (layer 0 never drops).  Train-mode only; the
    # reference lists this on its own wishlist (misc/todo.md "things to
    # add: stochastic depth") but never built it.
    stochastic_depth: float = 0.0

    # Token space.
    text_tokens: int = DEFAULT_TEXT_TOKENS
    continuous_tokens: int = 1024
    discrete_tokens: int = 1024

    # Context (sequence) length; static shape S of every packed batch.
    context_len: int = 1024

    # Continuous tokenization (mu-law companding, GATO sec. 2.1).
    mu: int = 100
    M: int = 256

    # Image patch embedding.
    patch_size: int = 16
    resid_mid_channels: int = 128
    num_groups: int = 32
    position_vocab_size: int = 128
    use_pos_encoding: bool = True          # inner-timestep positions
    use_patch_pos_encoding: bool = True    # 2-D patch positions

    # Static per-batch patch budget P (packer scatters patch embeddings into
    # the token stream).  0 disables the image path entirely (pure text /
    # state-based control) which also removes the conv from the graph.
    max_patches: int = 0

    # Host->device dtype of the patch pool.  Every image source produces raw
    # 8-bit pixels (Atari frames, PIL decodes) and the model normalizes
    # [0,255] -> [-1,1] on device (reference embeddings.py:38-41), so 'uint8'
    # transfers 4x fewer bytes than f32 with no information loss; set
    # 'float32' only for sources with genuinely fractional pixel values
    # (uint8 packing rounds-and-clips them to [0,255]).
    patch_dtype: str = "uint8"

    # Compute dtypes.  Params are kept fp32; activations in `dtype`.
    dtype: str = "bfloat16"
    param_dtype: str = "float32"

    # Attention implementation: 'auto' picks pallas flash attention on TPU
    # and the XLA reference path elsewhere.
    attention_impl: str = "auto"

    # KV-cache storage dtype for the serving path (prefill/decode/extend
    # cache modes; no effect on training).  'native' keeps cache rows in
    # the activation dtype — bit-exact generation, the default.  'int8'
    # stores symmetric per-row-quantized int8 keys/values plus fp32
    # scales: the decode step is HBM-bandwidth-bound on the cache streams
    # (README "Roadmap"), so halving the bytes read per token is the one
    # remaining serving lever after three rejected kernel designs.  The
    # per-row scales fold into the [B,H,Sq,Sk] logits/weights, so the
    # cache is never dequantized into a materialized bf16 copy.
    kv_cache_dtype: str = "native"

    # Gradient checkpointing (remat) of transformer blocks.
    remat: bool = False

    # LoRA adapters on the attention qkv projection (reference wraps the
    # transformer with peft LoraConfig(TaskType.CAUSAL_LM) whose GPT-2 target
    # is c_attn; train.py:109-112).  r == 0 disables.
    lora_r: int = 0
    lora_alpha: int = 32
    lora_dropout: float = 0.1

    @property
    def token_space(self) -> TokenSpace:
        return TokenSpace(self.text_tokens, self.continuous_tokens, self.discrete_tokens)

    @property
    def vocab_size(self) -> int:
        return self.token_space.vocab_size

    # Vocab-dim padding: the embedding table and LM head shard their vocab
    # dimension over the 'model' mesh axis, so pad to a 256-multiple (keeps
    # every shard lane-aligned for any model-axis size up to 256).  Ids in
    # [vocab_size+1, padded) are never produced; padded logit columns are
    # masked out of the loss.
    VOCAB_ALIGN = 256

    @property
    def padded_vocab_size(self) -> int:
        a = self.VOCAB_ALIGN
        return ((self.vocab_size + a - 1) // a) * a

    @property
    def padded_embed_rows(self) -> int:
        a = self.VOCAB_ALIGN
        return ((self.token_space.embed_rows + a - 1) // a) * a

    @property
    def head_dim(self) -> int:
        assert self.embed_dim % self.heads == 0
        return self.embed_dim // self.heads

    @property
    def activation_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def params_dtype(self):
        return jnp.dtype(self.param_dtype)

    @property
    def patch_np_dtype(self):
        import numpy as np

        return np.dtype(self.patch_dtype)

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)

"""NekoModel: the multimodal generalist policy (Gato-style), TPU-native.

Behavioural contract from the reference GatoPolicy
(/root/reference/gato/policy/gato_policy.py):

* one shared embedding table over text+continuous+discrete ids (+ a learned
  separator row, see neko_tpu/config.py) — gato_policy.py:94,117,124
* image patches embedded by ResNetV2 + projection and *scattered* into the
  token stream (the reference splices them in python; gato_policy.py:282-296)
* learned inner-timestep position embedding added to observation tokens only
  (gato_policy.py:149,381-385)
* untied LM head Linear(embed_dim -> vocab_size, no bias) — gato_policy.py:122
* masked shifted cross-entropy: loss_mask = input_mask[:, :-1] *
  target_mask[:, 1:], mean over unmasked targets of the whole batch
  (gato_policy.py:174-186).  We compute it as masked-sum / mask-count (no
  boolean indexing — dynamic shapes don't jit) which is numerically the same
  mean.

Initialization note: the transformer uses GPT-2's N(0, 0.02) init.  The
reference's top-level modules use torch defaults (embedding N(0,1), LM head
kaiming-uniform); we follow the transformer's 0.02 scheme everywhere for
better-conditioned training — init distributions are not part of the
behavioural contract.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neko_tpu.config import ModelConfig
from neko_tpu.data.batch import PackedBatch
from neko_tpu.models.embeddings import ImagePatchEmbedding
from neko_tpu.models.transformer import Transformer
from neko_tpu.ops.dropout import Dropout

_INIT = nn.initializers.normal(stddev=0.02)


class LMHead(nn.Module):
    """Untied vocab head (reference predict_token, gato_policy.py:122).

    Exposes both a plain projection and a fused chunked-CE loss that avoids
    materializing [B, S, V] logits (see neko_tpu/ops/losses.py).  Param path
    is predict_token/kernel, identical to the nn.Dense layout.
    """

    in_features: int
    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", _INIT, (self.in_features, self.features), self.param_dtype
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x @ self.kernel.astype(self.dtype)

    def loss(
        self, hidden, tokens, input_mask, target_mask, valid_vocab
    ) -> jnp.ndarray:
        from neko_tpu.ops.losses import chunked_masked_xent

        return chunked_masked_xent(
            hidden, self.kernel, tokens, input_mask, target_mask,
            valid_vocab=valid_vocab,
        )

    def loss_gathered(self, hidden, loss_pos, loss_tgt, valid_vocab):
        from neko_tpu.ops.losses import gathered_masked_xent

        return gathered_masked_xent(
            hidden, self.kernel, loss_pos, loss_tgt, valid_vocab=valid_vocab
        )


class NekoModel(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        ts = cfg.token_space
        self.embed_token = nn.Embed(
            cfg.padded_embed_rows,  # vocab-dim padded for 'model' sharding
            cfg.embed_dim,
            embedding_init=_INIT,
            param_dtype=cfg.params_dtype,
            name="embed_token",
        )
        self.image_embedding = ImagePatchEmbedding(cfg, name="image_embedding")
        if cfg.use_pos_encoding:
            self.pos_embed_observation = nn.Embed(
                cfg.context_len,
                cfg.embed_dim,
                embedding_init=_INIT,
                param_dtype=cfg.params_dtype,
                name="pos_embed_observation",
            )
        self.embed_dropout = Dropout(cfg.dropout)
        self.transformer = Transformer(cfg, name="transformer")
        self.predict_token = LMHead(
            in_features=cfg.embed_dim,
            features=cfg.padded_vocab_size,  # padded; loss/decode mask the tail
            dtype=cfg.activation_dtype,
            param_dtype=cfg.params_dtype,
            name="predict_token",
        )

    # ---------------------------------------------------------------- embed
    def embed_batch(
        self, batch: PackedBatch, *, deterministic: bool = True
    ) -> jnp.ndarray:
        """Token ids (+ patch scatter + inner positions) -> [B, S, D]."""
        cfg = self.cfg
        dtype = cfg.activation_dtype
        emb = self.embed_token(batch.tokens).astype(dtype)

        if batch.has_patches:
            p_emb = self.image_embedding(
                batch.patches, batch.patch_pos, deterministic=deterministic
            )  # [N, D] — global patch pool
            # (batch, slot) == (B, S) marks unused entries -> dropped
            emb = emb.at[batch.patch_batch, batch.patch_slot].set(
                p_emb.astype(dtype), mode="drop"
            )

        if cfg.use_pos_encoding:
            pos_idx = jnp.clip(batch.inner_pos, 0, cfg.context_len - 1)
            pos_emb = self.pos_embed_observation(pos_idx).astype(dtype)
            emb = emb + jnp.where((batch.inner_pos >= 0)[..., None], pos_emb, 0.0)
        return emb

    # -------------------------------------------------------------- forward
    def __call__(
        self,
        batch: PackedBatch,
        *,
        deterministic: bool = True,
        compute_loss: bool = False,
        return_logits: Optional[bool] = None,
    ):
        """Returns (logits, loss).

        When compute_loss=True and logits are not requested, the loss is
        computed by the fused chunked-CE head and logits come back as None —
        the full [B, S, V] fp32 logits tensor is never materialized (the
        dominant HBM-bandwidth cost of the naive implementation).
        """
        if return_logits is None:
            return_logits = not compute_loss
        emb = self.embed_batch(batch, deterministic=deterministic)
        emb = self.embed_dropout(emb, deterministic=deterministic)
        hidden = self.transformer(
            emb, batch.input_mask, deterministic=deterministic
        )
        logits = None
        if return_logits:
            logits = self.predict_token(hidden).astype(jnp.float32)
        if not compute_loss:
            return logits, None
        if return_logits:
            loss = masked_next_token_loss(
                logits,
                batch.tokens,
                batch.input_mask,
                batch.target_mask,
                valid_vocab=self.cfg.vocab_size,
            )
        elif batch.loss_pos is not None:
            # head matmul only at gathered target positions
            loss = self.predict_token.loss_gathered(
                hidden, batch.loss_pos, batch.loss_tgt,
                valid_vocab=self.cfg.vocab_size,
            )
        else:
            loss = self.predict_token.loss(
                hidden,
                batch.tokens,
                batch.input_mask,
                batch.target_mask,
                valid_vocab=self.cfg.vocab_size,
            )
        return logits, loss

    # -------------------------------------------------------------- decode
    def prefill(self, emb: jnp.ndarray, input_mask: jnp.ndarray) -> jnp.ndarray:
        """Full forward populating the KV cache; returns fp32 logits [B,S,V]."""
        hidden = self.transformer(
            emb, input_mask, deterministic=True, mode="prefill"
        )
        return self.predict_token(hidden).astype(jnp.float32)

    def decode_step(
        self, emb: jnp.ndarray, decode_index: jnp.ndarray
    ) -> jnp.ndarray:
        """One-token decode using the KV cache.

        emb: [B, 1, D] embedding of the new token; decode_index: int32[B]
        position at which it lives.  Returns fp32 logits [B, 1, V].
        """
        hidden = self.transformer(
            emb,
            jnp.ones(emb.shape[:2], jnp.bool_),
            deterministic=True,
            mode="decode",
            decode_index=decode_index,
        )
        return self.predict_token(hidden).astype(jnp.float32)

    def extend_step(
        self,
        emb: jnp.ndarray,          # [B, K, D] chunk of new-token embeddings
        start: jnp.ndarray,        # int32[B] ring position of chunk token 0
        clear_start=None,          # int32[B] evicted-slot start; None=append
        clear_len: int = 0,        # static: tokens per timestep
        buffer_len: int = 0,       # static: ring size (ctx_ts * clear_len)
    ) -> jnp.ndarray:
        """Chunked append into the KV cache; fp32 logits [B, K, V].

        clear_start given → RING mode (rollout cache): evict one timestep
        slot, write K tokens at (start + i) % buffer_len.  See the 'extend'
        branch of models/transformer.py::Attention for why ring eviction is
        exact.

        clear_start=None → APPEND mode (speculative verify rounds): writes
        at monotone [start, start+K), validity by iota compare.  Requires
        right-padded prompts, no context overflow, and successive rounds
        whose writes cover the stale rejected tail — generate_spec's loop
        guarantees all three.  The cache 'mask' variable is NOT maintained
        in this mode (nothing downstream of a spec loop reads it)."""
        hidden = self.transformer(
            emb,
            jnp.ones(emb.shape[:2], jnp.bool_),
            deterministic=True,
            mode="extend",
            decode_index=start,
            extend_clear=(
                None if clear_start is None
                else (clear_start, clear_len, buffer_len)
            ),
        )
        return self.predict_token(hidden).astype(jnp.float32)

    def embed_tokens(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """Plain token-id embedding (decode loop helper)."""
        return self.embed_token(tokens).astype(self.cfg.activation_dtype)

    def embed_tokens_with_pos(
        self, tokens: jnp.ndarray, pos: jnp.ndarray
    ) -> jnp.ndarray:
        """Token embedding + inner-timestep position (decode loop helper).

        predict_response-style generation re-packs generated text as
        observation tokens, which carry inner positions (the reference
        rebuilds the whole stream per token, gato_policy.py:503-510 ->
        tokenize_input_dicts:381-385); predict_text does NOT (it appends raw
        embeddings, gato_policy.py:462-465)."""
        e = self.embed_token(tokens).astype(self.cfg.activation_dtype)
        if self.cfg.use_pos_encoding:
            idx = jnp.clip(pos, 0, self.cfg.context_len - 1)
            pe = self.pos_embed_observation(idx).astype(self.cfg.activation_dtype)
            e = e + jnp.where((pos >= 0)[..., None], pe, 0.0)
        return e

    def embed_images(self, patches, patch_pos, *, deterministic: bool = True):
        """Standalone patch embedding (caption/VQA eval caches this once,
        mirroring gato_policy.py:489,503-506)."""
        return self.image_embedding(patches, patch_pos, deterministic=deterministic)


def masked_next_token_loss(
    logits: jnp.ndarray,   # fp32 [B, S, V] (V may be vocab-padded)
    tokens: jnp.ndarray,   # i32 [B, S]
    input_mask: jnp.ndarray,
    target_mask: jnp.ndarray,
    valid_vocab: Optional[int] = None,
) -> jnp.ndarray:
    """Shifted masked CE, averaged over unmasked target tokens of the batch."""
    if valid_vocab is not None and valid_vocab < logits.shape[-1]:
        # exclude padded vocab columns from the partition function
        col = jnp.arange(logits.shape[-1])
        logits = jnp.where(col < valid_vocab, logits, -1e30)
    loss_logits = logits[:, :-1, :]
    targets = tokens[:, 1:]
    mask = (
        input_mask[:, :-1].astype(jnp.float32)
        * target_mask[:, 1:].astype(jnp.float32)
    )
    logz = jax.nn.logsumexp(loss_logits, axis=-1)
    # Masked positions may hold ids outside the scored vocabulary (separator /
    # padding) — clip before the gather and zero via `where` (never `*` which
    # would propagate NaN from out-of-range fills).
    safe_targets = jnp.clip(targets, 0, loss_logits.shape[-1] - 1)
    target_logit = jnp.take_along_axis(
        loss_logits, safe_targets[..., None], axis=-1
    )[..., 0]
    nll = jnp.where(mask > 0, logz - target_logit, 0.0)
    denom = jnp.maximum(mask.sum(), 1.0)
    return nll.sum() / denom

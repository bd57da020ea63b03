"""Image patch embedding: ResNetV2 block per 16x16 patch + 2-D patch positions.

TPU-native re-design of the reference ImageEmbedding / PatchPosEncoding /
ResidualBlock_V2 (/root/reference/gato/policy/embeddings.py:8-131):

* The reference receives whole images (B,3,H,W), rearranges to patches and
  convolves per patch inside the model forward.  Here the *packer* has already
  cut images into patches (B, P, ps, ps, 3 — NHWC, TPU's preferred layout) and
  precomputed each patch's quantized position interval, so the device graph is
  a single fixed-shape conv over B*P patches regardless of image sizes mixed
  in the batch.
* Position intervals (embeddings.py:80-91): for an image split into n patches
  along an axis, patch i covers [linspace(0,1,n+1)[i], [i+1]) * 128, truncated
  to int.  Train samples uniformly inside the interval (embeddings.py:93-96,
  with an explicit JAX RNG replacing torch's global RNG); eval uses the
  rounded mean of the closed interval [lo, hi-1] (embeddings.py:97-100).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from neko_tpu.config import ModelConfig
from neko_tpu.ops.gelu import gelu_erf

_INIT = nn.initializers.normal(stddev=0.02)


def patch_position_intervals(n: int, position_vocab_size: int = 128):
    """Quantized (lo, hi) interval per patch index along one axis (numpy-free).

    Mirrors embeddings.py:80-91: linspace(0, 1, n+1) * vocab, truncating cast.
    """
    import numpy as np

    lin = np.linspace(0.0, 1.0, n + 1, dtype=np.float32)
    q = (lin * position_vocab_size).astype(np.int32)
    return np.stack([q[:-1], q[1:]], axis=-1)  # [n, 2]


class ResidualBlockV2(nn.Module):
    """GELU -> 3x3 conv (3->mid) -> GroupNorm -> GELU -> 3x3 conv (mid->3), residual.

    Matches reference ResidualBlock_V2 (embeddings.py:111-131) where the first
    GroupNorm is an Identity.  Operates on NHWC patches.
    """

    mid_channels: int = 128
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = gelu_erf(x)
        h = nn.Conv(
            self.mid_channels,
            (3, 3),
            padding="SAME",
            kernel_init=_INIT,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv1",
        )(h)
        h = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="gn2",
        )(h)
        h = gelu_erf(h)
        h = nn.Conv(
            3,
            (3, 3),
            padding="SAME",
            kernel_init=_INIT,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv2",
        )(h)
        return x + h


class ImagePatchEmbedding(nn.Module):
    """Embed raw patches [*, P, ps, ps, 3] -> [*, P, embed_dim]."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        patches: jnp.ndarray,  # [N, ps, ps, 3] raw 0..255 floats (global pool)
        patch_pos: jnp.ndarray,  # [N, 4] int32 (h_lo, h_hi, w_lo, w_hi)
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        N, ps, _, _ = patches.shape
        dtype = cfg.activation_dtype

        # Normalize: [0,255] -> [-1,1], then / sqrt(patch_size)
        # (embeddings.py:38-41).  Elementwise; XLA fuses into the conv.
        x = patches.astype(dtype)
        x = (x / 255.0 * 2.0 - 1.0) / math.sqrt(ps)

        x = ResidualBlockV2(
            mid_channels=cfg.resid_mid_channels,
            num_groups=cfg.num_groups,
            dtype=dtype,
            param_dtype=cfg.params_dtype,
            name="residual_block",
        )(x)
        x = x.reshape(N, ps * ps * 3)
        x = nn.Dense(
            cfg.embed_dim,
            kernel_init=_INIT,
            dtype=dtype,
            param_dtype=cfg.params_dtype,
            name="projection",
        )(x)

        if cfg.use_patch_pos_encoding:
            x = x + PatchPosEncoding(cfg, name="pos_encoding")(
                patch_pos, deterministic=deterministic
            ).astype(dtype)
        return x


class PatchPosEncoding(nn.Module):
    """2-D learned patch positions from quantized intervals.

    Train-time randomness uses the 'patch_pos' RNG stream (the functional
    equivalent of the reference's `self.training` branch, embeddings.py:93-100).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, patch_pos: jnp.ndarray, *, deterministic: bool) -> jnp.ndarray:
        cfg = self.cfg
        h_lo, h_hi = patch_pos[..., 0], patch_pos[..., 1]
        w_lo, w_hi = patch_pos[..., 2], patch_pos[..., 3]

        if deterministic:
            # round-half-even mean of the closed interval [lo, hi-1]
            h_idx = jnp.round((h_lo + h_hi - 1) / 2.0).astype(jnp.int32)
            w_idx = jnp.round((w_lo + w_hi - 1) / 2.0).astype(jnp.int32)
        else:
            key = self.make_rng("patch_pos")
            kh, kw = jax.random.split(key)
            # uniform integer in [lo, hi); guard degenerate intervals
            h_idx = jax.random.randint(kh, h_lo.shape, h_lo, jnp.maximum(h_hi, h_lo + 1))
            w_idx = jax.random.randint(kw, w_lo.shape, w_lo, jnp.maximum(w_hi, w_lo + 1))

        h_emb = nn.Embed(
            cfg.position_vocab_size,
            cfg.embed_dim,
            embedding_init=_INIT,
            param_dtype=cfg.params_dtype,
            name="height",
        )(jnp.clip(h_idx, 0, cfg.position_vocab_size - 1))
        w_emb = nn.Embed(
            cfg.position_vocab_size,
            cfg.embed_dim,
            embedding_init=_INIT,
            param_dtype=cfg.params_dtype,
            name="width",
        )(jnp.clip(w_idx, 0, cfg.position_vocab_size - 1))
        return h_emb + w_emb

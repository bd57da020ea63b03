"""VQ-VAE image tokenizer (RoboCat-style discrete image codes).

The reference's own wishlist names this ("could try RoboCat style VQGAN
image tokenization", misc/todo.md) but never built it: its only image
path is patch embeddings (embeddings.py).  This module provides the
discrete alternative — a small convolutional VQ-VAE (van den Oord et al.
2017, EMA codebook) that maps an image to a grid of integer codes:

    [B, H, W, C] float -> encode -> [B, h*w] int32 codes < codebook_size

Codes are plain small integers, so they slot straight into the EXISTING
discrete machinery with zero token-space surgery: wrap an image env with
`neko_tpu.envs.vq_wrapper.VQObservationWrapper` and its observations
become a MultiDiscrete space the control task already handles (one
discrete token per grid cell).  decode_indices reconstructs images from
codes (for inspection / future image-prediction heads).

TPU notes: the encoder/decoder are stride-4 conv stacks (NHWC — the TPU
conv layout used by models/embeddings.py); quantization is a single
argmin over the codebook (an [N, K] matmul that XLA maps to the MXU);
the codebook trains with EMA cluster statistics (no codebook gradients),
the straight-through estimator carries gradients through the quantizer,
and dead codes are restarted from batch samples.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VQConfig:
    codebook_size: int = 512
    code_dim: int = 64
    hidden: int = 64
    # two stride-2 convs: a H x W image -> (H/4) x (W/4) code grid
    downscale: int = 4
    commitment_cost: float = 0.25
    ema_decay: float = 0.99
    # channels of the input images
    channels: int = 3


class Encoder(nn.Module):
    cfg: VQConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = nn.Conv(c.hidden, (4, 4), strides=(2, 2), padding="SAME")(x)
        x = nn.gelu(x)
        x = nn.Conv(c.hidden, (4, 4), strides=(2, 2), padding="SAME")(x)
        x = nn.gelu(x)
        x = nn.Conv(c.hidden, (3, 3), padding="SAME")(x)
        x = nn.gelu(x)
        return nn.Conv(c.code_dim, (1, 1))(x)          # [B, h, w, D]


class Decoder(nn.Module):
    cfg: VQConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        x = nn.Conv(c.hidden, (3, 3), padding="SAME")(z)
        x = nn.gelu(x)
        x = nn.ConvTranspose(c.hidden, (4, 4), strides=(2, 2),
                             padding="SAME")(x)
        x = nn.gelu(x)
        x = nn.ConvTranspose(c.hidden, (4, 4), strides=(2, 2),
                             padding="SAME")(x)
        x = nn.gelu(x)
        return nn.Conv(c.channels, (3, 3), padding="SAME")(x)


class VQVAE(nn.Module):
    """Encoder + EMA-codebook quantizer + decoder.

    variables: params (convs) and a mutable 'codebook' collection holding
    {embedding [K, D], cluster_size [K], cluster_sum [K, D]} updated by
    EMA during training (no gradient flows into the codebook)."""

    cfg: VQConfig

    def setup(self):
        c = self.cfg
        self.encoder = Encoder(c)
        self.decoder = Decoder(c)
        self.cb_emb = self.variable(
            "codebook", "embedding",
            lambda: jax.random.normal(
                self.make_rng("codebook") if self.has_rng("codebook")
                else jax.random.key(0),
                (c.codebook_size, c.code_dim),
            ) * 0.1,
        )
        self.cb_size = self.variable(
            "codebook", "cluster_size",
            lambda: jnp.ones((c.codebook_size,), jnp.float32),
        )
        self.cb_sum = self.variable(
            "codebook", "cluster_sum", lambda: self.cb_emb.value.copy()
        )

    def _codebook(self):
        return self.cb_emb, self.cb_size, self.cb_sum

    def _nearest(self, flat, emb):
        # argmin ||z - e||^2 == argmax (2 z.e - ||e||^2): one [N, K] matmul
        dots = flat @ emb.T                              # [N, K]
        e2 = jnp.sum(emb * emb, axis=1)[None, :]
        return jnp.argmax(2.0 * dots - e2, axis=1)       # [N]

    def __call__(self, images, train: bool = False):
        """-> (recon, metrics dict).  In train mode the codebook EMA
        statistics update (mutable=['codebook']) and dead codes restart
        from batch encodings."""
        c = self.cfg
        z = self.encoder(images)                         # [B, h, w, D]
        B, h, w, D = z.shape
        flat = z.reshape(-1, D)
        emb, size, csum = self._codebook()
        idx = self._nearest(flat, emb.value)
        quant = emb.value[idx].reshape(B, h, w, D)

        if train:
            one_hot = jax.nn.one_hot(idx, c.codebook_size, dtype=jnp.float32)
            counts = one_hot.sum(axis=0)                 # [K]
            sums = one_hot.T @ flat                      # [K, D]
            d = c.ema_decay
            new_size = size.value * d + counts * (1 - d)
            new_sum = csum.value * d + sums * (1 - d)
            # dead-code restart: codes whose EMA count collapsed get a
            # random batch encoding (keeps the codebook fully used)
            dead = new_size < 1e-3
            n = flat.shape[0]
            pick = flat[
                jax.random.randint(
                    self.make_rng("codebook"), (c.codebook_size,), 0, n
                )
            ]
            new_emb = jnp.where(
                dead[:, None], pick,
                new_sum / jnp.maximum(new_size, 1e-6)[:, None],
            )
            size.value = jnp.where(dead, 1.0, new_size)
            csum.value = jnp.where(dead[:, None], pick, new_sum)
            emb.value = new_emb

        # straight-through: decoder sees quant, encoder grads pass through
        st = z + jax.lax.stop_gradient(quant - z)
        recon = self.decoder(st)
        commit = jnp.mean((z - jax.lax.stop_gradient(quant)) ** 2)
        recon_err = jnp.mean((recon - images) ** 2)
        perplexity = jnp.exp(
            -jnp.sum(
                jnp.bincount(idx, length=c.codebook_size) / idx.shape[0]
                * jnp.log(
                    jnp.bincount(idx, length=c.codebook_size) / idx.shape[0]
                    + 1e-10
                )
            )
        )
        loss = recon_err + c.commitment_cost * commit
        return recon, {
            "loss": loss, "recon_mse": recon_err, "commit": commit,
            "perplexity": perplexity,
        }

    def encode_indices(self, images):
        """[B, H, W, C] -> int32 [B, h*w] codes."""
        z = self.encoder(images)
        B, h, w, D = z.shape
        emb, _, _ = self._codebook()
        idx = self._nearest(z.reshape(-1, D), emb.value)
        return idx.reshape(B, h * w).astype(jnp.int32)

    def decode_indices(self, idx, grid: Tuple[int, int]):
        """int32 [B, h*w] -> reconstructed images [B, H, W, C]."""
        emb, _, _ = self._codebook()
        h, w = grid
        z = emb.value[idx.reshape(-1)].reshape(
            idx.shape[0], h, w, self.cfg.code_dim
        )
        return self.decoder(z)


def make_train_step(model: VQVAE, optimizer):
    """One jitted VQ-VAE train step over (params, codebook, opt_state)."""

    @jax.jit
    def step(params, codebook, opt_state, images, rng):
        def loss_fn(p):
            (recon, metrics), vars_ = model.apply(
                {"params": p, "codebook": codebook}, images, train=True,
                mutable=["codebook"], rngs={"codebook": rng},
            )
            return metrics["loss"], (metrics, vars_["codebook"])

        (_, (metrics, new_cb)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, new_cb, opt_state, metrics

    return step

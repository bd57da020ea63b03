"""Reference (GatoPolicy) checkpoint migration.

Converts a full reference checkpoint — the `checkpoint_<N>.pt` state_dict
written by /root/reference/gato/utils/utils.py:19-32 — into a NekoModel
params pytree, so users of the reference framework can load their existing
models here directly:

    params = convert_gato_state_dict(torch.load(path), params, cfg)

Weight-layout notes:
* `embed_token.weight` [52305, D] -> embedding rows [:vocab]; the learned
  `separator_token` vector becomes embedding row `vocab` (our separator id)
* `predict_token.weight` [V, D] (torch Linear) -> head kernel [:, :V]
  transposed; padded vocab columns zeroed (masked out of the loss anyway)
* transformer h.<i>.* / ln_f via the shared GPT-2-fork mapping (HF Conv1D
  weights are already [in, out])
* image embedder: torch conv OIHW -> flax HWIO; GroupNorm weight/bias ->
  scale/bias; projection Linear transposed; patch position embeddings copied
* `pos_embed_observation.weight` -> inner-timestep embedding table
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from neko_tpu.config import ModelConfig
from neko_tpu.models.import_gpt2 import convert_transformer_state_dict


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def convert_gato_state_dict(sd: Dict, params, cfg: ModelConfig):
    """Overlay a reference GatoPolicy state_dict onto a NekoModel tree."""
    import jax.numpy as jnp

    sd = {k: _np(v) for k, v in sd.items()}
    ts = cfg.token_space
    params = dict(params)

    # shared embedding + separator row
    emb = np.array(params["embed_token"]["embedding"])
    w = sd["embed_token.weight"]
    assert w.shape[0] == ts.vocab_size, (
        f"reference vocab {w.shape[0]} != configured {ts.vocab_size}"
    )
    emb[: ts.vocab_size] = w
    emb[ts.separator_id] = sd["separator_token"]
    params["embed_token"] = {"embedding": jnp.asarray(emb)}

    # untied head (torch Linear [out, in] -> [in, out]; pad cols zeroed)
    ker = np.zeros_like(np.array(params["predict_token"]["kernel"]))
    ker[:, : ts.vocab_size] = sd["predict_token.weight"].T
    params["predict_token"] = {"kernel": jnp.asarray(ker)}

    # transformer
    tsd = {
        k[len("transformer."):]: v
        for k, v in sd.items()
        if k.startswith("transformer.")
    }
    params["transformer"] = convert_transformer_state_dict(
        tsd, params["transformer"], cfg.layers
    )
    # GEGLU gate (the fork's extra nn.Linear, trajectory_gpt2.py:266-269)
    if cfg.activation_fn == "geglu":
        tr = dict(params["transformer"])
        for i in range(cfg.layers):
            gk = f"transformer.h.{i}.mlp.gated_layer.weight"
            if gk in sd:
                blk = {k: dict(v) for k, v in tr[f"h_{i}"].items()}
                blk["mlp"]["gate"] = {
                    "kernel": jnp.asarray(sd[gk].T),
                    "bias": jnp.asarray(
                        sd[f"transformer.h.{i}.mlp.gated_layer.bias"]
                    ),
                }
                tr[f"h_{i}"] = blk
        params["transformer"] = tr

    if cfg.use_pos_encoding and "pos_embed_observation" in params:
        params["pos_embed_observation"] = {
            "embedding": jnp.asarray(sd["pos_embed_observation.weight"])
        }

    # image embedder (absent from the tree when the model was initialized
    # without any image batch — max_patches == 0)
    if "image_embedding" not in params:
        return params
    ie = {k: dict(v) if isinstance(v, dict) else v
          for k, v in params["image_embedding"].items()}

    def conv(name):
        return {
            "kernel": jnp.asarray(
                sd[f"image_embedding.patch_embedding.{name}.weight"]
                .transpose(2, 3, 1, 0)  # OIHW -> HWIO
            ),
            "bias": jnp.asarray(
                sd[f"image_embedding.patch_embedding.{name}.bias"]
            ),
        }

    ie["residual_block"] = {
        "conv1": conv("conv1"),
        "conv2": conv("conv2"),
        "gn2": {
            "scale": jnp.asarray(sd["image_embedding.patch_embedding.gn2.weight"]),
            "bias": jnp.asarray(sd["image_embedding.patch_embedding.gn2.bias"]),
        },
    }
    # the reference flattens patches as (c, p1, p2) (einops 'c p1 p2',
    # embeddings.py:50); we flatten NHWC patches as (p1, p2, c) — permute the
    # projection's input dimension accordingly
    ps = cfg.patch_size
    pw = sd["image_embedding.post_embedding_projection.weight"]  # [out, c*p1*p2]
    pw = (
        pw.reshape(-1, 3, ps, ps).transpose(0, 2, 3, 1).reshape(pw.shape[0], -1)
    )
    ie["projection"] = {
        "kernel": jnp.asarray(pw.T),
        "bias": jnp.asarray(
            sd["image_embedding.post_embedding_projection.bias"]
        ),
    }
    if cfg.use_patch_pos_encoding:
        ie["pos_encoding"] = {
            "height": {
                "embedding": jnp.asarray(
                    sd["image_embedding.patch_pos_encoding.height_pos_embedding.weight"]
                )
            },
            "width": {
                "embedding": jnp.asarray(
                    sd["image_embedding.patch_pos_encoding.width_pos_embedding.weight"]
                )
            },
        }
    params["image_embedding"] = ie
    return params


def load_reference_checkpoint(path: str, params, cfg: ModelConfig):
    """torch.load a reference `checkpoint_<N>.pt` and convert."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return convert_gato_state_dict(sd, params, cfg)

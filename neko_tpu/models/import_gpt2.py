"""Pretrained HF GPT-2 weight import (--pretrained_lm parity).

The reference loads HF GPT-2 into its forked transformer and expands the
embedding table to the multimodal vocab (gato_policy.py:79-95); the global
position embedding `wpe` is deleted from the fork so its weights are unused.
Here the HF torch state_dict is mapped into the flax param tree:

* wte.weight -> embed_token.embedding rows [0, 50257) (rest keep fresh init)
* h.<i>.{ln_1,ln_2} weight/bias -> transformer.h_<i>.{ln_1,ln_2} scale/bias
* h.<i>.attn.{c_attn,c_proj} -> attention kernels/biases.  HF stores these as
  Conv1D with weight ALREADY [in, out], so no transpose is needed.
* h.<i>.mlp.{c_fc,c_proj} -> MLP
* ln_f -> final LayerNorm
* wpe, lm_head: intentionally dropped (no global positions; untied head)

Use `gpt2_model_config(...)` to get the matching ModelConfig (pretrained
GPT-2 uses the tanh 'gelu_new' activation).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from neko_tpu.config import ModelConfig


def gpt2_model_config(
    base: ModelConfig, n_embd: int, n_layer: int, n_head: int
) -> ModelConfig:
    return base.replace(
        embed_dim=n_embd, layers=n_layer, heads=n_head, activation_fn="gelu_new"
    )


def convert_state_dict(sd: Dict[str, np.ndarray], params, n_layers: int):
    """Overlay an HF GPT2Model state_dict (numpy arrays) onto a NekoModel
    params pytree (returns a new tree; unmatched params keep their values)."""
    import jax.numpy as jnp

    params = {k: v for k, v in params.items()}  # shallow copy top level

    def _np(x):
        return np.asarray(x)

    # embedding expansion (gato_policy.py:94): pretrained text rows only
    wte = _np(sd["wte.weight"])
    emb = np.array(params["embed_token"]["embedding"])
    assert wte.shape[1] == emb.shape[1], (
        f"embed dim mismatch: pretrained {wte.shape[1]} vs model {emb.shape[1]}"
    )
    emb[: wte.shape[0]] = wte
    params["embed_token"] = {"embedding": jnp.asarray(emb)}
    params["transformer"] = convert_transformer_state_dict(
        sd, params["transformer"], n_layers
    )
    return params


def convert_transformer_state_dict(
    sd: Dict[str, np.ndarray], transformer_params, n_layers: int
):
    """Map GPT-2-fork transformer weights (h.<i>.*, ln_f) onto our tree."""
    import jax.numpy as jnp

    def _np(x):
        return np.asarray(x)

    tr = dict(transformer_params)
    for i in range(n_layers):
        blk = {
            k: (dict(v) if isinstance(v, dict) else v)
            for k, v in tr[f"h_{i}"].items()
        }
        p = f"h.{i}."
        blk["ln_1"] = {
            "scale": jnp.asarray(_np(sd[p + "ln_1.weight"])),
            "bias": jnp.asarray(_np(sd[p + "ln_1.bias"])),
        }
        blk["ln_2"] = {
            "scale": jnp.asarray(_np(sd[p + "ln_2.weight"])),
            "bias": jnp.asarray(_np(sd[p + "ln_2.bias"])),
        }
        # merge (don't replace) so extra adapter params (lora_a/lora_b) and
        # the GEGLU gate keep their fresh initialization
        blk["attn"] = {
            **blk.get("attn", {}),
            "c_attn": {
                "kernel": jnp.asarray(_np(sd[p + "attn.c_attn.weight"])),
                "bias": jnp.asarray(_np(sd[p + "attn.c_attn.bias"])),
            },
            "c_proj": {
                "kernel": jnp.asarray(_np(sd[p + "attn.c_proj.weight"])),
                "bias": jnp.asarray(_np(sd[p + "attn.c_proj.bias"])),
            },
        }
        blk["mlp"] = {
            **blk.get("mlp", {}),
            "c_fc": {
                "kernel": jnp.asarray(_np(sd[p + "mlp.c_fc.weight"])),
                "bias": jnp.asarray(_np(sd[p + "mlp.c_fc.bias"])),
            },
            "c_proj": {
                "kernel": jnp.asarray(_np(sd[p + "mlp.c_proj.weight"])),
                "bias": jnp.asarray(_np(sd[p + "mlp.c_proj.bias"])),
            },
        }
        tr[f"h_{i}"] = blk
    tr["ln_f"] = {
        "scale": jnp.asarray(_np(sd["ln_f.weight"])),
        "bias": jnp.asarray(_np(sd["ln_f.bias"])),
    }
    return tr


def load_pretrained_gpt2(params, model_name: str = "gpt2"):
    """Fetch HF GPT-2 (requires network or local cache) and overlay weights."""
    import transformers

    model = transformers.GPT2Model.from_pretrained(model_name)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return convert_state_dict(sd, params, model.config.n_layer), model.config

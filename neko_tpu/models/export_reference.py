"""Export a NekoModel params pytree as a reference (GatoPolicy) checkpoint.

The inverse of `import_reference.convert_gato_state_dict`: produces the
exact `checkpoint_<N>.pt` state_dict the reference's save_model writes
(/root/reference/gato/utils/utils.py:19-32), loadable with
`GatoPolicy(...).load_state_dict(sd, strict=True)` — so models trained here
round-trip back into the reference framework (full interop in BOTH
directions; the reference itself has no export/import tooling at all).

Layout notes mirror import_reference.py:
* embedding rows [:vocab] -> `embed_token.weight`; the separator row ->
  the learned `separator_token` Parameter
* head kernel [:, :vocab] transposed -> `predict_token.weight` (padded vocab
  columns are dropped — they are masked out of the loss on both sides)
* transformer kernels stay [in, out] (HF Conv1D convention, no transpose);
  the GEGLU gate is a plain nn.Linear in the fork -> transposed
* LoRA adapters (when cfg.lora_r > 0) are MERGED into c_attn by default:
  W_eff = W + A @ B * alpha/r (peft's merge_and_unload semantics) — the
  reference checkpoint format has no adapter slots
* per-layer causal buffers (`attn.bias` uint8 tril, `attn.masked_bias`
  -1e4) are synthesized from context_len (trajectory_gpt2.py:127-130);
  they are persistent buffers, required by strict load_state_dict
* image embedder: flax HWIO conv kernels -> torch OIHW; the projection's
  input dim is permuted back from our (p1, p2, c) patch flattening to the
  reference's (c, p1, p2) (embeddings.py:50)
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from neko_tpu.config import ModelConfig


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def export_gato_state_dict(
    params, cfg: ModelConfig, *, merge_lora: bool = True, wte_rows: int = 1
) -> Dict[str, np.ndarray]:
    """NekoModel params -> reference GatoPolicy state_dict (numpy values).

    Use `save_reference_checkpoint` to write the torch .pt artifact.

    `wte_rows`: the fork keeps GPT2Model's own `wte` embedding as a (dead)
    parameter — GatoPolicy feeds inputs_embeds so it is never consulted, but
    strict load_state_dict requires it.  Fresh GatoPolicy constructs the
    config with vocab_size=1 (gato_policy.py:102); pass 50257 when targeting
    a `--pretrained_lm` construction (gato_policy.py:86-95)."""
    ts = cfg.token_space
    sd: Dict[str, np.ndarray] = {}
    D = cfg.embed_dim
    sd["transformer.wte.weight"] = np.zeros((wte_rows, D), np.float32)
    if wte_rows >= ts.text_tokens:
        # keep the pretrained-path invariant wte[:text] == embed[:text]
        # (gato_policy.py:92) so round-tripped checkpoints stay consistent
        sd["transformer.wte.weight"][: ts.text_tokens] = _np(
            params["embed_token"]["embedding"]
        )[: ts.text_tokens]

    emb = _np(params["embed_token"]["embedding"])
    sd["embed_token.weight"] = emb[: ts.vocab_size]
    sd["separator_token"] = emb[ts.separator_id]
    sd["predict_token.weight"] = _np(
        params["predict_token"]["kernel"]
    )[:, : ts.vocab_size].T

    # GatoPolicy constructs pos_embed_observation UNCONDITIONALLY
    # (gato_policy.py:149) — strict load needs the key even when this model
    # never exercised inner positions
    if "pos_embed_observation" in params:
        sd["pos_embed_observation.weight"] = _np(
            params["pos_embed_observation"]["embedding"]
        )
    else:
        sd["pos_embed_observation.weight"] = np.zeros(
            (cfg.context_len, cfg.embed_dim), np.float32
        )

    tr = params["transformer"]
    for i in range(cfg.layers):
        blk = tr[f"h_{i}"]
        p = f"transformer.h.{i}."
        for ln in ("ln_1", "ln_2"):
            sd[p + f"{ln}.weight"] = _np(blk[ln]["scale"])
            sd[p + f"{ln}.bias"] = _np(blk[ln]["bias"])
        attn = blk["attn"]
        ck = _np(attn["c_attn"]["kernel"])
        if merge_lora and cfg.lora_r > 0 and "lora_a" in attn:
            a = _np(attn["lora_a"]["kernel"])       # [D, r]
            b = _np(attn["lora_b"]["kernel"])       # [r, 3D]
            ck = ck + (a @ b) * (cfg.lora_alpha / cfg.lora_r)
        sd[p + "attn.c_attn.weight"] = ck
        sd[p + "attn.c_attn.bias"] = _np(attn["c_attn"]["bias"])
        sd[p + "attn.c_proj.weight"] = _np(attn["c_proj"]["kernel"])
        sd[p + "attn.c_proj.bias"] = _np(attn["c_proj"]["bias"])
        mlp = blk["mlp"]
        sd[p + "mlp.c_fc.weight"] = _np(mlp["c_fc"]["kernel"])
        sd[p + "mlp.c_fc.bias"] = _np(mlp["c_fc"]["bias"])
        sd[p + "mlp.c_proj.weight"] = _np(mlp["c_proj"]["kernel"])
        sd[p + "mlp.c_proj.bias"] = _np(mlp["c_proj"]["bias"])
        if cfg.activation_fn == "geglu" and "gate" in mlp:
            sd[p + "mlp.gated_layer.weight"] = _np(mlp["gate"]["kernel"]).T
            sd[p + "mlp.gated_layer.bias"] = _np(mlp["gate"]["bias"])
        # persistent causal buffers (trajectory_gpt2.py:127-130)
        sd[p + "attn.bias"] = np.tril(
            np.ones((cfg.context_len, cfg.context_len), np.uint8)
        ).reshape(1, 1, cfg.context_len, cfg.context_len)
        sd[p + "attn.masked_bias"] = np.float32(-1e4)
    sd["transformer.ln_f.weight"] = _np(tr["ln_f"]["scale"])
    sd["transformer.ln_f.bias"] = _np(tr["ln_f"]["bias"])

    if "image_embedding" not in params:
        # GatoPolicy also constructs ImageEmbedding unconditionally
        # (gato_policy.py:138-145); a model trained without images (our
        # max_patches == 0) has no such module — synthesize deterministic
        # placeholders so strict load succeeds (never consulted unless the
        # loaded model is fed images: zero weights, identity-ish GN)
        mid, ps, D = cfg.resid_mid_channels, cfg.patch_size, cfg.embed_dim
        ip = "image_embedding.patch_embedding."
        sd[ip + "conv1.weight"] = np.zeros((mid, 3, 3, 3), np.float32)
        sd[ip + "conv1.bias"] = np.zeros((mid,), np.float32)
        sd[ip + "conv2.weight"] = np.zeros((3, mid, 3, 3), np.float32)
        sd[ip + "conv2.bias"] = np.zeros((3,), np.float32)
        sd[ip + "gn2.weight"] = np.ones((mid,), np.float32)
        sd[ip + "gn2.bias"] = np.zeros((mid,), np.float32)
        sd["image_embedding.post_embedding_projection.weight"] = np.zeros(
            (D, ps * ps * 3), np.float32
        )
        sd["image_embedding.post_embedding_projection.bias"] = np.zeros(
            (D,), np.float32
        )
        if cfg.use_patch_pos_encoding:
            z = np.zeros((cfg.position_vocab_size, D), np.float32)
            sd["image_embedding.patch_pos_encoding.height_pos_embedding.weight"] = z
            sd["image_embedding.patch_pos_encoding.width_pos_embedding.weight"] = z.copy()

    if "image_embedding" in params:
        ie = params["image_embedding"]
        rb = ie["residual_block"]
        ip = "image_embedding.patch_embedding."
        for name in ("conv1", "conv2"):
            sd[ip + f"{name}.weight"] = _np(
                rb[name]["kernel"]
            ).transpose(3, 2, 0, 1)  # HWIO -> OIHW
            sd[ip + f"{name}.bias"] = _np(rb[name]["bias"])
        sd[ip + "gn2.weight"] = _np(rb["gn2"]["scale"])
        sd[ip + "gn2.bias"] = _np(rb["gn2"]["bias"])
        ps = cfg.patch_size
        pk = _np(ie["projection"]["kernel"]).T      # [out, p1*p2*c]
        pk = pk.reshape(-1, ps, ps, 3).transpose(0, 3, 1, 2).reshape(
            pk.shape[0], -1
        )  # -> (c, p1, p2) flattening
        sd["image_embedding.post_embedding_projection.weight"] = pk
        sd["image_embedding.post_embedding_projection.bias"] = _np(
            ie["projection"]["bias"]
        )
        if cfg.use_patch_pos_encoding and "pos_encoding" in ie:
            pe = ie["pos_encoding"]
            sd["image_embedding.patch_pos_encoding.height_pos_embedding.weight"] = _np(
                pe["height"]["embedding"]
            )
            sd["image_embedding.patch_pos_encoding.width_pos_embedding.weight"] = _np(
                pe["width"]["embedding"]
            )
    return sd


def save_reference_checkpoint(
    path: str, params, cfg: ModelConfig, *, merge_lora: bool = True,
    wte_rows: int = 1,
) -> None:
    """Write a reference-format `.pt` checkpoint (torch.save of the
    state_dict, matching utils.py:19-32's artifact)."""
    import torch

    sd = {
        k: torch.tensor(v)
        for k, v in export_gato_state_dict(
            params, cfg, merge_lora=merge_lora, wte_rows=wte_rows
        ).items()
    }
    torch.save(sd, path)

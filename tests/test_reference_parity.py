"""Golden parity: our flax transformer vs the reference's forked GPT-2 with
identical weights, at fp32 tolerance (the BASELINE.json requirement).

The reference fork is imported straight from /root/reference with a small
compat shim (transformers moved Conv1D out of modeling_utils after 4.30).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from neko_tpu.config import ModelConfig
from neko_tpu.models.import_gpt2 import convert_state_dict
from neko_tpu.models.transformer import Transformer


def _load_reference_gpt2():
    import transformers.modeling_utils as mu
    from transformers.pytorch_utils import (
        Conv1D,
        find_pruneable_heads_and_indices,
        prune_conv1d_layer,
    )

    mu.Conv1D = Conv1D
    mu.find_pruneable_heads_and_indices = find_pruneable_heads_and_indices
    mu.prune_conv1d_layer = prune_conv1d_layer
    if not hasattr(mu, "SequenceSummary"):
        mu.SequenceSummary = type("SequenceSummary", (), {})
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from gato.transformers import GPT2Model  # noqa: PLC0415

    return GPT2Model


@pytest.mark.parametrize("activation,gate", [("gelu", False), ("gelu", True)])
def test_transformer_matches_reference_fork(activation, gate):
    import jax

    GPT2Model = _load_reference_gpt2()
    import transformers

    D, L, H, S = 64, 2, 2, 16
    tcfg = transformers.GPT2Config(
        vocab_size=1, n_embd=D, n_head=H, n_layer=L,
        resid_pdrop=0.0, attn_pdrop=0.0, embd_pdrop=0.0,
        n_positions=S, n_inner=4 * D, activation_function=activation,
    )
    tcfg.flash = False
    tcfg.gate = gate
    tcfg.n_ctx = S
    ref = GPT2Model(tcfg)
    ref.eval()

    cfg = ModelConfig(
        embed_dim=D, layers=L, heads=H, dropout=0.0,
        activation_fn="geglu" if gate else activation,
        context_len=S, dtype="float32",
        text_tokens=64, continuous_tokens=16, discrete_tokens=16,
        attention_impl="xla",
    )
    model = Transformer(cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(2, S, D).astype(np.float32) * 0.5
    mask = np.ones((2, S), bool)
    mask[1, :5] = False  # left padding on example 1

    params = model.init(
        {"params": jax.random.key(0)},
        np.zeros_like(x), np.ones((2, S), bool),
    )["params"]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    # convert_state_dict works on a full NekoModel tree; wrap the transformer
    wrapped = {"transformer": params, "embed_token": {"embedding": np.zeros((66, D), np.float32)}}
    converted = convert_state_dict(sd, wrapped, n_layers=L)
    params = converted["transformer"]
    if gate:
        # the fork's gated_layer is an extra nn.Linear (torch layout [out,in])
        for i in range(L):
            params[f"h_{i}"]["mlp"]["gate"] = {
                "kernel": sd[f"h.{i}.mlp.gated_layer.weight"].T,
                "bias": sd[f"h.{i}.mlp.gated_layer.bias"],
            }

    ours = model.apply({"params": params}, x, mask)

    with torch.no_grad():
        theirs = ref(
            inputs_embeds=torch.tensor(x),
            attention_mask=torch.tensor(mask.astype(np.float32)),
        )["last_hidden_state"].numpy()

    # compare only valid positions (pad rows are garbage by design)
    np.testing.assert_allclose(
        np.asarray(ours)[0], theirs[0], atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours)[1, 5:], theirs[1, 5:], atol=2e-5, rtol=1e-4
    )


def test_gelu_new_matches_hf_activation():
    import jax.numpy as jnp
    import flax.linen as nn
    from transformers.activations import ACT2FN

    x = np.linspace(-4, 4, 101).astype(np.float32)
    ours = np.asarray(nn.gelu(jnp.asarray(x), approximate=True))
    theirs = ACT2FN["gelu_new"](torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)

    ours_exact = np.asarray(nn.gelu(jnp.asarray(x), approximate=False))
    theirs_exact = ACT2FN["gelu"](torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours_exact, theirs_exact, atol=1e-6)

"""END-TO-END parity: NekoModel vs the actual reference GatoPolicy.

Builds the reference model imported straight from /root/reference (with a
transformers-compat shim and a network-free tokenizer stub), migrates its
weights via neko_tpu.models.import_reference, packs identical mixed-modality
batches, and asserts fp32-tolerance equality of logits and loss — the
BASELINE.json acceptance requirement.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from neko_tpu.config import ModelConfig
from neko_tpu.data.batch import to_device_batch
from neko_tpu.data.packing import SequencePacker
from neko_tpu.models.import_reference import convert_gato_state_dict
from neko_tpu.models.policy import NekoModel

D, L, H, S = 64, 2, 2, 128


class _StubTokenizer:
    vocab_size = 50257

    def decode(self, ids):
        return " ".join(str(int(i)) for i in ids)

    def encode(self, text):
        return [int(t) for t in text.split()]


def _load_reference_policy():
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

    import gato.policy.gato_policy as gp

    # avoid the network fetch of the gpt2 BPE files (gato_policy.py:57)
    gp.AutoTokenizer = types.SimpleNamespace(
        from_pretrained=lambda name: _StubTokenizer()
    )
    return gp.GatoPolicy


@pytest.fixture(scope="module")
def models():
    GatoPolicy = _load_reference_policy()
    ref = GatoPolicy(
        device="cpu", embed_dim=D, layers=L, heads=H, dropout=0.0,
        patch_size=16, resid_mid_channels=128, num_groups=32,
        position_vocab_size=128, context_len=S, activation_fn="gelu",
        use_pos_encoding=True, use_patch_pos_encoding=True, flash=False,
        pad_seq=False,
    )
    ref.eval()

    cfg = ModelConfig(
        embed_dim=D, layers=L, heads=H, dropout=0.0, context_len=S,
        max_patches=8, patch_size=16, resid_mid_channels=128, num_groups=32,
        position_vocab_size=128, dtype="float32", attention_impl="xla",
    )
    import jax

    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    arrays = packer.pack_batch([{"text": [1, 2, 3]}])
    arrays.pop("lengths")
    params = model.init({"params": jax.random.key(0)}, to_device_batch(arrays))[
        "params"
    ]
    params = convert_gato_state_dict(ref.state_dict(), params, cfg)
    return ref, model, params, cfg, packer


def _examples():
    rng = np.random.RandomState(0)
    img_hwc = rng.randint(0, 255, (2, 16, 32, 3)).astype(np.float32)
    return {
        "text": {"ours": {"text": [11, 22, 33, 44, 55]},
                 "ref": {"text": torch.tensor([11, 22, 33, 44, 55])}},
        "continuous": {
            "ours": {
                "continuous_obs": rng.randn(3, 4).astype(np.float32),
                "continuous_actions": np.tanh(rng.randn(3, 2)).astype(np.float32),
            },
        },
        "image_discrete": {
            "ours": {"images": img_hwc,
                     "discrete_actions": np.array([[1], [3]], np.int32)},
            "ref": {"images": torch.tensor(img_hwc.transpose(0, 3, 1, 2)),
                    "discrete_actions": torch.tensor([[1], [3]])},
        },
    }


def _ref_dict(ex):
    if "ref" in ex:
        return ex["ref"]
    return {k: torch.tensor(v) for k, v in ex["ours"].items()}


def test_full_forward_and_loss_parity(models):
    ref, model, params, cfg, packer = models
    exs = _examples()
    ours_batch = [exs[k]["ours"] for k in exs]
    ref_batch = [_ref_dict(exs[k]) for k in exs]

    arrays = packer.pack_batch(ours_batch)
    lengths = arrays.pop("lengths")
    batch = to_device_batch(arrays)
    our_logits, our_loss = model.apply(
        {"params": params}, batch, deterministic=True, compute_loss=True,
        return_logits=True,
    )
    our_logits = np.asarray(our_logits)

    with torch.no_grad():
        ref_logits, ref_loss = ref.forward(ref_batch, compute_loss=True)
    ref_logits = ref_logits.numpy()
    M = ref_logits.shape[1]  # reference pads to the batch max

    V = cfg.vocab_size
    for i, Li in enumerate(lengths):
        ours_i = our_logits[i, S - Li :, :V]
        ref_i = ref_logits[i, M - Li :, :]
        np.testing.assert_allclose(ours_i, ref_i, atol=3e-4, rtol=1e-3)

    np.testing.assert_allclose(float(our_loss), float(ref_loss), rtol=2e-5)


def test_chunked_loss_also_matches_reference(models):
    ref, model, params, cfg, packer = models
    exs = _examples()
    arrays = packer.pack_batch([exs[k]["ours"] for k in exs])
    arrays.pop("lengths")
    _, loss_fused = model.apply(
        {"params": params}, to_device_batch(arrays), deterministic=True,
        compute_loss=True,
    )
    with torch.no_grad():
        _, ref_loss = ref.forward([_ref_dict(exs[k]) for k in exs],
                                  compute_loss=True)
    np.testing.assert_allclose(float(loss_fused), float(ref_loss), rtol=2e-5)

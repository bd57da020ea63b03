"""Reverse interop: NekoModel params -> reference .pt checkpoint.

Strongest check possible in this environment: export OUR randomly
initialized params, `load_state_dict(strict=True)` them into the ACTUAL
reference GatoPolicy from /root/reference, and assert fp32 logit/loss
parity on mixed-modality batches — the mirror image of
tests/test_full_model_parity.py (reference -> ours)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from neko_tpu.config import ModelConfig
from neko_tpu.data.batch import to_device_batch
from neko_tpu.data.packing import SequencePacker
from neko_tpu.models.export_reference import (
    export_gato_state_dict,
    save_reference_checkpoint,
)
from neko_tpu.models.import_reference import convert_gato_state_dict
from neko_tpu.models.policy import NekoModel
from tests.test_full_model_parity import D, H, L, S, _load_reference_policy


def _fresh(cfg):
    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    arrays = packer.pack_batch(
        [{"text": [1, 2, 3]},
         {"images": np.zeros((1, 16, 32, 3), np.float32),
          "discrete_actions": np.array([[1]], np.int32)}]
    )
    arrays.pop("lengths")
    params = model.init(
        {"params": jax.random.key(42)}, to_device_batch(arrays)
    )["params"]
    return model, packer, params


@pytest.fixture(scope="module")
def exported():
    cfg = ModelConfig(
        embed_dim=D, layers=L, heads=H, dropout=0.0, context_len=S,
        max_patches=8, patch_size=16, resid_mid_channels=128, num_groups=32,
        position_vocab_size=128, dtype="float32", attention_impl="xla",
    )
    model, packer, params = _fresh(cfg)
    sd = {
        k: torch.tensor(np.asarray(v))
        for k, v in export_gato_state_dict(params, cfg).items()
    }
    GatoPolicy = _load_reference_policy()
    ref = GatoPolicy(
        device="cpu", embed_dim=D, layers=L, heads=H, dropout=0.0,
        patch_size=16, resid_mid_channels=128, num_groups=32,
        position_vocab_size=128, context_len=S, activation_fn="gelu",
        use_pos_encoding=True, use_patch_pos_encoding=True, flash=False,
        pad_seq=False,
    )
    ref.load_state_dict(sd, strict=True)  # every key, every buffer
    ref.eval()
    return ref, model, packer, params, cfg


def test_strict_load_and_logit_parity(exported):
    ref, model, packer, params, cfg = exported
    rng = np.random.RandomState(1)
    examples = [
        {"text": [7, 8, 9, 10]},
        {
            "continuous_obs": rng.randn(3, 4).astype(np.float32),
            "continuous_actions": np.tanh(rng.randn(3, 2)).astype(np.float32),
        },
    ]
    for ex in examples:
        arrays = packer.pack_batch([ex], pad_side="right")
        n = int(arrays.pop("lengths")[0])
        ours = np.asarray(
            model.apply({"params": params}, to_device_batch(arrays))[0]
        )[0, :n]

        ref_ex = {k: torch.tensor(v) for k, v in ex.items()}
        with torch.no_grad():
            ref_logits, _ = ref.forward([ref_ex], compute_loss=False)
        theirs = ref_logits[0].numpy()[:n]
        np.testing.assert_allclose(ours[:, : theirs.shape[-1]], theirs,
                                   atol=3e-4, rtol=1e-3)


def test_image_branch_parity(exported):
    ref, model, packer, params, cfg = exported
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (1, 16, 32, 3)).astype(np.float32)
    ex = {"images": img, "discrete_actions": np.array([[2]], np.int32)}
    arrays = packer.pack_batch([ex], pad_side="right")
    n = int(arrays.pop("lengths")[0])
    ours = np.asarray(
        model.apply(
            {"params": params}, to_device_batch(arrays),
            rngs={"patch_pos": jax.random.key(0)},
        )[0]
    )[0, :n]
    ref_ex = {
        "images": torch.tensor(img.transpose(0, 3, 1, 2)),
        "discrete_actions": torch.tensor([[2]]),
    }
    with torch.no_grad():
        ref_logits, _ = ref.forward([ref_ex], compute_loss=False)
    theirs = ref_logits[0].numpy()[:n]
    np.testing.assert_allclose(ours[:, : theirs.shape[-1]], theirs,
                               atol=3e-4, rtol=1e-3)


def test_round_trip_identity(exported):
    """import(export(params)) reproduces every exported leaf exactly."""
    ref, model, packer, params, cfg = exported
    sd = export_gato_state_dict(params, cfg)
    back = convert_gato_state_dict(sd, params, cfg)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(back)[0]}
    V = cfg.token_space.vocab_size
    for k, v in flat_a:
        ks = jax.tree_util.keystr(k)
        a, b = np.asarray(v), np.asarray(flat_b[ks])
        if "predict_token" in ks:
            # the padded vocab columns are dropped by the reference format
            # (masked out of the loss on both sides); import re-zeroes them
            a, b = a[:, :V], b[:, :V]
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=ks)


def test_save_reference_checkpoint(tmp_path, exported):
    ref, model, packer, params, cfg = exported
    path = str(tmp_path / "checkpoint_0.pt")
    save_reference_checkpoint(path, params, cfg)
    sd = torch.load(path, map_location="cpu")
    GatoPolicy = _load_reference_policy()
    ref2 = GatoPolicy(
        device="cpu", embed_dim=D, layers=L, heads=H, dropout=0.0,
        patch_size=16, resid_mid_channels=128, num_groups=32,
        position_vocab_size=128, context_len=S, activation_fn="gelu",
        use_pos_encoding=True, use_patch_pos_encoding=True, flash=False,
        pad_seq=False,
    )
    ref2.load_state_dict(sd, strict=True)


def test_textonly_model_exports_strict():
    """A model trained WITHOUT images (max_patches=0 — no image_embedding
    module, no exercised pos table beyond text) must still export a
    strict-loadable checkpoint: GatoPolicy constructs ImageEmbedding and
    pos_embed_observation unconditionally (gato_policy.py:138-149)."""
    cfg = ModelConfig(
        embed_dim=D, layers=L, heads=H, dropout=0.0, context_len=S,
        max_patches=0, patch_size=16, resid_mid_channels=128, num_groups=32,
        position_vocab_size=128, dtype="float32", attention_impl="xla",
    )
    model, packer, params = _fresh_text_only(cfg)
    assert "image_embedding" not in params
    sd = {
        k: torch.tensor(np.asarray(v))
        for k, v in export_gato_state_dict(params, cfg).items()
    }
    GatoPolicy = _load_reference_policy()
    ref = GatoPolicy(
        device="cpu", embed_dim=D, layers=L, heads=H, dropout=0.0,
        patch_size=16, resid_mid_channels=128, num_groups=32,
        position_vocab_size=128, context_len=S, activation_fn="gelu",
        use_pos_encoding=True, use_patch_pos_encoding=True, flash=False,
        pad_seq=False,
    )
    ref.load_state_dict(sd, strict=True)
    ref.eval()
    # text logits still agree
    arrays = packer.pack_batch([{"text": [3, 4, 5]}], pad_side="right")
    n = int(arrays.pop("lengths")[0])
    from neko_tpu.data.batch import to_device_batch as tdb

    ours = np.asarray(model.apply({"params": params}, tdb(arrays))[0])[0, :n]
    with torch.no_grad():
        ref_logits, _ = ref.forward(
            [{"text": torch.tensor([3, 4, 5])}], compute_loss=False
        )
    theirs = ref_logits[0].numpy()[:n]
    np.testing.assert_allclose(ours[:, : theirs.shape[-1]], theirs,
                               atol=3e-4, rtol=1e-3)


def test_lora_merge():
    cfg = ModelConfig(
        embed_dim=32, layers=1, heads=2, dropout=0.0, context_len=32,
        max_patches=0, dtype="float32", attention_impl="xla",
        lora_r=4, lora_alpha=8,
        text_tokens=64, continuous_tokens=16, discrete_tokens=16,
    )
    model, packer, params = _fresh_text_only(cfg)
    attn = params["transformer"]["h_0"]["attn"]
    a = np.asarray(attn["lora_a"]["kernel"], np.float32)
    # zero-init lora_b would make the merge invisible; randomize it
    import jax.numpy as jnp

    b = np.random.RandomState(0).randn(
        *np.asarray(attn["lora_b"]["kernel"]).shape
    ).astype(np.float32)
    attn = dict(attn)
    attn["lora_b"] = {"kernel": jnp.asarray(b)}
    tr = dict(params["transformer"])
    blk = dict(tr["h_0"])
    blk["attn"] = attn
    tr["h_0"] = blk
    params = dict(params)
    params["transformer"] = tr

    sd = export_gato_state_dict(params, cfg, merge_lora=True)
    expect = np.asarray(attn["c_attn"]["kernel"], np.float32) + (
        a @ b
    ) * (cfg.lora_alpha / cfg.lora_r)
    np.testing.assert_allclose(
        sd["transformer.h.0.attn.c_attn.weight"], expect, atol=1e-6
    )
    plain = export_gato_state_dict(params, cfg, merge_lora=False)
    np.testing.assert_allclose(
        plain["transformer.h.0.attn.c_attn.weight"],
        np.asarray(attn["c_attn"]["kernel"], np.float32), atol=0,
    )


def _fresh_text_only(cfg):
    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    arrays = packer.pack_batch([{"text": [1, 2, 3]}])
    arrays.pop("lengths")
    params = model.init(
        {"params": jax.random.key(0)}, to_device_batch(arrays)
    )["params"]
    return model, packer, params

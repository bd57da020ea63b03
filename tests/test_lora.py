"""LoRA adapter tests: identity at init, base-frozen training."""

import jax
import numpy as np

from neko_tpu.config import ModelConfig
from neko_tpu.data.batch import to_device_batch
from neko_tpu.data.packing import SequencePacker
from neko_tpu.models.policy import NekoModel
from neko_tpu.parallel.mesh import create_mesh
from neko_tpu.training.train_state import OptimizerConfig, TrainContext

BASE = ModelConfig(
    embed_dim=32, layers=2, heads=2, dropout=0.0, context_len=32,
    max_patches=0, dtype="float32",
    text_tokens=128, continuous_tokens=32, discrete_tokens=32,
)


def make_batch(cfg):
    p = SequencePacker(cfg)
    arrays = p.pack_batch([{"text": [3, 4, 5, 6]}, {"text": [7, 8, 9]}])
    arrays.pop("lengths")
    return to_device_batch(arrays)


def test_lora_identity_at_init():
    """Zero-init lora_b means the adapted model starts exactly at base."""
    cfg = BASE.replace(lora_r=4)
    base_model, lora_model = NekoModel(BASE), NekoModel(cfg)
    batch = make_batch(BASE)
    base_params = base_model.init({"params": jax.random.key(0)}, batch)["params"]
    lora_params = lora_model.init({"params": jax.random.key(0)}, batch)["params"]
    # graft base weights into the lora tree (shared names match)
    merged = jax.tree_util.tree_map_with_path(
        lambda path, v: v, lora_params
    )

    def overlay(lp, bp):
        out = {}
        for k, v in lp.items():
            if isinstance(v, dict):
                out[k] = overlay(v, bp[k]) if k in bp else v
            else:
                out[k] = bp.get(k, v) if isinstance(bp, dict) else v
        return out

    merged = overlay(lora_params, base_params)
    lg_base, _ = base_model.apply({"params": base_params}, batch)
    lg_lora, _ = lora_model.apply({"params": merged}, batch)
    np.testing.assert_allclose(np.asarray(lg_base), np.asarray(lg_lora), atol=1e-6)


def test_lora_only_training_freezes_base():
    cfg = BASE.replace(lora_r=4)
    opt = OptimizerConfig(
        learning_rate=1e-2, init_lr=1e-3, warmup_steps=2, training_steps=50,
        lora_only=True,
    )
    mesh = create_mesh(data=1, model=1, devices=jax.devices()[:1])
    ctx = TrainContext(cfg, opt, mesh, seed=0)
    batch = make_batch(cfg)
    state = ctx.init_state(batch)
    before = jax.device_get(state.params)
    losses = []
    for _ in range(8):
        state, loss = ctx.train_step(state, batch)
        losses.append(float(loss))
    after = jax.device_get(state.params)

    # transformer base weights unchanged
    np.testing.assert_array_equal(
        before["transformer"]["h_0"]["attn"]["c_attn"]["kernel"],
        after["transformer"]["h_0"]["attn"]["c_attn"]["kernel"],
    )
    # lora + embedding weights moved
    assert not np.allclose(
        before["transformer"]["h_0"]["attn"]["lora_b"]["kernel"],
        after["transformer"]["h_0"]["attn"]["lora_b"]["kernel"],
    )
    assert not np.allclose(
        before["embed_token"]["embedding"], after["embed_token"]["embedding"]
    )
    assert losses[-1] < losses[0]


def test_pretrained_import_preserves_lora_params():
    """convert_transformer_state_dict must merge, not replace, block dicts —
    a --lora --pretrained_lm run needs lora_a/lora_b to survive the import."""
    import numpy as np

    from neko_tpu.models.import_gpt2 import convert_transformer_state_dict

    cfg = BASE.replace(lora_r=4)
    model = NekoModel(cfg)
    batch = make_batch(cfg)
    params = model.init({"params": jax.random.key(0)}, batch)["params"]
    D = cfg.embed_dim
    sd = {}
    for i in range(cfg.layers):
        p = f"h.{i}."
        sd[p + "ln_1.weight"] = np.ones(D, np.float32)
        sd[p + "ln_1.bias"] = np.zeros(D, np.float32)
        sd[p + "ln_2.weight"] = np.ones(D, np.float32)
        sd[p + "ln_2.bias"] = np.zeros(D, np.float32)
        sd[p + "attn.c_attn.weight"] = np.zeros((D, 3 * D), np.float32)
        sd[p + "attn.c_attn.bias"] = np.zeros(3 * D, np.float32)
        sd[p + "attn.c_proj.weight"] = np.zeros((D, D), np.float32)
        sd[p + "attn.c_proj.bias"] = np.zeros(D, np.float32)
        sd[p + "mlp.c_fc.weight"] = np.zeros((D, 4 * D), np.float32)
        sd[p + "mlp.c_fc.bias"] = np.zeros(4 * D, np.float32)
        sd[p + "mlp.c_proj.weight"] = np.zeros((4 * D, D), np.float32)
        sd[p + "mlp.c_proj.bias"] = np.zeros(D, np.float32)
    sd["ln_f.weight"] = np.ones(D, np.float32)
    sd["ln_f.bias"] = np.zeros(D, np.float32)

    tr = convert_transformer_state_dict(sd, params["transformer"], cfg.layers)
    assert "lora_a" in tr["h_0"]["attn"] and "lora_b" in tr["h_0"]["attn"]
    # imported weights landed
    assert float(np.asarray(tr["h_0"]["attn"]["c_attn"]["kernel"]).sum()) == 0.0
    # and the model still applies cleanly with the merged tree
    new_params = dict(params)
    new_params["transformer"] = tr
    model.apply({"params": new_params}, batch)

"""Loss-CURVE parity: train the actual reference GatoPolicy (torch AdamW) and
NekoModel (optax adamw) from identical weights on identical batch streams and
assert the loss trajectories track each other — the BASELINE.json north-star
acceptance criterion, at test scale.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from neko_tpu.data.batch import to_device_batch
from neko_tpu.data.packing import SequencePacker
from tests.test_full_model_parity import D, H, L, S, _load_reference_policy

N_STEPS = 25
LR = 1e-3


def _batches(n, batch_size=4, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        batch = []
        for i in range(batch_size):
            if i % 2 == 0:
                batch.append({"text": list(rng.randint(1, 50257, size=6))})
            else:
                batch.append(
                    {
                        "continuous_obs": rng.randn(3, 4).astype(np.float32),
                        "continuous_actions": np.tanh(rng.randn(3, 2)).astype(
                            np.float32
                        ),
                    }
                )
        out.append(batch)
    return out


def _to_torch(batch):
    return [{k: torch.tensor(v) for k, v in ex.items()} for ex in batch]


def test_loss_curves_track(tmp_path):
    import jax
    import optax

    from neko_tpu.config import ModelConfig
    from neko_tpu.models.import_reference import convert_gato_state_dict
    from neko_tpu.models.policy import NekoModel

    torch.manual_seed(0)  # reference init draws from torch's global RNG
    GatoPolicy = _load_reference_policy()
    ref = GatoPolicy(
        device="cpu", embed_dim=D, layers=L, heads=H, dropout=0.0,
        patch_size=16, resid_mid_channels=128, num_groups=32,
        position_vocab_size=128, context_len=S, activation_fn="gelu",
        use_pos_encoding=True, use_patch_pos_encoding=True, flash=False,
        pad_seq=False,
    )
    ref.train()  # dropout is 0; train mode only matters for patch-pos RNG
    # the reference's fresh GPT2Config leaves embd_pdrop at the HF default
    # 0.1 (gato_policy.py:96-115 never sets it) — zero it so both sides are
    # deterministic
    ref.transformer.drop.p = 0.0
    opt_ref = torch.optim.AdamW(
        ref.parameters(), lr=LR, betas=(0.9, 0.95), eps=1e-8, weight_decay=0.1
    )

    cfg = ModelConfig(
        embed_dim=D, layers=L, heads=H, dropout=0.0, context_len=S,
        max_patches=0, patch_size=16, dtype="float32", attention_impl="xla",
    )
    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    # cycle 5 distinct batches so memorization pulls the loss down visibly
    batches = (_batches(5) * ((N_STEPS + 4) // 5))[:N_STEPS]

    arrays0 = packer.pack_batch(batches[0])
    arrays0.pop("lengths")
    params = model.init(
        {"params": jax.random.key(0)}, to_device_batch(arrays0)
    )["params"]
    params = convert_gato_state_dict(ref.state_dict(), params, cfg)

    tx = optax.adamw(LR, b1=0.9, b2=0.95, eps=1e-8, weight_decay=0.1)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            return model.apply(
                {"params": p}, batch, deterministic=True, compute_loss=True
            )[1]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    ours, theirs = [], []
    for i in range(N_STEPS):
        arrays = packer.pack_batch(batches[i])
        arrays.pop("lengths")
        params, opt_state, loss = step(
            params, opt_state, to_device_batch(arrays)
        )
        ours.append(float(loss))

        opt_ref.zero_grad()
        _, ref_loss = ref.forward(_to_torch(batches[i]), compute_loss=True)
        ref_loss.backward()
        opt_ref.step()
        theirs.append(float(ref_loss))

    ours, theirs = np.asarray(ours), np.asarray(theirs)
    # identical math to fp32 tolerance -> trajectories track closely; allow
    # small drift accumulation over the optimization path
    np.testing.assert_allclose(ours[:5], theirs[:5], atol=5e-3)
    assert np.abs(ours - theirs).max() < 0.05, (
        list(np.round(ours, 4)), list(np.round(theirs, 4))
    )
    # and training actually learns
    assert ours[-1] < ours[0] - 0.5

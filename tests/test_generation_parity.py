"""Generation parity vs the reference: greedy predict_text / predict_control
produce identical token sequences from identical (migrated) weights — our
KV-cache decode vs the reference's full-context re-forward per token."""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from neko_tpu.data.batch import to_device_batch
from neko_tpu.data.packing import SequencePacker
from neko_tpu.inference.generator import Generator
from tests.test_full_model_parity import D, H, L, S, _load_reference_policy


@pytest.fixture(scope="module")
def pair():
    import jax

    from neko_tpu.config import ModelConfig
    from neko_tpu.models.import_reference import convert_gato_state_dict
    from neko_tpu.models.policy import NekoModel

    torch.manual_seed(0)
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
        max_patches=8, patch_size=16, dtype="float32", attention_impl="xla",
    )
    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    arrays = packer.pack_batch([{"text": [1, 2, 3]}])
    arrays.pop("lengths")
    params = model.init({"params": jax.random.key(0)}, to_device_batch(arrays))[
        "params"
    ]
    params = convert_gato_state_dict(ref.state_dict(), params, cfg)
    return ref, Generator(model, params, packer)


def test_predict_text_greedy_parity(pair):
    ref, gen = pair
    prompt = [101, 2002, 33, 404, 5]
    with torch.no_grad():
        _, ref_tokens = ref.predict_text(
            {"text": torch.tensor(prompt)}, max_length=8, deterministic=True
        )
    ref_tokens = [int(t) for t in ref_tokens]
    _, ours = gen.predict_text({"text": prompt}, max_length=8)
    assert list(ours) == ref_tokens


def test_predict_control_greedy_parity(pair):
    import gymnasium as gym

    ref, gen = pair
    rng = np.random.RandomState(0)
    obs = rng.randn(4, 6).astype(np.float32)
    act = np.tanh(rng.randn(4, 3)).astype(np.float32)
    act[-1] = 0.0  # padded action slot for the current timestep

    # the reference's predict_control only touches task.action_type,
    # task.action_tokens and task.env.action_space
    fake_task = types.SimpleNamespace(
        action_type=gym.spaces.Box,
        action_tokens=3,
        env=types.SimpleNamespace(
            action_space=gym.spaces.Box(-1, 1, (3,), np.float32)
        ),
    )
    with torch.no_grad():
        ref_action = ref.predict_control(
            {
                "continuous_obs": torch.tensor(obs),
                "continuous_actions": torch.tensor(act),
            },
            task=fake_task,
            deterministic=True,
        ).numpy()

    ours = gen.predict_control(
        {"continuous_obs": obs, "continuous_actions": act},
        action_kind="continuous",
        action_tokens=3,
    )
    np.testing.assert_allclose(ours, ref_action, atol=1e-6)


def test_predict_discrete_control_parity(pair):
    import gymnasium as gym

    ref, gen = pair
    rng = np.random.RandomState(1)
    obs = rng.randn(3, 4).astype(np.float32)
    act = np.array([[2], [0], [0]], np.int64)

    fake_task = types.SimpleNamespace(
        action_type=gym.spaces.Discrete,
        action_tokens=1,
        env=types.SimpleNamespace(action_space=gym.spaces.Discrete(5)),
    )
    with torch.no_grad():
        ref_action = int(
            ref.predict_control(
                {
                    "continuous_obs": torch.tensor(obs),
                    "discrete_actions": torch.tensor(act),
                },
                task=fake_task,
                deterministic=True,
            )
        )
    ours = gen.predict_control(
        {"continuous_obs": obs, "discrete_actions": act.astype(np.int32)},
        action_kind="discrete",
        action_tokens=1,
        num_actions=5,
    )
    assert int(ours) == ref_action


def test_predict_response_greedy_parity(pair):
    """Caption/VQA generation: the reference re-packs generated tokens as
    text observations (inner positions continue), gato_policy.py:503-510."""
    ref, gen = pair
    rng = np.random.RandomState(3)
    img_hwc = rng.randint(0, 255, (1, 32, 32, 3)).astype(np.float32)
    prompt = [7, 8]
    # predict_response returns (logits, decoded-string); compare via logits
    with torch.no_grad():
        ref_logits, _ = ref.predict_response(
            torch.tensor(img_hwc.transpose(0, 3, 1, 2)),
            prompt_tokens=list(prompt),
            max_length=6,
            deterministic=True,
        )
    ref_ids = ref_logits.argmax(-1).numpy()
    logits, ids = gen.predict_answer(img_hwc, prompt, max_length=6)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)
    np.testing.assert_allclose(logits, ref_logits.numpy(), atol=3e-4, rtol=1e-3)

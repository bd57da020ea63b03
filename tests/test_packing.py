"""Packer structure tests: interleave order, masks, positions, patch scatter."""

import numpy as np
import pytest

from neko_tpu.config import ModelConfig
from neko_tpu.data.packing import SequencePacker, extract_patches
from neko_tpu.tokenizers.continuous import encode_np

CFG = ModelConfig(
    embed_dim=64, layers=1, heads=2, context_len=64, max_patches=8, patch_size=16
)
TS = CFG.token_space


def test_text_example_layout():
    p = SequencePacker(CFG)
    ids = [5, 6, 7]
    pe = p.pack_example({"text": ids})
    # one timestep: [text..., SEP]
    np.testing.assert_array_equal(pe.tokens, [5, 6, 7, TS.separator_id])
    np.testing.assert_array_equal(pe.target_mask, [True, True, True, False])
    np.testing.assert_array_equal(pe.inner_pos, [0, 1, 2, -1])
    assert pe.patches.shape[0] == 0


def test_control_example_layout():
    p = SequencePacker(CFG)
    obs = np.array([[0.5, -0.5], [0.1, 0.2]], np.float32)   # T=2, C=2
    act = np.array([[0.0], [1.0]], np.float32)              # T=2, A=1
    pe = p.pack_example({"continuous_obs": obs, "continuous_actions": act})
    obs_toks = encode_np(obs, use_mu_law=True, offset=TS.continuous_start)
    act_toks = encode_np(act, use_mu_law=False, offset=TS.continuous_start)
    expected = []
    for t in range(2):
        expected += list(obs_toks[t]) + [TS.separator_id] + list(act_toks[t])
    np.testing.assert_array_equal(pe.tokens, expected)
    # targets: only actions
    np.testing.assert_array_equal(
        pe.target_mask.reshape(2, 4),
        [[False, False, False, True]] * 2,
    )
    np.testing.assert_array_equal(
        pe.inner_pos.reshape(2, 4), [[0, 1, -1, -1]] * 2
    )


def test_discrete_obs_and_actions_offsets():
    p = SequencePacker(CFG)
    pe = p.pack_example(
        {"discrete_obs": np.array([3, 1]), "discrete_actions": np.array([2, 0])}
    )
    assert pe.tokens[0] == 3 + TS.discrete_start
    assert pe.tokens[1] == TS.separator_id
    assert pe.tokens[2] == 2 + TS.discrete_start
    assert list(pe.tokens.reshape(2, 3)[1]) == [
        1 + TS.discrete_start,
        TS.separator_id,
        0 + TS.discrete_start,
    ]


def test_image_example_patches_and_slots():
    p = SequencePacker(CFG)
    img = np.arange(2 * 32 * 16 * 3, dtype=np.float32).reshape(2, 32, 16, 3)
    act = np.array([0, 1], np.int32)
    pe = p.pack_example({"images": img, "discrete_actions": act})
    # 2x1 patch grid -> 2 patches/timestep; layout per ts: [p0, p1, SEP, act]
    assert pe.patches.shape == (4, 16, 16, 3)
    np.testing.assert_array_equal(pe.patch_slot, [0, 1, 4, 5])
    # patch token ids are 0 and not targets
    assert pe.tokens[0] == 0 and not pe.target_mask[0]
    # intervals: n_h=2 -> rows [0,64),[64,128); n_w=1 -> [0,128)
    np.testing.assert_array_equal(pe.patch_pos[0], [0, 64, 0, 128])
    np.testing.assert_array_equal(pe.patch_pos[1], [64, 128, 0, 128])
    # inner positions cover the 2 patch tokens
    np.testing.assert_array_equal(pe.inner_pos.reshape(2, 4)[0], [0, 1, -1, -1])
    # patch pixel content round-trips (through the config's wire dtype)
    ref_patches, n_h, n_w = extract_patches(img, 16, dtype=CFG.patch_np_dtype)
    np.testing.assert_array_equal(pe.patches, ref_patches)
    assert (n_h, n_w) == (2, 1)


def test_patch_uint8_wire_dtype():
    # default schema sends patches as uint8 (raw 8-bit pixels); conversion
    # rounds-and-clips float sources, and is exact for integral pixels
    p = SequencePacker(CFG)
    img = np.array([[17.4, 255.0, 300.0], [0.0, -3.0, 128.6]], np.float32)
    img = np.tile(img.reshape(1, 2, 3, 1), (1, 8, 16, 3))[:, :16, :16, :]
    pe = p.pack_example({"images": img, "discrete_actions": np.array([0])})
    assert pe.patches.dtype == np.uint8
    vals = np.unique(pe.patches)
    assert set(vals.tolist()) <= {0, 17, 128, 129, 255}
    # float32 opt-out preserves fractional pixel values exactly
    p32 = SequencePacker(CFG.replace(patch_dtype="float32"))
    pe32 = p32.pack_example({"images": img, "discrete_actions": np.array([0])})
    assert pe32.patches.dtype == np.float32
    assert np.any(pe32.patches == np.float32(300.0))


def test_extract_patches_row_major():
    img = np.zeros((1, 32, 32, 3), np.float32)
    img[0, 0:16, 16:32, 0] = 7.0  # row 0, col 1
    patches, n_h, n_w = extract_patches(img, 16)
    assert (n_h, n_w) == (2, 2)
    assert patches[1].max() == 7.0 and patches[0].max() == 0.0


def test_left_padding_and_batch():
    p = SequencePacker(CFG)
    batch = p.pack_batch(
        [{"text": [1, 2, 3]}, {"text": list(range(10))}], pad_side="left"
    )
    S = CFG.context_len
    assert batch["tokens"].shape == (2, S)
    # left pad: content at the END
    assert batch["input_mask"][0, : S - 4].sum() == 0
    assert batch["input_mask"][0, S - 4 :].all()
    np.testing.assert_array_equal(
        batch["tokens"][0, S - 4 :], [1, 2, 3, TS.separator_id]
    )
    assert list(batch["lengths"]) == [4, 11]


def test_right_padding_for_decode():
    p = SequencePacker(CFG)
    batch = p.pack_batch([{"text": [1, 2, 3]}], pad_side="right")
    assert batch["input_mask"][0, :4].all()
    assert batch["input_mask"][0, 4:].sum() == 0


def test_patch_slot_offset_with_left_pad():
    p = SequencePacker(CFG)
    img = np.zeros((1, 16, 16, 3), np.float32)
    batch = p.pack_batch([{"images": img, "discrete_actions": np.array([0])}])
    S = CFG.context_len
    L = 3  # patch + sep + action
    # active patch slot moved by pad offset; pool row 0 belongs to example 0
    assert batch["patch_slot"][0] == S - L
    assert batch["patch_batch"][0] == 0
    # unused pool entries are parked at (B, S)
    assert (batch["patch_slot"][1:] == S).all()
    assert (batch["patch_batch"][1:] == 1).all()


def test_patch_pool_is_global():
    """Mixed text+image batch shares one patch pool across examples."""
    p = SequencePacker(CFG)
    img = np.zeros((1, 16, 32, 3), np.float32)  # 2 patches
    batch = p.pack_batch(
        [
            {"text": [1, 2]},
            {"images": img, "discrete_actions": np.array([0])},
            {"images": img, "discrete_actions": np.array([1])},
        ],
        patch_budget=8,
    )
    assert batch["patches"].shape == (8, 16, 16, 3)
    np.testing.assert_array_equal(batch["patch_batch"][:4], [1, 1, 2, 2])
    assert (batch["patch_batch"][4:] == 3).all()


def test_overlong_truncates_oldest_timesteps():
    p = SequencePacker(CFG)
    obs = np.zeros((100, 2), np.float32)  # 4 tokens/ts * 100 = 400 > 64
    act = np.zeros((100, 1), np.float32)
    pe = p.pack_example({"continuous_obs": obs, "continuous_actions": act})
    assert pe.length <= CFG.context_len
    assert pe.length == 64  # 16 timesteps * 4


def test_text_truncated_to_context():
    p = SequencePacker(CFG)
    pe = p.pack_example({"text": list(range(1000))})
    assert pe.length == CFG.context_len  # S-1 text + SEP
    assert pe.tokens[-1] == TS.separator_id


def test_too_many_patches_raises():
    p = SequencePacker(CFG)
    img = np.zeros((9, 16, 16, 3), np.float32)  # 9 patches > budget 8
    with pytest.raises(ValueError, match="patch_budget"):
        p.pack_batch(
            [{"images": img, "discrete_actions": np.zeros(9, np.int32)}],
            patch_budget=8,
        )

"""Property-based fuzz of the SequencePacker (hypothesis).

The structure tests (test_packing.py) pin exact layouts on hand-picked
examples; these properties assert the packer's global invariants over
randomly generated mixed batches — shapes, values, truncation, and pad
side are all fuzzed:

  * lengths match the analytic token count per modality
  * the attention mask is exactly one contiguous run on the pad side
  * targets are a subset of attended positions and carry legal token ids
    for their modality (text / continuous-action / discrete-action ranges)
  * batch packing == independent example packing placed by pad side
  * overlong episodes truncate, never overflow the context
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from neko_tpu.config import ModelConfig
from neko_tpu.data.packing import SequencePacker

CFG = ModelConfig(
    embed_dim=32, layers=1, heads=2, context_len=48, max_patches=0,
    text_tokens=256, continuous_tokens=64, discrete_tokens=16,
)
TS = CFG.token_space
S = CFG.context_len


def _text_example(draw):
    n = draw(st.integers(1, 60))
    ids = draw(st.lists(st.integers(0, TS.text_tokens - 1),
                        min_size=n, max_size=n))
    return {"text": ids}


def _continuous_example(draw):
    T = draw(st.integers(1, 12))
    C = draw(st.integers(1, 5))
    A = draw(st.integers(1, 3))
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    return {
        "continuous_obs": (rng.randn(T, C) * 3).astype(np.float32),
        "continuous_actions": np.clip(rng.randn(T, A), -1, 1).astype(
            np.float32
        ),
    }


def _discrete_example(draw):
    T = draw(st.integers(1, 12))
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    return {
        "discrete_obs": rng.randint(0, TS.discrete_tokens, T),
        "discrete_actions": rng.randint(0, TS.discrete_tokens, T),
    }


@st.composite
def example(draw):
    kind = draw(st.sampled_from(["text", "continuous", "discrete"]))
    if kind == "text":
        return _text_example(draw)
    if kind == "continuous":
        return _continuous_example(draw)
    return _discrete_example(draw)


def _analytic_len(ex) -> int:
    if "text" in ex:
        return min(len(ex["text"]) + 1, S)
    if "continuous_obs" in ex:
        T, C = ex["continuous_obs"].shape
        A = ex["continuous_actions"].shape[1]
        tpt = C + 1 + A
        return min(T, S // tpt) * tpt
    T = len(ex["discrete_obs"])
    tpt = 3  # 1 obs + sep + 1 action
    return min(T, S // tpt) * tpt


@st.composite
def batch(draw):
    n = draw(st.integers(1, 6))
    return [draw(example()) for _ in range(n)]


@given(batch(), st.sampled_from(["left", "right"]))
@settings(max_examples=60, deadline=None)
def test_packer_invariants(examples, pad_side):
    p = SequencePacker(CFG)
    arrays = p.pack_batch(examples, pad_side=pad_side)
    lengths = arrays["lengths"]
    tokens = arrays["tokens"]
    attn = arrays["input_mask"]
    targets = arrays["target_mask"]

    for i, ex in enumerate(examples):
        L = int(lengths[i])
        assert L == _analytic_len(ex)
        assert 0 < L <= S
        # contiguous attention run on the pad side
        expect = np.zeros(S, bool)
        sl = slice(0, L) if pad_side == "right" else slice(S - L, S)
        expect[sl] = True
        np.testing.assert_array_equal(attn[i], expect)
        # targets attend
        assert not (targets[i] & ~attn[i]).any()
        # all attended ids legal (the separator owns embedding row
        # `vocab_size`, outside the predictable vocab)
        ids = tokens[i][attn[i]]
        legal = (ids >= 0) & (
            (ids < TS.vocab_size) | (ids == TS.separator_id)
        )
        assert legal.all()
        # target ids live in their modality's range
        tids = tokens[i][targets[i]]
        if "text" in ex:
            assert (tids < TS.text_tokens).all()
        elif "continuous_actions" in ex:
            lo = TS.continuous_start
            assert (tids >= lo).all()
            # <= (not <): x == 1.0 encodes to bin n_bins — the reference's
            # unclipped top bin (input_tokenizers.py:24-25), reproduced
            # bit-exactly here (tokenizers/continuous.py)
            assert (tids <= lo + TS.continuous_tokens).all()
        else:
            lo = TS.discrete_start
            assert (tids >= lo).all()
            assert (tids < lo + TS.discrete_tokens).all()


@given(batch(), st.sampled_from(["left", "right"]))
@settings(max_examples=40, deadline=None)
def test_batch_equals_independent_packing(examples, pad_side):
    """pack_batch(examples)[i] is exactly pack_example(examples[i]) placed
    by pad side — batching never couples rows."""
    p = SequencePacker(CFG)
    arrays = p.pack_batch(examples, pad_side=pad_side)
    for i, ex in enumerate(examples):
        pe = p.pack_example(ex)
        L = len(pe.tokens)
        sl = slice(0, L) if pad_side == "right" else slice(S - L, S)
        np.testing.assert_array_equal(arrays["tokens"][i][sl], pe.tokens)
        np.testing.assert_array_equal(
            arrays["target_mask"][i][sl], pe.target_mask
        )
        np.testing.assert_array_equal(
            arrays["inner_pos"][i][sl], pe.inner_pos
        )


@given(st.integers(13, 40), st.integers(1, 5), st.integers(1, 3),
       st.integers(0, 2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_overlong_control_truncates_to_newest(T, C, A, seed):
    """Episodes longer than the context keep the LAST whole timesteps
    (reference slices the tail, control_task.py:223)."""
    rng = np.random.RandomState(seed)
    obs = (rng.randn(T, C) * 2).astype(np.float32)
    act = np.clip(rng.randn(T, A), -1, 1).astype(np.float32)
    p = SequencePacker(CFG)
    pe = p.pack_example({"continuous_obs": obs, "continuous_actions": act})
    tpt = C + 1 + A
    keep = min(T, S // tpt)
    assert len(pe.tokens) == keep * tpt
    # the final timestep's action tokens are the episode's LAST action
    from neko_tpu.tokenizers.continuous import encode_np

    last_act = encode_np(
        act[-1:], use_mu_law=False, offset=TS.continuous_start,
        n_bins=TS.continuous_tokens,
    )[0]
    np.testing.assert_array_equal(pe.tokens[-A:], last_act)

"""Property-based fuzz of the Gym-space codecs (hypothesis).

test_text_space.py / test_dict_space.py pin exact layouts; these properties
assert the codecs' global invariants over randomly generated spaces and
values: Text encode/decode round-trips for any charset and string, decoded
predictions always satisfy space.contains, and DictObsCodec's token
accounting matches its per-component parts for arbitrary component mixes.
"""

import string

import numpy as np
from hypothesis import given, settings, strategies as st

import gymnasium as gym

from neko_tpu.tasks.control import (
    DictActCodec, DictObsCodec, decode_text, encode_text, space_nvec,
    tokens_per_space,
)

_CHARS = string.ascii_letters + string.digits + "_-"


@st.composite
def _text_space(draw):
    chars = draw(st.lists(st.sampled_from(_CHARS), min_size=1, max_size=12,
                          unique=True))
    max_length = draw(st.integers(1, 8))
    min_length = draw(st.integers(1, max_length))
    return gym.spaces.Text(
        max_length=max_length, min_length=min_length,
        charset="".join(chars),
    )


@given(_text_space(), st.data())
@settings(max_examples=80, deadline=None)
def test_text_roundtrip(space, data):
    n = data.draw(st.integers(space.min_length, space.max_length))
    s = "".join(
        data.draw(st.sampled_from(space.characters)) for _ in range(n)
    )
    enc = encode_text(space, [s])
    assert enc.shape == (1, space.max_length) and enc.dtype == np.int32
    assert (enc >= 0).all() and (enc <= len(space.characters)).all()
    assert decode_text(space, enc[0]) == s
    # trailing slots are pad
    assert (enc[0, n:] == 0).all()


@given(_text_space(), st.data())
@settings(max_examples=80, deadline=None)
def test_text_decode_always_contained(space, data):
    """ANY in-range index vector (what a masked decode can emit) decodes to
    a string the space contains — min_length padding included."""
    idx = np.asarray(
        data.draw(st.lists(
            st.integers(0, len(space.characters)),
            min_size=space.max_length, max_size=space.max_length,
        )),
        np.int32,
    )
    s = decode_text(space, idx)
    assert space.contains(s), (s, idx)


@st.composite
def _component(draw):
    kind = draw(st.sampled_from(["box", "discrete", "multi", "binary", "text"]))
    if kind == "box":
        n = draw(st.integers(1, 5))
        return gym.spaces.Box(-1, 1, (n,), np.float32), ("cont", n)
    if kind == "discrete":
        return gym.spaces.Discrete(draw(st.integers(2, 9))), ("disc", 1)
    if kind == "multi":
        nvec = draw(st.lists(st.integers(2, 6), min_size=1, max_size=4))
        return gym.spaces.MultiDiscrete(nvec), ("disc", len(nvec))
    if kind == "binary":
        n = draw(st.integers(1, 4))
        return gym.spaces.MultiBinary(n), ("disc", n)
    L = draw(st.integers(1, 5))
    return gym.spaces.Text(max_length=L, min_length=1, charset="abc"), ("disc", L)


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_dict_codec_token_accounting(data):
    n_comp = data.draw(st.integers(1, 4))
    comps, metas = zip(*[data.draw(_component()) for _ in range(n_comp)])
    with_image = data.draw(st.booleans())
    spaces = {f"k{i}": s for i, s in enumerate(comps)}
    if with_image:
        spaces["img"] = gym.spaces.Box(0, 255, (16, 16), np.uint8)
    space = gym.spaces.Dict(spaces)
    codec = DictObsCodec(space, patch_size=16)

    cont = sum(n for kind, n in metas if kind == "cont")
    disc = sum(n for kind, n in metas if kind == "disc")
    assert codec.cont_tokens == cont
    assert codec.disc_tokens == disc
    assert codec.patches_per_timestep == (1 if with_image else 0)
    assert codec.obs_tokens == cont + disc + (1 if with_image else 0)

    # encode a 2-timestep sample drawn from the space itself
    samples = [space.sample() for _ in range(2)]
    obs = {
        k: np.asarray([s[k] for s in samples])
        for k in spaces
    }
    enc = codec.encode(obs)
    if cont:
        assert enc["continuous_obs"].shape == (2, cont)
        assert enc["continuous_obs"].dtype == np.float32
    if disc:
        assert enc["discrete_obs"].shape == (2, disc)
        assert (enc["discrete_obs"] >= 0).all()
    if with_image:
        assert enc["images"].shape == (2, 16, 16, 3)
    assert set(enc) == set(codec.entry_keys)


@st.composite
def _discrete_act_component(draw):
    kind = draw(st.sampled_from(["discrete", "multi", "binary", "text"]))
    if kind == "discrete":
        return gym.spaces.Discrete(draw(st.integers(2, 6)))
    if kind == "multi":
        return gym.spaces.MultiDiscrete(
            draw(st.lists(st.integers(2, 5), min_size=1, max_size=3))
        )
    if kind == "binary":
        return gym.spaces.MultiBinary(draw(st.integers(1, 3)))
    return gym.spaces.Text(
        max_length=draw(st.integers(1, 4)), min_length=1, charset="ab",
    )


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_dict_act_codec_roundtrip(data):
    """encode -> decode returns EXACTLY the sampled composite action, and
    decode of any in-range component vector satisfies space.contains."""
    kind = data.draw(st.sampled_from(["discrete", "continuous"]))
    n = data.draw(st.integers(1, 3))
    comps = {}
    for i in range(n):
        if kind == "continuous":
            w = data.draw(st.integers(1, 3))
            comps[f"k{i}"] = gym.spaces.Box(-1, 1, (w,), np.float32)
        else:
            comps[f"k{i}"] = data.draw(_discrete_act_component())
    space = gym.spaces.Dict(comps)
    codec = DictActCodec(space)
    assert codec.kind == kind
    if kind == "discrete":
        assert len(codec.nvec) == codec.tokens

    samples = [space.sample() for _ in range(2)]
    stacked = {k: np.asarray([s[k] for s in samples]) for k in comps}
    enc = codec.encode(stacked)
    assert enc.shape == (2, codec.tokens)
    for t, s in enumerate(samples):
        dec = codec.decode(enc[t])
        assert space.contains(dec), (dec, s)
        for k, sub in comps.items():
            if isinstance(sub, gym.spaces.Text):
                assert dec[k] == s[k]
            else:
                np.testing.assert_array_almost_equal(
                    np.asarray(dec[k], np.float64).reshape(-1),
                    np.asarray(s[k], np.float64).reshape(-1),
                )


@given(st.integers(0, 1023))
@settings(max_examples=200, deadline=None)
def test_mu_law_decode_roundtrip(b):
    """decode_mu_law_np is a true right-inverse of the mu-law encode: any
    bin decodes to a value that re-encodes to the SAME bin — the invariant
    Generator.imagine needs so fed-back continuous observations re-pack to
    the tokens the model actually generated (no double companding)."""
    from neko_tpu.tokenizers.continuous import decode_mu_law_np, encode_np

    x = decode_mu_law_np(np.asarray([b]), n_bins=1024, offset=0)
    b2 = encode_np(x, use_mu_law=True, n_bins=1024, offset=0)
    assert int(b2[0]) == b


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_tokens_per_space_matches_nvec_lengths(data):
    space, (kind, n) = data.draw(_component())
    assert tokens_per_space(space) == n
    nvec = space_nvec(space)
    if nvec is not None:
        assert len(nvec) == n
        assert all(v >= 2 for v in nvec)

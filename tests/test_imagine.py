"""Generator.imagine — multi-step world-model rollout.

Given a control history and K future actions, imagine() autoregressively
predicts each next timestep's observation tokens, feeding predictions back
as history (re-packed, so between steps the token stream carries the exact
train-time structure).  Pairs with --observation_loss (the RoboCat recipe,
PARITY.md "Observation-prediction loss"); the reference has no world-model
inference path at all (its obs tokens are never loss targets,
gato_policy.py:301,312).
"""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def setup():
    from neko_tpu.cli import build as B
    from neko_tpu.inference.generator import Generator
    from neko_tpu.training.arguments import TrainingArgs
    from neko_tpu.training.trainer import Trainer

    targs = TrainingArgs(
        cpu=True, sequence_length=96, embed_dim=32, layers=2, heads=2,
        batch_size=8, text_prop=0.0, text_datasets=[], text_datasets_paths=[],
        control_datasets=["neko-synth-multidiscrete-v0"],
        training_steps=2, log_eval_freq=2, eval_episodes=0,
        eval_text_num_examples=0, mixed_precision="no",
        save_model=False, log_jsonl=False, dropout=0.0, observation_loss=True,
    )
    ctx, tasks = B.build_context(targs)
    tr = Trainer(ctx, tasks, "imagine_test", targs)
    tr.train()
    gen = Generator(ctx.model, tr.state.params, tr.packer)
    return tasks[0], gen, ctx.model_cfg.token_space


def _hist(task, H=5):
    ex = task.sample_batch(1, {}, max_tokens=96)[0]
    return (
        {
            "discrete_obs": ex["discrete_obs"][:H],
            "discrete_actions": ex["discrete_actions"][:H],
        },
        ex["discrete_actions"][H : H + 3],
    )


def test_shapes_and_component_ranges(setup):
    task, gen, _ = setup
    hist, acts = _hist(task)
    preds = gen.imagine(hist, acts, obs_nvec=[6, 4, 8])
    assert preds.shape == (3, 3) and preds.dtype == hist["discrete_obs"].dtype
    assert (preds[:, 0] < 6).all()
    assert (preds[:, 1] < 4).all()
    assert (preds[:, 2] < 8).all()
    assert (preds >= 0).all()


def test_first_step_matches_direct_generate(setup):
    """imagine()'s step 1 IS a range-restricted generate on the history
    with inner positions restarting at 0 (train-time obs embedding)."""
    task, gen, ts = setup
    hist, acts = _hist(task)
    preds = gen.imagine(hist, acts, obs_nvec=[6, 4, 8])
    toks, _ = gen.generate(
        hist, max_new_tokens=3, start=ts.start("discrete"),
        end=ts.start("discrete") + 7, step_limits=[6, 4, 8],
        inner_pos_start=0,
    )
    assert (np.asarray(toks) - ts.start("discrete") == preds[0]).all()


def test_prefix_consistency(setup):
    """Deterministic imagine over K steps starts with the K-1 rollout —
    the feedback loop is causal."""
    task, gen, _ = setup
    hist, acts = _hist(task)
    p2 = gen.imagine(hist, acts[:2], obs_nvec=[6, 4, 8])
    p3 = gen.imagine(hist, acts, obs_nvec=[6, 4, 8])
    assert (p3[:2] == p2).all()


def test_stochastic_rollouts_stay_in_range(setup):
    task, gen, _ = setup
    hist, acts = _hist(task)
    for i in range(3):
        preds = gen.imagine(
            hist, acts, obs_nvec=[6, 4, 8], deterministic=False,
            temperature=3.0, rng=jax.random.key(i),
        )
        assert (preds[:, 0] < 6).all()
        assert (preds[:, 1] < 4).all()
        assert (preds[:, 2] < 8).all()


def test_long_rollout_trims_context(setup):
    """K large enough that history + predictions exceed the context window:
    the rolling trim keeps every packed step inside it."""
    task, gen, _ = setup
    hist, _ = _hist(task, H=8)
    acts = np.tile(np.asarray([[1, 2]], np.int32), (12, 1))
    preds = gen.imagine(hist, acts, obs_nvec=[6, 4, 8])
    assert preds.shape == (12, 3)


def test_decode_windows_match_packed_full_forward(setup):
    """The strong pin of imagine()'s embedding semantics: the window logits
    the decode scan produced while generating a timestep's obs tokens equal
    a FULL FORWARD over the re-packed stream (history + the generated
    timestep) at the corresponding positions — i.e. generated obs tokens
    embed exactly as packed ones (token + inner position).  Without
    inner_pos_start=0 the trained-model imagination measured BELOW chance
    (0.083 vs 0.18); with it, above (0.21)."""
    import jax.numpy as jnp

    from neko_tpu.data.batch import to_device_batch

    task, gen, ts = setup
    hist, acts = _hist(task, H=4)
    start = ts.start("discrete")
    lims = [6, 4, 8]
    toks, win = gen.generate(
        hist, max_new_tokens=3, start=start, end=start + 7,
        step_limits=lims, inner_pos_start=0,
    )
    full = {
        "discrete_obs": np.concatenate(
            [hist["discrete_obs"],
             np.asarray(toks - start, np.int32)[None]], axis=0
        ),
        "discrete_actions": np.concatenate(
            [hist["discrete_actions"], acts[:1]], axis=0
        ),
    }
    arrays = gen.packer.pack_batch([full], pad_side="right")
    L = int(arrays.pop("lengths")[0])
    batch = to_device_batch(arrays)
    emb = gen._embed_batch(gen.params, batch)
    mask = np.zeros((1, gen.cfg.context_len), bool)
    mask[0, :L] = True
    logits, _ = gen._prefill(gen.params, emb, jnp.asarray(mask))
    tpt = 6  # 3 obs + sep + 2 act
    hist_len = 4 * tpt
    for i in range(3):
        ref = np.asarray(logits[0, hist_len - 1 + i, start : start + lims[i]])
        got = np.asarray(win[i][: lims[i]])
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_continuous_obs_imagination(setup):
    """Continuous observations decode through the mu-law bins to floats."""
    _, gen, _ = setup
    hist = {
        "continuous_obs": np.zeros((4, 3), np.float32),
        "continuous_actions": np.zeros((4, 2), np.float32),
    }
    acts = np.zeros((2, 2), np.float32)
    preds = gen.imagine(hist, acts, obs_kind="continuous")
    assert preds.shape == (2, 3) and preds.dtype == np.float32
    assert np.isfinite(preds).all()

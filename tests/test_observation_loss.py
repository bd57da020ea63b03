"""Observation-prediction loss (`--observation_loss`).

Gato (and the reference, gato_policy.py:301,312) exclude observation
tokens from the loss; the flag additionally trains next-token CE on them
— the RoboCat observation-prediction recipe (predict future obs, e.g.
VQ image codes from models/vq.py).  Default off = exact reference
semantics (the default-path masks are pinned unchanged).
"""

import dataclasses

import numpy as np

import jax

from neko_tpu.config import ModelConfig
from neko_tpu.data.packing import SequencePacker

CFG = ModelConfig(
    embed_dim=32, layers=1, heads=2, dropout=0.0, context_len=96,
    max_patches=0, dtype="float32", attention_impl="xla",
    text_tokens=64, continuous_tokens=32, discrete_tokens=32,
)

EX = {
    "discrete_obs": np.asarray([[1, 2, 3], [4, 5, 6]], np.int32),
    "discrete_actions": np.asarray([[0, 1], [1, 0]], np.int32),
}


def test_obs_tokens_become_targets():
    off = SequencePacker(CFG).pack_example(EX)
    on = SequencePacker(
        dataclasses.replace(CFG, observation_loss=True)
    ).pack_example(EX)
    np.testing.assert_array_equal(off.tokens, on.tokens)
    # layout per timestep: [o o o | SEP | a a]
    L = off.length
    off_t = np.asarray(off.target_mask[:L]).reshape(2, 6)
    on_t = np.asarray(on.target_mask[:L]).reshape(2, 6)
    np.testing.assert_array_equal(off_t[:, :3], False)   # obs masked (ref)
    np.testing.assert_array_equal(on_t[:, :3], True)     # obs trained
    np.testing.assert_array_equal(off_t[:, 3], False)    # SEP never
    np.testing.assert_array_equal(on_t[:, 3], False)
    np.testing.assert_array_equal(off_t[:, 4:], True)    # actions always
    np.testing.assert_array_equal(on_t[:, 4:], True)


def test_continuous_obs_targets_and_text_unchanged():
    ex = {
        "continuous_obs": np.asarray([[0.1, -0.2]], np.float32),
        "continuous_actions": np.asarray([[0.3]], np.float32),
    }
    on = SequencePacker(
        dataclasses.replace(CFG, observation_loss=True)
    ).pack_example(ex)
    t = np.asarray(on.target_mask[: on.length])
    # [o o | SEP | a]
    np.testing.assert_array_equal(t, [True, True, False, True])
    # text examples are targets either way
    t_on = SequencePacker(
        dataclasses.replace(CFG, observation_loss=True)
    ).pack_example({"text": [5, 6, 7]})
    t_off = SequencePacker(CFG).pack_example({"text": [5, 6, 7]})
    np.testing.assert_array_equal(
        t_on.target_mask[: t_on.length], t_off.target_mask[: t_off.length]
    )


def test_native_fast_path_gated_off():
    """The C kernel hard-codes the reference rule; under the flag the
    numpy route serves control episodes (masks above prove correctness)."""
    p = SequencePacker(dataclasses.replace(CFG, observation_loss=True))
    assert p._pack_control_native(EX) is None


_WM_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from neko_tpu.cli import build as B
from neko_tpu.inference.generator import Generator
from neko_tpu.training.arguments import TrainingArgs
from neko_tpu.training.trainer import Trainer

targs = TrainingArgs(
    cpu=True, sequence_length=96, embed_dim=48, layers=2, heads=2,
    batch_size=8, text_prop=0.0, text_datasets=[], text_datasets_paths=[],
    control_datasets=["neko-synth-multidiscrete-v0"],
    training_steps=150, log_eval_freq=150, eval_episodes=0,
    eval_text_num_examples=0, mixed_precision="no",
    save_model=False, log_jsonl=False, dropout=0.0, observation_loss=True,
    warmup_steps=20, learning_rate=3e-3,
)
ctx, tasks = B.build_context(targs)
assert ctx.model_cfg.observation_loss
tr = Trainer(ctx, tasks, "wm_sub", targs)
tr.train()
gen = Generator(ctx.model, tr.state.params, tr.packer)
ts = ctx.model_cfg.token_space
task = tasks[0]
hits = total = 0
for i in range(4):
    ex = task.sample_batch(1, {}, max_tokens=96)[0]
    # the packed example ends [... | SEP | a a]; the NEXT tokens are the
    # next timestep's observation — predictable ONLY under the flag
    (p,) = gen.generate_batch(
        [ex], max_new_tokens=3, start=ts.start("discrete"),
        end=ts.end("discrete"), return_logits=False,
    )
    v = np.asarray(p)[0] - ts.start("discrete")
    hits += int((v < np.asarray([6, 4, 8])).sum())
    total += 3
print("IN_RANGE", hits / total)
assert hits / total >= 2 / 3
# multi-step imagination on the trained model: predictions track the env's
# DETERMINISTIC dynamics (state' fixed by state+action) above chance
env = task.env
correct = count = 0
for i in range(4):
    ex = task.sample_batch(1, {}, max_tokens=96)[0]
    H = 6
    hist = {"discrete_obs": ex["discrete_obs"][:H],
            "discrete_actions": ex["discrete_actions"][:H]}
    acts = ex["discrete_actions"][H:H+2]
    preds = gen.imagine(hist, acts, obs_nvec=[6, 4, 8])
    true = ex["discrete_obs"][H:H+2]
    correct += int((preds == true).sum()); count += preds.size
print("IMAGINE_ACC", correct / count)
# measured 0.21 at 150 steps (chance ~ 0.18; 0.08 before generated obs
# tokens carried inner positions).  24 samples is too few to pin
# above-chance robustly, so assert only against gross regression; the
# exact embedding semantics are pinned by tests/test_imagine.py::
# test_decode_windows_match_packed_full_forward.
assert correct / count > 0.05
print("WM_OK")
"""


def test_world_model_predicts_next_observation():
    """End-to-end RoboCat recipe on the MultiDiscrete synthetic env:
    train WITH observation_loss, then autoregressively predict the next
    timestep's observation tokens (a capability the masked loss can
    never produce).  Runs in a SINGLE-device subprocess: a 150-step
    train under the suite's 8-virtual-device mesh can trip XLA's 40 s
    CPU all-reduce rendezvous timeout on a loaded machine (observed:
    rendezvous.cc abort) — device count is fixed at backend init, so
    the small run gets its own process."""
    import subprocess
    import sys

    env = dict(__import__("os").environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c", _WM_SCRIPT], env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert "WM_OK" in out.stdout, (out.stdout[-800:], out.stderr[-800:])

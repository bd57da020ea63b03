"""Multi-host data loading (parallel/multihost.py).

Real multi-process pods can't run in CI; these tests cover the pure parts
(batch-size split, row-index globalization, per-host RNG decorrelation) with
explicit (process_index, process_count) arguments, plus the degenerate
single-process assembly path against shard_batch.
"""

import numpy as np
import pytest

from neko_tpu.parallel import multihost as mh


def test_local_batch_size():
    assert mh.local_batch_size(16, 1) == 16
    assert mh.local_batch_size(16, 4) == 4
    with pytest.raises(AssertionError):
        mh.local_batch_size(10, 4)


def _local_arrays(local_b=4, S=8, n_patches=6, n_tgt=5):
    rng = np.random.RandomState(0)
    return {
        "tokens": rng.randint(0, 100, (local_b, S)).astype(np.int32),
        "input_mask": np.ones((local_b, S), bool),
        # 2 real pool entries, rest unused (marker == local_b)
        "patch_batch": np.array(
            [0, 3] + [local_b] * (n_patches - 2), np.int32
        ),
        "loss_pos": np.array(
            [[1, 2], [2, 5]] + [[local_b, 0]] * (n_tgt - 2), np.int32
        ),
    }


def test_globalize_arrays_offsets_and_markers():
    local_b = 4
    arrays = _local_arrays(local_b)
    out = mh.globalize_arrays(arrays, process_index=2, process_count=4)
    global_b = 16
    # used rows shifted into this process's global slice [8, 12)
    np.testing.assert_array_equal(out["patch_batch"][:2], [8, 11])
    # unused markers become global_B, NOT local marker + offset (which would
    # alias process 3's first row)
    assert (out["patch_batch"][2:] == global_b).all()
    np.testing.assert_array_equal(out["loss_pos"][:2, 0], [9, 10])
    np.testing.assert_array_equal(out["loss_pos"][:2, 1], [2, 5])
    assert (out["loss_pos"][2:, 0] == global_b).all()
    # [B, S] arrays untouched (layout handled by the sharding, not values)
    np.testing.assert_array_equal(out["tokens"], arrays["tokens"])
    # input untouched (copy semantics)
    assert arrays["loss_pos"][0, 0] == 1


def test_globalize_single_process_is_identity():
    arrays = _local_arrays()
    out = mh.globalize_arrays(arrays, 0, 1)
    assert out is arrays


def test_host_seed_decorrelates():
    # process 0 must keep the user's seed (single-host runs unchanged)
    assert mh.host_seed(17, process_index=0) == 17
    # other processes must differ from process 0 and from each other
    seeds = [mh.host_seed(17, process_index=i) for i in range(4)]
    assert len(set(seeds)) == 4
    # default uses the live jax process index (0 in CI)
    assert mh.host_seed(17) == 17


def test_form_global_batch_single_process_matches_shard_batch():
    import jax.numpy as jnp

    from neko_tpu.parallel import sharding as shd
    from neko_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(model=1)
    batch = {
        "tokens": jnp.zeros((8, 16), jnp.int32),
        "input_mask": jnp.ones((8, 16), bool),
    }
    a = mh.form_global_batch(mesh, batch)
    b = shd.shard_batch(mesh, batch)
    for k in batch:
        assert a[k].sharding == b[k].sharding
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_trainer_uses_local_slice(monkeypatch, tmp_path):
    """With 4 fake processes, the trainer must sample batch_size//4 examples
    and globalize the packed row indices into its process slice."""
    from neko_tpu.config import ModelConfig
    from neko_tpu.parallel.mesh import create_mesh
    from neko_tpu.tasks.text import TextTask
    from neko_tpu.training.arguments import TrainingArgs
    from neko_tpu.training.train_state import OptimizerConfig, TrainContext
    from neko_tpu.training.trainer import Trainer

    monkeypatch.setattr(mh, "process_info", lambda: (2, 4))

    cfg = ModelConfig(
        embed_dim=32, layers=1, heads=2, context_len=32, max_patches=0,
        dtype="float32", text_tokens=256, continuous_tokens=32,
        discrete_tokens=32,
    )
    opt = OptimizerConfig(
        learning_rate=1e-3, init_lr=1e-5, warmup_steps=2, training_steps=10
    )
    mesh = create_mesh(model=1)
    ctx = TrainContext(cfg, opt, mesh, seed=0)
    args = TrainingArgs(
        batch_size=8,
        sequence_length=32,
        text_prop=1.0,
        text_datasets=["synthetic"],
        text_datasets_paths=["synthetic"],
        save_model=False,
        log_jsonl=False,
        training_steps=10,
    )
    task = TextTask(
        ["synthetic"], ["synthetic"], context_length=32,
        tokenizer_model="gpt2", seed=0,
    )
    trainer = Trainer(ctx, [task], "mh_test", args)
    assert trainer.local_batch_size == 2
    assert not trainer.is_main_process
    arrays = trainer.sample_arrays()
    assert arrays["tokens"].shape[0] == 2  # per-host slice, not global
    out = mh.globalize_arrays(arrays, trainer.proc_index, trainer.proc_count)
    if "loss_pos" in out:
        used = out["loss_pos"][:, 0] != 8
        assert ((out["loss_pos"][used, 0] >= 4) & (out["loss_pos"][used, 0] < 6)).all()


def test_trainer_multihost_eval_on_main_process(monkeypatch, tmp_path):
    """Multi-host in-training eval: params are gathered (collective) and the
    MAIN process emits evaluation metrics; other processes return {} after
    participating in the gather.  (Round-2 behavior skipped eval entirely on
    pods — reference evaluates in-loop under DDP, trainer.py:83-103.)"""
    from neko_tpu.config import ModelConfig
    from neko_tpu.parallel.mesh import create_mesh
    from neko_tpu.tasks.text import TextTask
    from neko_tpu.training.arguments import TrainingArgs
    from neko_tpu.training.train_state import OptimizerConfig, TrainContext
    from neko_tpu.training.trainer import Trainer

    cfg = ModelConfig(
        embed_dim=32, layers=1, heads=2, context_len=32, max_patches=0,
        dtype="float32", text_tokens=256, continuous_tokens=32,
        discrete_tokens=32,
    )
    opt = OptimizerConfig(
        learning_rate=1e-3, init_lr=1e-5, warmup_steps=2, training_steps=10
    )
    mesh = create_mesh(model=1)
    ctx = TrainContext(cfg, opt, mesh, seed=0)
    args = TrainingArgs(
        batch_size=8, sequence_length=32, text_prop=1.0,
        text_datasets=["synthetic"], text_datasets_paths=["synthetic"],
        save_model=False, log_jsonl=False, training_steps=10,
        eval_text_num_examples=2, eval_episodes=0,
    )
    task = TextTask(
        ["synthetic"], ["synthetic"], context_length=32,
        tokenizer_model="gpt2", seed=0,
    )

    # init the state single-process (the mocked process_count only governs
    # the Trainer's view)
    real_trainer = Trainer(ctx, [task], "mh_eval_pre", args)
    real_trainer.init_state()
    state = real_trainer.state

    monkeypatch.setattr(mh, "process_info", lambda: (0, 2))
    t_main = Trainer(ctx, [task], "mh_eval_main", args)
    t_main.state = state
    logs = t_main.evaluate()
    assert any(k.startswith("evaluation/text/") for k in logs), logs

    monkeypatch.setattr(mh, "process_info", lambda: (1, 2))
    t_other = Trainer(ctx, [task], "mh_eval_other", args)
    t_other.state = state
    assert t_other.evaluate() == {}

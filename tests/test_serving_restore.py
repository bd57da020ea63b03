"""Task-less (serving) restore of IMAGE-trained checkpoints.

Regression: serve.py / the checkpoint tools build their model with
`tasks=[]`, so `derive_max_patches` returned 0 when args left
max_patches=-1 — the restore target then LACKED the image-embedder
params an image-trained checkpoint carries and Orbax refused the
restore.  `build_context(..., ckpt_path=...)` now reads the
checkpoint's _METADATA tree and sizes a serving patch pool when the
embedder exists (cli/build.py::serving_max_patches).
"""

import numpy as np

import jax

from neko_tpu.cli import build as B
from neko_tpu.training.arguments import TrainingArgs
from neko_tpu.training.trainer import Trainer


def _train_image_ckpt(tmp_path):
    targs = TrainingArgs(
        cpu=True, sequence_length=96, embed_dim=32, layers=1, heads=2,
        batch_size=8, text_prop=0.0,
        text_datasets=[], text_datasets_paths=[],
        control_datasets=["neko-synth-image-v0"],
        training_steps=2, log_eval_freq=2, eval_episodes=0,
        eval_text_num_examples=0, mixed_precision="no",
        save_model=True, save_mode="last", save_dir=str(tmp_path),
        log_jsonl=False, dropout=0.0,
    )
    ctx, tasks = B.build_context(targs)
    trainer = Trainer(ctx, tasks, "img_ckpt", targs)
    trainer.train()
    import glob
    import os

    return glob.glob(os.path.join(str(tmp_path), "img_ckpt",
                                  "checkpoint_*"))[0]


def test_serving_restore_of_image_checkpoint(tmp_path):
    ckpt = _train_image_ckpt(tmp_path)
    ckpt_path, args = B.resolve_checkpoint_and_args(ckpt, {"cpu": True})
    assert args.max_patches == -1  # training derived it from tasks
    mp = B.serving_max_patches(ckpt_path, args)
    assert mp == (256 // args.patch_size) ** 2
    # the previously-failing path: task-less restore
    ctx, _ = B.build_context(args, tasks=[], ckpt_path=ckpt_path)
    assert ctx.model_cfg.max_patches == mp
    state, packer = B.load_state_for(ctx, ckpt_path)
    assert "image_embedding" in state.params
    # ...and the restored model can embed an image prompt
    from neko_tpu.inference.generator import Generator

    gen = Generator(ctx.model, state.params, packer)
    ts = ctx.model_cfg.token_space
    img = np.zeros((1, 16, 16, 3), np.float32)
    logits, ids = gen.predict_response(img, max_length=3)
    assert len(ids) == 3


def test_serving_max_patches_no_image(tmp_path):
    """Checkpoints WITHOUT the embedder keep the derived-0 behavior."""
    targs = TrainingArgs(
        cpu=True, sequence_length=64, embed_dim=32, layers=1, heads=2,
        batch_size=8, text_prop=1.0,
        text_datasets=["synthetic"], text_datasets_paths=["synthetic"],
        control_datasets=[],
        training_steps=2, log_eval_freq=2, eval_episodes=0,
        eval_text_num_examples=0, mixed_precision="no",
        save_model=True, save_mode="last", save_dir=str(tmp_path),
        log_jsonl=False, dropout=0.0,
    )
    ctx, tasks = B.build_context(targs)
    Trainer(ctx, tasks, "txt_ckpt", targs).train()
    import glob
    import os

    ckpt = glob.glob(os.path.join(str(tmp_path), "txt_ckpt",
                                  "checkpoint_*"))[0]
    ckpt_path, args = B.resolve_checkpoint_and_args(ckpt, {"cpu": True})
    assert B.serving_max_patches(ckpt_path, args) == -1
    ctx2, _ = B.build_context(args, tasks=[], ckpt_path=ckpt_path)
    state, _ = B.load_state_for(ctx2, ckpt_path)
    assert "image_embedding" not in state.params

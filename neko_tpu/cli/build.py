"""Shared construction: TrainingArgs -> (model config, mesh, tasks, context).

The TPU-native counterpart of the reference's train.py:25-159 wiring
(Accelerator init, env/task construction, GatoPolicy build, optimizer).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax

from neko_tpu.config import ModelConfig
from neko_tpu.parallel.mesh import create_mesh
from neko_tpu.tasks.base import Task
from neko_tpu.tasks.control import ControlTask
from neko_tpu.tasks.text import TextTask
from neko_tpu.tokenizers.text import get_text_tokenizer
from neko_tpu.training.arguments import TrainingArgs
from neko_tpu.training.train_state import OptimizerConfig, TrainContext


def select_platform(args: TrainingArgs) -> None:
    """Honour --cpu / --device / --rng_impl / --multihost (must run before
    first jax use)."""
    if args.cpu or args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "rng_impl", "threefry") != "threefry":
        jax.config.update("jax_default_prng_impl", args.rng_impl)
    if getattr(args, "compilation_cache", None):
        # persistent compile cache: restarts of train/eval/serve skip every
        # already-seen XLA/Mosaic compile (verified cache-hit on the axon
        # TPU runtime; a flagship serving process pays minutes of compiles
        # cold).  min_compile_time=0 caches even the small helper programs
        # — on this runtime each costs ~0.4 s of remote_compile round-trip.
        jax.config.update("jax_compilation_cache_dir", args.compilation_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if getattr(args, "multihost", False):
        # multi-host slice: jax.devices() then spans the whole slice and the
        # ('data','model') mesh rides ICI (SURVEY.md §2.2/§5.8).  On TPU
        # pods the coordinator is auto-detected from the environment; the
        # NEKO_COORDINATOR/NEKO_NUM_PROCESSES/NEKO_PROCESS_ID variables
        # drive explicit multi-process bring-up elsewhere (e.g. the CPU
        # two-process integration test, tests/test_distributed.py)
        import os

        kw = {}
        if os.environ.get("NEKO_COORDINATOR"):
            kw = dict(
                coordinator_address=os.environ["NEKO_COORDINATOR"],
                num_processes=int(os.environ["NEKO_NUM_PROCESSES"]),
                process_id=int(os.environ["NEKO_PROCESS_ID"]),
            )
        jax.distributed.initialize(**kw)


def build_control_tasks(
    args: TrainingArgs, context_len: int, seed: int = None
) -> List[ControlTask]:
    if not args.control_datasets:
        return []
    from neko_tpu.envs.setup_env import load_envs

    if seed is None:
        from neko_tpu.parallel.multihost import host_seed

        seed = host_seed(args.seed)

    envs, datasets = load_envs(args.control_datasets)
    tasks = []
    from neko_tpu.envs.setup_env import expand_dataset_names

    names = expand_dataset_names(args.control_datasets)
    for name, env, dataset in zip(names, envs, datasets):
        tasks.append(
            ControlTask(
                name,
                env,
                dataset,
                context_len=context_len,
                patch_size=args.patch_size,
                training_prompt_len_proportion=args.prompt_len_proportion,
                share_prompt_episodes=not args.unique_prompt_episodes,
                top_k_prompting=args.top_k,
                seed=seed,
            )
        )
    return tasks


def build_tasks(args: TrainingArgs) -> List[Task]:
    from neko_tpu.parallel.multihost import host_seed

    seed = host_seed(args.seed)
    tasks: List[Task] = list(
        build_control_tasks(args, args.sequence_length, seed)
    )
    if args.text_datasets:
        tasks.append(
            TextTask(
                args.text_datasets,
                args.text_datasets_paths,
                context_length=args.sequence_length,
                tokenizer_model=args.tokenizer_model_name,
                seed=seed,
            )
        )
    if args.caption_dataset:
        from neko_tpu.tasks.caption import CaptionTask

        tasks.append(
            CaptionTask(
                args.caption_dataset,
                train_data=args.caption_train_data,
                test_data=args.caption_test_data,
                test_data_prop=args.test_data_prop,
                tokenizer_model=args.tokenizer_model_name,
                patch_size=args.patch_size,
                image_size=args.caption_image_size,
                context_length=args.sequence_length,
                seed=seed,
            )
        )
    if args.vqa_dataset:
        from neko_tpu.tasks.vqa import VqaTask

        tasks.append(
            VqaTask(
                args.vqa_dataset,
                train_data=args.vqa_train_data,
                test_data=args.vqa_test_data,
                train_img_name_prefix=args.train_img_name_prefix,
                train_img_file_name_len=args.train_img_file_name_len,
                test_img_name_prefix=args.test_img_name_prefix,
                test_img_file_name_len=args.test_img_file_name_len,
                questions_file=args.questions_file,
                annotations_file=args.annotations_file,
                tokenizer_model=args.tokenizer_model_name,
                patch_size=args.patch_size,
                image_size=args.vqa_image_size,
                context_length=args.sequence_length,
                seed=seed,
            )
        )
    return tasks


def derive_max_patches(args: TrainingArgs, tasks: List[Task]) -> int:
    if args.max_patches >= 0:
        return args.max_patches
    required = [0]
    for t in tasks:
        if isinstance(t, ControlTask):
            required.append(t.required_patches)
        elif getattr(t, "task_kind", "") in ("caption", "vqa"):
            required.append(getattr(t, "patches_per_image"))
    return max(required)


def model_config_from_args(args: TrainingArgs, max_patches: int) -> ModelConfig:
    dtype = {
        "no": "float32",
        "bf16": "bfloat16",
        "fp16": "bfloat16",  # fp16 has no TPU benefit; map to bf16
        "fp8": "bfloat16",
    }[args.mixed_precision]
    tok = get_text_tokenizer(args.tokenizer_model_name)
    embed_dim, layers, heads = args.embed_dim, args.layers, args.heads
    activation_fn = args.activation_fn
    if args.pretrained_lm:
        # pretrained GPT-2 overrides architecture (reference train.py
        # pretrained path / gato_policy.py:79-95)
        import transformers

        try:
            hf = transformers.GPT2Config.from_pretrained(args.pretrained_lm)
        except Exception as e:
            raise RuntimeError(
                f"--pretrained_lm={args.pretrained_lm} requires the HF config "
                "to be downloadable or cached"
            ) from e
        embed_dim, layers, heads = hf.n_embd, hf.n_layer, hf.n_head
        activation_fn = "gelu_new"
    return ModelConfig(
        embed_dim=embed_dim,
        layers=layers,
        heads=heads,
        dropout=args.dropout,
        stochastic_depth=getattr(args, "stochastic_depth", 0.0),
        observation_loss=getattr(args, "observation_loss", False),
        activation_fn=activation_fn,
        text_tokens=int(tok.vocab_size),
        continuous_tokens=args.continuous_tokens,
        discrete_tokens=args.discrete_tokens,
        context_len=args.sequence_length,
        mu=args.mu,
        M=args.M,
        patch_size=args.patch_size,
        resid_mid_channels=args.resid_mid_channels,
        num_groups=args.num_groups,
        position_vocab_size=args.patch_position_vocab_size,
        use_pos_encoding=not args.disable_inner_pos_encoding,
        use_patch_pos_encoding=not args.disable_patch_pos_encoding,
        max_patches=max_patches,
        dtype=dtype,
        attention_impl="flash" if args.flash else "xla",
        kv_cache_dtype=args.kv_cache_dtype,
        remat=args.remat,
        lora_r=args.lora_r if args.lora else 0,
        lora_alpha=args.lora_alpha,
        lora_dropout=args.lora_dropout,
    )


def optimizer_config_from_args(args: TrainingArgs) -> OptimizerConfig:
    return OptimizerConfig(
        learning_rate=args.learning_rate,
        init_lr=args.init_lr,
        min_factor=args.min_factor,
        warmup_steps=args.warmup_steps,
        training_steps=args.training_steps,
        disable_cosine_decay=args.disable_cosine_decay,
        beta_1=args.beta_1,
        beta_2=args.beta_2,
        adam_eps=args.adam_eps,
        weight_decay=args.weight_decay,
        grad_norm_clip=args.grad_norm_clip,
        disable_grad_clip=args.disable_grad_clip,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        lora_only=bool(args.lora),
        ema_decay=args.ema_decay,
        pipeline_microbatches=args.pipeline_microbatches,
        pipeline_schedule=args.pipeline_schedule,
        fused_adamw=args.fused_adamw,
    )


def serving_max_patches(ckpt_path: str, args: TrainingArgs) -> int:
    """Patch-pool size for a TASK-LESS (serving) restore.

    A task-less build derives max_patches=0 when args leave it at -1, so
    the restore target would LACK the image-embedder params an
    image-trained checkpoint carries and Orbax refuses the restore.  The
    checkpoint's own _METADATA tree says whether the embedder exists;
    one full 256x256 image (the caption/VQA serving shape,
    caption_task.py:70-73) is enough for predict_response — control
    rollout sessions size their own per-step packers."""
    if args.max_patches >= 0:
        return args.max_patches
    import json as _json

    meta = os.path.join(ckpt_path, "_METADATA")
    try:
        with open(meta) as fh:
            tree = _json.load(fh).get("tree_metadata", {})
    except (OSError, ValueError):
        return -1
    if any("image_embedding" in k for k in tree):
        return (256 // args.patch_size) ** 2
    return -1


def build_context(
    args: TrainingArgs,
    tasks: Optional[List[Task]] = None,
    ckpt_path: Optional[str] = None,
) -> Tuple[TrainContext, List[Task]]:
    select_platform(args)
    if tasks is None:
        tasks = build_tasks(args)
    elif not tasks and ckpt_path is not None:
        # serving restore with no tasks: size the pool from the checkpoint
        args.max_patches = serving_max_patches(ckpt_path, args)
    max_patches = derive_max_patches(args, tasks)
    model_cfg = model_config_from_args(args, max_patches)
    opt_cfg = optimizer_config_from_args(args)
    if args.mesh_seq_axis > 1:
        assert args.sequence_length % args.mesh_seq_axis == 0, (
            f"context len {args.sequence_length} must divide evenly over "
            f"mesh_seq_axis={args.mesh_seq_axis} sequence shards"
        )
    if args.mesh_pipe_axis > 1:
        # check the RESOLVED layer count: --pretrained_lm overrides
        # args.layers with the HF config's n_layer (model_config_from_args)
        assert model_cfg.layers % args.mesh_pipe_axis == 0, (
            f"layers={model_cfg.layers} must split evenly into "
            f"mesh_pipe_axis={args.mesh_pipe_axis} pipeline stages"
        )
    mesh = create_mesh(
        model=args.mesh_model_axis, seq=args.mesh_seq_axis,
        pipe=args.mesh_pipe_axis,
    )
    ctx = TrainContext(
        model_cfg, opt_cfg, mesh, seed=args.seed,
        fsdp=getattr(args, "fsdp", False),
    )
    return ctx, tasks


def resolve_checkpoint_and_args(model_path: str, overrides: Optional[dict] = None):
    """Shared inference-restore recipe, step 1 (eval.py / serve.py /
    tools/export_checkpoint.py): resolve `model_path` (a checkpoint_<N> dir,
    or an experiment dir whose LATEST checkpoint is used), load the adjacent
    args.json, and merge non-None overrides — the reference's eval.py
    restore contract (eval.py:22-38).  Returns (ckpt_path, TrainingArgs)."""
    import os

    from neko_tpu.utils.checkpoint import load_args_dict, resolve_checkpoint_dir

    ckpt_path = resolve_checkpoint_dir(model_path)
    saved = load_args_dict(os.path.dirname(ckpt_path))
    for k, v in (overrides or {}).items():
        if v is not None:
            saved[k] = v
    known = {f.name for f in TrainingArgs.__dataclass_fields__.values()}
    args = TrainingArgs(**{k: v for k, v in saved.items() if k in known})
    return ckpt_path, args


def load_state_for(ctx: TrainContext, ckpt_path: str):
    """Shared inference-restore recipe, step 2: init the sharded train state
    from a dummy packed batch (sized to the context mesh's data axis) and
    restore the checkpoint into it.  Returns (state, packer)."""
    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker
    from neko_tpu.utils.checkpoint import load_checkpoint

    packer = SequencePacker(ctx.model_cfg)
    n_data = dict(ctx.mesh.shape).get("data", 1)
    arrays = packer.pack_batch([{"text": [0]}] * n_data)
    arrays.pop("lengths")
    state = ctx.init_state(to_device_batch(arrays))
    return load_checkpoint(ckpt_path, jax.tree.map(lambda x: x, state)), packer

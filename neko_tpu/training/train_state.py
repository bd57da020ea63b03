"""Train state + the pjit-compiled train step.

The TPU-native equivalent of the reference's Accelerate loop
(trainer.py:176-186: accumulate -> backward -> clip -> AdamW step -> cosine
schedule): one jit-compiled function over a ('data','model') mesh holding
params, AdamW state, step counter and RNG in a single donated pytree.
Gradient all-reduce over the 'data' axis and tensor-parallel collectives over
'model' are emitted by XLA from sharding annotations — there is no hand-written
communication code on the train path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neko_tpu.config import ModelConfig
from neko_tpu.data.batch import PackedBatch
from neko_tpu.models.policy import NekoModel
from neko_tpu.parallel import sharding as shd
from neko_tpu.training.schedulers import linear_warmup_cosine_decay


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # plain uint32 seed, NOT a typed PRNG key: checkpoints stay loadable
    # across PRNG implementations (threefry keys are uint32[2], rbg uint32[4]
    # — a typed key baked into the state would tie the checkpoint to the
    # --rng_impl it was saved under). Per-step keys derive from (seed, step).
    seed: jnp.ndarray
    # exponential moving average of params (--ema_decay > 0; a capability
    # the reference lacks). None when disabled — None is a leafless pytree
    # node, so pre-EMA checkpoints keep restoring into this state.
    ema_params: Any = None


@dataclasses.dataclass
class OptimizerConfig:
    """Reference flag surface (arguments.py:63-89)."""

    learning_rate: float = 1e-4
    init_lr: float = 1e-7
    min_factor: float = 10.0
    warmup_steps: int = 15_000
    training_steps: int = 1_000_000
    disable_cosine_decay: bool = False
    beta_1: float = 0.9
    beta_2: float = 0.95
    adam_eps: float = 1e-8
    weight_decay: float = 0.1
    grad_norm_clip: float = 1.0
    disable_grad_clip: bool = False
    gradient_accumulation_steps: int = 1
    # Freeze transformer base weights, training only LoRA adapters + the
    # non-transformer modules (embeddings, head, image embedder) — matching
    # peft wrapping model.transformer only (reference train.py:109-112).
    lora_only: bool = False
    # EMA of params: 0.0 = off; typical values 0.999-0.9999.  The shadow
    # copy updates inside the compiled train step, rides the TrainState
    # through checkpoints, and serves eval via --use_ema.
    ema_decay: float = 0.0
    # Microbatches per GPipe tick when the mesh has a 'pipe' axis > 1
    # (parallel/pipeline.py).  Bubble fraction = (stages-1)/(micro+stages-1);
    # ignored on meshes without pipeline parallelism.
    pipeline_microbatches: int = 4
    # 'gpipe': all-forward/all-backward via autodiff (activation memory
    # O(n_micro)); '1f1b': interleaved hand-written schedule with per-stage
    # activation memory bounded at O(n_stages) ring-buffered stage inputs
    # and backward-by-rematerialization (parallel/pipeline.py::
    # pipelined_loss_1f1b).  Ignored when the mesh has no 'pipe' axis.
    pipeline_schedule: str = "gpipe"
    # Single-pass fused AdamW (ops/fused_adamw.py): clip-scale + moment
    # updates + bias correction + weight decay + apply in one elementwise
    # pass per leaf — skips the optax transform-boundary `updates`
    # materialization (chip-measured in runs/adamw_r5.json).  Same math as
    # the optax chain to fp32 round-off (tests/test_fused_adamw.py), but the
    # opt_state tree is FusedAdamWState — checkpoints are not interchangeable
    # with the optax layout, so this is opt-in (--fused_adamw).  Falls back
    # to the optax chain under --lora_only or gradient accumulation.
    fused_adamw: bool = False


def use_fused_adamw(cfg: OptimizerConfig) -> bool:
    """The fused path covers the plain AdamW train step; LoRA-freeze label
    routing and MultiSteps accumulation stay on the optax chain."""
    return (
        cfg.fused_adamw
        and not cfg.lora_only
        and cfg.gradient_accumulation_steps == 1
    )


def make_optimizer(cfg: OptimizerConfig) -> Tuple[optax.GradientTransformation, Callable]:
    schedule = linear_warmup_cosine_decay(
        base_lr=cfg.learning_rate,
        init_lr=cfg.init_lr,
        min_lr=cfg.learning_rate / cfg.min_factor,
        warmup_steps=cfg.warmup_steps,
        total_steps=cfg.training_steps,
        cosine_decay=not cfg.disable_cosine_decay,
    )
    chain = []
    if not cfg.disable_grad_clip:
        chain.append(optax.clip_by_global_norm(cfg.grad_norm_clip))
    # torch.optim.AdamW decays every parameter passed to it (train.py:127-133)
    # so no decay mask here — parity over fashion.
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.beta_1,
            b2=cfg.beta_2,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        )
    )
    tx = optax.chain(*chain)
    if cfg.lora_only:
        def _labels(params):
            def label(path, _):
                names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
                if "lora_a" in names or "lora_b" in names:
                    return "train"
                return "freeze" if names and names[0] == "transformer" else "train"

            return jax.tree_util.tree_map_with_path(label, params)

        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, _labels
        )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.gradient_accumulation_steps)
    return tx, schedule


class TrainContext:
    """Owns model, optimizer, mesh and the compiled train/eval steps."""

    def __init__(
        self,
        model_cfg: ModelConfig,
        opt_cfg: OptimizerConfig,
        mesh: Mesh,
        seed: int = 0,
        fsdp: bool = False,
    ):
        self.model_cfg = model_cfg
        self.opt_cfg = opt_cfg
        self.mesh = mesh
        # ZeRO-3: shard params + AdamW moments + EMA over 'data' too
        # (parallel/sharding.py::fsdp_param_pspec); plain jit emits the
        # use-site all-gathers and gradient reduce-scatters
        self.fsdp = fsdp
        from neko_tpu.parallel.pipeline import pipe_axis_size

        # stage-local PP storage: on a 'pipe' mesh the TrainState stores the
        # Block stack as transformer/h_stack [n_stages, Lp, ...] sharded
        # over 'pipe' — each stage's devices hold only their layers' params,
        # AdamW moments and EMA (parallel/pipeline.py::STACK_KEY).  The
        # canonical per-layer tree remains the checkpoint/interop layout
        # (to_canonical_state / from_canonical_state reshard at the
        # boundary).
        self.n_pipe = pipe_axis_size(mesh)
        if self.n_pipe > 1:
            assert model_cfg.layers % self.n_pipe == 0, (
                f"layers={model_cfg.layers} not divisible by "
                f"pipe={self.n_pipe} stages"
            )
        self.model = NekoModel(model_cfg)
        self.tx, self.schedule = make_optimizer(opt_cfg)
        from neko_tpu.training.schedulers import (
            linear_warmup_cosine_decay_host,
        )

        self._host_schedule = linear_warmup_cosine_decay_host(
            base_lr=opt_cfg.learning_rate,
            init_lr=opt_cfg.init_lr,
            min_lr=opt_cfg.learning_rate / opt_cfg.min_factor,
            warmup_steps=opt_cfg.warmup_steps,
            total_steps=opt_cfg.training_steps,
            cosine_decay=not opt_cfg.disable_cosine_decay,
        )
        self.seed = seed
        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------- init
    def init_state(self, example_batch: PackedBatch) -> TrainState:
        rng = jax.random.key(self.seed)

        def _init(rng, batch):
            params = self.model.init({"params": rng}, batch)["params"]
            if self.n_pipe > 1:
                from neko_tpu.parallel.pipeline import stack_pipeline_tree

                # stage-local storage from step 0: moments/EMA inherit the
                # stacked layout because they are initialized from it
                params = stack_pipeline_tree(
                    params, self.n_pipe, self.model_cfg.layers
                )
            if use_fused_adamw(self.opt_cfg):
                from neko_tpu.ops.fused_adamw import init_fused_adamw_state

                opt_state = init_fused_adamw_state(params)
            else:
                opt_state = self.tx.init(params)
            ema = (
                jax.tree.map(jnp.copy, params)
                if self.opt_cfg.ema_decay > 0 else None
            )
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                opt_state=opt_state,
                seed=jnp.uint32(self.seed + 1),
                ema_params=ema,
            )

        # Evaluate shapes first so we can jit-init directly into the sharded
        # layout (no host-memory spike, no device round-trip).
        abstract = jax.eval_shape(_init, rng, example_batch)
        out_shardings = jax.tree_util.tree_map_with_path(
            lambda path, v: NamedSharding(
                self.mesh, self._state_pspec(path, v)
            ),
            abstract,
        )
        init_fn = jax.jit(_init, out_shardings=out_shardings)
        with self.mesh:
            return init_fn(rng, shd.shard_batch(self.mesh, example_batch))

    def _state_pspec(self, path, value) -> P:
        # Param rules match by path suffix, so they apply equally to params
        # and to the param-shaped adam moments inside opt_state; scalars and
        # RNG keys fall through to replicated.  Axes the mesh doesn't carry
        # (e.g. 'model' on a pipeline mesh) are pruned to replicated.
        if self.n_pipe > 1:
            from neko_tpu.parallel.pipeline import STACK_KEY

            names = shd._path_names(path)
            if STACK_KEY in names:
                # stage-local stacked leaf: 'pipe' on the stage dim (+ TP
                # on the layer dims, + 'data' under --fsdp)
                return shd.stacked_param_pspec(
                    path, value, self.mesh, self.fsdp
                )
        if self.fsdp:
            return shd.fsdp_param_pspec(path, value, self.mesh)
        return shd.prune_spec(shd.param_pspec(path, value), self.mesh)

    def state_shardings(self, state: TrainState):
        return jax.tree_util.tree_map_with_path(
            lambda path, v: NamedSharding(self.mesh, self._state_pspec(path, v)),
            state,
        )

    # ------------------------------------------------------------- steps
    def train_step(self, state: TrainState, batch: PackedBatch):
        if self._train_step is None:
            self._train_step = self._build_train_step(state, batch)
        with self.mesh:
            return self._train_step(state, batch)

    def train_step_lowered(self, state: TrainState, batch: PackedBatch):
        """AOT lowering of the jitted train step — for compiled-memory /
        cost analysis (tools/measure_pipeline.py) without running it."""
        if self._train_step is None:
            self._train_step = self._build_train_step(state, batch)
        with self.mesh:
            return self._train_step.lower(state, batch)

    def _build_train_step(self, state: TrainState, batch: PackedBatch):
        model, tx = self.model, self.tx

        from neko_tpu.parallel.pipeline import (
            pipe_axis_size, pipelined_loss, pipelined_loss_1f1b,
        )

        n_pipe = pipe_axis_size(self.mesh)
        pipe_fn = (
            pipelined_loss_1f1b
            if self.opt_cfg.pipeline_schedule == "1f1b"
            else pipelined_loss
        )

        def step_fn(state: TrainState, batch: PackedBatch):
            step_key = jax.random.fold_in(
                jax.random.key(state.seed), state.step
            )
            dropout_rng, patch_rng = jax.random.split(step_key, 2)

            def loss_fn(params):
                if n_pipe > 1:
                    # microbatch schedule over the 'pipe' mesh axis:
                    # GPipe or 1F1B per opt_cfg.pipeline_schedule
                    # (parallel/pipeline.py)
                    return pipe_fn(
                        model, params, batch,
                        mesh=self.mesh,
                        n_micro=self.opt_cfg.pipeline_microbatches,
                        rngs={"dropout": dropout_rng, "patch_pos": patch_rng},
                    )
                _, loss = model.apply(
                    {"params": params},
                    batch,
                    deterministic=False,
                    compute_loss=True,
                    rngs={"dropout": dropout_rng, "patch_pos": patch_rng},
                )
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            if use_fused_adamw(self.opt_cfg):
                from neko_tpu.ops.fused_adamw import fused_adamw_update

                oc = self.opt_cfg
                new_params, new_opt = fused_adamw_update(
                    state.params, grads, state.opt_state,
                    lr=self.schedule(state.opt_state.count),
                    b1=oc.beta_1, b2=oc.beta_2, eps=oc.adam_eps,
                    wd=oc.weight_decay,
                    max_norm=(
                        None if oc.disable_grad_clip else oc.grad_norm_clip
                    ),
                    # chip-measured (runs/adamw_r5.json): the pallas backend
                    # is 8.70 ms vs XLA's 2.29 — per-leaf grid launches lose
                    # to XLA's loop fusion; jnp ties optax (2.28)
                    use_pallas=False,
                )
            else:
                updates, new_opt = tx.update(
                    grads, state.opt_state, state.params
                )
                new_params = optax.apply_updates(state.params, updates)
            ema = state.ema_params
            if ema is not None:
                d = self.opt_cfg.ema_decay
                k = self.opt_cfg.gradient_accumulation_steps
                updated = jax.tree.map(
                    lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                    ema, new_params,
                )
                if k > 1:
                    # decay once per OPTIMIZER update, not per micro-step:
                    # MultiSteps applies the update on every k-th call, so
                    # decaying each call would compound to d^k per update
                    boundary = (state.step + 1) % k == 0
                    ema = jax.tree.map(
                        lambda u, e: jnp.where(boundary, u, e), updated, ema
                    )
                else:
                    ema = updated
            new_state = TrainState(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt,
                seed=state.seed,
                ema_params=ema,
            )
            return new_state, loss

        state_sh = self.state_shardings(state)
        batch_sh = shd.batch_shardings(self.mesh, batch)
        return jax.jit(
            step_fn,
            in_shardings=(state_sh, batch_sh),
            out_shardings=(state_sh, NamedSharding(self.mesh, P())),
            donate_argnums=(0,),
        )

    def eval_step(self, state: TrainState, batch: PackedBatch):
        """Deterministic loss on a batch (no grads)."""
        if self._eval_step is None:
            model = self.model
            n_pipe = self.n_pipe

            def fn(params, batch):
                if n_pipe > 1:
                    # sequential eval on a pipe mesh: gather the stacked
                    # stage-local body back to the canonical tree
                    from neko_tpu.parallel.pipeline import (
                        unstack_pipeline_tree,
                    )

                    params = unstack_pipeline_tree(params)
                _, loss = model.apply(
                    {"params": params}, batch, deterministic=True, compute_loss=True
                )
                return loss

            self._eval_step = jax.jit(fn)
        with self.mesh:
            return self._eval_step(state.params, batch)

    # --------------------------------------------- stage-local PP reshards
    def unstack_params(self, params):
        """Stage-local stacked params -> canonical per-layer tree (identity
        off pipeline meshes).  Used by the decode-loop Generator and the
        GPT-2/LoRA import paths, which consume the canonical layout."""
        from neko_tpu.parallel.pipeline import (
            params_are_stacked, unstack_pipeline_tree,
        )

        if self.n_pipe <= 1 or not params_are_stacked(params):
            return params
        if getattr(self, "_unstack_params_fn", None) is None:
            ab = jax.eval_shape(unstack_pipeline_tree, params)
            out_sh = jax.tree_util.tree_map_with_path(
                lambda p, v: NamedSharding(
                    self.mesh,
                    shd.prune_spec(shd.param_pspec(p, v), self.mesh),
                ),
                ab,
            )
            self._unstack_params_fn = jax.jit(
                unstack_pipeline_tree, out_shardings=out_sh
            )
        with self.mesh:
            return self._unstack_params_fn(params)

    def stack_params(self, params):
        """Canonical per-layer params -> stage-local stacked layout
        (identity off pipeline meshes)."""
        from neko_tpu.parallel.pipeline import (
            params_are_stacked, stack_pipeline_tree,
        )

        if self.n_pipe <= 1 or params_are_stacked(params):
            return params
        fn = lambda p: stack_pipeline_tree(
            p, self.n_pipe, self.model_cfg.layers
        )
        ab = jax.eval_shape(fn, params)
        out_sh = jax.tree_util.tree_map_with_path(
            lambda p, v: NamedSharding(self.mesh, self._state_pspec(p, v)), ab
        )
        with self.mesh:
            return jax.jit(fn, out_shardings=out_sh)(params)

    def to_canonical_state(self, state: TrainState) -> TrainState:
        """Reshard a stage-local TrainState to the canonical per-layer
        layout for checkpointing (identity off pipeline meshes) — on-disk
        checkpoints stay byte-compatible with every other mesh."""
        from neko_tpu.parallel.pipeline import unstack_pipeline_tree

        if self.n_pipe <= 1:
            return state
        if getattr(self, "_to_canonical_fn", None) is None:
            ab = jax.eval_shape(unstack_pipeline_tree, state)
            out_sh = jax.tree_util.tree_map_with_path(
                lambda p, v: NamedSharding(
                    self.mesh, self._canonical_pspec(p, v)
                ),
                ab,
            )
            self._to_canonical_fn = jax.jit(
                unstack_pipeline_tree, out_shardings=out_sh
            )
        with self.mesh:
            return self._to_canonical_fn(state)

    def from_canonical_state(self, state: TrainState) -> TrainState:
        """Inverse of to_canonical_state (identity off pipeline meshes)."""
        from neko_tpu.parallel.pipeline import stack_pipeline_tree

        if self.n_pipe <= 1:
            return state
        fn = lambda s: stack_pipeline_tree(
            s, self.n_pipe, self.model_cfg.layers
        )
        ab = jax.eval_shape(fn, state)
        out_sh = jax.tree_util.tree_map_with_path(
            lambda p, v: NamedSharding(self.mesh, self._state_pspec(p, v)), ab
        )
        with self.mesh:
            return jax.jit(fn, out_shardings=out_sh)(state)

    def _canonical_pspec(self, path, value) -> P:
        """_state_pspec for the canonical (unstacked) layout — never sees
        h_stack paths."""
        if self.fsdp:
            return shd.fsdp_param_pspec(path, value, self.mesh)
        return shd.prune_spec(shd.param_pspec(path, value), self.mesh)

    def canonical_abstract(self, state: TrainState):
        """ShapeDtypeStructs (with shardings) of the canonical layout of
        `state` — the restore template for Orbax checkpoints written by any
        mesh (identity off pipeline meshes)."""
        from neko_tpu.parallel.pipeline import unstack_pipeline_tree

        if self.n_pipe <= 1:
            return jax.tree.map(lambda x: x, state)
        ab = jax.eval_shape(unstack_pipeline_tree, state)
        return jax.tree_util.tree_map_with_path(
            lambda p, v: jax.ShapeDtypeStruct(
                v.shape, v.dtype,
                sharding=NamedSharding(self.mesh, self._canonical_pspec(p, v)),
            ),
            ab,
        )

    def current_lr(self, step: int) -> float:
        # host-side math: evaluating the jnp schedule eagerly runs on the
        # accelerator and float() then blocks on the ENTIRE dispatched
        # device queue — a hidden per-step pipeline sync (schedulers.py)
        return float(self._host_schedule(step))

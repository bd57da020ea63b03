"""Training orchestration: mixture sampling, train/eval cadence, checkpoints.

Mirrors the reference Trainer (/root/reference/gato/training/trainer.py):

* train() = (training_steps // log_eval_freq) iterations of N train steps +
  per-task evaluation + logging + optional checkpoint (trainer.py:43-125)
* per-step mixture: batch split by text/caption/vqa props with the remainder
  dispensed via a multinomial over fractional residuals (trainer.py:134-154)
* control batch: tasks assigned round-robin without replacement, a
  prompt_ep_proportion subset of slots prompted, half 'end' half 'uniform'
  (trainer.py:211-247)

TPU-native differences: examples are packed host-side into one static-shape
PackedBatch and dispatched to a single pjit train step (no per-modality python
in the device graph); losses are fetched asynchronously; evaluation uses the
KV-cache Generator.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from neko_tpu.data.packing import SequencePacker
from neko_tpu.inference.generator import Generator
from neko_tpu.parallel import sharding as shd
from neko_tpu.tasks.base import Task
from neko_tpu.tasks.control import ControlTask
from neko_tpu.tasks.text import TextTask
from neko_tpu.training.train_state import TrainContext, TrainState
from neko_tpu.utils.checkpoint import save_checkpoint
from neko_tpu.utils.logging import MetricsLogger


class Trainer:
    def __init__(
        self,
        ctx: TrainContext,
        tasks: List[Task],
        exp_name: str,
        args,
        logger: Optional[MetricsLogger] = None,
    ):
        self.ctx = ctx
        self.tasks = tasks
        self.args = args
        self.exp_name = exp_name
        self.exp_dir = os.path.join(args.save_dir, exp_name)
        self.packer = SequencePacker(ctx.model_cfg)
        # multi-host: batch_size is GLOBAL (reference split_batches
        # semantics); each process samples/packs only its slice, the
        # sampling RNG is decorrelated per host, and only the main process
        # writes logs (reference is_main_process gating, trainer.py:110-116)
        from neko_tpu.parallel import multihost as mh

        self.proc_index, self.proc_count = mh.process_info()
        self.is_main_process = self.proc_index == 0
        self.local_batch_size = mh.local_batch_size(
            args.batch_size, self.proc_count
        )
        self.logger = logger or MetricsLogger(
            exp_dir=self.exp_dir
            if (args.save_model or args.log_jsonl) and self.is_main_process
            else None,
            use_wandb=args.use_wandb and self.is_main_process,
            wandb_project=args.wandb_project,
            exp_name=exp_name,
            config=args.__dict__,
            print_logs=self.is_main_process,
            jsonl=args.log_jsonl,
        )
        self.rng = np.random.default_rng(
            mh.host_seed(args.seed, self.proc_index)
        )
        self.deterministic = args.eval_mode == "deterministic"
        self.steps = 0
        self.state: Optional[TrainState] = None
        self.start_time = None

        self.control_tasks = [t for t in tasks if isinstance(t, ControlTask)]
        self.text_tasks = [t for t in tasks if isinstance(t, TextTask)]
        # caption/vqa tasks are matched by duck-typed task_kind
        self.caption_tasks = [t for t in tasks if getattr(t, "task_kind", "") == "caption"]
        self.vqa_tasks = [t for t in tasks if getattr(t, "task_kind", "") == "vqa"]
        data_axis = ctx.mesh.shape.get("data", 1)
        assert args.batch_size % data_axis == 0, (
            f"batch_size={args.batch_size} must be divisible by the mesh "
            f"data axis ({data_axis}); adjust --batch_size or "
            "--mesh_model_axis"
        )
        self.patch_budget = self._compute_patch_budget()
        self.target_budget = self._compute_target_budget()
        self._prefetcher = None
        self._generator = None
        # host data-stream state of the batch most recently CONSUMED by
        # train_step — what checkpoints persist so a resumed run replays
        # the uninterrupted sample stream exactly (utils/host_state.py);
        # the live RNGs race ahead of it by the prefetch depth
        self._host_snapshot = None
        # serializes host-side sampling: the prefetch thread and evaluation
        # share task RNGs and h5py handles, which are not thread-safe
        import threading

        self._sample_lock = threading.Lock()

    def _component_counts(self):
        """Base per-component row counts and the EXACT residual remainder.

        _mixture_sizes assigns int(prop * bs) rows per component and hands
        the whole remainder to exactly ONE component per step — so the
        worst-case static budgets below add the remainder to whichever
        single component maximizes the cost, not to all of them (the old
        +3-everywhere bound pushed the flagship mixture's target budget
        past the dense-loss cutoff and cost ~20 ms/step in chunked-loss
        remat; measured in the r4 trainer-run trace)."""
        bs = self.local_batch_size
        base = {
            "text": int(self.args.text_prop * bs) if self.text_tasks else 0,
            "caption": int(self.args.caption_prop * bs) if self.caption_tasks else 0,
            "vqa": int(self.args.vqa_prop * bs) if self.vqa_tasks else 0,
        }
        control_prop = (
            1 - self.args.text_prop - self.args.caption_prop
            - self.args.vqa_prop
        )
        base["control"] = int(control_prop * bs) if self.control_tasks else 0
        remainder = bs - sum(base.values())
        return base, remainder

    def _compute_patch_budget(self) -> int:
        """Worst-case total image patches in one mixture batch, kept constant
        across steps so the compiled step never reshapes (see the global
        patch pool in data/batch.py).  Computed from the LOCAL (per-host)
        slice; the global pool is the process-concatenation."""
        base, remainder = self._component_counts()
        per_row = {"text": 0, "caption": 0, "vqa": 0, "control": 0}
        ctrl_patches = [t.required_patches for t in self.control_tasks]
        if ctrl_patches and max(ctrl_patches) > 0:
            per_row["control"] = max(ctrl_patches)
        if self.caption_tasks:
            per_row["caption"] = max(
                t.patches_per_image for t in self.caption_tasks
            )
        if self.vqa_tasks:
            per_row["vqa"] = max(t.patches_per_image for t in self.vqa_tasks)
        budget = sum(base[c] * per_row[c] for c in base)
        # the remainder lands on one component: take the costliest recipient
        budget += remainder * max(per_row.values())
        if budget == 0:
            return 0
        return -(-budget // 256) * 256  # round up for clean 'data' sharding

    def _compute_target_budget(self) -> int:
        """Worst-case loss-target count per batch for the gathered-loss path
        (ops/losses.py::gathered_masked_xent); 0 -> dense loss."""
        bs = self.local_batch_size
        S = self.args.sequence_length
        base, remainder = self._component_counts()
        per_row = {"text": S - 1, "caption": 0, "vqa": 0, "control": 0}
        if self.control_tasks:
            per_row["control"] = max(
                t.context_timesteps * (
                    t.action_tokens
                    # --observation_loss: obs tokens are targets too
                    # (RoboCat recipe); the first obs token of a timestep
                    # is predicted from the previous SEP/action position,
                    # so every obs token counts
                    + (t.observation_tokens
                       if getattr(self.args, "observation_loss", False)
                       else 0)
                )
                for t in self.control_tasks
            )
        for key, tasks in (("caption", self.caption_tasks), ("vqa", self.vqa_tasks)):
            if tasks:
                per_row[key] = max(S - t.patches_per_image - 1 for t in tasks)
        budget = sum(base[c] * per_row[c] for c in base if self._has_tasks(c))
        budget += remainder * max(
            (per_row[c] for c in base if self._has_tasks(c)), default=0
        )
        budget = -(-budget // 256) * 256
        # dense only when gathering projects no fewer positions than the
        # dense head already does: the gathered path's custom VJP also skips
        # the chunked loss's checkpoint-remat (a second full [C,V] pass +
        # logsumexp re-reduction in the backward), so it wins essentially
        # until budget == bs*S.  Measured at the flagship mixture (r4):
        # dense ~41 ms of loss-head work vs ~22 gathered at 12k targets.
        if budget >= bs * S:
            return 0
        return budget

    def _has_tasks(self, component: str) -> bool:
        return bool({
            "text": self.text_tasks,
            "caption": self.caption_tasks,
            "vqa": self.vqa_tasks,
            "control": self.control_tasks,
        }[component])

    # ----------------------------------------------------------- lifecycle
    def init_state(self, init_state: Optional[TrainState] = None):
        if init_state is not None:
            self.state = init_state
            return
        batch = self.build_batch()
        self.state = self.ctx.init_state(batch)

    def train(self):
        self.start_time = time.time()
        if self.state is None:
            self.init_state()
        # train only the REMAINING steps (exact-resume contract: a run
        # resumed at step N finishes at training_steps, not N+training_steps)
        remaining = max(0, self.args.training_steps - self.steps)
        iters, tail = divmod(remaining, self.args.log_eval_freq)
        try:
            for i in range(iters):
                logs = self.train_iteration(self.args.log_eval_freq, i)
                self.logger.log(logs, step=self.steps, header=f"Iteration {i}")
            if tail:
                # run the remainder when training_steps isn't a multiple of
                # log_eval_freq instead of silently dropping those steps
                logs = self.train_iteration(tail, iters)
                self.logger.log(
                    logs, step=self.steps, header=f"Iteration {iters}"
                )
            if self.args.save_model and self.args.save_mode == "last":
                self._save()
        except BaseException:
            # preemption / failure safety: persist the full train state so
            # --resume_from continues exactly (the reference has no failure
            # handling at all, SURVEY.md §5.3)
            if self.args.save_model and self.state is not None:
                try:
                    path = self._save()
                    print(f"[neko-tpu] emergency checkpoint: {path}")
                except Exception as e:  # noqa: BLE001
                    print(f"[neko-tpu] emergency checkpoint failed: {e}")
            raise
        finally:
            if self._prefetcher is not None:
                self._prefetcher.close()
                self._prefetcher = None

    def train_iteration(self, num_steps: int, it: int) -> Dict:
        logs: Dict = {}
        train_start = time.time()
        losses = []
        sample_time = 0.0
        step_logs: Dict = {}
        for _ in range(num_steps):
            self.steps += 1
            loss, step_logs = self.train_step()
            losses.append(loss)
        sample_time = step_logs.get("time/sample_batch", 0.0)
        losses = [float(l) for l in losses]  # blocks on the last device value
        logs.update(step_logs)
        train_time = time.time() - train_start
        logs["time/training"] = train_time
        logs["training/tokens_per_sec"] = (
            num_steps * self.args.batch_size * self.args.sequence_length
            / max(train_time, 1e-9)
        )

        eval_start = time.time()
        logs.update(self.evaluate())
        logs["time/total"] = time.time() - self.start_time
        logs["time/evaluation"] = time.time() - eval_start
        logs["training/train_loss_mean"] = float(np.mean(losses))
        logs["training/train_loss_std"] = float(np.std(losses))

        if self.args.save_model and self.args.save_mode == "checkpoint":
            self._save()
        return logs

    # ------------------------------------------------------------ training
    def _mixture_sizes(self) -> Dict[str, int]:
        """Reference trainer.py:134-154 (applied to the per-host slice)."""
        bs = self.local_batch_size
        text_prop = self.args.text_prop
        caption_prop = self.args.caption_prop
        vqa_prop = self.args.vqa_prop
        control_prop = 1 - text_prop - caption_prop - vqa_prop
        sizes = {
            "text": int(text_prop * bs),
            "caption": int(caption_prop * bs),
            "vqa": int(vqa_prop * bs),
            "control": int(control_prop * bs),
        }
        remainder = bs - sum(sizes.values())
        if remainder > 0:
            residuals = np.array(
                [
                    text_prop * bs - sizes["text"],
                    caption_prop * bs - sizes["caption"],
                    vqa_prop * bs - sizes["vqa"],
                    control_prop * bs - sizes["control"],
                ]
            )
            total = residuals.sum()
            probs = residuals / total if total > 0 else np.ones(4) / 4
            idx = self.rng.choice(4, p=probs)
            sizes[["text", "caption", "vqa", "control"][idx]] += remainder
        assert sum(sizes.values()) == bs
        return sizes

    # ------------------------------------------------------- exact resume
    def host_state(self):
        """Current host data-stream state (trainer RNG + per-task RNGs)."""
        from neko_tpu.utils import host_state as hs

        return hs.collect(self.rng, self.tasks)

    def load_host_state(self, snapshot) -> None:
        from neko_tpu.utils import host_state as hs

        hs.restore(snapshot, self.rng, self.tasks)
        self._host_snapshot = snapshot

    def _checkpoint_host_state(self):
        """The state to persist: post-sample state of the batch consumed at
        the current step, falling back to the live state before any batch
        was consumed (step 0)."""
        if self._host_snapshot is not None:
            return self._host_snapshot
        with self._sample_lock:
            return self.host_state()

    def _save(self) -> str:
        from neko_tpu.utils.host_state import save_host_state

        # stage-local PP storage reshards to the canonical per-layer layout
        # at the checkpoint boundary (identity off pipeline meshes) — the
        # on-disk artifact is byte-compatible across meshes
        state = self.ctx.to_canonical_state(self.state)
        path = save_checkpoint(self.exp_dir, state, self.steps, self.args)
        save_host_state(
            self.exp_dir,
            self.steps,
            self._checkpoint_host_state(),
            self.proc_index,
        )
        return path

    def sample_arrays(self):
        """Sample the task mixture and pack to host numpy arrays."""
        with self._sample_lock:
            return self._sample_arrays_locked()

    def _sample_arrays_with_state(self):
        """Sample one batch and snapshot the post-sample host RNG state
        (atomically, under the sampling lock)."""
        with self._sample_lock:
            arrays = self._sample_arrays_locked()
            return arrays, self.host_state()

    def _sample_arrays_locked(self):
        sizes = self._mixture_sizes()
        examples: List[Dict] = []
        if sizes["text"] > 0:
            for task in self.text_tasks:
                examples += task.sample_batch(sizes["text"])
        if sizes["caption"] > 0:
            for task in self.caption_tasks:
                examples += task.sample_batch(sizes["caption"])
        if sizes["vqa"] > 0:
            for task in self.vqa_tasks:
                examples += task.sample_batch(sizes["vqa"])
        if sizes["control"] > 0:
            examples += self.sample_control_batch(sizes["control"])
        arrays = self.packer.pack_batch(
            examples,
            patch_budget=self.patch_budget,
            target_budget=self.target_budget,
        )
        arrays.pop("lengths")
        return arrays

    def build_batch(self, arrays=None):
        """Sample (unless given), pack, and device_put ONE sharded batch.

        Runs inside the prefetch thread on the hot path so the host->device
        copy overlaps device compute — the copy, not the packing, dominated
        host time (a 15 MB f32 patch pool serialized ~3 device steps; the
        uint8 schema + overlap removed the stall entirely)."""
        from neko_tpu.data.batch import from_arrays
        from neko_tpu.parallel import multihost as mh

        if arrays is None:
            arrays = self.sample_arrays()
        arrays = mh.globalize_arrays(arrays, self.proc_index, self.proc_count)
        # numpy pytree -> one device_put with the mesh shardings (no
        # intermediate default-device copy)
        batch = from_arrays(arrays)
        return mh.form_global_batch(self.ctx.mesh, batch, self.proc_count)

    def _produce_batch(self):
        """One (device batch, post-sample host snapshot) pair — the unit the
        prefetch queue carries so train_step can associate each consumed
        batch with the RNG state that checkpoints must persist."""
        arrays, snapshot = self._sample_arrays_with_state()
        return self.build_batch(arrays), snapshot

    def _next_batch(self):
        depth = getattr(self.args, "prefetch_batches", 2)
        if depth <= 0:
            return self._produce_batch()
        if self._prefetcher is None:
            from neko_tpu.data.pipeline import HostPrefetcher

            self._prefetcher = HostPrefetcher(
                self._produce_batch,
                depth=depth,
                workers=getattr(self.args, "prefetch_workers", 1),
            )
        return self._prefetcher.get()

    def train_step(self):
        logs: Dict = {}
        # the cosine schedule advances per OPTIMIZER step: under gradient
        # accumulation optax.MultiSteps applies the inner update every k-th
        # micro step, so log the LR the update actually uses
        accum = max(1, self.args.gradient_accumulation_steps)
        logs["training/learning_rate"] = self.ctx.current_lr(
            max(0, self.steps - 1) // accum
        )
        t0 = time.time()
        batch, pending_snapshot = self._next_batch()
        # with prefetch this is pure queue wait: ~0 when the host pipeline
        # keeps up, ~(host_pipeline - device_step) when it doesn't
        logs["time/sample_batch"] = time.time() - t0
        if self._prefetcher is not None:
            logs["time/host_pipeline"] = self._prefetcher.last_produce_time
        self._maybe_profile()
        self.state, loss = self.ctx.train_step(self.state, batch)
        # commit only after the step is dispatched: an interrupt mid-step
        # leaves the snapshot at the previous batch, so resume replays the
        # batch whose update never happened
        self._host_snapshot = pending_snapshot
        return loss, logs

    def _maybe_profile(self):
        """Trace steps [2, 2+profile_steps) when --profile_dir is set
        (TPU-native replacement for the reference's wall-clock-only
        observability, SURVEY.md §5.1)."""
        pdir = getattr(self.args, "profile_dir", None)
        if not pdir:
            return
        import jax

        if self.steps == 2:
            jax.profiler.start_trace(pdir)
            self._profiling = True
        elif getattr(self, "_profiling", False) and self.steps == 2 + getattr(
            self.args, "profile_steps", 3
        ):
            jax.profiler.stop_trace()
            self._profiling = False
            print(f"[neko-tpu] profiler trace written to {pdir}")

    def sample_control_batch(self, batch_size: int) -> List[Dict]:
        """Reference trainer.py:211-247."""
        tasks = self.control_tasks
        n_tasks = len(tasks)
        if n_tasks == 0:
            raise ValueError("control batch requested but no control tasks")

        sampled: List[int] = []
        while len(sampled) < batch_size:
            take = min(n_tasks, batch_size - len(sampled))
            sampled += list(self.rng.choice(n_tasks, size=take, replace=False))

        n_prompted = round(batch_size * self.args.prompt_ep_proportion)
        prompt_slots = list(self.rng.choice(batch_size, size=n_prompted, replace=False))
        end_slots = set(
            self.rng.choice(prompt_slots, size=round(len(prompt_slots) / 2), replace=False)
            if prompt_slots else []
        )
        uniform_slots = set(s for s in prompt_slots if s not in end_slots)

        out: List[Dict] = []
        for i, task in enumerate(tasks):
            vanilla = 0
            prompted: Dict[str, int] = {}
            for slot, task_idx in enumerate(sampled):
                if task_idx != i:
                    continue
                if slot in end_slots:
                    prompted["end"] = prompted.get("end", 0) + 1
                elif slot in uniform_slots:
                    prompted["uniform"] = prompted.get("uniform", 0) + 1
                else:
                    vanilla += 1
            if vanilla + sum(prompted.values()) > 0:
                out += task.sample_batch(
                    vanilla, prompted, max_tokens=self.args.sequence_length
                )
        return out

    # ---------------------------------------------------------- evaluation
    def evaluate(self) -> Dict:
        logs: Dict = {}
        # stage-local PP storage: the decode-loop Generator consumes the
        # canonical per-layer tree (identity off pipeline meshes)
        params = self.ctx.unstack_params(self.state.params)
        if self.proc_count > 1:
            # multi-host: the decode-loop eval runs per-host and cannot
            # consume pod-sharded params.  Form a DEVICE-side replica (one
            # XLA all-gather — a collective, ALL processes must reach this
            # line) and evaluate on the main process only; no process copies
            # params to host memory, and non-main processes drop their
            # transient buffers immediately (multihost.py::eval_replica).
            # The reference evaluates in-loop under DDP where every rank
            # already holds a host replica
            # (/root/reference/gato/training/trainer.py:83-103).
            from neko_tpu.parallel import multihost as mh

            params = mh.eval_replica(self.ctx.mesh, params)
            if not self.is_main_process:
                del params
                return logs
        # reuse one Generator so its jitted prefill/decode stay cached
        # (a fresh instance would recompile every evaluation); hold the
        # sampling lock: task RNGs / h5 handles are shared with the
        # prefetch thread
        if self._generator is None:
            self._generator = Generator(self.ctx.model, params, self.packer)
        self._generator.set_params(params)
        gen = self._generator
        self._sample_lock.acquire()
        try:
            return self._evaluate_locked(logs, gen)
        finally:
            self._sample_lock.release()

    def _evaluate_locked(self, logs: Dict, gen) -> Dict:
        for task in self.tasks:
            if isinstance(task, ControlTask):
                if self.args.eval_episodes > 0:
                    from neko_tpu.training.arguments import (
                        resolve_parallel_episodes,
                    )

                    m = task.evaluate(
                        gen,
                        n_iterations=self.args.eval_episodes,
                        deterministic=self.deterministic,
                        promptless_eval=self.args.promptless_eval,
                        parallel_episodes=resolve_parallel_episodes(
                            getattr(self.args, "eval_parallel_episodes", 0),
                            self.args.eval_episodes,
                        ),
                    )
                    for k, v in m.items():
                        logs[f"evaluation/{task.name}/{k}"] = v
            elif isinstance(task, TextTask):
                if self.args.eval_text_num_examples > 0:
                    m = task.evaluate(
                        gen,
                        num_examples_to_test=self.args.eval_text_num_examples,
                        deterministic=self.deterministic,
                        log_examples_to_output=self.args.eval_text_log_examples,
                    )
                    for k, v in m.items():
                        logs[f"evaluation/text/{k}"] = v
            elif getattr(task, "task_kind", "") == "caption":
                if self.args.eval_caption_num_examples > 0:
                    m = task.evaluate(
                        gen,
                        num_examples_to_test=self.args.eval_caption_num_examples,
                        deterministic=self.deterministic,
                        log_examples_to_output=self.args.eval_caption_log_examples,
                    )
                    for k, v in m.items():
                        logs[f"evaluation/caption/{k}"] = v
            elif getattr(task, "task_kind", "") == "vqa":
                if self.args.eval_vqa_num_examples > 0:
                    m = task.evaluate(
                        gen,
                        num_examples_to_test=self.args.eval_vqa_num_examples,
                        deterministic=self.deterministic,
                        log_examples_to_output=self.args.eval_vqa_log_examples,
                    )
                    for k, v in m.items():
                        logs[f"evaluation/VQA/{k}"] = v
        return logs

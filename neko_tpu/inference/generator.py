"""KV-cache autoregressive generation engine.

Replaces the reference's token loops which re-run the FULL transformer over
the whole context for every generated token with no cache
(gato_policy.py:434-470 predict_text, 556-614 predict_control, 477-544
predict_response).  Here: one jit-compiled prefill over the prompt, then one
jit-compiled single-token decode step per generated token — O(S) work per
token instead of O(S^2).

Semantics preserved:

* logits restricted to the modality's legal token range before
  argmax/sampling, with discrete control further restricted to the env's
  action count (gato_policy.py:570-576,589)
* predict_text/predict_control append generated tokens as plain embeddings —
  no inner positions (gato_policy.py:462-465) — while predict_response embeds
  them WITH continuing inner positions, matching the reference's per-token
  re-pack of the text stream (gato_policy.py:503-510)
* deterministic=argmax, stochastic=softmax sampling (gato_policy.py:453-458)
* continuous actions decoded via the uniform-bin inverse
  (gato_policy.py:608-613)
* when generation would overflow the context, the window slides: we re-prefill
  on the last S-1 embeddings (reference trims to `[-context_len:]` each step,
  gato_policy.py:466-467)
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neko_tpu.config import ModelConfig
from neko_tpu.data.batch import to_device_batch
from neko_tpu.data.packing import SequencePacker
from neko_tpu.models.policy import NekoModel
from neko_tpu.tokenizers.continuous import decode_mu_law_np, decode_np


def apply_logit_filters(window, *, temperature=1.0, top_k: int = 0,
                        top_p=1.0, use_top_p: Optional[bool] = None):
    """Serving-time logit warps: temperature -> top-k -> top-p (nucleus).

    Operates on the restricted logit window along the last axis and returns
    warped logits for SAMPLING only; callers keep the unwarped window for
    returned logits / NLL evaluation.  The reference offers only
    argmax/multinomial (gato_policy.py:453-458); these are strict
    extensions, all off by default (temperature=1.0, top_k=0, top_p=1.0
    reproduce the reference's multinomial exactly).

    `temperature` and `top_p` may be TRACED scalars (the decode scan passes
    them as operands so a long-lived server never recompiles over
    client-supplied values); `top_k` is static (it shapes lax.top_k), and
    `use_top_p` is the static on/off switch for the nucleus sort — required
    when `top_p` is traced, inferred (`top_p < 1.0`) when it is a float.

    top-p keeps the minimal descending-probability prefix whose cumulative
    mass reaches `top_p` (the most likely token is always kept); ties at the
    cut keep every tied logit.
    """
    if isinstance(temperature, (int, float)):
        if temperature != 1.0:
            window = window / temperature
    else:
        window = window / temperature
    W = window.shape[-1]
    if top_k and top_k < W:
        kth = jax.lax.top_k(window, top_k)[0][..., -1:]
        window = jnp.where(window < kth, -jnp.inf, window)
    if use_top_p is None:
        assert isinstance(top_p, (int, float)), (
            "use_top_p must be passed explicitly when top_p is traced"
        )
        use_top_p = top_p < 1.0
    if use_top_p:
        desc = jnp.flip(jnp.sort(window, axis=-1), axis=-1)
        probs = jax.nn.softmax(desc, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < top_p  # prefix BEFORE this token < p => keep
        thresh = jnp.min(
            jnp.where(keep, desc, jnp.inf), axis=-1, keepdims=True
        )
        window = jnp.where(window < thresh, -jnp.inf, window)
    return window


def _check_sampling_args(temperature, top_k, top_p):
    assert temperature > 0.0, f"temperature must be > 0, got {temperature}"
    assert top_k >= 0, f"top_k must be >= 0 (0 = off), got {top_k}"
    assert 0.0 < top_p <= 1.0, f"top_p must be in (0, 1], got {top_p}"


def _resolve_sampling(defaults, temperature, top_k, top_p):
    """Per-call knobs (None = inherit the Generator-level defaults)."""
    t = defaults[0] if temperature is None else temperature
    k = defaults[1] if top_k is None else top_k
    p = defaults[2] if top_p is None else top_p
    _check_sampling_args(t, k, p)
    return float(t), int(k), float(p)


class Generator:
    def __init__(
        self,
        model: NekoModel,
        params,
        packer: Optional[SequencePacker] = None,
        seed: int = 0,
        cast_params: bool = True,
        mesh=None,
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        weight_dtype: Optional[str] = None,
    ):
        """`temperature`/`top_k`/`top_p`: default sampling knobs for every
        generation call on this instance (stochastic mode only; see
        apply_logit_filters).  Per-call arguments override them.

        `weight_dtype`: None/'bf16' serves the plain activation-dtype cast;
        'fp8' (alias 'fp8_e4m3') additionally stores the large matmul
        kernels as float8_e4m3fn with per-output-channel scales and
        dequantizes them at the point of use INSIDE the decode loop —
        halving the weight bytes the bandwidth-bound decode step streams
        (inference/quant.py has the full design rationale).  Dots stay in
        the activation dtype; the KV cache is unaffected (compose with
        `kv_cache_dtype='int8'` for quantized caches too).

        `mesh`: optional jax.sharding.Mesh for TENSOR-PARALLEL serving.
        Params are placed by the training pspecs (parallel/sharding.py —
        heads/MLP hidden/vocab on 'model'); the KV cache and every
        activation inherit their sharding through XLA's SPMD propagation,
        so one Generator serves a model larger than one chip's HBM.  The
        reference has no distributed inference at all (its eval runs the
        whole model per rank).  Jitted fns trace inside `with mesh:` so
        the Pallas prefill kernels see the active mesh and shard_map
        themselves (ops/attention.py:176-205)."""
        self.model = model
        self.cfg = model.cfg
        self._cast = cast_params
        if weight_dtype not in (None, "bf16", "fp8", "fp8_e4m3"):
            raise ValueError(
                f"weight_dtype must be None/'bf16'/'fp8', got {weight_dtype!r}"
            )
        self._wq = weight_dtype in ("fp8", "fp8_e4m3")
        self.mesh = mesh
        _check_sampling_args(temperature, top_k, top_p)
        self._default_sampling = (temperature, top_k, top_p)
        self.packer = packer or SequencePacker(model.cfg)
        self.set_params(params)
        # persistent sampling stream: callers that pass rng=None still get
        # fresh draws on every call (a fixed default key would make
        # 'stochastic' evaluation deterministic across calls)
        self._rng = jax.random.key(seed)

        jit = self._jit
        self._embed_batch = jit(self._embed_batch_impl)
        self._prefill = jit(self._prefill_impl)
        self._decode = jit(self._decode_impl)
        self._embed_tokens = jit(self._embed_tokens_impl)
        self._embed_tokens_pos = jit(self._embed_tokens_pos_impl)
        # temperature/top_p are TRACED operands (no recompile across values);
        # top_k shapes lax.top_k and use_top_p gates the nucleus sort -> static
        _samp = ("top_k", "use_top_p")
        self._select = jit(
            self._select_impl,
            static_argnames=("start", "end", "deterministic") + _samp,
        )
        self._select_batch = jit(
            self._select_batch_impl,
            static_argnames=("start", "end", "deterministic") + _samp,
        )
        self._decode_scan = jit(
            self._decode_scan_impl,
            static_argnames=(
                "n_steps", "start", "end", "deterministic", "with_pos",
                "return_logits", "return_cache", "ring",
            ) + _samp,
        )
        self._rollout_step = jit(
            self._rollout_step_impl,
            static_argnames=(
                "obs_sep_tokens", "action_tokens", "clear_len", "buffer_len",
                "sel_start", "sel_end", "deterministic",
            ) + _samp,
            donate_argnames=("cache",),
        )
        self._beam_scan = jit(
            self._beam_scan_impl,
            static_argnames=(
                "n_steps", "start", "end", "num_beams", "with_pos",
                "return_logits",
            ),
        )
        self._spec_decode = jit(
            self._spec_decode_impl,
            static_argnames=(
                "n_steps", "start", "end", "K", "ngram", "deterministic",
            ) + _samp,
        )
        # draft-model speculative decoding: one jitted loop per draft
        # MODEL (the flax module is closure-bound; params stay traced)
        self._spec_draft_jits: Dict[int, object] = {}
        # continuous-batching engine: per-row det/temperature/top_p are
        # TRACED, so requests with any knob mix share one compiled chunk
        self._engine_chunk_j = jit(
            self._engine_chunk_impl,
            static_argnames=("n_steps", "start", "end", "use_top_p"),
            donate_argnames=("cache",),
        )
        self._engine_adopt_j = jit(
            self._engine_adopt_impl,
            donate_argnames=("cache", "last_logits", "pos"),
        )
        # speculative continuous batching: verify rounds over the slot
        # pool, per-row greedy/sampled knobs traced (engine_spec_chunk)
        self._engine_spec_chunk_j = jit(
            self._engine_spec_chunk_impl,
            static_argnames=("rounds", "start", "end", "K", "ngram",
                             "use_top_p"),
            donate_argnames=("cache", "hist"),
        )

    def _jit(self, fn, **kw):
        """jax.jit that traces (and runs) under the serving mesh, so the
        attention dispatch sees it as the active mesh and sharding
        propagates from the TP-placed params."""
        jitted = jax.jit(fn, **kw)
        if self.mesh is None:
            return jitted

        @functools.wraps(fn)
        def call(*a, **k):
            with self.mesh:
                return jitted(*a, **k)

        return call

    def set_params(self, params) -> None:
        """Install (freshly trained) weights, applying the inference cast."""
        params = self._maybe_cast(params) if self._cast else params
        if self._wq:
            from neko_tpu.inference import quant

            params = quant.quantize_weights(params)
        if self.mesh is not None:
            from neko_tpu.parallel import sharding as shd

            if self._wq:
                from neko_tpu.inference import quant

                shardings = quant.quant_shardings(self.mesh, params)
            else:
                shardings = shd.param_shardings(self.mesh, params)
            params = jax.device_put(params, shardings)
        self.params = params

    def _dq(self, params):
        """Dequantize fp8 weight leaves to the activation dtype at the point
        of use.  MUST be called inside scan/while bodies (not hoisted to fn
        entry) so the convert streams fp8 bytes per iteration — quant.py
        explains the LICM trap.  Identity when fp8 serving is off."""
        if not self._wq:
            return params
        from neko_tpu.inference import quant

        return quant.dequantize(params, self.cfg.activation_dtype)

    def _maybe_cast(self, params):
        """Inference-only weight cast to the activation dtype.

        Training keeps fp32 master weights; flax then casts them to bf16 on
        EVERY matmul, so a decode step re-reads the full fp32 tables from
        HBM.  Decode is HBM-bandwidth-bound — serving from a bf16 copy
        halves the weight traffic per generated token.  No-op when the
        config's activation dtype is fp32 (all parity tests)."""
        import jax.numpy as jnp

        dtype = self.cfg.activation_dtype
        if dtype == jnp.float32:
            return params
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            params,
        )

    # ------------------------------------------------------------ jit impls
    def _embed_batch_impl(self, params, batch):
        return self.model.apply(
            {"params": self._dq(params)}, batch, method=NekoModel.embed_batch
        )

    def _prefill_impl(self, params, emb, mask):
        logits, vars_ = self.model.apply(
            {"params": self._dq(params)}, emb, mask,
            method=NekoModel.prefill, mutable=["cache"],
        )
        return logits, vars_["cache"]

    def _decode_impl(self, params, cache, emb, index):
        logits, vars_ = self.model.apply(
            {"params": self._dq(params), "cache": cache}, emb, index,
            method=NekoModel.decode_step, mutable=["cache"],
        )
        return logits, vars_["cache"]

    def _embed_tokens_impl(self, params, tokens):
        return self.model.apply(
            {"params": self._dq(params)}, tokens,
            method=NekoModel.embed_tokens,
        )

    def _embed_tokens_pos_impl(self, params, tokens, pos):
        return self.model.apply(
            {"params": self._dq(params)}, tokens, pos,
            method=NekoModel.embed_tokens_with_pos,
        )

    def _select_impl(self, logits, key, *, start, end, deterministic,
                     temperature=1.0, top_k=0, top_p=1.0, use_top_p=False):
        """Restrict logits to [start, end] inclusive and pick a token id.
        Returns the UNWARPED window (eval consumers score raw logits)."""
        window = logits[start : end + 1]
        if deterministic:
            tok = jnp.argmax(window)
        else:
            warped = apply_logit_filters(
                window, temperature=temperature, top_k=top_k, top_p=top_p,
                use_top_p=use_top_p,
            )
            tok = jax.random.categorical(key, warped)
        return tok + start, window

    # ------------------------------------------------------------- helpers
    def _pack_prompt(self, example: Dict, drop_trailing: int = 0):
        """Pack one example right-padded; optionally drop trailing tokens
        (predict_control strips the zero-padded action slots,
        gato_policy.py:580-581)."""
        arrays = self.packer.pack_batch([example], pad_side="right")
        L = int(arrays.pop("lengths")[0]) - drop_trailing
        next_pos = int(arrays["inner_pos"][0, :max(L, 1)].max()) + 1
        batch = to_device_batch(arrays)
        emb = self._embed_batch(self.params, batch)
        return emb, L, next_pos

    def generate(
        self,
        example: Dict,
        *,
        max_new_tokens: int,
        start: int,
        end: int,
        deterministic: bool = True,
        drop_trailing: int = 0,
        rng: Optional[jax.Array] = None,
        prompt_emb: Optional[jnp.ndarray] = None,
        prompt_len: Optional[int] = None,
        inner_pos_continuation: bool = False,
        inner_pos_start: Optional[int] = None,
        exact_window: bool = False,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        step_limits: Optional[Sequence[int]] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Generate tokens restricted to [start, end].

        `step_limits`: optional per-STEP sub-range widths (len ==
        max_new_tokens): step i may only select [start, start+limits[i]-1]
        — MultiDiscrete action decoding, where each action token has its
        own component range.

        Returns (token_ids [n], window_logits [n, end-start+1]).  Either pass
        `example` (packed here) or a precomputed (prompt_emb, prompt_len).
        inner_pos_continuation=True embeds generated tokens WITH continuing
        inner-timestep positions (predict_response semantics); False appends
        raw embeddings (predict_text/predict_control semantics).

        When generation overflows the context the default path is the ring
        decode (see generate_batch); exact_window=True instead re-prefills
        the trimmed window per token — bit-exact reference sliding-window
        semantics (gato_policy.py:466-467), O(S^2) per overflowing token.
        """
        temperature, top_k, top_p = _resolve_sampling(
            self._default_sampling, temperature, top_k, top_p
        )
        S = self.cfg.context_len
        next_pos = 0
        if prompt_emb is None:
            emb, L, next_pos = self._pack_prompt(example, drop_trailing)
            if L + max_new_tokens <= S or not exact_window:
                # common case: one prefill + ONE compiled decode scan (per-
                # token host dispatch costs ~100 ms through a tunneled TPU)
                toks, windows = self.generate_batch(
                    [example],
                    max_new_tokens=max_new_tokens,
                    start=start,
                    end=end,
                    deterministic=deterministic,
                    drop_trailing=drop_trailing,
                    rng=rng,
                    inner_pos_continuation=inner_pos_continuation,
                    inner_pos_start=inner_pos_start,
                    temperature=temperature, top_k=top_k, top_p=top_p,
                    step_limits=step_limits,
                )
                return toks[0], windows[0]
        else:
            emb, L = prompt_emb, int(prompt_len)
        if inner_pos_start is not None:
            next_pos = inner_pos_start
            inner_pos_continuation = True
        assert step_limits is None, (
            "step_limits is not supported on the exact-window overflow "
            "path (control prompts always fit the context)"
        )
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)

        mask = np.zeros((1, S), bool)
        mask[0, :L] = True
        logits, cache = self._prefill(self.params, emb, jnp.asarray(mask))
        last_logits = logits[0, L - 1]

        out_tokens: List[int] = []
        out_logits: List[np.ndarray] = []
        pos = L
        for i in range(max_new_tokens):
            rng, key = jax.random.split(rng)
            tok, window = self._select(
                last_logits, key, start=start, end=end,
                deterministic=deterministic,
                temperature=temperature, top_k=top_k, top_p=top_p,
                use_top_p=top_p < 1.0,
            )
            out_tokens.append(int(tok))
            out_logits.append(np.asarray(window))
            if i == max_new_tokens - 1:
                break
            if inner_pos_continuation:
                tok_emb = self._embed_tokens_pos(
                    self.params,
                    jnp.asarray([[out_tokens[-1]]], jnp.int32),
                    jnp.asarray([[next_pos + i]], jnp.int32),
                )
            else:
                tok_emb = self._embed_tokens(
                    self.params, jnp.asarray([[out_tokens[-1]]], jnp.int32)
                )
            if pos >= S:
                # slide the window: re-prefill on the last S-1 embeddings
                emb = jnp.concatenate([emb[:, 1:], tok_emb], axis=1)
                full = np.ones((1, S), bool)
                logits, cache = self._prefill(
                    self.params, emb, jnp.asarray(full)
                )
                last_logits = logits[0, -1]
                continue
            step_logits, cache = self._decode(
                self.params, cache, tok_emb, jnp.asarray([pos], jnp.int32)
            )
            # keep the embedding stream in sync for potential future slides
            emb = emb.at[:, pos].set(tok_emb[:, 0])
            last_logits = step_logits[0, 0]
            pos += 1

        return np.asarray(out_tokens, np.int64), np.stack(out_logits)

    # ------------------------------------------------------------- batched
    def generate_batch(
        self,
        examples: Sequence[Dict],
        *,
        max_new_tokens: int,
        start: int,
        end: int,
        deterministic: bool = True,
        drop_trailing: int = 0,
        rng: Optional[jax.Array] = None,
        inner_pos_continuation: bool = False,
        inner_pos_start: Optional[int] = None,
        targets: Optional[np.ndarray] = None,
        return_logits: bool = True,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        step_limits: Optional[Sequence[int]] = None,
    ):
        """Generate for a batch of prompts in lockstep (right-padded prompts,
        per-row decode positions).  Returns (tokens [N, T], window_logits
        [N, T, end-start+1]).  The reference evaluates text/caption/VQA one
        example at a time (text_task.py:80-102); batching the KV-cache decode
        amortizes per-step dispatch across the batch.

        All rows generate max_new_tokens; callers truncate per example.
        When a row would overflow the context the decode turns into a
        token-granular RING over the cache — the attended key set stays the
        reference's sliding `[-context_len:]` window, with
        TransformerXL-style reuse of cached hidden states (the old fallback
        re-prefilled the full context per overflowing token).
        """
        temperature, top_k, top_p = _resolve_sampling(
            self._default_sampling, temperature, top_k, top_p
        )
        S = self.cfg.context_len
        N = len(examples)
        arrays = self.packer.pack_batch(examples, pad_side="right")
        lengths = arrays.pop("lengths") - drop_trailing
        next_pos = arrays["inner_pos"].max(axis=1) + 1  # [N]
        if inner_pos_start is not None:
            # restart inner-timestep positions for the generated run —
            # observation imagination (Generator.imagine): generated obs
            # token i embeds with the SAME inner pos i it carries in a
            # packed training stream
            next_pos = np.full_like(next_pos, inner_pos_start)
            inner_pos_continuation = True
        ring = int(lengths.max()) + max_new_tokens > S
        batch = to_device_batch(arrays)
        emb = self._embed_batch(self.params, batch)
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)

        mask = np.zeros((N, S), bool)
        for i, L in enumerate(lengths):
            mask[i, :L] = True
        logits, cache = self._prefill(self.params, emb, jnp.asarray(mask))
        pos = jnp.asarray(lengths, jnp.int32)
        rows = jnp.arange(N)
        last_logits = logits[rows, pos - 1]  # [N, V]

        if step_limits is not None:
            assert len(step_limits) == max_new_tokens
        ys = self._decode_scan(
            self.params, cache, last_logits, pos,
            jnp.asarray(next_pos, jnp.int32), rng,
            None if targets is None else jnp.asarray(targets, jnp.int32),
            None if step_limits is None
            else jnp.asarray(step_limits, jnp.int32),
            n_steps=max_new_tokens, start=start, end=end,
            deterministic=deterministic, with_pos=inner_pos_continuation,
            return_logits=return_logits, ring=ring,
            temperature=temperature, top_k=top_k, top_p=top_p,
            use_top_p=top_p < 1.0,
        )
        out = [np.asarray(ys[0], np.int64)]
        for y in ys[1:]:
            out.append(np.asarray(y, np.float32))
        # (tokens[, window_logits][, per_token_nll])
        return tuple(out) if len(out) > 2 else (out[0], out[1]) if len(out) == 2 else (out[0],)

    def generate_beam(
        self,
        examples: Sequence[Dict],
        *,
        max_new_tokens: int,
        start: int,
        end: int,
        num_beams: int = 4,
        drop_trailing: int = 0,
        inner_pos_continuation: bool = False,
        return_logits: bool = False,
    ):
        """Batched beam search restricted to [start, end] — one compiled scan.

        A capability the reference lacks entirely (its generation is greedy
        or plain multinomial, gato_policy.py:453-458, one full re-forward per
        token).  Here the KV cache rides the beam: each step re-indexes every
        cache leaf (leading axis = N*num_beams rows) by the surviving beams'
        parent rows, so the whole search is O(num_beams) decode work per
        token with zero host round-trips.

        Returns (tokens [N, num_beams, T] int64, scores [N, num_beams] fp32
        cumulative log-probs, descending — beam 0 is the best), plus the raw
        window logits along each surviving beam [N, num_beams, T, W] when
        return_logits=True (caption/VQA CE eval consumes these).

        Sequences are fixed-length (the reference's eval contract: generate
        exactly max_length tokens, caption_task.py:139-147) — no EOS short-
        circuit, hence no length normalization is needed for ranking.
        Context overflow is not supported on the beam path (assert below);
        use generate_batch's ring decode for overflowing generation.
        """
        assert num_beams >= 1
        assert num_beams <= end - start + 1, (
            f"num_beams={num_beams} exceeds the {end - start + 1}-token "
            "window: step 0 has only one live beam, so wider beams would be "
            "filled with dead (-1e30) duplicates"
        )
        S = self.cfg.context_len
        N = len(examples)
        arrays = self.packer.pack_batch(examples, pad_side="right")
        lengths = arrays.pop("lengths") - drop_trailing
        next_pos = arrays["inner_pos"].max(axis=1) + 1
        assert int(lengths.max()) + max_new_tokens <= S, (
            "beam search does not support context overflow"
        )
        batch = to_device_batch(arrays)
        emb = self._embed_batch(self.params, batch)
        mask = np.zeros((N, S), bool)
        for i, L in enumerate(lengths):
            mask[i, :L] = True
        logits, cache = self._prefill(self.params, emb, jnp.asarray(mask))
        pos = jnp.asarray(lengths, jnp.int32)
        last = logits[jnp.arange(N), pos - 1]  # [N, V]

        # beam-expand every row N -> N*B, ordered [n0b0, n0b1, ..., n1b0, ..]
        def rep(a):
            return jnp.repeat(a, num_beams, axis=0)

        ys = self._beam_scan(
            self.params, jax.tree.map(rep, cache), rep(last), rep(pos),
            rep(jnp.asarray(next_pos, jnp.int32)),
            n_steps=max_new_tokens, start=start, end=end,
            num_beams=num_beams, with_pos=inner_pos_continuation,
            return_logits=return_logits,
        )
        tokens = np.asarray(ys[0], np.int64)
        scores = np.asarray(ys[1], np.float32)
        if return_logits:
            return tokens, scores, np.asarray(ys[2], np.float32)
        return tokens, scores

    def generate_spec(
        self,
        example: Dict,
        *,
        max_new_tokens: int,
        start: int,
        end: int,
        speculate_k: int = 4,
        lookup_ngram: int = 2,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
    ) -> Tuple[np.ndarray, int]:
        """LOSSLESS speculative decoding via prompt-lookup proposals.

        The serving decode step is bandwidth-bound on the KV-cache streams
        (PROFILE.md: the [B·H x (1,S)x(S,hd)] matvec caps at the per-stream
        rate on every path measured) — per-token cost cannot drop further.
        Speculation sidesteps the per-TOKEN wall: each round verifies
        1 + speculate_k candidate tokens in ONE chunked forward
        (extend_step), which streams the cache ONCE for the whole chunk.
        Proposals come from prompt-lookup (the most recent prior occurrence
        of the trailing `lookup_ngram` suggests the continuation — no draft
        model, Saxena 2023 'prompt lookup decoding').

        deterministic=True: every emitted token is verified equal to what
        greedy decoding would produce — output BIT-IDENTICAL to generate().
        deterministic=False: the point-mass rejection rule (Leviathan et
        al.) — accept proposal t with probability P(t) under the (warped)
        target distribution, on rejection sample from P with t masked out,
        renormalized — which preserves the target distribution EXACTLY
        (tests pin the marginals against plain sampling).  The sampling
        knobs (temperature/top_k/top_p) warp P before acceptance, like
        every other stochastic path.  Either way only the number of device
        rounds changes (`rounds`; tokens/round > 1 is the speedup on a
        bandwidth-bound decode).

        Text-prompt examples only (the lookup needs a token history).
        Pass one example dict -> (token_ids [max_new_tokens], rounds), or a
        SEQUENCE of dicts -> (token_ids [N, max_new_tokens], rounds): rows
        decode in lockstep rounds with per-row positions and per-row
        acceptance (a finished row parks, re-verifying its last chunk, until
        the slowest row completes — `rounds` counts device calls for all).
        """
        single = isinstance(example, dict)
        examples = [example] if single else list(example)
        assert all("images" not in ex for ex in examples), (
            "spec decode needs a token history"
        )
        S = self.cfg.context_len
        K = int(speculate_k)
        assert K >= 1 and lookup_ngram >= 1
        N = len(examples)
        arrays = self.packer.pack_batch(examples, pad_side="right")
        lengths = arrays.pop("lengths")
        assert int(lengths.max()) + max_new_tokens + K + 1 <= S, (
            "spec decode does not support context overflow"
        )
        batch = to_device_batch(arrays)
        emb = self._embed_batch(self.params, batch)
        mask = np.zeros((N, S), bool)
        for i, L in enumerate(lengths):
            mask[i, :L] = True
        logits, cache = self._prefill(self.params, emb, jnp.asarray(mask))
        hist = np.zeros((N, S + K + 1), np.int32)
        for i, L in enumerate(lengths):
            hist[i, :L] = np.asarray(arrays["tokens"][i][:L])
        pos = jnp.asarray(lengths, jnp.int32)
        last = logits[jnp.arange(N), pos - 1]
        temperature, top_k, top_p = _resolve_sampling(
            self._default_sampling, temperature, top_k, top_p
        )
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        toks, rounds = self._spec_decode(
            self.params, cache, last, jnp.asarray(hist), pos, rng,
            n_steps=max_new_tokens, start=start, end=end, K=K,
            ngram=int(lookup_ngram), deterministic=deterministic,
            temperature=temperature, top_k=top_k, top_p=top_p,
            use_top_p=top_p < 1.0,
        )
        toks = np.asarray(toks, np.int64)
        return (toks[0], int(rounds)) if single else (toks, int(rounds))

    @staticmethod
    def _lookup_proposals(hist, pos, *, K, ngram):
        """Prompt-lookup proposals, batched: per row, the K tokens that
        followed the most recent occurrence of the ngram-length suffix
        ending at `pos` in `hist` (falling back to repeating recent
        context when no match exists)."""
        N, Hlen = hist.shape
        rows = jnp.arange(N)
        idx = jnp.arange(Hlen)[None, :]                  # [1, Hlen]
        ok = idx < (pos - ngram)[:, None]
        match = jnp.ones((N, Hlen), bool)
        for j in range(ngram):
            tail = hist[rows, jnp.clip(pos - ngram + j, 0, Hlen - 1)]
            match = match & (
                jnp.roll(hist, -j, axis=1) == tail[:, None]
            )
        i_star = jnp.max(jnp.where(ok & match, idx, -1), axis=1)  # [N]
        base = jnp.where(i_star >= 0, i_star + ngram, pos - 1)
        cols = jnp.clip(base, 0, Hlen - K)[:, None] + jnp.arange(K)
        return hist[rows[:, None], cols]                 # [N, K]

    def _spec_decode_impl(
        self, params, cache, last_logits, hist, pos, key,
        *, n_steps, start, end, K, ngram, deterministic,
        temperature=1.0, top_k=0, top_p=1.0, use_top_p=False,
    ):
        """Device loop: one extend_step verifies a0 + K proposals per round,
        batched over rows with per-row positions and acceptance.

        Cache discipline (APPEND-mode extend): round r writes chunk k/v at
        [pos, pos+K]; only the accepted prefix is valid, but the NEXT
        round's writes at [pos', pos'+K] (pos' = pos + accepted + 1 <=
        pos+K+1) COVER the stale tail, and validity is the iota compare
        col <= pos'+i, so stale entries are never attended — no eviction
        scatter or chunk-causality mask needed (models/transformer.py
        'extend' branch, extend_clear=None).  Finished rows PARK:
        pos/emitted stop advancing and they keep re-verifying their final
        chunk in place."""
        S = self.cfg.context_len
        N, Hlen = hist.shape
        rows = jnp.arange(N)
        out = jnp.zeros((N, n_steps + K + 1), jnp.int32)
        kcol = jnp.arange(K + 1)[None, :]                    # [1, K+1]

        def lookup(hist, pos):
            return self._lookup_proposals(hist, pos, K=K, ngram=ngram)

        W = end - start + 1

        def warp(w):
            return apply_logit_filters(
                w, temperature=temperature, top_k=top_k, top_p=top_p,
                use_top_p=use_top_p,
            )

        def cond(carry):
            return jnp.any(carry[0] < n_steps)

        def body(carry):
            (emitted, cache, last_logits, hist, pos, out, rounds, key,
             reject) = carry
            # fp8 serving: dequantize in-body (once per round; see _dq)
            p = self._dq(params)
            done = emitted >= n_steps
            win0 = last_logits[:, start : end + 1]
            if deterministic:
                a0w = jnp.argmax(win0, axis=-1)
            else:
                # residual rule: the prior round's rejected proposal is
                # masked out of the (warped) target, renormalized by the
                # categorical itself
                w0 = warp(win0)
                has = reject >= 0
                oh = jax.nn.one_hot(
                    jnp.clip(reject, 0, W - 1), W, dtype=bool
                )
                w0 = jnp.where(has[:, None] & oh, -jnp.inf, w0)
                key, k0 = jax.random.split(key)
                a0w = jax.random.categorical(k0, w0, axis=-1)
            a0 = (a0w + start).astype(jnp.int32)             # [N]
            hist = hist.at[rows, pos].set(a0)
            props = lookup(hist, pos + 1)                    # [N, K]
            chunk = jnp.concatenate([a0[:, None], props], axis=1)  # [N, K+1]
            emb = self.model.apply(
                {"params": p}, chunk, method=NekoModel.embed_tokens
            )
            logits, vars_ = self.model.apply(
                {"params": p, "cache": cache},
                emb, pos,  # append mode: monotone writes cover stale tails
                method=NekoModel.extend_step, mutable=["cache"],
            )
            cache = vars_["cache"]
            win = logits[:, :, start : end + 1]              # [N, K+1, W]
            if deterministic:
                greedy = (
                    jnp.argmax(win, axis=-1) + start
                ).astype(jnp.int32)
                ok = props == greedy[:, :K]
            else:
                # accept proposal t with prob P(t) under the warped target
                # (point-mass draft => this preserves P exactly); proposals
                # outside the restricted window have P(t) = 0 by definition
                P = jax.nn.softmax(warp(win[:, :K]), axis=-1)  # [N, K, W]
                in_win = (props >= start) & (props <= end)
                pt = jnp.where(
                    in_win,
                    P[
                        rows[:, None], jnp.arange(K)[None, :],
                        jnp.clip(props - start, 0, W - 1),
                    ],
                    0.0,
                )
                key, ku = jax.random.split(key)
                u = jax.random.uniform(ku, (N, K))
                ok = u < pt
            m = jnp.argmin(jnp.concatenate(
                [ok.astype(jnp.int32), jnp.zeros((N, 1), jnp.int32)], axis=1
            ), axis=1)                                       # [N]
            # residual mask applies only to an IN-window rejected proposal:
            # a point mass outside P's support leaves (P - Q)+ = P unchanged
            rj = props[rows, jnp.clip(m, 0, K - 1)]
            reject = jnp.where(
                (m < K) & (rj >= start) & (rj <= end), rj - start, -1
            ).astype(jnp.int32)
            # scatter each row's chunk at its own output offset (clamped so
            # parked rows rewrite the scratch tail, never the real prefix)
            off = jnp.minimum(emitted, n_steps)[:, None] + kcol
            out = out.at[rows[:, None], off].set(chunk)
            hist = hist.at[rows[:, None], pos[:, None] + kcol].set(chunk)
            adv = jnp.where(done, 0, m + 1)
            return (
                emitted + adv, cache, logits[rows, m], hist,
                pos + adv, out, rounds + 1, key, reject,
            )

        init = (jnp.zeros(N, jnp.int32), cache, last_logits, hist, pos, out,
                jnp.int32(0), key, jnp.full(N, -1, jnp.int32))
        carry = jax.lax.while_loop(cond, body, init)
        return carry[5][:, :n_steps], carry[6]

    # ------------------------------------------- draft-model speculation
    def _get_spec_draft(self, draft_model):
        """One compiled loop per draft MODULE (closure-bound static); the
        draft's params stay a traced operand, so weight updates don't
        recompile."""
        key = id(draft_model)
        fn = self._spec_draft_jits.get(key)
        if fn is None:
            impl = functools.partial(
                self._spec_draft_impl, draft_model=draft_model
            )
            fn = self._jit(
                impl,
                static_argnames=(
                    "n_steps", "start", "end", "K", "deterministic",
                    "top_k", "use_top_p",
                ),
            )
            self._spec_draft_jits[key] = fn
        return fn

    def _spec_draft_impl(
        self, params, params_d, cache, cache_d, last_logits, pos, key,
        *, draft_model, n_steps, start, end, K, deterministic,
        temperature=1.0, top_k=0, top_p=1.0, use_top_p=False,
    ):
        """Device loop for DRAFT-MODEL speculative decoding (Leviathan et
        al. 2022): per round the draft autoregressively proposes K tokens
        (its own KV cache rides along), the target verifies a0 + K
        proposals in ONE extend_step, and acceptance/residual follow the
        exact rejection rule:

        * accept proposal t_i with prob min(1, p_i(t_i) / q_i(t_i))
          (implemented as u * q < p with u ~ U[0,1));
        * on the first rejection, the NEXT round's a0 samples from the
          normalized residual (p_m - q_m)+ — carried as the draft's full
          warped distribution at the rejected position (`q_rej`), since
          the target's p_m is already the carried last_logits;
        * all K accepted: a0 next round samples from p_{K+1} directly.

        This preserves the target distribution EXACTLY whatever the draft
        (greedy mode: every emitted token verified equal to target
        argmax).  Cache discipline: the TARGET verify extend runs in
        APPEND mode (see _spec_decode_impl — monotone writes cover stale
        tails).  The DRAFT keeps the RING extend with clear_len=K+1 for
        its a0-ingestion: its subsequent decode_steps read the cache MASK,
        which only the ring path maintains, and the clear wipes the stale
        proposal tail from the previous round."""
        from neko_tpu.inference import quant

        S = self.cfg.context_len
        N = last_logits.shape[0]
        rows = jnp.arange(N)
        W = end - start + 1
        out = jnp.zeros((N, n_steps + K + 1), jnp.int32)
        kcol = jnp.arange(K + 1)[None, :]
        d_dtype = draft_model.cfg.activation_dtype

        def warp(w):
            return apply_logit_filters(
                w, temperature=temperature, top_k=top_k, top_p=top_p,
                use_top_p=use_top_p,
            )

        def cond(carry):
            return jnp.any(carry[0] < n_steps)

        def body(carry):
            (emitted, cache, cache_d, last_logits, pos, out, rounds, key,
             has_rej, q_rej) = carry
            p_t = self._dq(params)
            # idempotent: dequantizes only if the draft serves fp8 weights
            p_d = quant.dequantize(params_d, d_dtype)
            done = emitted >= n_steps
            win0 = last_logits[:, start : end + 1]
            if deterministic:
                a0w = jnp.argmax(win0, axis=-1)
            else:
                p0 = jax.nn.softmax(warp(win0), axis=-1)
                resid = jnp.where(
                    has_rej[:, None], jnp.maximum(p0 - q_rej, 0.0), p0
                )
                # numerically-empty residual (p ~= q everywhere): fall
                # back to p0 — measure-zero event, keeps the categorical
                # well-defined
                rs = jnp.sum(resid, axis=-1, keepdims=True)
                resid = jnp.where(rs > 1e-9, resid, p0)
                key, k0 = jax.random.split(key)
                a0w = jax.random.categorical(k0, jnp.log(resid + 1e-30))
            a0 = (a0w + start).astype(jnp.int32)

            # ---- draft: ingest a0 (clearing the stale tail), propose K
            emb0 = draft_model.apply(
                {"params": p_d}, a0[:, None], method=NekoModel.embed_tokens
            )
            dlog, dvars = draft_model.apply(
                {"params": p_d, "cache": cache_d},
                emb0, pos, pos, K + 1, S,
                method=NekoModel.extend_step, mutable=["cache"],
            )
            cache_d = dvars["cache"]
            qlast = dlog[:, -1]
            props, qdists, qsel = [], [], []
            for i in range(K):
                qw = warp(qlast[:, start : end + 1])
                qprob = jax.nn.softmax(qw, axis=-1)
                if deterministic:
                    tw = jnp.argmax(qw, axis=-1)
                else:
                    key, ki = jax.random.split(key)
                    tw = jax.random.categorical(ki, qw, axis=-1)
                ti = (tw + start).astype(jnp.int32)
                props.append(ti)
                qdists.append(qprob)
                qsel.append(qprob[rows, tw])
                embi = draft_model.apply(
                    {"params": p_d}, ti[:, None],
                    method=NekoModel.embed_tokens,
                )
                dlog, dvars = draft_model.apply(
                    {"params": p_d, "cache": cache_d}, embi, pos + 1 + i,
                    method=NekoModel.decode_step, mutable=["cache"],
                )
                cache_d = dvars["cache"]
                qlast = dlog[:, 0]
            props = jnp.stack(props, axis=1)        # [N, K]
            qd = jnp.stack(qdists, axis=1)          # [N, K, W]
            qs = jnp.stack(qsel, axis=1)            # [N, K]

            # ---- target: verify the whole chunk in one extend
            chunk = jnp.concatenate([a0[:, None], props], axis=1)
            emb = self.model.apply(
                {"params": p_t}, chunk, method=NekoModel.embed_tokens
            )
            logits, vars_ = self.model.apply(
                {"params": p_t, "cache": cache},
                emb, pos,  # append mode: monotone writes cover stale tails
                method=NekoModel.extend_step, mutable=["cache"],
            )
            cache = vars_["cache"]
            win = logits[:, :, start : end + 1]     # [N, K+1, W]
            if deterministic:
                greedy = (
                    jnp.argmax(win, axis=-1) + start
                ).astype(jnp.int32)
                ok = props == greedy[:, :K]
            else:
                P = jax.nn.softmax(warp(win[:, :K]), axis=-1)
                pt = P[
                    rows[:, None], jnp.arange(K)[None, :], props - start
                ]
                key, ku = jax.random.split(key)
                u = jax.random.uniform(ku, (N, K))
                ok = u * qs < pt                    # u < p/q, q > 0
            m = jnp.argmin(jnp.concatenate(
                [ok.astype(jnp.int32), jnp.zeros((N, 1), jnp.int32)], axis=1
            ), axis=1)                              # [N]
            if deterministic:
                has_rej = jnp.zeros(N, bool)
                q_rej = jnp.zeros((N, W), jnp.float32)
            else:
                has_rej = m < K
                q_rej = jnp.where(
                    has_rej[:, None],
                    qd[rows, jnp.clip(m, 0, K - 1)], 0.0,
                )
            off = jnp.minimum(emitted, n_steps)[:, None] + kcol
            out = out.at[rows[:, None], off].set(chunk)
            adv = jnp.where(done, 0, m + 1)
            return (
                emitted + adv, cache, cache_d, logits[rows, m], pos + adv,
                out, rounds + 1, key, has_rej, q_rej,
            )

        init = (jnp.zeros(N, jnp.int32), cache, cache_d, last_logits, pos,
                out, jnp.int32(0), key, jnp.zeros(N, bool),
                jnp.zeros((N, W), jnp.float32))
        carry = jax.lax.while_loop(cond, body, init)
        return carry[5][:, :n_steps], carry[6]

    def truncated_draft(self, n_layers: int) -> "Generator":
        """Self-speculative draft: the target's FIRST n_layers blocks plus
        its own embeddings, final LN and head — zero extra weights, zero
        training (the early-exit analogue of the reference's `set_layers`
        truncation, trajectory_gpt2.py:552-556).  Pass the result to
        generate_spec_draft / NekoServer(draft_generator=...); acceptance
        depends on how predictive the early layers are, but losslessness
        never does.  Serve with `serve.py --self_draft_layers N`."""
        import dataclasses

        assert 1 <= n_layers < self.cfg.layers, (
            f"need 1 <= n_layers < {self.cfg.layers}, got {n_layers}"
        )
        tf = self.params["transformer"]

        def _keep(k: str) -> bool:
            return not k.startswith("h_") or int(k[2:]) < n_layers

        params_d = {
            **self.params,
            "transformer": {k: v for k, v in tf.items() if _keep(k)},
        }
        cfg_d = dataclasses.replace(self.cfg, layers=n_layers)
        return Generator(
            NekoModel(cfg_d), params_d, self.packer,
            cast_params=False,  # already serve-cast (and maybe quantized)
            weight_dtype="fp8" if self._wq else None,
            mesh=self.mesh,
        )

    def generate_spec_draft(
        self,
        example: Dict,
        draft: "Generator",
        *,
        max_new_tokens: int,
        start: int,
        end: int,
        speculate_k: int = 4,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
    ) -> Tuple[np.ndarray, int]:
        """LOSSLESS speculative decoding with a DRAFT MODEL (the classic
        Leviathan/Chen scheme; `generate_spec` is the draft-free
        prompt-lookup variant).  A small trained draft proposes K tokens
        per round from its own KV cache; the big target verifies all K+1
        in one bandwidth-bound extend_step.  Unlike prompt lookup, the
        draft proposes from a real distribution, so the sampled-mode
        acceptance is the full min(1, p/q) rule with the (p-q)+ residual
        — marginals still match plain sampling exactly; greedy output is
        bit-identical to plain greedy.  Works for any prompt modality
        (no token-history requirement).  Speedup = draft acceptance rate
        x (cheap draft step / expensive target step); the reference has
        no speculative decoding (or serving) at all.

        `draft` must share the target's token space and context length
        (its width/depth are free — that's the point)."""
        single = isinstance(example, dict)
        examples = [example] if single else list(example)
        dc, tc = draft.cfg, self.cfg
        assert (
            dc.text_tokens, dc.continuous_tokens, dc.discrete_tokens
        ) == (tc.text_tokens, tc.continuous_tokens, tc.discrete_tokens), (
            "draft and target must share the token space"
        )
        assert dc.context_len == tc.context_len, (
            "draft and target must share context_len (one packer feeds "
            "both caches)"
        )
        S = tc.context_len
        K = int(speculate_k)
        assert K >= 1
        N = len(examples)
        arrays = self.packer.pack_batch(examples, pad_side="right")
        lengths = arrays.pop("lengths")
        assert int(lengths.max()) + max_new_tokens + K + 1 <= S, (
            "spec decode does not support context overflow"
        )
        batch = to_device_batch(arrays)
        mask = np.zeros((N, S), bool)
        for i, L in enumerate(lengths):
            mask[i, :L] = True
        mask = jnp.asarray(mask)
        logits, cache = self._prefill(
            self.params, self._embed_batch(self.params, batch), mask
        )
        _, cache_d = draft._prefill(
            draft.params, draft._embed_batch(draft.params, batch), mask
        )
        pos = jnp.asarray(lengths, jnp.int32)
        last = logits[jnp.arange(N), pos - 1]
        temperature, top_k, top_p = _resolve_sampling(
            self._default_sampling, temperature, top_k, top_p
        )
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        toks, rounds = self._get_spec_draft(draft.model)(
            self.params, draft.params, cache, cache_d, last, pos, rng,
            n_steps=max_new_tokens, start=start, end=end, K=K,
            deterministic=deterministic,
            temperature=temperature, top_k=top_k, top_p=top_p,
            use_top_p=top_p < 1.0,
        )
        toks = np.asarray(toks, np.int64)
        return (toks[0], int(rounds)) if single else (toks, int(rounds))

    def _beam_scan_impl(
        self, params, cache, last_logits, pos, next_pos,
        *, n_steps, start, end, num_beams, with_pos, return_logits,
    ):
        """Device-side beam search body.  All inputs arrive beam-expanded
        ([N*B] leading rows); `pos`/`next_pos` advance in lockstep across an
        example's beams so only the cache/token/logit buffers need the
        per-step parent gather."""
        W = end - start + 1
        NB = last_logits.shape[0]
        B = num_beams
        N = NB // B
        # only beam 0 is live at step 0 (all beams hold identical prefills;
        # masking the rest prevents B duplicates of the same hypothesis)
        cum0 = jnp.tile(
            jnp.concatenate(
                [jnp.zeros((1,), jnp.float32),
                 jnp.full((B - 1,), jnp.float32(-1e30))]
            )[None],
            (N, 1),
        )
        tokbuf = jnp.zeros((NB, n_steps), jnp.int32)
        logbuf = (
            jnp.zeros((NB, n_steps, W), jnp.float32) if return_logits else None
        )

        def body(carry, i):
            cache, last_logits, cum, pos, next_pos, tokbuf, logbuf = carry
            # fp8 serving: dequantize in-body (once per step; see _dq)
            p = self._dq(params)
            window = last_logits[:, start : end + 1]          # [NB, W]
            logp = jax.nn.log_softmax(window, axis=-1)
            total = (cum.reshape(NB, 1) + logp).reshape(N, B * W)
            scores, idx = jax.lax.top_k(total, B)             # [N, B] desc
            parent = idx // W
            tokw = idx % W
            rowp = (jnp.arange(N)[:, None] * B + parent).reshape(-1)  # [NB]
            cache = jax.tree.map(lambda a: a[rowp], cache)
            tokbuf = tokbuf[rowp]
            tok = (tokw + start).astype(jnp.int32).reshape(-1)
            tokbuf = tokbuf.at[:, i].set(tok)
            if return_logits:
                logbuf = logbuf[rowp].at[:, i].set(window[rowp])
            if with_pos:
                emb = self.model.apply(
                    {"params": p}, tok[:, None], next_pos[:, None],
                    method=NekoModel.embed_tokens_with_pos,
                )
            else:
                emb = self.model.apply(
                    {"params": p}, tok[:, None],
                    method=NekoModel.embed_tokens,
                )
            logits, vars_ = self.model.apply(
                {"params": p, "cache": cache}, emb, pos,
                method=NekoModel.decode_step, mutable=["cache"],
            )
            new_carry = (
                vars_["cache"], logits[:, 0], scores, pos + 1, next_pos + 1,
                tokbuf, logbuf,
            )
            return new_carry, None

        carry = (cache, last_logits, cum0, pos, next_pos, tokbuf, logbuf)
        carry, _ = jax.lax.scan(body, carry, jnp.arange(n_steps))
        _, _, cum, _, _, tokbuf, logbuf = carry
        out = (tokbuf.reshape(N, B, n_steps), cum)
        if return_logits:
            out = out + (logbuf.reshape(N, B, n_steps, W),)
        return out

    def _decode_scan_impl(
        self, params, cache, last_logits, pos, next_pos, key, targets,
        limits=None,
        *, n_steps, start, end, deterministic, with_pos, return_logits,
        return_cache=False, ring=False,
        temperature=1.0, top_k=0, top_p=1.0, use_top_p=False,
    ):
        """Fully-device decode loop: one compiled scan generates n_steps
        tokens without any host round-trip (per-token host syncs through the
        dispatch path measured ~100 ms each on a tunneled TPU).

        Outputs per step: the sampled token, plus either the restricted
        window logits (return_logits=True — a [N, T, W] fp32 fetch that can
        dominate wall time over slow links) or, when `targets` [N, T] is
        given, the per-position CE of the target under the restricted window
        — computed on device so only [N, T] floats ever leave the chip.

        ring=True writes each new token at pos % context_len, overwriting
        (= evicting) the OLDEST cached token once the window is full: the
        attended key set equals the reference's sliding `[-context_len:]`
        window (gato_policy.py:466-467) at every step, while cached tokens
        keep the hidden states they were computed with (TransformerXL-style
        memory — see RolloutSession).  This replaces the old overflow
        fallback of one full re-prefill per generated token."""

        def body(carry, x):
            cache, last_logits, pos, next_pos, key = carry
            tgt = x.get("t") if x else None
            lim = x.get("l") if x else None
            # fp8 serving: dequantize in-body (once per token; see _dq)
            p = self._dq(params)
            key, sub = jax.random.split(key)
            window = last_logits[:, start : end + 1]
            if lim is not None:
                # per-STEP legal sub-range (MultiDiscrete actions: token i
                # of a timestep selects within its own component's nvec[i])
                cols = jnp.arange(window.shape[-1])
                window = jnp.where(cols[None, :] < lim, window, -jnp.inf)
            if deterministic:
                tok = jnp.argmax(window, axis=-1)
            else:
                warped = apply_logit_filters(
                    window, temperature=temperature, top_k=top_k, top_p=top_p,
                    use_top_p=use_top_p,
                )
                tok = jax.random.categorical(sub, warped, axis=-1)
            tok = (tok + start).astype(jnp.int32)
            ys = [tok]
            if return_logits:
                ys.append(window)
            if tgt is not None:
                logz = jax.nn.logsumexp(window, axis=-1)
                tl = jnp.take_along_axis(window, tgt[:, None], axis=-1)[:, 0]
                ys.append(logz - tl)
            if with_pos:
                emb = self.model.apply(
                    {"params": p}, tok[:, None], next_pos[:, None],
                    method=NekoModel.embed_tokens_with_pos,
                )
            else:
                emb = self.model.apply(
                    {"params": p}, tok[:, None],
                    method=NekoModel.embed_tokens,
                )
            write_pos = pos % self.cfg.context_len if ring else pos
            logits, vars_ = self.model.apply(
                {"params": p, "cache": cache}, emb, write_pos,
                method=NekoModel.decode_step, mutable=["cache"],
            )
            new_carry = (
                vars_["cache"], logits[:, 0], pos + 1, next_pos + 1, key
            )
            return new_carry, tuple(ys)

        xs = {}
        if targets is not None:
            xs["t"] = jnp.swapaxes(targets, 0, 1)
        if limits is not None:
            xs["l"] = jnp.asarray(limits, jnp.int32)  # [n_steps]
        xs = xs or None
        carry = (cache, last_logits, pos, next_pos, key)
        carry, ys = jax.lax.scan(body, carry, xs, length=n_steps)
        # scan stacks on the leading axis -> move N first
        out = tuple(jnp.swapaxes(y, 0, 1) for y in ys)
        if return_cache:
            # note: every selected token INCLUDING the last has been fed
            # through decode_step, so the returned cache holds all n_steps
            # generated tokens (the rollout session relies on this)
            return out + (carry[0],)
        return out

    def _rollout_step_impl(
        self, params, cache, small_batch, slot_start, key, limits=None,
        *, obs_sep_tokens, action_tokens, clear_len, buffer_len,
        sel_start, sel_end, deterministic,
        temperature=1.0, top_k=0, top_p=1.0, use_top_p=False,
    ):
        """ONE compiled device call per env step of a rollout (rollout
        cache): embed the new timestep's [obs | sep] tokens, ring-extend the
        KV cache (evicting the oldest timestep slot), and decode the action
        tokens — O(tokens_per_timestep * S) work instead of the O(S^2)
        re-prefill the re-pack path pays (reference re-tokenizes and re-runs
        the FULL context every env step, control_task.py:144-159 +
        gato_policy.py:586-605).

        Returns (action_token_ids [B, m], updated cache).  The decode scan
        writes every generated token's k/v — including the last — so the
        cache leaves this call holding the COMPLETE timestep slot."""
        # fp8 serving: dequantized here for the extend; the decode scan
        # below receives the still-quantized tree and dequantizes in-body
        p = self._dq(params)
        emb_ts = self.model.apply(
            {"params": p}, small_batch, method=NekoModel.embed_batch
        )  # [B, tpt, D]: [obs | sep | zero-action-slot]
        chunk = emb_ts[:, :obs_sep_tokens]
        logits, vars_ = self.model.apply(
            {"params": p, "cache": cache},
            chunk, slot_start, slot_start, clear_len, buffer_len,
            method=NekoModel.extend_step, mutable=["cache"],
        )
        cache = vars_["cache"]
        last_logits = logits[:, -1]  # the separator position
        pos0 = slot_start + obs_sep_tokens
        tokens, cache = self._decode_scan_impl(
            params, cache, last_logits, pos0, jnp.zeros_like(pos0), key, None,
            limits,
            n_steps=action_tokens, start=sel_start, end=sel_end,
            deterministic=deterministic, with_pos=False, return_logits=False,
            return_cache=True,
            temperature=temperature, top_k=top_k, top_p=top_p,
            use_top_p=use_top_p,
        )
        return tokens, cache

    # --------------------------------------- continuous-batching engine
    def _engine_chunk_impl(
        self, params, cache, last_logits, pos, key, det, temp, top_p,
        hist=None, reject=None,
        *, n_steps, start, end, use_top_p,
    ):
        """Decode `n_steps` tokens for ALL engine slots in one compiled
        scan, with PER-ROW sampling controls.

        Unlike _decode_scan_impl (whose knobs are shared scalars), `det`
        [N] bool, `temp` [N] and `top_p` [N] are traced per-row operands:
        greedy and sampled requests with arbitrary knob values share ONE
        compile variant (both candidate tokens are computed; jnp.where
        selects per row — the categorical costs nothing next to the
        matmuls).  Positions ring over the context per row (pos % S equals
        pos until a row overflows, after which the attended key set is the
        sliding [-S:] window — same argument as _decode_scan_impl
        ring=True).  Free slots decode garbage into their own rows
        (per-row cache masks isolate them; engine_admit overwrites the
        whole row), which keeps the batch shape static — the decode step
        is weight-stream-bound, so idle rows are nearly free (PROFILE.md:
        B=8→32 costs only +12%).

        `hist`/`reject` are present on a speculative engine state: the
        plain chunk writes its tokens into the prompt-lookup history and
        consumes a pending sampled-rejection residual on its first draw,
        so the adaptive engine (serving/continuous.py) can interleave
        plain chunks with spec rounds without distribution drift.
        """
        W = end - start + 1
        N = pos.shape[0]
        rows = jnp.arange(N)

        def body(carry, _):
            cache, last_logits, pos, key, hist, reject = carry
            # fp8 serving: dequantize in-body (once per token; see _dq)
            p = self._dq(params)
            key, sub = jax.random.split(key)
            window = last_logits[:, start : end + 1]
            greedy = jnp.argmax(window, axis=-1)
            warped = apply_logit_filters(
                window, temperature=temp[:, None], top_k=0,
                top_p=top_p[:, None], use_top_p=use_top_p,
            )
            if reject is not None:
                # residual of a sampled spec rejection: mask the rejected
                # token from this (first effective) draw, then clear
                has = reject >= 0
                oh = jax.nn.one_hot(
                    jnp.clip(reject, 0, W - 1), W, dtype=bool
                )
                warped = jnp.where(has[:, None] & oh, -jnp.inf, warped)
                reject = jnp.full_like(reject, -1)
            sampled = jax.random.categorical(sub, warped, axis=-1)
            tok = (jnp.where(det, greedy, sampled) + start).astype(jnp.int32)
            if hist is not None:
                # keep the prompt-lookup history current for later spec
                # rounds (scatter clamps at the tail for rung-over rows —
                # the mode policy never specs those)
                hist = hist.at[rows, pos].set(tok, mode="clip")
            emb = self.model.apply(
                {"params": p}, tok[:, None], method=NekoModel.embed_tokens
            )
            logits, vars_ = self.model.apply(
                {"params": p, "cache": cache}, emb,
                pos % self.cfg.context_len,
                method=NekoModel.decode_step, mutable=["cache"],
            )
            return (
                vars_["cache"], logits[:, 0], pos + 1, key, hist, reject
            ), tok

        carry, toks = jax.lax.scan(
            body, (cache, last_logits, pos, key, hist, reject), None,
            length=n_steps,
        )
        cache, last_logits, pos, _, hist, reject = carry
        return jnp.swapaxes(toks, 0, 1), cache, last_logits, pos, hist, reject

    def _engine_spec_chunk_impl(
        self, params, cache, last_logits, pos, hist, reject, key,
        det, temp, top_p,
        *, rounds, start, end, K, ngram, use_top_p,
    ):
        """Advance every engine slot by `rounds` prompt-lookup verify
        rounds in one compiled call — speculative decoding inside the
        continuous-batching engine, GREEDY AND SAMPLED per row.

        Each round is one append-mode extend_step verifying a0 + K
        lookup proposals per row (same cache discipline as
        _spec_decode_impl: monotone writes cover stale tails), so a round
        costs ~1.03x a 1-token decode step but advances each row by its
        accepted prefix 1..K+1 (PROFILE.md: 4.92 tokens/round on
        in-distribution text).  Rows whose next write window [pos, pos+K]
        would cross the context end PARK (advance 0, keep their
        pre-round state; their extend re-writes a clamped stale window
        that only ever belongs to them) — the engine's chunk-mode policy
        never issues a spec round while an active row could park
        (serving/continuous.py::_run_spec).

        Per-row sampling (VERDICT r4 #3b): `det`/`temp`/`top_p` are traced
        per-row operands exactly like _engine_chunk_impl's; sampled rows
        use the point-mass rejection rule (accept proposal t with prob
        P(t) under the row's warped target; on rejection the next a0 draw
        masks t out — the `reject` carry, window-relative, -1 = none),
        which preserves each row's target distribution exactly (same rule
        the TV-tested _spec_decode_impl applies with shared knobs).
        Per-row accepted counts and residual draws are per-row data, just
        like the temperature operands — nothing about them fails to
        batch.

        Returns (chunks [N, rounds, K+1] absolute ids, advs [N, rounds]
        accepted counts, cache, last_logits, pos, hist, reject) — the
        host keeps chunks[b, r, :advs[b, r]] per row.
        """
        S = self.cfg.context_len
        N, Hlen = hist.shape
        rows = jnp.arange(N)
        kcol = jnp.arange(K + 1)[None, :]                    # [1, K+1]
        W = end - start + 1

        def warp(w):
            # broadcast the per-row knobs across any [N, ..., W] rank
            extra = (1,) * (w.ndim - 1)
            return apply_logit_filters(
                w, temperature=temp.reshape(temp.shape + extra), top_k=0,
                top_p=top_p.reshape(top_p.shape + extra),
                use_top_p=use_top_p,
            )

        def body(carry, _):
            cache, last_logits, pos, hist, reject, key = carry
            # fp8 serving: dequantize in-body (once per round; see _dq)
            p = self._dq(params)
            parked = pos + K + 1 > S
            wpos = jnp.minimum(pos, S - K - 1)
            win0 = last_logits[:, start : end + 1]
            g0 = jnp.argmax(win0, axis=-1)
            w0 = warp(win0)
            # residual rule: mask the prior round's rejected proposal
            has = reject >= 0
            oh = jax.nn.one_hot(jnp.clip(reject, 0, W - 1), W, dtype=bool)
            w0 = jnp.where(has[:, None] & oh, -jnp.inf, w0)
            key, k0 = jax.random.split(key)
            s0 = jax.random.categorical(k0, w0, axis=-1)
            a0 = (jnp.where(det, g0, s0) + start).astype(jnp.int32)
            hist2 = hist.at[rows, pos].set(a0)   # Hlen = S+K+1: in bounds
            props = self._lookup_proposals(hist2, pos + 1, K=K, ngram=ngram)
            chunk = jnp.concatenate([a0[:, None], props], axis=1)  # [N,K+1]
            emb = self.model.apply(
                {"params": p}, chunk, method=NekoModel.embed_tokens
            )
            logits, vars_ = self.model.apply(
                {"params": p, "cache": cache}, emb, wpos,
                method=NekoModel.extend_step, mutable=["cache"],
            )
            cache = vars_["cache"]
            win = logits[:, :, start : end + 1]              # [N, K+1, W]
            greedy = (jnp.argmax(win, axis=-1) + start).astype(jnp.int32)
            ok_g = props == greedy[:, :K]
            # sampled acceptance: accept t w.p. P(t) under the row's
            # warped target (point-mass draft preserves P exactly)
            P = jax.nn.softmax(warp(win[:, :K]), axis=-1)    # [N, K, W]
            in_win = (props >= start) & (props <= end)
            pt = jnp.where(
                in_win,
                P[rows[:, None], jnp.arange(K)[None, :],
                  jnp.clip(props - start, 0, W - 1)],
                0.0,
            )
            key, ku = jax.random.split(key)
            u = jax.random.uniform(ku, (N, K))
            ok = jnp.where(det[:, None], ok_g, u < pt)
            m = jnp.argmin(jnp.concatenate(
                [ok.astype(jnp.int32), jnp.zeros((N, 1), jnp.int32)],
                axis=1,
            ), axis=1)                                       # [N]
            adv = jnp.where(parked, 0, m + 1)
            # next-round residual only for a sampled, in-window rejection
            rj = props[rows, jnp.clip(m, 0, K - 1)]
            new_reject = jnp.where(
                (~det) & (m < K) & (rj >= start) & (rj <= end),
                rj - start, -1,
            ).astype(jnp.int32)
            reject = jnp.where(parked, reject, new_reject)
            hist2 = hist2.at[rows[:, None], pos[:, None] + kcol].set(chunk)
            hist = jnp.where(parked[:, None], hist, hist2)
            last_logits = jnp.where(
                parked[:, None], last_logits, logits[rows, m]
            )
            return (
                cache, last_logits, pos + adv, hist, reject, key
            ), (chunk, adv)

        carry, (chunks, advs) = jax.lax.scan(
            body, (cache, last_logits, pos, hist, reject, key), None,
            length=rounds,
        )
        cache, last_logits, pos, hist, reject, _ = carry
        # append-mode extend never maintains the cache 'mask' variable
        # (validity inside verify rounds is the iota compare); the ADAPTIVE
        # engine may run plain decode chunks next, and decode-mode validity
        # IS the mask — refresh it to the accepted prefix [0, pos).  Right-
        # padded prompts guarantee the prefix has no holes (engine_admit).
        valid = jnp.arange(S)[None, :] < jnp.minimum(pos, S)[:, None]

        def _refresh(path, leaf):
            last = path[-1]
            name = str(getattr(last, "key", getattr(last, "name", last)))
            return valid if name == "mask" else leaf

        cache = jax.tree_util.tree_map_with_path(_refresh, cache)
        return (
            jnp.swapaxes(chunks, 0, 1), jnp.swapaxes(advs, 0, 1),
            cache, last_logits, pos, hist, reject,
        )

    def _engine_adopt_impl(
        self, cache, last_logits, pos, cache1, last1, b, L
    ):
        """Scatter a freshly prefilled single-row cache into engine slot
        `b` (traced int32 — no recompile per slot)."""
        cache = jax.tree.map(lambda d, s: d.at[b].set(s[0]), cache, cache1)
        return cache, last_logits.at[b].set(last1), pos.at[b].set(L)

    def engine_init(self, slots: int, speculate_k: int = 0) -> Dict:
        """Allocate continuous-batching engine state: `slots` cache rows,
        all free.  The serving counterpart of the reference's... nothing —
        the reference has no server and re-runs full forwards per token
        (gato_policy.py:434-470).  See serving/continuous.py for the
        scheduler that drives this.

        speculate_k > 0 additionally allocates the per-row token history
        the speculative engine chunk's prompt lookup reads
        (engine_spec_chunk)."""
        arrays = self.packer.pack_batch(
            [{"text": [0]}] * slots, pad_side="right"
        )
        arrays.pop("lengths")
        batch = to_device_batch(arrays)
        emb = self._embed_batch(self.params, batch)
        mask = jnp.zeros((slots, self.cfg.context_len), bool)
        logits, cache = self._prefill(self.params, emb, mask)
        state = {
            "cache": cache,
            "last": jnp.zeros_like(logits[:, 0]),
            "pos": jnp.zeros((slots,), jnp.int32),
        }
        if speculate_k > 0:
            state["hist"] = jnp.zeros(
                (slots, self.cfg.context_len + speculate_k + 1), jnp.int32
            )
            # pending residual per row: window-relative id of a rejected
            # sampled proposal to mask from the next a0 draw (-1 = none)
            state["reject"] = jnp.full((slots,), -1, jnp.int32)
        return state

    def engine_admit(
        self, state: Dict, slot: int, example: Dict, drop_trailing: int = 0
    ) -> Dict:
        """Prefill one prompt and install it in engine slot `slot` while
        the other slots' caches ride along untouched."""
        arrays = self.packer.pack_batch([example], pad_side="right")
        L = int(arrays.pop("lengths")[0]) - drop_trailing
        batch = to_device_batch(arrays)
        emb = self._embed_batch(self.params, batch)
        mask = np.zeros((1, self.cfg.context_len), bool)
        mask[0, :L] = True
        logits, cache1 = self._prefill(self.params, emb, jnp.asarray(mask))
        cache, last, pos = self._engine_adopt_j(
            state["cache"], state["last"], state["pos"],
            cache1, logits[0, L - 1],
            jnp.asarray(slot, jnp.int32), jnp.asarray(L, jnp.int32),
        )
        out = {"cache": cache, "last": last, "pos": pos}
        if "hist" in state:
            hrow = np.zeros(state["hist"].shape[1], np.int32)
            hrow[:L] = np.asarray(arrays["tokens"][0][:L])
            out["hist"] = state["hist"].at[slot].set(jnp.asarray(hrow))
            out["reject"] = state["reject"].at[slot].set(-1)
        return out

    def engine_chunk(
        self, state: Dict, *, n_steps: int, start: int, end: int,
        det, temp, top_p, rng: Optional[jax.Array] = None,
    ):
        """Advance every slot by `n_steps` tokens; returns (tokens [N,
        n_steps] np.int64 ABSOLUTE ids, new state).  det/temp/top_p are
        length-N per-row arrays (free slots: True/1.0/1.0).

        On a speculative engine state (engine_init speculate_k > 0) the
        plain chunk keeps the prompt-lookup history current and consumes
        any pending sampled-rejection residual, so the adaptive engine can
        interleave plain chunks and spec rounds freely
        (serving/continuous.py mode policy)."""
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        use_top_p = bool(np.any(np.asarray(top_p, np.float32) < 1.0))
        toks, cache, last, pos, hist, reject = self._engine_chunk_j(
            self.params, state["cache"], state["last"], state["pos"], rng,
            jnp.asarray(det, bool), jnp.asarray(temp, jnp.float32),
            jnp.asarray(top_p, jnp.float32),
            state.get("hist"), state.get("reject"),
            n_steps=int(n_steps), start=int(start), end=int(end),
            use_top_p=use_top_p,
        )
        out = {"cache": cache, "last": last, "pos": pos}
        if hist is not None:
            out["hist"], out["reject"] = hist, reject
        return np.asarray(toks, np.int64), out

    def engine_spec_chunk(
        self, state: Dict, *, rounds: int, start: int, end: int,
        K: int, ngram: int = 2, det=None, temp=None, top_p=None,
        rng: Optional[jax.Array] = None,
    ):
        """Advance every slot by `rounds` speculative verify rounds
        (engine_init must have been called with speculate_k=K), greedy or
        sampled PER ROW (det/temp/top_p length-N arrays; default all
        greedy).  Returns (chunks [N, rounds, K+1] np.int64 absolute ids,
        advs [N, rounds] accepted counts, new state); row b's round-r
        tokens are chunks[b, r, :advs[b, r]]."""
        n = state["pos"].shape[0]
        if det is None:
            det = np.ones(n, bool)
        if temp is None:
            temp = np.ones(n, np.float32)
        if top_p is None:
            top_p = np.ones(n, np.float32)
        if rng is None:
            self._rng, rng = jax.random.split(self._rng)
        use_top_p = bool(np.any(np.asarray(top_p, np.float32) < 1.0))
        (chunks, advs, cache, last, pos, hist,
         reject) = self._engine_spec_chunk_j(
            self.params, state["cache"], state["last"], state["pos"],
            state["hist"], state["reject"], rng,
            jnp.asarray(det, bool), jnp.asarray(temp, jnp.float32),
            jnp.asarray(top_p, jnp.float32),
            rounds=int(rounds), start=int(start), end=int(end),
            K=int(K), ngram=int(ngram), use_top_p=use_top_p,
        )
        return (
            np.asarray(chunks, np.int64),
            np.asarray(advs, np.int64),
            {"cache": cache, "last": last, "pos": pos, "hist": hist,
             "reject": reject},
        )

    def _select_batch_impl(self, logits, key, *, start, end, deterministic,
                           temperature=1.0, top_k=0, top_p=1.0,
                           use_top_p=False):
        window = logits[:, start : end + 1]
        if deterministic:
            tok = jnp.argmax(window, axis=-1)
        else:
            warped = apply_logit_filters(
                window, temperature=temperature, top_k=top_k, top_p=top_p,
                use_top_p=use_top_p,
            )
            tok = jax.random.categorical(key, warped, axis=-1)
        return (tok + start).astype(jnp.int32), window

    # ------------------------------------------------------ task-level API
    def predict_text(
        self,
        example: Dict,
        max_length: int = 20,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        num_beams: int = 1,
    ):
        """Greedy/sampled text continuation (reference predict_text).
        num_beams>1 switches to beam search (deterministic; the sampling
        knobs are ignored) and returns the best beam."""
        ts = self.cfg.token_space
        if num_beams > 1:
            tokens, _, logits = self.generate_beam(
                [example],
                max_new_tokens=max_length,
                start=ts.start("text"), end=ts.end("text"),
                num_beams=num_beams, return_logits=True,
            )
            return logits[0, 0], tokens[0, 0] - ts.start("text")
        # NOTE: the prompt keeps its trailing separator — the reference's
        # tokenize_input_dicts always appends one, so predict_text generates
        # the first token from the SEP position (gato_policy.py:343-345,439).
        tokens, logits = self.generate(
            example,
            max_new_tokens=max_length,
            start=ts.start("text"),
            end=ts.end("text"),
            deterministic=deterministic,
            rng=rng,
            temperature=temperature, top_k=top_k, top_p=top_p,
        )
        return logits, tokens - ts.start("text")

    def predict_control(
        self,
        example: Dict,
        *,
        action_kind: str,          # 'continuous' | 'discrete'
        action_tokens: int,
        num_actions: Optional[int] = None,  # |A| for discrete envs
        action_nvec: Optional[Sequence[int]] = None,  # MultiDiscrete ranges
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
    ):
        """Predict one action for the last (action-padded) timestep.

        `action_nvec` (MultiDiscrete/MultiBinary envs — beyond the
        reference, which supports Box and Discrete only,
        control_task.py:53-71 + its own wishlist misc/todo.md): one
        discrete token per component, token i restricted to its
        component's [0, nvec[i]) range via per-step logit limits.
        Returns an int for plain Discrete, an int array for
        MultiDiscrete, a float array for Box."""
        ts = self.cfg.token_space
        start = ts.start(action_kind)
        end = ts.end(action_kind)
        limits = None
        if action_kind == "discrete":
            if action_nvec is not None:
                assert len(action_nvec) == action_tokens
                assert max(action_nvec) <= ts.end("discrete") - start + 1
                end = start + int(max(action_nvec)) - 1
                limits = [int(n) for n in action_nvec]
            else:
                assert action_tokens == 1, (
                    "multi-token discrete actions need action_nvec"
                )
                assert num_actions is not None
                end = start + num_actions - 1
        tokens, _ = self.generate(
            example,
            max_new_tokens=action_tokens,
            start=start,
            end=end,
            deterministic=deterministic,
            drop_trailing=action_tokens,
            rng=rng,
            temperature=temperature, top_k=top_k, top_p=top_p,
            step_limits=limits,
        )
        if action_kind == "discrete":
            if action_nvec is not None:
                return np.asarray(tokens - start, np.int64)
            return int(tokens[0] - start)
        return decode_np(
            tokens.astype(np.int32),
            n_bins=ts.continuous_tokens,
            offset=ts.continuous_start,
        )

    def predict_response(
        self,
        image: np.ndarray,           # [1, H, W, 3] raw 0..255
        prompt_tokens: Sequence[int] = (),
        max_length: int = 128,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        num_beams: int = 1,
    ):
        """Text response conditioned on an image (reference predict_response,
        gato_policy.py:477-544): caption when prompt_tokens is empty, answer
        when it holds a question's BPE ids.  Returns (window_logits, ids).
        num_beams>1 switches to beam search and returns the best beam."""
        ts = self.cfg.token_space
        if num_beams > 1:
            tokens, _, logits = self.generate_beam(
                [{"images": np.asarray(image), "text": list(prompt_tokens)}],
                max_new_tokens=max_length,
                start=ts.start("text"), end=ts.end("text"),
                num_beams=num_beams, drop_trailing=1,
                inner_pos_continuation=True, return_logits=True,
            )
            return logits[0, 0], tokens[0, 0] - ts.start("text")
        tokens, logits = self.generate(
            {"images": np.asarray(image), "text": list(prompt_tokens)},
            max_new_tokens=max_length,
            start=ts.start("text"),
            end=ts.end("text"),
            deterministic=deterministic,
            drop_trailing=1,  # trailing SEP is causally invisible
            rng=rng,
            inner_pos_continuation=True,
            temperature=temperature, top_k=top_k, top_p=top_p,
        )
        return logits, tokens - ts.start("text")

    def predict_caption(self, image, max_length: int = 128, **kw):
        return self.predict_response(image, (), max_length, **kw)

    def predict_answer(self, image, question_tokens, max_length: int = 16, **kw):
        return self.predict_response(image, question_tokens, max_length, **kw)

    def imagine(
        self,
        example: Dict,
        actions: np.ndarray,
        *,
        obs_kind: str = "discrete",      # 'discrete' | 'continuous'
        obs_nvec: Optional[Sequence[int]] = None,
        context_timesteps: Optional[int] = None,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
    ) -> np.ndarray:
        """World-model rollout: predict observations for K future timesteps
        given their actions, feeding each prediction back as history.

        `example` is a control history {*_obs: [T, n], *_actions: [T, m]}
        whose model was trained with --observation_loss (the RoboCat
        recipe; PARITY.md "Observation-prediction loss") — without the
        flag observation tokens are never loss targets (reference
        gato_policy.py:301,312) and the predictions are noise.  `actions`
        holds the K future actions [K, m] (encoded values: ints for
        discrete components, floats for continuous).  Returns the decoded
        predicted observations [K, n] (component indices for discrete,
        floats for continuous).

        Each step generates the next timestep's n observation tokens
        (per-component ranges via `obs_nvec`, same -inf logit masking as
        MultiDiscrete action decode) with inner-timestep positions
        restarting at 0 (`inner_pos_start=0`) so each generated obs token
        embeds exactly as it would in a packed training stream, decodes
        them, appends (predicted obs, given action) to the history, and
        RE-PACKS — between steps the token stream carries the full
        train-time structure (positions, separators).
        """
        ts = self.cfg.token_space
        actions = np.asarray(actions)
        assert actions.ndim == 2, "actions must be [K, action_tokens]"
        K = actions.shape[0]
        obs_str = f"{obs_kind}_obs"
        assert obs_str in example, f"history lacks {obs_str}"
        action_str = (
            "discrete_actions" if "discrete_actions" in example
            else "continuous_actions"
        )
        obs_hist = np.asarray(example[obs_str])
        act_hist = np.asarray(example[action_str])
        n = obs_hist.shape[1]
        start, end = ts.start(obs_kind), ts.end(obs_kind)
        limits = None
        if obs_kind == "discrete" and obs_nvec is not None:
            assert len(obs_nvec) == n
            end = start + int(max(obs_nvec)) - 1
            limits = [int(v) for v in obs_nvec]
        # keep history + n generated tokens inside the context window
        tpt = n + 1 + act_hist.shape[1]
        max_ts = (self.cfg.context_len - n) // tpt
        assert max_ts >= 1, (
            f"one timestep ({tpt} tokens) + {n} generated obs tokens "
            f"exceed the context ({self.cfg.context_len})"
        )
        if context_timesteps is not None:
            assert context_timesteps >= 1
            max_ts = min(max_ts, context_timesteps)
        preds = []
        for k in range(K):
            obs_hist = obs_hist[-max_ts:]
            act_hist = act_hist[-max_ts:]
            step_rng = None
            if rng is not None:
                rng, step_rng = jax.random.split(rng)
            # generated obs tokens carry their train-time inner positions
            # (inner_pos_start=0); logits are never needed — don't fetch
            # an [1, n, W] fp32 buffer per step over the tunnel
            (toks,) = self.generate_batch(
                [{obs_str: obs_hist, action_str: act_hist}],
                max_new_tokens=n,
                start=start,
                end=end,
                deterministic=deterministic,
                rng=step_rng,
                inner_pos_start=0,
                return_logits=False,
                temperature=temperature, top_k=top_k, top_p=top_p,
                step_limits=limits,
            )
            toks = toks[0]
            if obs_kind == "discrete":
                obs_next = np.asarray(toks - start, obs_hist.dtype)
            else:
                # continuous obs are PACKED with mu-law companding
                # (data/packing.py mu_law=True); invert bin AND companding
                # so predictions are in value space and the fed-back
                # history re-encodes to the very tokens generated
                obs_next = decode_mu_law_np(
                    np.asarray(toks, np.int32),
                    mu=self.cfg.mu,
                    M=self.cfg.M,
                    n_bins=ts.continuous_tokens,
                    offset=ts.continuous_start,
                ).astype(obs_hist.dtype)
            preds.append(obs_next)
            obs_hist = np.concatenate([obs_hist, obs_next[None]], axis=0)
            act_hist = np.concatenate(
                [act_hist, actions[k][None].astype(act_hist.dtype)], axis=0
            )
        return np.stack(preds)

    def rollout_session(self, **kw) -> "RolloutSession":
        return RolloutSession(self, **kw)

    def predict_control_batch(
        self,
        examples: Sequence[Dict],
        *,
        action_kind: str,
        action_tokens: int,
        num_actions: Optional[int] = None,
        action_nvec: Optional[Sequence[int]] = None,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
    ):
        """predict_control for several env instances in lockstep.

        Returns a list of actions (ints for discrete, int arrays for
        MultiDiscrete via `action_nvec`, float arrays for continuous) —
        one per example."""
        ts = self.cfg.token_space
        start = ts.start(action_kind)
        end = ts.end(action_kind)
        limits = None
        if action_kind == "discrete":
            if action_nvec is not None:
                assert len(action_nvec) == action_tokens
                end = start + int(max(action_nvec)) - 1
                limits = [int(n) for n in action_nvec]
            else:
                assert action_tokens == 1 and num_actions is not None
                end = start + num_actions - 1
        tokens, _ = self.generate_batch(
            examples,
            max_new_tokens=action_tokens,
            start=start,
            end=end,
            deterministic=deterministic,
            drop_trailing=action_tokens,
            rng=rng,
            temperature=temperature, top_k=top_k, top_p=top_p,
            step_limits=limits,
        )
        if action_kind == "discrete":
            if action_nvec is not None:
                return [np.asarray(t - start, np.int64) for t in tokens]
            return [int(t[0] - start) for t in tokens]
        return [
            decode_np(
                t.astype(np.int32),
                n_bins=ts.continuous_tokens,
                offset=ts.continuous_start,
            )
            for t in tokens
        ]


class RolloutSession:
    """Persistent ring-KV-cache rollout state across env steps (the 'rollout
    cache', VERDICT.md round-2 item #5).

    The reference re-tokenizes and re-forwards the ENTIRE trimmed context for
    every env step (control_task.py:144-159 -> gato_policy.py:586-605); the
    repo's previous path improved the per-token loop but still re-packed and
    re-prefilled O(S^2) per step.  This session keeps the KV cache alive:
    each env step appends only the new timestep's [obs | sep] tokens with one
    ring `extend` and decodes the action tokens in the same compiled call —
    ONE device dispatch per env step, O(tokens_per_timestep * S) attention
    work.

    Window-slide semantics: the ring evicts the oldest timestep's cache slot,
    so the attended KEY SET equals the reference's trimmed window exactly.
    Cached tokens keep the hidden states they were computed with (their own
    full context at the time), i.e. TransformerXL-style inference memory —
    the upgrade the reference's own roadmap asks for (misc/todo.md:12
    "TransformerXL style memory during inference").  Until the first
    eviction the outputs are bit-identical to the re-pack path
    (tests/test_rollout_cache.py).
    """

    def __init__(
        self,
        generator: Generator,
        *,
        obs_str: Optional[str],  # None for Dict/Tuple obs (dict entries
        action_str: str,         # passed to step() directly)
        obs_tokens: int,
        action_tokens: int,
        action_kind: str,
        num_actions: Optional[int] = None,
        action_nvec: Optional[Sequence[int]] = None,
        context_timesteps: int,
        patches_per_timestep: int = 0,
    ):
        self.g = generator
        self.cfg = generator.cfg
        self.obs_str = obs_str
        self.action_str = action_str
        self.obs_tokens = obs_tokens
        self.action_tokens = action_tokens
        self.action_kind = action_kind
        self.num_actions = num_actions
        self.action_nvec = (
            None if action_nvec is None else [int(n) for n in action_nvec]
        )
        self.patches_per_timestep = patches_per_timestep
        self.tpt = obs_tokens + 1 + action_tokens
        self.L = context_timesteps * self.tpt
        assert self.L <= self.cfg.context_len, (
            f"ring buffer {self.L} exceeds cache length {self.cfg.context_len}"
        )
        ts = self.cfg.token_space
        self.sel_start = ts.start(action_kind)
        self.sel_end = ts.end(action_kind)
        if action_kind == "discrete":
            if self.action_nvec is not None:
                assert len(self.action_nvec) == action_tokens
                self.sel_end = self.sel_start + max(self.action_nvec) - 1
            else:
                assert action_tokens == 1 and num_actions is not None
                self.sel_end = self.sel_start + num_actions - 1
        self._act_dtype = (
            np.float32 if action_kind == "continuous" else np.int32
        )
        self.cache = None
        self.slot_start = None

    # ------------------------------------------------------------- episode
    def start(self, prompts: Sequence[Optional[Dict]]) -> None:
        """Begin episodes: prefill the cache with full-timestep prompts
        (real actions included), or start empty for promptless eval.  All
        rows must be prompted or all promptless."""
        B = len(prompts)
        S, D = self.cfg.context_len, self.cfg.embed_dim
        g = self.g
        if all(p is None for p in prompts):
            emb = jnp.zeros((B, S, D), self.cfg.activation_dtype)
            mask = jnp.zeros((B, S), bool)
            _, self.cache = g._prefill(g.params, emb, mask)
            lengths = np.zeros(B, np.int64)
        else:
            assert all(p is not None for p in prompts), (
                "mixed prompted/promptless rows are not supported"
            )
            arrays = g.packer.pack_batch(list(prompts), pad_side="right")
            lengths = arrays.pop("lengths")
            assert (lengths % self.tpt == 0).all(), (
                "prompts must be whole timesteps"
            )
            batch = to_device_batch(arrays)
            emb = g._embed_batch(g.params, batch)
            mask = np.zeros((B, S), bool)
            for i, L in enumerate(lengths):
                mask[i, :L] = True
            _, self.cache = g._prefill(g.params, emb, jnp.asarray(mask))
        self.slot_start = (lengths % self.L).astype(np.int32)

    # ---------------------------------------------------------------- step
    def step(
        self,
        observations: Sequence[np.ndarray],
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
    ) -> List:
        """One env step for every row.  `observations` holds one
        already-transformed SINGLE-TIMESTEP obs per row: an array with
        leading dim 1 (e.g. task._obs_array(raw_obs[None])), or a dict of
        packer modality entries for Dict/Tuple obs spaces
        (task._obs_entries).  Returns decoded actions (ints for discrete,
        float arrays for continuous)."""
        assert self.cache is not None, "call start() first"
        temperature, top_k, top_p = _resolve_sampling(
            self.g._default_sampling, temperature, top_k, top_p
        )
        B = len(observations)
        zeros_act = lambda: np.zeros(  # noqa: E731
            (1, self.action_tokens), self._act_dtype
        )
        examples = [
            {**obs, self.action_str: zeros_act()} if isinstance(obs, dict)
            else {self.obs_str: obs, self.action_str: zeros_act()}
            for obs in observations
        ]
        arrays = self.g.packer.pack_batch(
            examples,
            pad_side="right",
            seq_len=self.tpt,
            patch_budget=B * self.patches_per_timestep,
        )
        arrays.pop("lengths")
        small = to_device_batch(arrays)
        if rng is None:
            self.g._rng, rng = jax.random.split(self.g._rng)
        tokens, self.cache = self.g._rollout_step(
            self.g.params, self.cache, small,
            jnp.asarray(self.slot_start), rng,
            None if self.action_nvec is None
            else jnp.asarray(self.action_nvec, jnp.int32),
            obs_sep_tokens=self.obs_tokens + 1,
            action_tokens=self.action_tokens,
            clear_len=self.tpt,
            buffer_len=self.L,
            sel_start=self.sel_start,
            sel_end=self.sel_end,
            deterministic=deterministic,
            temperature=temperature, top_k=top_k, top_p=top_p,
            use_top_p=top_p < 1.0,
        )
        self.slot_start = (self.slot_start + self.tpt) % self.L
        tokens = np.asarray(tokens, np.int64)
        ts = self.cfg.token_space
        if self.action_kind == "discrete":
            if self.action_nvec is not None:
                return [
                    np.asarray(t - self.sel_start, np.int64) for t in tokens
                ]
            return [int(t[0] - self.sel_start) for t in tokens]
        return [
            decode_np(
                t.astype(np.int32),
                n_bins=ts.continuous_tokens,
                offset=ts.continuous_start,
            )
            for t in tokens
        ]

"""Continuous batching: requests join and leave a RUNNING decode loop.

The coalescing worker (server.py::_run_worker) batches requests that
arrive within one window and then runs them to completion — a request
that arrives mid-decode waits for the whole batch to finish, and requests
only share a device call when their sampling knobs match exactly.  This
module removes both limits the way production LLM servers do (vLLM-style
continuous batching, rebuilt TPU-style on static shapes):

* a fixed pool of `slots` cache rows decodes in lockstep, `chunk` tokens
  per compiled call (`Generator.engine_chunk`);
* a new request PREFILLS into any free slot between chunks and starts
  decoding on the next chunk (`Generator.engine_admit` scatters one
  prefilled row into the pool without touching the others);
* finished rows free their slot immediately; the other rows never stop;
* deterministic/temperature/top_p are per-ROW traced operands, so greedy
  and sampled requests with arbitrary knob values share one compile
  variant AND one device call (the coalescing path recompiles per top_k
  and groups per knob tuple);
* each row runs its exact requested length — no pow2 bucketing.

Why lockstep slots instead of dynamic batching: XLA requires static
shapes, and the decode step is weight-stream-bound, so idle rows are
nearly free (PROFILE.md: growing the decode batch 8->32 costs only +12%
wall time).  Greedy outputs are token-identical to `generate_batch`
(tests/test_continuous.py) — scheduling changes latency, not results.

The reference has no server and no cache: every generated token re-runs
the full context forward (gato_policy.py:434-470).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, List, Optional

import numpy as np


def _truncate_at_stop(ids: List[int], stop) -> List[int]:
    if not stop:
        return ids
    stops = set(int(s) for s in stop)
    for i, t in enumerate(ids):
        if t in stops:
            return ids[:i]
    return ids


class _Slot:
    __slots__ = ("req", "want", "ids", "det", "temp", "top_p", "co", "sent",
                 "prompt_len")

    def __init__(self, req, want, det, temp, top_p, prompt_len=0):
        self.req = req
        self.want = want
        self.ids: List[int] = []
        self.det = det
        self.temp = temp
        self.top_p = top_p
        self.co = 0    # max co-resident active slots observed
        self.sent = 0  # tokens already streamed (stream_q requests)
        self.prompt_len = prompt_len  # host shadow of the device pos base


class ContinuousEngine:
    """Owns the slot pool, the admission queue and the decode thread.

    Accepts the server's `_Pending` requests (payloads pre-validated by
    NekoServer.submit).  Eligibility is the server's concern: plain
    /v1/generate requests (no beams, no speculative, top_k == 0)."""

    def __init__(self, generator, *, slots: int = 8, chunk: int = 8,
                 seed: int = 0, speculate_k: int = 0, lookup_ngram: int = 2,
                 spec_threshold: int = 48):
        """speculate_k > 0 enables ADAPTIVE speculative decoding: per
        device call the engine picks between plain decode chunks
        (Generator.engine_chunk) and prompt-lookup verify rounds
        (engine_spec_chunk), whichever serves the CURRENT residents —
        spec rounds advance each row by its accepted 1..K+1 proposals
        (the steady-state 3.71x, PROFILE.md) but cost ~1.03x a plain
        step, which loses ~19% on short bursts (serving_spec_r4.json); so
        spec runs only while some active row still wants >=
        `spec_threshold` more tokens and no row is near the context end
        (VERDICT r4 #3a — a mixed workload never pays the short-burst
        regression).  Sampled rows participate in spec rounds with the
        per-row point-mass rejection rule (engine_spec_chunk; r4 #3b) —
        outputs preserve each row's target distribution exactly."""
        assert slots >= 1 and chunk >= 1
        self.gen = generator
        self.n_slots = slots
        self.chunk = chunk
        self.spec_k = int(speculate_k)
        self.ngram = int(lookup_ngram)
        self.spec_threshold = int(spec_threshold)
        # engine-owned sampling stream: the coalescing worker splits the
        # Generator's key concurrently — two threads must not share it
        import jax

        self._key = jax.random.key(seed)
        ts = generator.cfg.token_space
        self.start_id, self.end_id = ts.start("text"), ts.end("text")
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._state = None  # lazily engine_init'd on the decode thread
        self._slots: List[Optional[_Slot]] = [None] * slots
        # advisory counters (served via GET /metrics)
        self.stats = {"admitted": 0, "finished": 0, "chunks": 0,
                      "tokens_out": 0, "spec_chunks": 0, "plain_chunks": 0}

    def metrics(self) -> Dict:
        return {
            **self.stats,
            "slots": self.n_slots,
            "active": sum(s is not None for s in self._slots),
            "queued": self._q.qsize(),
            "chunk": self.chunk,
            "speculate_k": self.spec_k,
            "spec_threshold": self.spec_threshold,
        }

    # ------------------------------------------------------------ lifecycle
    def start(self) -> "ContinuousEngine":
        self._thread.start()
        return self

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=10)
        for r in self._drain() + [
            s.req for s in self._slots if s is not None
        ]:
            r.error, r.status = "server closing", 503
            if r.stream_q is not None:
                r.stream_q.put(("error", r.error))
            r.event.set()
        self._slots = [None] * self.n_slots

    def _drain(self):
        out = []
        while True:
            try:
                out.append(self._q.get_nowait())
            except queue.Empty:
                return out

    # -------------------------------------------------------------- intake
    def submit(self, req) -> None:
        self._q.put(req)

    # --------------------------------------------------------------- loop
    def _want_spec(self, active: List[int]) -> bool:
        """Chunk-mode policy (VERDICT r4 #3a): run a verify-round call iff
        some active row still wants >= spec_threshold more tokens (spec
        pays on decode-loop-dominated rows; short bursts are
        admission-bound and lose ~19% to the costlier call) AND no active
        row's write window could cross the context end (such a row would
        PARK in a spec round — advance 0 — so plain chunks carry it)."""
        S = self.gen.cfg.context_len
        some_long = False
        for b in active:
            s = self._slots[b]
            produced = len(s.ids)
            if s.prompt_len + produced + self.spec_k + 1 > S:
                return False  # would park: plain chunks keep it moving
            if s.want - produced >= self.spec_threshold:
                some_long = True
        return some_long

    def _admit_waiting(self) -> None:
        while None in self._slots:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                return
            if req.cancelled:
                continue
            try:
                self._admit(req)
            except Exception as e:  # noqa: BLE001 — prefill fault
                self._fail(req, f"{type(e).__name__}: {e}")

    def _admit(self, req) -> None:
        from neko_tpu.serving.server import _example_from_payload, _opt

        b = self._slots.index(None)
        p = req.payload
        ex = _example_from_payload(p)
        want = _opt(p, "max_new_tokens", 16, int)
        prompt_len = 0
        if self.spec_k:
            # host shadow of the row's device pos: the mode policy keeps
            # spec rounds away from rows whose write window [pos, pos+K]
            # could cross the context end (they would park, advance 0) —
            # so requests of ANY length admit; oversized ones just decode
            # through plain chunks near the boundary
            prompt_len = self.gen.packer.pack_example(ex).length
        self._state = self.gen.engine_admit(self._state, b, ex)
        self._slots[b] = _Slot(
            req,
            want=want,
            det=bool(p.get("deterministic", True)),
            temp=_opt(p, "temperature", 1.0, float),
            top_p=_opt(p, "top_p", 1.0, float),
            prompt_len=prompt_len,
        )
        self.stats["admitted"] += 1

    def _finish(self, b: int, ids: List[int]) -> None:
        s = self._slots[b]
        s.req.result = {
            "tokens": ids,
            "batched_with": s.co,
            "continuous": True,
        }
        if s.req.stream_q is not None:
            s.req.stream_q.put(("done", s.req.result))
        s.req.event.set()
        self._slots[b] = None
        self.stats["finished"] += 1
        self.stats["tokens_out"] += len(ids)

    @staticmethod
    def _fail(req, msg: str) -> None:
        req.error, req.status = msg, 500
        if req.stream_q is not None:
            req.stream_q.put(("error", msg))
        req.event.set()

    def _loop(self) -> None:
        self._state = self.gen.engine_init(
            self.n_slots, speculate_k=self.spec_k
        )
        n = self.n_slots
        while not self._stop.is_set():
            self._admit_waiting()
            active = [b for b, s in enumerate(self._slots) if s is not None]
            if not active:
                # idle: block briefly on the queue instead of spinning
                try:
                    req = self._q.get(timeout=0.05)
                except queue.Empty:
                    continue
                if req.cancelled:
                    continue
                try:
                    self._admit(req)
                except Exception as e:  # noqa: BLE001
                    self._fail(req, f"{type(e).__name__}: {e}")
                continue

            det = np.ones(n, bool)
            temp = np.ones(n, np.float32)
            top_p = np.ones(n, np.float32)
            for b in active:
                s = self._slots[b]
                det[b], temp[b], top_p[b] = s.det, s.temp, s.top_p
                s.co = max(s.co, len(active) - 1)
            run_spec = self.spec_k > 0 and self._want_spec(active)
            try:
                import jax

                self._key, sub = jax.random.split(self._key)
                if run_spec:
                    chunks, advs, self._state = self.gen.engine_spec_chunk(
                        self._state, rounds=self.chunk,
                        start=self.start_id, end=self.end_id,
                        K=self.spec_k, ngram=self.ngram,
                        det=det, temp=temp, top_p=top_p, rng=sub,
                    )
                    self.stats["spec_chunks"] += 1
                else:
                    toks, self._state = self.gen.engine_chunk(
                        self._state, n_steps=self.chunk,
                        start=self.start_id, end=self.end_id,
                        det=det, temp=temp, top_p=top_p, rng=sub,
                    )
                    self.stats["plain_chunks"] += 1
                self.stats["chunks"] += 1
            except Exception as e:  # noqa: BLE001 — device fault: fail the
                # in-flight requests rather than hanging their handlers
                for b in active:
                    s = self._slots[b]
                    self._fail(s.req, f"{type(e).__name__}: {e}")
                    self._slots[b] = None
                continue
            for b in active:
                s = self._slots[b]
                if s.req.cancelled:  # handler timed out mid-flight
                    self._slots[b] = None
                    continue
                if run_spec:
                    for r in range(self.chunk):
                        a = int(advs[b, r])
                        s.ids.extend(
                            int(t) - self.start_id for t in chunks[b, r, :a]
                        )
                else:
                    s.ids.extend(int(t) - self.start_id for t in toks[b])
                ids = s.ids[: s.want]
                cut = _truncate_at_stop(ids, s.req.payload.get("stop"))
                done = len(cut) < len(ids) or len(ids) >= s.want
                if s.req.stream_q is not None and len(cut) > s.sent:
                    # stream only CONFIRMED tokens (the stop cut applies
                    # within the chunk that produced it — never retracts
                    # tokens streamed by earlier chunks)
                    s.req.stream_q.put(("tokens", cut[s.sent:]))
                    s.sent = len(cut)
                if done:
                    self._finish(b, cut)

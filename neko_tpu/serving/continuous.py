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
    __slots__ = ("req", "want", "ids", "det", "temp", "top_p", "co", "sent")

    def __init__(self, req, want, det, temp, top_p):
        self.req = req
        self.want = want
        self.ids: List[int] = []
        self.det = det
        self.temp = temp
        self.top_p = top_p
        self.co = 0    # max co-resident active slots observed
        self.sent = 0  # tokens already streamed (stream_q requests)


class ContinuousEngine:
    """Owns the slot pool, the admission queue and the decode thread.

    Accepts the server's `_Pending` requests (payloads pre-validated by
    NekoServer.submit).  Eligibility is the server's concern: plain
    /v1/generate requests (no beams, no speculative, top_k == 0)."""

    def __init__(self, generator, *, slots: int = 8, chunk: int = 8,
                 seed: int = 0, speculate_k: int = 0, lookup_ngram: int = 2):
        """speculate_k > 0 switches the decode loop to GREEDY speculative
        verify rounds (Generator.engine_spec_chunk): each device call runs
        `chunk` rounds, every round costing ~1 decode step but advancing
        each row by its accepted 1..K+1 prompt-lookup proposals — the
        steady-state 3.71x (PROFILE.md) applied to the serving path.  The
        server then routes only deterministic text requests here (sampled
        acceptance needs the per-row p/q residual chain; those coalesce)."""
        assert slots >= 1 and chunk >= 1
        self.gen = generator
        self.n_slots = slots
        self.chunk = chunk
        self.spec_k = int(speculate_k)
        self.ngram = int(lookup_ngram)
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
                      "tokens_out": 0}

    def metrics(self) -> Dict:
        return {
            **self.stats,
            "slots": self.n_slots,
            "active": sum(s is not None for s in self._slots),
            "queued": self._q.qsize(),
            "chunk": self.chunk,
            "speculate_k": self.spec_k,
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
        if self.spec_k:
            # a live row must reach `want` before its write window
            # [pos, pos+K] could cross the context end (parking is for
            # free/finished rows only — engine_spec_chunk docstring)
            L = self.gen.packer.pack_example(ex).length
            S = self.gen.cfg.context_len
            if L + want + self.spec_k + 1 > S:
                raise ValueError(
                    "speculative continuous batching needs prompt + "
                    f"max_new_tokens + K + 1 <= context ({L} + {want} + "
                    f"{self.spec_k} + 1 > {S})"
                )
        self._state = self.gen.engine_admit(self._state, b, ex)
        self._slots[b] = _Slot(
            req,
            want=want,
            det=bool(p.get("deterministic", True)),
            temp=_opt(p, "temperature", 1.0, float),
            top_p=_opt(p, "top_p", 1.0, float),
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
            try:
                import jax

                self._key, sub = jax.random.split(self._key)
                if self.spec_k:
                    chunks, advs, self._state = self.gen.engine_spec_chunk(
                        self._state, rounds=self.chunk,
                        start=self.start_id, end=self.end_id,
                        K=self.spec_k, ngram=self.ngram,
                    )
                else:
                    toks, self._state = self.gen.engine_chunk(
                        self._state, n_steps=self.chunk,
                        start=self.start_id, end=self.end_id,
                        det=det, temp=temp, top_p=top_p, rng=sub,
                    )
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
                if self.spec_k:
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

"""HTTP inference server over the KV-cache Generator.

The reference ships a `DockerServer` image but no serving code at all —
its only inference surface is eval.py's offline loop.  This module is the
missing piece: a dependency-free (stdlib http.server) JSON API with
MICRO-BATCHING — concurrent requests with compatible decode parameters are
coalesced into one `generate_batch` call, so the per-call dispatch and the
decode scan are amortized across clients exactly like the batched eval path
(inference/generator.py:generate_batch).

Endpoints:
  GET  /healthz       -> {"status": "ok", "model": {...}}
  POST /v1/generate   -> {"tokens": [...]} for {"text": [ids], "max_new_tokens": N,
                         "deterministic": bool, "temperature"/"top_k"/"top_p",
                         "num_beams"} (beam requests are served unbatched)
  POST /v1/action     -> {"action": ...} for {"continuous_obs"/"discrete_obs"/
                         "images": ..., "action_kind": "continuous"|"discrete",
                         "action_tokens": N[, "num_actions": M]}

Run it with `python serve.py --model_path <ckpt dir>` (repo root shim).
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np

from neko_tpu.inference.generator import _check_sampling_args


class _Pending:
    __slots__ = ("payload", "event", "result", "error", "key", "status",
                 "cancelled", "stream_q")

    def __init__(self, payload: Dict, key):
        self.payload = payload
        self.event = threading.Event()
        self.result = None
        self.error: Optional[str] = None
        self.status = 200
        self.cancelled = False
        self.key = key
        # streaming requests: ("tokens", [ids]) / ("done", result) /
        # ("error", msg) events, produced by the continuous engine
        self.stream_q: Optional[queue.Queue] = None


def _opt(payload: Dict, key: str, default, cast):
    """Explicit-None coercion: 0 is a VALUE (rejected downstream where
    invalid), not an absent field."""
    v = payload.get(key)
    return default if v is None else cast(v)


def _next_pow2(n: int, lo: int = 8) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _pad_pow2(examples: List[Dict]) -> List[Dict]:
    """Pad a coalesced group to a power-of-two batch size by repeating the
    last example.  Batch size is the only remaining compile-variant axis on
    the coalescing path (sequence length is always the full context and
    max_new_tokens is already pow2-bucketed), so this bounds the variant set
    to {1, 2, 4, ...} instead of one program per distinct group size.  Pad
    rows are appended AFTER the real rows, which leaves the real rows'
    sample streams untouched: per-step random bits are counter-indexed by
    (row, column) position, so row i draws the same bits at any batch size
    >= i+1.  Callers read results for the real rows only."""
    n = _next_pow2(len(examples), lo=1)
    return list(examples) + [examples[-1]] * (n - len(examples))


def _truncate_at_stop(ids: List[int], stop) -> List[int]:
    """Cut the response at the first stop id (exclusive).  Post-processing
    only — the decode scan still runs its static length, so `stop` does not
    join the coalescing key."""
    if not stop:
        return ids
    stops = set(int(s) for s in stop)
    for i, t in enumerate(ids):
        if t in stops:
            return ids[:i]
    return ids


def _example_from_payload(p: Dict) -> Dict:
    ex = {}
    for k in ("text",):
        if k in p:
            ex[k] = [int(t) for t in p[k]]
    for k in ("continuous_obs", "discrete_obs", "images",
              "continuous_actions", "discrete_actions"):
        if k in p:
            dt = np.int32 if k.startswith("discrete") else np.float32
            ex[k] = np.asarray(p[k], dt)
    if not ex:
        raise ValueError("request carries no model inputs")
    return ex


class NekoServer:
    """Owns the request queue, the batching worker, and the HTTP server."""

    def __init__(
        self,
        generator,
        *,
        host: str = "127.0.0.1",
        port: int = 0,
        max_batch: int = 8,
        batch_window_ms: float = 5.0,
        max_tokens: int = 256,
        max_beams: int = 8,
        continuous_slots: int = 0,
        continuous_chunk: int = 8,
        continuous_spec_k: int = 0,
        continuous_spec_threshold: int = 48,
        draft_generator=None,
        request_timeout: float = 120.0,
    ):
        """`continuous_slots` > 0 enables CONTINUOUS BATCHING for plain
        /v1/generate requests (no beams/speculative, top_k == 0): they
        join a running decode loop over a fixed slot pool instead of the
        coalescing worker — see serving/continuous.py.  Everything else
        (beams, speculative, top_k > 0, /v1/action) keeps the coalescing
        path.

        `draft_generator`: a second (smaller) Generator sharing the
        target's token space enables DRAFT-MODEL speculative decoding —
        {"speculative": true} then verifies real draft proposals instead
        of prompt-lookup guesses ({"speculative": "lookup"} forces the
        draft-free variant)."""
        self.gen = generator
        self.draft = draft_generator
        self.max_batch = max_batch
        self.batch_window = batch_window_ms / 1000.0
        self.max_tokens = max_tokens
        # per-request wall cap before the handler answers 504.  Raise it on
        # runtimes where a COLD process pays minutes of compiles on the
        # first request of each shape family — or pre-warm with
        # --compilation_cache, which makes restarts skip those compiles.
        self.request_timeout = request_timeout
        self.max_beams = min(max_beams, generator.cfg.token_space.text_tokens)
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run_worker, daemon=True)
        # advisory serving counters (GET /metrics); plain int increments —
        # GIL-consistent enough for observability
        self.stats = {"requests": 0, "responses": 0, "errors": 0,
                      "tokens_out": 0, "coalesced_calls": 0}
        self._cont = None
        if continuous_slots > 0:
            from neko_tpu.serving.continuous import ContinuousEngine

            self._cont = ContinuousEngine(
                generator, slots=continuous_slots, chunk=continuous_chunk,
                speculate_k=continuous_spec_k,
                spec_threshold=continuous_spec_threshold,
            )

        server = self

        class Handler(BaseHTTPRequestHandler):
            # chunked transfer-encoding (token streaming) needs HTTP/1.1;
            # every non-stream response already sends Content-Length
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def _json(self, code: int, obj: Dict) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/metrics":
                    m = dict(server.stats)
                    if server._cont is not None:
                        m["continuous"] = server._cont.metrics()
                    return self._json(200, m)
                if self.path != "/healthz":
                    return self._json(404, {"error": "not found"})
                cfg = server.gen.cfg
                self._json(200, {
                    "status": "ok",
                    "model": {
                        "embed_dim": cfg.embed_dim,
                        "layers": cfg.layers,
                        "heads": cfg.heads,
                        "context_len": cfg.context_len,
                        "kv_cache_dtype": cfg.kv_cache_dtype,
                    },
                })

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    payload = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    return self._json(400, {"error": "invalid JSON"})
                if self.path == "/v1/generate":
                    payload["_kind"] = "generate"
                elif self.path == "/v1/action":
                    payload["_kind"] = "action"
                else:
                    return self._json(404, {"error": "not found"})
                server.stats["requests"] += 1
                try:
                    result = server.submit(
                        payload, timeout=server.request_timeout
                    )
                except Exception as e:  # noqa: BLE001
                    # anything raised BEFORE queueing is payload-induced
                    # (submit validates; OverflowError from absurd numbers,
                    # etc.) — client error, never a worker fault
                    server.stats["errors"] += 1
                    return self._json(400, {"error": str(e)})
                if result.error is not None:
                    server.stats["errors"] += 1
                    return self._json(result.status, {"error": result.error})
                if result.stream_q is not None:
                    return self._stream(result)
                server.stats["responses"] += 1
                if isinstance(result.result, dict):
                    server.stats["tokens_out"] += len(
                        result.result.get("tokens", ())
                    )
                self._json(200, result.result)

            def _stream(self, req) -> None:
                """Chunked NDJSON: one {'tokens': [...]} line per engine
                chunk, then {'done': true, ...} (or {'error': ...})."""
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def line(obj):
                    data = (json.dumps(obj) + "\n").encode()
                    self.wfile.write(
                        f"{len(data):X}\r\n".encode() + data + b"\r\n"
                    )

                deadline = time.time() + 120.0
                try:
                    while True:
                        try:
                            kind, val = req.stream_q.get(
                                timeout=max(0.1, deadline - time.time())
                            )
                        except queue.Empty:
                            req.cancelled = True  # engine frees the slot
                            line({"error": "timed out"})
                            break
                        if kind == "tokens":
                            line({"tokens": val})
                        elif kind == "done":
                            server.stats["responses"] += 1
                            server.stats["tokens_out"] += len(val["tokens"])
                            line({"done": True, **val})
                            break
                        else:
                            line({"error": val})
                            break
                    self.wfile.write(b"0\r\n\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    # client went away mid-stream: free the slot instead of
                    # decoding the remaining tokens for nobody
                    req.cancelled = True

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self._serve_thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )

    # ------------------------------------------------------------ lifecycle
    @property
    def address(self):
        return self.httpd.server_address

    def start(self) -> "NekoServer":
        self._worker.start()
        if self._cont is not None:
            self._cont.start()
        self._serve_thread.start()
        return self

    def close(self) -> None:
        self._stop.set()
        self.httpd.shutdown()
        self.httpd.server_close()
        self._worker.join(timeout=5)
        if self._cont is not None:
            self._cont.close()
        # release any handler threads still waiting on queued requests
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                break
            r.error, r.status = "server closing", 503
            r.event.set()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------- requests
    # compile-variant bounds for a long-lived process: temperature/top_p are
    # traced operands in the decode scan (no recompile across values);
    # max_new_tokens is bucketed to powers of two (the scan generates the
    # bucket, the response is truncated — identical tokens, same RNG chain);
    # top_k (static, shapes lax.top_k) is snapped to this allowlist.
    TOP_K_CHOICES = (0, 1, 2, 5, 10, 20, 50, 100)

    def submit(self, payload: Dict, timeout: float = 120.0) -> _Pending:
        kind = payload["_kind"]
        use_cont = False
        if kind == "generate":
            want = _opt(payload, "max_new_tokens", 16, int)
            if not 1 <= want <= self.max_tokens:
                raise ValueError(
                    f"max_new_tokens must be in [1, {self.max_tokens}]"
                )
            top_k = _opt(payload, "top_k", 0, int)
            if top_k < 0:
                raise ValueError(f"top_k must be >= 0 (0 = off), got {top_k}")
            if top_k not in self.TOP_K_CHOICES:
                top_k = min(
                    (c for c in self.TOP_K_CHOICES if c >= max(top_k, 1)),
                    default=self.TOP_K_CHOICES[-1],
                )
            num_beams = _opt(payload, "num_beams", 1, int)
            if not 1 <= num_beams <= self.max_beams:
                raise ValueError(f"num_beams must be in [1, {self.max_beams}]")
            temperature = _opt(payload, "temperature", 1.0, float)
            top_p = _opt(payload, "top_p", 1.0, float)
            _check_sampling_args(temperature, top_k, top_p)
            if payload.get("stop") is not None:
                payload["stop"] = [int(s) for s in payload["stop"]]
            # requested length stays OUT of the key: requests differing only
            # in want coalesce into the shared pow2 bucket and each response
            # slices its own prefix
            key = (
                "generate",
                _next_pow2(want),
                bool(payload.get("deterministic", True)),
                temperature,
                top_k,
                top_p,
                num_beams,
            )
            if num_beams > 1:
                # beams run at the exact requested length (no bucketing —
                # the winning hypothesis depends on it) and must fit the
                # context; surface overflow as a client error, not a 500
                pe = _example_from_payload(payload)
                L = len(self.gen.packer.pack_example(pe).tokens)
                S = self.gen.cfg.context_len
                if L + want > S:
                    raise ValueError(
                        f"beam search needs prompt+max_new_tokens <= "
                        f"context ({L} + {want} > {S})"
                    )
                key = key + (want,)
            if payload.get("speculative"):
                # lossless speculative decoding: greedy is bit-exact,
                # sampled uses the distribution-preserving rejection rule.
                # Proposals come from the DRAFT MODEL when the server has
                # one (generate_spec_draft), else prompt lookup
                # (generate_spec); "lookup"/"draft" force a mode
                if num_beams > 1:
                    raise ValueError("speculative excludes num_beams")
                mode = payload["speculative"]
                if mode not in (True, "lookup", "draft"):
                    raise ValueError(
                        "speculative must be true, 'lookup' or 'draft'"
                    )
                if mode == "draft" and self.draft is None:
                    raise ValueError(
                        "no draft model loaded (--draft_model_path)"
                    )
                spec_mode = (
                    "draft"
                    if mode == "draft"
                    or (mode is True and self.draft is not None)
                    else "lookup"
                )
                if spec_mode == "lookup" and "text" not in payload:
                    raise ValueError(
                        "prompt-lookup speculation needs a text prompt"
                    )
                pe = _example_from_payload(payload)
                L = len(self.gen.packer.pack_example(pe).tokens)
                spec_k = _opt(payload, "speculate_k", 4, int)
                if not 1 <= spec_k <= 16:
                    raise ValueError("speculate_k must be in [1, 16]")
                if L + want + spec_k + 1 > self.gen.cfg.context_len:
                    raise ValueError(
                        "speculative decode needs prompt + max_new_tokens "
                        "+ speculate_k + 1 <= context"
                    )
                # batched spec decode coalesces same-knob requests
                key = ("spec", spec_mode, want, spec_k,
                       bool(payload.get("deterministic", True)),
                       temperature, top_k, top_p)
            # continuous batching serves the plain-generate class: the
            # engine's per-row traced knobs cover det/temp/top_p/stop/want;
            # top_k (static shape) and beams/speculative stay coalesced
            # The ADAPTIVE speculative engine (--continuous_spec_k) serves
            # the same request class: sampled rows use the per-row
            # point-mass rejection rule inside verify rounds, and requests
            # too long for the spec write window simply decode through
            # plain chunks near the context end (the engine's chunk-mode
            # policy, serving/continuous.py::_want_spec) — no extra
            # eligibility or overflow constraints remain.
            use_cont = (
                self._cont is not None
                and num_beams == 1
                and not payload.get("speculative")
                and top_k == 0
            )
        else:
            action_kind = str(payload["action_kind"])
            if action_kind not in ("continuous", "discrete"):
                raise ValueError("action_kind must be continuous|discrete")
            num_actions = _opt(payload, "num_actions", None,
                               int) if "num_actions" in payload else None
            nvec = payload.get("action_nvec")
            if nvec is not None:
                nvec = tuple(int(n) for n in nvec)
            if action_kind == "discrete":
                if nvec is not None:
                    # MultiDiscrete: one token per component, per-range
                    # restricted decode (tests/test_multidiscrete.py)
                    if int(payload["action_tokens"]) != len(nvec):
                        raise ValueError(
                            "action_tokens must equal len(action_nvec)"
                        )
                elif num_actions is None:
                    raise ValueError("discrete actions require num_actions "
                                     "or action_nvec")
                elif int(payload["action_tokens"]) != 1:
                    raise ValueError("discrete actions use action_tokens=1 "
                                     "(MultiDiscrete needs action_nvec)")
            key = (
                "action",
                action_kind,
                int(payload["action_tokens"]),
                num_actions,
                nvec,
                bool(payload.get("deterministic", True)),
            )
        ex = _example_from_payload(payload)  # validate before queueing
        if kind == "action" and not any(
            "obs" in k or k == "images" for k in ex
        ):
            raise ValueError("action requests need an observation input")
        stream = bool(payload.get("stream"))
        if stream and not use_cont:
            raise ValueError(
                "streaming needs continuous batching (--continuous_slots) "
                "and a plain generate request (no beams/speculative/top_k)"
            )
        req = _Pending(payload, key)
        if self._stop.is_set():
            req.error, req.status = "server closing", 503
            return req
        if stream:
            # hand the caller an event stream; tokens flow as engine
            # chunks finish (the handler writes them as chunked NDJSON)
            req.stream_q = queue.Queue()
            self._cont.submit(req)
            return req
        if use_cont:
            self._cont.submit(req)
        else:
            self._q.put(req)
        if not req.event.wait(timeout):
            req.cancelled = True  # worker will skip it
            req.error, req.status = "timed out", 504
        return req

    # --------------------------------------------------------------- worker
    def _run_worker(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.time() + self.batch_window
            while len(batch) < self.max_batch:
                left = deadline - time.time()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            groups: Dict[tuple, List[_Pending]] = {}
            for r in batch:
                if r.cancelled:  # handler already timed out and responded
                    continue
                groups.setdefault(r.key, []).append(r)
            for key, rs in groups.items():
                self.stats["coalesced_calls"] += 1
                try:
                    if key[0] == "generate":
                        self._serve_generate(key, rs)
                    elif key[0] == "spec":
                        self._serve_spec(key, rs)
                    else:
                        self._serve_action(key, rs)
                except Exception as e:  # noqa: BLE001 — payloads were
                    # validated pre-queue, so this is a server fault
                    for r in rs:
                        r.error = f"{type(e).__name__}: {e}"
                        r.status = 500
                for r in rs:
                    r.event.set()

    def _serve_generate(self, key, rs: List[_Pending]) -> None:
        _, bucket, det, temp, top_k, top_p, num_beams = key[:7]
        ts = self.gen.cfg.token_space
        start, end = ts.start("text"), ts.end("text")
        examples = [_example_from_payload(r.payload) for r in rs]
        if num_beams > 1:
            # beams run at the exact requested length (key carries it): the
            # winning hypothesis at `bucket` tokens can differ from `want`'s
            want = key[7]
            tokens, scores = self.gen.generate_beam(
                _pad_pow2(examples), max_new_tokens=want, start=start,
                end=end, num_beams=num_beams,
            )
            for i, r in enumerate(rs):
                ids = (tokens[i, 0] - start).tolist()
                r.result = {
                    "tokens": _truncate_at_stop(ids, r.payload.get("stop")),
                    "score": float(scores[i, 0]),
                    "batched_with": len(rs) - 1,
                }
            return
        # generate the bucket length, return each request's own prefix — the
        # prefix is identical to a `want`-length run (the per-step RNG chain
        # depends only on step order), so bucketing changes compile variants
        # and coalescing groups, not results
        tokens, _ = self.gen.generate_batch(
            _pad_pow2(examples), max_new_tokens=bucket, start=start, end=end,
            deterministic=det, temperature=temp, top_k=top_k, top_p=top_p,
        )
        for i, r in enumerate(rs):
            want = _opt(r.payload, "max_new_tokens", 16, int)
            ids = (tokens[i, :want] - start).tolist()
            r.result = {
                "tokens": _truncate_at_stop(ids, r.payload.get("stop")),
                "batched_with": len(rs) - 1,
            }

    def _serve_spec(self, key, rs: List[_Pending]) -> None:
        _, spec_mode, want, spec_k, det, temp, top_k, top_p = key
        ts = self.gen.cfg.token_space
        start, end = ts.start("text"), ts.end("text")
        examples = [_example_from_payload(r.payload) for r in rs]
        if spec_mode == "draft":
            tokens, rounds = self.gen.generate_spec_draft(
                _pad_pow2(examples), self.draft,
                max_new_tokens=want, start=start, end=end,
                speculate_k=spec_k, deterministic=det,
                temperature=temp, top_k=top_k, top_p=top_p,
            )
        else:
            tokens, rounds = self.gen.generate_spec(
                _pad_pow2(examples),
                max_new_tokens=want, start=start, end=end,
                speculate_k=spec_k, deterministic=det,
                temperature=temp, top_k=top_k, top_p=top_p,
            )
        for i, r in enumerate(rs):
            ids = (tokens[i] - start).tolist()
            r.result = {
                "tokens": _truncate_at_stop(ids, r.payload.get("stop")),
                "rounds": int(rounds),
                "batched_with": len(rs) - 1,
            }

    def _serve_action(self, key, rs: List[_Pending]) -> None:
        _, action_kind, action_tokens, num_actions, nvec, det = key
        examples = []
        for r in rs:
            ex = _example_from_payload(r.payload)
            slot = f"{action_kind}_actions"
            if slot not in ex:  # zero action slots, one per obs timestep
                obs = next(v for k, v in ex.items() if "obs" in k or k == "images")
                dt = np.float32 if action_kind == "continuous" else np.int32
                ex[slot] = np.zeros((len(obs), action_tokens), dt)
            examples.append(ex)
        actions = self.gen.predict_control_batch(
            _pad_pow2(examples), action_kind=action_kind,
            action_tokens=action_tokens, num_actions=num_actions,
            action_nvec=nvec, deterministic=det,
        )
        for r, a in zip(rs, actions):
            r.result = {
                "action": a if isinstance(a, int) else np.asarray(a).tolist(),
                "batched_with": len(rs) - 1,
            }

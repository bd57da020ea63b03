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


class _Pending:
    __slots__ = ("payload", "event", "result", "error", "key")

    def __init__(self, payload: Dict, key):
        self.payload = payload
        self.event = threading.Event()
        self.result = None
        self.error: Optional[str] = None
        self.key = key


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
    ):
        self.gen = generator
        self.max_batch = max_batch
        self.batch_window = batch_window_ms / 1000.0
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run_worker, daemon=True)

        server = self

        class Handler(BaseHTTPRequestHandler):
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
                try:
                    result = server.submit(payload)
                except Exception as e:  # noqa: BLE001 — surfaced to client
                    return self._json(400, {"error": str(e)})
                if result.error is not None:
                    return self._json(400, {"error": result.error})
                self._json(200, result.result)

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
        self._serve_thread.start()
        return self

    def close(self) -> None:
        self._stop.set()
        self.httpd.shutdown()
        self.httpd.server_close()
        self._worker.join(timeout=5)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------- requests
    def submit(self, payload: Dict, timeout: float = 120.0) -> _Pending:
        kind = payload["_kind"]
        if kind == "generate":
            key = (
                "generate",
                int(payload.get("max_new_tokens", 16)),
                bool(payload.get("deterministic", True)),
                float(payload.get("temperature") or 1.0),
                int(payload.get("top_k") or 0),
                float(payload.get("top_p") or 1.0),
                int(payload.get("num_beams") or 1),
            )
        else:
            key = (
                "action",
                str(payload["action_kind"]),
                int(payload["action_tokens"]),
                payload.get("num_actions") and int(payload["num_actions"]),
                bool(payload.get("deterministic", True)),
            )
        req = _Pending(payload, key)
        _example_from_payload(payload)  # validate before queueing
        self._q.put(req)
        if not req.event.wait(timeout):
            req.error = "timed out"
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
                groups.setdefault(r.key, []).append(r)
            for key, rs in groups.items():
                try:
                    if key[0] == "generate":
                        self._serve_generate(key, rs)
                    else:
                        self._serve_action(key, rs)
                except Exception as e:  # noqa: BLE001 — per-group isolation
                    for r in rs:
                        r.error = f"{type(e).__name__}: {e}"
                for r in rs:
                    r.event.set()

    def _serve_generate(self, key, rs: List[_Pending]) -> None:
        _, max_new, det, temp, top_k, top_p, num_beams = key
        ts = self.gen.cfg.token_space
        start, end = ts.start("text"), ts.end("text")
        examples = [_example_from_payload(r.payload) for r in rs]
        if num_beams > 1:
            tokens, scores = self.gen.generate_beam(
                examples, max_new_tokens=max_new, start=start, end=end,
                num_beams=num_beams,
            )
            for i, r in enumerate(rs):
                r.result = {
                    "tokens": (tokens[i, 0] - start).tolist(),
                    "score": float(scores[i, 0]),
                    "batched_with": len(rs) - 1,
                }
            return
        tokens, _ = self.gen.generate_batch(
            examples, max_new_tokens=max_new, start=start, end=end,
            deterministic=det, temperature=temp, top_k=top_k, top_p=top_p,
        )
        for i, r in enumerate(rs):
            r.result = {
                "tokens": (tokens[i] - start).tolist(),
                "batched_with": len(rs) - 1,
            }

    def _serve_action(self, key, rs: List[_Pending]) -> None:
        _, action_kind, action_tokens, num_actions, det = key
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
            examples, action_kind=action_kind, action_tokens=action_tokens,
            num_actions=num_actions, deterministic=det,
        )
        for r, a in zip(rs, actions):
            r.result = {
                "action": a if isinstance(a, int) else np.asarray(a).tolist(),
                "batched_with": len(rs) - 1,
            }

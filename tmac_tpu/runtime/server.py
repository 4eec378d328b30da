"""Minimal HTTP serving front-end over the continuous-batching engine.

The user-facing serving surface (the reference exposes only a CLI,
`llama-cli`, run one request at a time; tools/run_pipeline.py:222-277).
Stdlib-only (http.server) so it runs in hermetic environments.

API (JSON over HTTP):
  POST /v1/completions   {"prompt_ids": [int, ...], "max_tokens": int,
                          "eos_id": int|null}
                      -> {"ids": [int, ...], "uid": int}
     or with a tokenizer configured:
                         {"prompt": "text", ...} -> {"text": "...", ...}
  GET  /v1/stats      -> engine counters
  GET  /health        -> {"ok": true}

Requests from concurrent clients are batched together by the engine
(continuous batching); each HTTP handler thread blocks until its request
completes.  A single scheduler thread owns the TPU.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from tmac_tpu.runtime.engine import InferenceEngine


class ServingEngine:
    """Thread-safe wrapper: submit from any thread, one scheduler thread."""

    def __init__(self, engine: InferenceEngine, poll_s: float = 0.002):
        self.engine = engine
        self._lock = threading.Lock()
        self._events: dict[int, threading.Event] = {}
        self._results: dict[int, list] = {}
        self._poll_s = poll_s
        self._stop = False
        engine.stream_cb = self._on_finish
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _on_finish(self, uid: int, tokens: list):
        self._results[uid] = list(tokens)
        ev = self._events.pop(uid, None)
        if ev:
            ev.set()

    def _loop(self):
        while not self._stop:
            with self._lock:
                busy = self.engine.pending() > 0
                if busy:
                    self.engine.step()
            if not busy:
                time.sleep(self._poll_s)

    def complete(self, prompt_ids, max_tokens: int = 128,
                 eos_id: Optional[int] = None, timeout: float = 600.0):
        ev = threading.Event()
        with self._lock:
            uid = self.engine.submit(prompt_ids, max_new_tokens=max_tokens,
                                     eos_id=eos_id)
            self._events[uid] = ev
        if not ev.wait(timeout):
            # Clean up fully: free the engine slot (or wait-queue entry) and
            # drop the event/result entries so abandoned requests don't
            # accumulate or keep occupying batch capacity.
            with self._lock:
                self._events.pop(uid, None)
                self._results.pop(uid, None)
                self.engine.cancel(uid)
            raise TimeoutError(f"request {uid} timed out after {timeout}s")
        return uid, self._results.pop(uid)

    def stats(self):
        return dict(self.engine.stats)

    def shutdown(self):
        self._stop = True
        self._thread.join(timeout=5)


def make_handler(serving: ServingEngine, tokenizer=None):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/health":
                return self._json(200, {"ok": True})
            if self.path == "/v1/stats":
                return self._json(200, serving.stats())
            return self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/v1/completions":
                return self._json(404, {"error": "not found"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                if "prompt_ids" in req:
                    ids = [int(t) for t in req["prompt_ids"]]
                elif tokenizer is not None and "prompt" in req:
                    ids = tokenizer.encode(req["prompt"])
                else:
                    return self._json(400, {"error": "need prompt_ids (or prompt with a tokenizer)"})
                uid, out = serving.complete(
                    ids, max_tokens=int(req.get("max_tokens", 128)),
                    eos_id=req.get("eos_id"))
                resp = {"uid": uid, "ids": out}
                if tokenizer is not None:
                    resp["text"] = tokenizer.decode(out)
                return self._json(200, resp)
            except AssertionError as e:
                return self._json(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 -- report, don't crash the server
                return self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(engine: InferenceEngine, host: str = "127.0.0.1", port: int = 8777,
          tokenizer=None):
    """Blocking serve loop. Returns the (server, serving) pair when used
    programmatically via serve_async."""
    serving = ServingEngine(engine)
    httpd = ThreadingHTTPServer((host, port), make_handler(serving, tokenizer))
    print(f"tmac-tpu serving on http://{host}:{port}  "
          f"(batch={engine.B}, max_len={engine.S})", flush=True)
    try:
        httpd.serve_forever()
    finally:
        serving.shutdown()


def serve_async(engine: InferenceEngine, host: str = "127.0.0.1", port: int = 0,
                tokenizer=None):
    """Start the server on a background thread; returns (httpd, serving).
    port=0 picks a free port (httpd.server_address[1])."""
    serving = ServingEngine(engine)
    httpd = ThreadingHTTPServer((host, port), make_handler(serving, tokenizer))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, serving

"""Minimal HTTP serving front-end over the continuous-batching engine.

The user-facing serving surface (the reference exposes only a CLI,
`llama-cli`, run one request at a time; tools/run_pipeline.py:222-277).
Stdlib-only (http.server) so it runs in hermetic environments.

API (JSON over HTTP):
  POST /v1/completions   {"prompt_ids": [int, ...], "max_tokens": int,
                          "eos_id": int|null,
                          "temperature": float, "top_k": int, "top_p": float,
                          "repeat_penalty": float, "presence_penalty": float,
                          "frequency_penalty": float, "stream": bool}
                      -> {"ids": [int, ...], "uid": int}
     or with "stream": true -> text/event-stream of
                         data: {"ids": [new tokens], "done": false}
                         ...
                         data: {"ids": [], "done": true}
        (tokens arrive per decode chunk, the llama-cli interactive-
        streaming role of reference tools/run_pipeline.py:222-277)
     or with a tokenizer configured:
                         {"prompt": "text", ...} -> {"text": "...", ...}
  GET  /v1/stats      -> engine counters
  GET  /health        -> {"ok": true}

OpenAI-compatible surface (so standard SDKs/tools can point at this
server directly -- net-new vs the reference's one-shot CLI):
  GET  /v1/models           -> {"object": "list", "data": [{"id": ...}]}
  POST /v1/chat/completions {"messages": [{"role", "content"}, ...],
                             "max_tokens", "temperature", "top_p",
                             "stream"}  (needs a tokenizer with a chat
                             template) -> chat.completion object, or an
                             SSE stream of chat.completion.chunk deltas
                             terminated by `data: [DONE]`

Requests from concurrent clients are batched together by the engine
(continuous batching); each HTTP handler thread blocks until its request
completes (or consumes its stream queue).  A single scheduler thread owns
the TPU.  Per-request sampling params ride as traced per-slot vectors
(runtime/sampling.SamplerState) so they never trigger a recompile.
"""

from __future__ import annotations

import json
import queue
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
        # streaming state: per-uid delta queue + count of tokens delivered
        self._queues: dict[int, queue.Queue] = {}
        self._delivered: dict[int, int] = {}
        self._poll_s = poll_s
        self._stop = False
        engine.stream_cb = self._on_tokens
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _on_tokens(self, uid: int, tokens: list, done: bool):
        """Engine callback (scheduler thread): fan out deltas to streaming
        consumers and resolve blocking completions on finish."""
        q = self._queues.get(uid)
        if q is not None:
            sent = self._delivered.get(uid, 0)
            delta = list(tokens[sent:])
            self._delivered[uid] = sent + len(delta)
            if delta or done:
                q.put((delta, done))
        if done:
            # record the result only for a blocking waiter (complete());
            # streaming consumers read their queue -- unconditionally
            # storing would leak an entry per streamed request
            ev = self._events.pop(uid, None)
            if ev:
                self._results[uid] = list(tokens)
                ev.set()

    def _loop(self):
        while not self._stop:
            with self._lock:
                busy = self.engine.pending() > 0
                if busy:
                    self.engine.step()
            if not busy:
                time.sleep(self._poll_s)

    def _submit(self, prompt_ids, max_tokens, eos_id, sampling):
        return self.engine.submit(prompt_ids, max_new_tokens=max_tokens,
                                  eos_id=eos_id, **(sampling or {}))

    def complete(self, prompt_ids, max_tokens: int = 128,
                 eos_id: Optional[int] = None, timeout: float = 600.0,
                 sampling: Optional[dict] = None):
        ev = threading.Event()
        with self._lock:
            uid = self._submit(prompt_ids, max_tokens, eos_id, sampling)
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

    def stream(self, prompt_ids, max_tokens: int = 128,
               eos_id: Optional[int] = None, timeout: float = 600.0,
               sampling: Optional[dict] = None):
        """Generator of (delta_tokens, done) tuples as the engine produces
        them -- tokens arrive per decode chunk, BEFORE the request
        completes."""
        q: queue.Queue = queue.Queue()
        with self._lock:
            uid = self._submit(prompt_ids, max_tokens, eos_id, sampling)
            self._queues[uid] = q
            self._delivered[uid] = 0
        finished = False
        try:
            while True:
                try:
                    delta, done = q.get(timeout=timeout)
                except queue.Empty:
                    raise TimeoutError(
                        f"stream {uid} stalled for {timeout}s") from None
                yield delta, done
                if done:
                    finished = True
                    return
        finally:
            with self._lock:
                self._queues.pop(uid, None)
                self._delivered.pop(uid, None)
                self._results.pop(uid, None)
                if not finished:
                    # consumer went away mid-stream (client disconnect,
                    # timeout, GeneratorExit): free the engine slot so the
                    # request doesn't keep decoding as a zombie
                    self.engine.cancel(uid)

    def stats(self):
        return dict(self.engine.stats)

    def shutdown(self):
        self._stop = True
        self._thread.join(timeout=5)


def _sampling_from_req(req: dict) -> Optional[dict]:
    s = {}
    if "temperature" in req:
        s["temperature"] = float(req["temperature"])
    if "top_k" in req:
        s["top_k"] = int(req["top_k"])
    if "top_p" in req:
        s["top_p"] = float(req["top_p"])
    if "min_p" in req:
        s["min_p"] = float(req["min_p"])
    if "repeat_penalty" in req:
        s["repeat_penalty"] = float(req["repeat_penalty"])
    if "presence_penalty" in req:
        s["presence_penalty"] = float(req["presence_penalty"])
    if "frequency_penalty" in req:
        s["frequency_penalty"] = float(req["frequency_penalty"])
    return s or None


def make_handler(serving: ServingEngine, tokenizer=None,
                 model_name: str = "tmac-tpu"):
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
            if self.path == "/v1/models":
                return self._json(200, {"object": "list", "data": [
                    {"id": model_name, "object": "model",
                     "owned_by": "tmac-tpu"}]})
            return self._json(404, {"error": "not found"})

        def _stream_response(self, ids, max_tokens, eos_id, sampling):
            """Server-sent-events-style incremental token delivery."""
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()
            gen = serving.stream(ids, max_tokens=max_tokens, eos_id=eos_id,
                                 sampling=sampling)
            try:
                for delta, done in gen:
                    ev = {"ids": delta, "done": done}
                    if tokenizer is not None and delta:
                        ev["text"] = tokenizer.decode(delta)
                    self.wfile.write(f"data: {json.dumps(ev)}\n\n".encode())
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                # client went away: closing the generator runs its finally
                # block, which cancels the engine request
                gen.close()

        def _chat_stream(self, ids, max_tokens, eos_id, sampling, cid):
            """OpenAI chat.completion.chunk SSE stream."""
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()

            def chunk(delta: dict, finish=None):
                return ("data: " + json.dumps({
                    "id": cid, "object": "chat.completion.chunk",
                    "model": model_name,
                    "choices": [{"index": 0, "delta": delta,
                                 "finish_reason": finish}],
                }) + "\n\n").encode()

            gen = serving.stream(ids, max_tokens=max_tokens, eos_id=eos_id,
                                 sampling=sampling)
            saw_eos = False
            try:
                self.wfile.write(chunk({"role": "assistant", "content": ""}))
                for delta, done in gen:
                    if eos_id is not None and eos_id in delta:
                        # keep the streamed text identical to the
                        # non-stream path, which strips eos
                        saw_eos = True
                        delta = [t for t in delta if t != eos_id]
                    if delta:
                        self.wfile.write(
                            chunk({"content": tokenizer.decode(delta)}))
                    if done:
                        self.wfile.write(chunk(
                            {}, finish="stop" if saw_eos else "length"))
                        self.wfile.write(b"data: [DONE]\n\n")
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                gen.close()

        def _chat_completions(self, req: dict):
            """OpenAI-compatible chat endpoint (needs a tokenizer whose
            chat template renders the message list)."""
            if tokenizer is None or not hasattr(tokenizer,
                                                "apply_chat_template"):
                return self._json(400, {"error": {"message":
                    "server has no tokenizer with a chat template",
                    "type": "invalid_request_error"}})
            msgs = req.get("messages")
            if not isinstance(msgs, list) or not msgs:
                return self._json(400, {"error": {"message":
                    "messages must be a non-empty list",
                    "type": "invalid_request_error"}})
            ids = tokenizer.apply_chat_template(msgs,
                                                add_generation_prompt=True)
            max_tokens = int(req.get("max_tokens")
                             or req.get("max_completion_tokens") or 128)
            eos_id = getattr(tokenizer, "eos_token_id", None)
            sampling = _sampling_from_req(req)
            cid = f"chatcmpl-{int(time.time() * 1000):x}"
            if req.get("stream"):
                return self._chat_stream(ids, max_tokens, eos_id, sampling,
                                         cid)
            uid, out = serving.complete(ids, max_tokens=max_tokens,
                                        eos_id=eos_id, sampling=sampling)
            gen_ids = [t for t in out if eos_id is None or t != eos_id]
            return self._json(200, {
                "id": cid, "object": "chat.completion",
                "model": model_name,
                "choices": [{"index": 0,
                             "message": {"role": "assistant",
                                         "content": tokenizer.decode(gen_ids)},
                             "finish_reason": "stop" if len(out) < max_tokens
                             or (eos_id is not None and eos_id in out)
                             else "length"}],
                "usage": {"prompt_tokens": len(ids),
                          "completion_tokens": len(out),
                          "total_tokens": len(ids) + len(out)},
            })

        def do_POST(self):
            if self.path == "/v1/chat/completions":
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    return self._chat_completions(
                        json.loads(self.rfile.read(n)))
                except AssertionError as e:
                    return self._json(400, {"error": str(e)})
                except Exception as e:  # noqa: BLE001
                    return self._json(
                        500, {"error": f"{type(e).__name__}: {e}"})
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
                max_tokens = int(req.get("max_tokens", 128))
                eos_id = req.get("eos_id")
                sampling = _sampling_from_req(req)
                if req.get("stream"):
                    return self._stream_response(ids, max_tokens, eos_id,
                                                 sampling)
                uid, out = serving.complete(ids, max_tokens=max_tokens,
                                            eos_id=eos_id, sampling=sampling)
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
          tokenizer=None, model_name: str = "tmac-tpu"):
    """Blocking serve loop. Returns the (server, serving) pair when used
    programmatically via serve_async."""
    serving = ServingEngine(engine)
    httpd = ThreadingHTTPServer((host, port),
                                make_handler(serving, tokenizer, model_name))
    print(f"tmac-tpu serving on http://{host}:{port}  "
          f"(batch={engine.B}, max_len={engine.S})", flush=True)
    try:
        httpd.serve_forever()
    finally:
        serving.shutdown()


def serve_async(engine: InferenceEngine, host: str = "127.0.0.1", port: int = 0,
                tokenizer=None, model_name: str = "tmac-tpu"):
    """Start the server on a background thread; returns (httpd, serving).
    port=0 picks a free port (httpd.server_address[1])."""
    serving = ServingEngine(engine)
    httpd = ThreadingHTTPServer((host, port),
                                make_handler(serving, tokenizer, model_name))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, serving

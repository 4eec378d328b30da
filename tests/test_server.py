"""HTTP serving layer: concurrent clients batched by one engine (CPU)."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import init_params
from tmac_tpu.runtime.engine import InferenceEngine
from tmac_tpu.runtime.generate import generate
from tmac_tpu.runtime.server import serve_async


@pytest.fixture(scope="module")
def server():
    cfg = get_preset("llama-2-7b").scaled(8)
    params = init_params(cfg, seed=0)
    eng = InferenceEngine(cfg, params, max_batch=4, max_len=64,
                          impl="xla", decode_chunk=4)
    httpd, serving = serve_async(eng, port=0)
    yield cfg, params, httpd.server_address[1]
    serving.shutdown()
    httpd.shutdown()


def _post(port, obj, path="/v1/completions"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_health_and_completion(server):
    cfg, params, port = server
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=10) as r:
        assert json.loads(r.read())["ok"]
    out = _post(port, {"prompt_ids": [1, 2, 3], "max_tokens": 6})
    ref = generate(params, cfg, np.asarray([[1, 2, 3]], np.int32),
                   max_new_tokens=6, impl="xla")
    assert out["ids"] == [int(t) for t in np.asarray(ref)[0]]


def test_concurrent_clients_batched(server):
    cfg, params, port = server
    prompts = [[1, 2], [3, 4, 5], [6], [7, 8, 9, 10]]
    results = [None] * len(prompts)

    def worker(i):
        results[i] = _post(port, {"prompt_ids": prompts[i], "max_tokens": 5})

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, p in enumerate(prompts):
        ref = generate(params, cfg, np.asarray([p], np.int32),
                       max_new_tokens=5, impl="xla")
        assert results[i]["ids"] == [int(t) for t in np.asarray(ref)[0]], p

    # stats endpoint reflects the traffic
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/v1/stats", timeout=10) as r:
        stats = json.loads(r.read())
    assert stats["prefills"] >= 5


def test_streaming_tokens_arrive_before_completion(server):
    """'stream': true -> SSE-style events; token deltas arrive in multiple
    events before the final done event, and the concatenation equals the
    non-streaming result."""
    cfg, params, port = server
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/completions",
        data=json.dumps({"prompt_ids": [1, 2, 3], "max_tokens": 12,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "text/event-stream"
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: "):
                events.append(json.loads(line[len("data: "):]))
    assert events[-1]["done"] is True
    # incremental delivery: more than one token-bearing event BEFORE done
    token_events = [e for e in events if e["ids"]]
    assert len(token_events) >= 2, events
    got = [t for e in events for t in e["ids"]]
    ref = generate(params, cfg, np.asarray([[1, 2, 3]], np.int32),
                   max_new_tokens=12, impl="xla")
    assert got == [int(t) for t in np.asarray(ref)[0]]


def test_per_request_sampling_http(server):
    """temperature/top_k/top_p in the POST body apply per request; an
    explicit temperature=0 request still matches greedy."""
    cfg, params, port = server
    out = _post(port, {"prompt_ids": [1, 2, 3], "max_tokens": 5,
                       "temperature": 0.9, "top_k": 20})
    assert len(out["ids"]) == 5
    assert all(0 <= t < cfg.vocab_size for t in out["ids"])
    out0 = _post(port, {"prompt_ids": [1, 2, 3], "max_tokens": 5,
                        "temperature": 0.0})
    ref = generate(params, cfg, np.asarray([[1, 2, 3]], np.int32),
                   max_new_tokens=5, impl="xla")
    assert out0["ids"] == [int(t) for t in np.asarray(ref)[0]]


def test_bad_request(server):
    _, _, port = server
    try:
        _post(port, {"max_tokens": 5})
        assert False, "should have errored"
    except urllib.error.HTTPError as e:
        assert e.code == 400


import urllib.error  # noqa: E402


def test_bench_serve_mixed_arrivals(server):
    """Mixed-arrival bench harness: all requests finish, stats sane, and
    TTFT stays bounded while other requests decode (the interleaved
    scheduler's aggregate-throughput story)."""
    import numpy as np
    from tmac_tpu.models.config import get_preset
    from tmac_tpu.models.llama import init_params
    from tmac_tpu.runtime.bench_serve import run_serve_bench
    from tmac_tpu.runtime.engine import InferenceEngine

    cfg, params, _ = server
    eng = InferenceEngine(cfg, params, max_batch=4, max_len=64,
                          impl="xla", decode_chunk=2, prefill_chunk=16)
    rng = np.random.default_rng(1)
    prompts = [[int(t) for t in rng.integers(1, cfg.vocab_size, n)]
               for n in (3, 20, 7, 30, 5, 12)]
    r = run_serve_bench(eng, prompts, max_new=6, arrival_rate=50.0)
    assert r["requests"] == 6
    assert r["decode_tokens"] > 0 and r["aggregate_tok_s"] > 0
    assert r["ttft_p95_s"] <= r["latency_p95_s"]
    assert len(eng.finished) == 6
    for req in eng.finished.values():
        assert len(req.output) == 6


class _ChatTok:
    """Minimal chat-capable tokenizer stub: token ids are character codes;
    the chat template concatenates message contents."""
    eos_token_id = 0

    def encode(self, s):
        return [ord(c) % 256 + 1 for c in s]

    def decode(self, ids):
        return "".join(chr((i - 1) % 26 + 97) for i in ids)

    def apply_chat_template(self, messages, add_generation_prompt=True):
        text = "".join(m["content"] for m in messages)
        return self.encode(text)


@pytest.fixture(scope="module")
def chat_server():
    cfg = get_preset("llama-2-7b").scaled(8)
    params = init_params(cfg, seed=0)
    eng = InferenceEngine(cfg, params, max_batch=4, max_len=64,
                          impl="xla", decode_chunk=4)
    httpd, serving = serve_async(eng, port=0, tokenizer=_ChatTok(),
                                 model_name="test-model")
    yield cfg, params, httpd.server_address[1]
    serving.shutdown()
    httpd.shutdown()


def test_openai_models_endpoint(chat_server):
    _, _, port = chat_server
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/v1/models",
                                timeout=10) as r:
        out = json.loads(r.read())
    assert out["object"] == "list"
    assert out["data"][0]["id"] == "test-model"


def test_openai_chat_completion(chat_server):
    cfg, params, port = chat_server
    out = _post(port, {"messages": [{"role": "user", "content": "hi"}],
                       "max_tokens": 6}, path="/v1/chat/completions")
    assert out["object"] == "chat.completion"
    assert out["model"] == "test-model"
    ch = out["choices"][0]
    assert ch["message"]["role"] == "assistant"
    assert isinstance(ch["message"]["content"], str)
    assert ch["finish_reason"] in ("stop", "length")
    assert out["usage"]["prompt_tokens"] == 2
    assert out["usage"]["total_tokens"] == (out["usage"]["prompt_tokens"]
                                            + out["usage"]["completion_tokens"])
    # content must decode the engine's actual greedy tokens
    tok = _ChatTok()
    ref = generate(params, cfg, np.asarray([tok.encode("hi")], np.int32),
                   max_new_tokens=6, impl="xla")
    ref_ids = [int(t) for t in np.asarray(ref)[0]]
    gen = [t for t in ref_ids if t != tok.eos_token_id]
    assert ch["message"]["content"] == tok.decode(gen)


def test_openai_chat_stream(chat_server):
    _, _, port = chat_server
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/chat/completions",
        data=json.dumps({"messages": [{"role": "user", "content": "yo"}],
                         "max_tokens": 8, "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            body = line[len("data: "):]
            if body == "[DONE]":
                events.append("DONE")
                break
            events.append(json.loads(body))
    assert events[-1] == "DONE"
    chunks = [e for e in events if isinstance(e, dict)]
    assert all(c["object"] == "chat.completion.chunk" for c in chunks)
    assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
    assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")
    text = "".join(c["choices"][0]["delta"].get("content", "")
                   for c in chunks)
    assert isinstance(text, str) and len(text) > 0


def test_openai_chat_requires_tokenizer(server):
    _, _, port = server  # the plain fixture has no tokenizer
    try:
        _post(port, {"messages": [{"role": "user", "content": "x"}]},
              path="/v1/chat/completions")
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400

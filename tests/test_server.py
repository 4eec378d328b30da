"""HTTP serving layer: concurrent clients batched by one engine (CPU)."""

import json
import threading
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

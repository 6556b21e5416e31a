"""OpenAI-compatible HTTP adapter against a canned-response fake
server (stdlib http.server) — the keyless-testable path for the one
piece of the reference's LLM stack that needs a network client."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from parquet_pipeline_spark.plans.client import (
    OpenAICompatibleClient,
    OpenAICompatibleEmbedder,
)


def _fake_embedding(text: str, dim: int = 4) -> list[float]:
    # deterministic per-text vector the tests can recompute
    return [float((len(text) + j) % 7) for j in range(dim)]


class _FakeOpenAI(BaseHTTPRequestHandler):
    # class-level script: list of (status, body_dict_or_content).
    # /embeddings answers from _fake_embedding (reversed order, to
    # prove the client reassembles by 'index') unless a scripted
    # non-200 status is queued.
    script = []
    requests = []

    def do_POST(self):
        n = int(self.headers["Content-Length"])
        payload = json.loads(self.rfile.read(n).decode())
        type(self).requests.append((self.path, dict(self.headers), payload))
        status, content = (
            type(self).script.pop(0) if type(self).script else (200, "ok")
        )
        if status != 200:
            self.send_response(status)
            self.end_headers()
            return
        if self.path.endswith("/embeddings"):
            data = [
                {"index": i, "embedding": _fake_embedding(t)}
                for i, t in enumerate(payload["input"])
            ]
            body = json.dumps({"data": list(reversed(data))}).encode()
        else:
            body = json.dumps(
                {"choices": [{"message": {"role": "assistant", "content": content}}]}
            ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def fake_server():
    _FakeOpenAI.script = []
    _FakeOpenAI.requests = []
    srv = HTTPServer(("127.0.0.1", 0), _FakeOpenAI)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1", _FakeOpenAI
    srv.shutdown()


def test_complete_roundtrip(fake_server):
    base, fake = fake_server
    fake.script = [(200, "the answer")]
    c = OpenAICompatibleClient(base_url=base, api_key="sk-test", model="m1")
    assert c.complete("sys", "usr") == "the answer"
    path, headers, payload = fake.requests[0]
    assert path == "/v1/chat/completions"
    assert headers["Authorization"] == "Bearer sk-test"
    assert payload["model"] == "m1"
    assert payload["messages"] == [
        {"role": "system", "content": "sys"},
        {"role": "user", "content": "usr"},
    ]
    assert "response_format" not in payload


def test_json_mode_sets_response_format_and_validates(fake_server):
    base, fake = fake_server
    fake.script = [(200, '{"queries": ["a", "b"]}')]
    c = OpenAICompatibleClient(base_url=base)
    out = c.complete("sys", "usr", json_mode=True)
    assert json.loads(out) == {"queries": ["a", "b"]}
    assert fake.requests[0][2]["response_format"] == {"type": "json_object"}


def test_retries_on_5xx_then_succeeds(fake_server):
    base, fake = fake_server
    fake.script = [(503, None), (200, "recovered")]
    c = OpenAICompatibleClient(base_url=base, max_retries=2)
    assert c.complete("s", "u") == "recovered"
    assert len(fake.requests) == 2


def test_non_retryable_error_raises(fake_server):
    base, fake = fake_server
    fake.script = [(401, None)]
    c = OpenAICompatibleClient(base_url=base)
    with pytest.raises(RuntimeError, match="401"):
        c.complete("s", "u")


def test_env_config(monkeypatch, fake_server):
    base, fake = fake_server
    fake.script = [(200, "from-env")]
    monkeypatch.setenv("LLM_BASE_URL", base)
    monkeypatch.setenv("LLM_API_KEY", "")
    monkeypatch.setenv("LLM_MODEL", "env-model")
    c = OpenAICompatibleClient()
    assert c.complete("s", "u") == "from-env"
    path, headers, payload = fake.requests[0]
    assert payload["model"] == "env-model"
    assert "Authorization" not in headers


def test_planner_decompose_via_http_adapter(fake_server):
    """The adapter satisfies the same LLMClient contract the planner
    nodes consume (reference decomposition contract: JSON object with
    a 'queries' list)."""
    from parquet_pipeline_spark.plans import decompose_query

    base, fake = fake_server
    fake.script = [(200, '{"queries": ["max price?", "who is customer 5?"]}')]
    c = OpenAICompatibleClient(base_url=base)
    assert decompose_query("max price and who is customer 5", c) == [
        "max price?",
        "who is customer 5?",
    ]


def test_embedder_roundtrip_reassembles_by_index(fake_server):
    base, fake = fake_server
    e = OpenAICompatibleEmbedder(base_url=base, api_key="sk-emb", model="emb-1")
    out = e(["alpha", "bee"])
    # server answers in REVERSED order; client must restore by index
    assert out == [_fake_embedding("alpha"), _fake_embedding("bee")]
    path, headers, payload = fake.requests[0]
    assert path == "/v1/embeddings"
    assert headers["Authorization"] == "Bearer sk-emb"
    assert payload == {"model": "emb-1", "input": ["alpha", "bee"]}
    assert e([]) == []  # no HTTP call for an empty batch
    assert len(fake.requests) == 1


def test_embedder_retries_then_raises(fake_server):
    base, fake = fake_server
    fake.script = [(503, None)]
    e = OpenAICompatibleEmbedder(base_url=base, max_retries=1)
    assert e(["x"]) == [_fake_embedding("x")]
    assert len(fake.requests) == 2  # 503 then success
    fake.script = [(401, None)]
    with pytest.raises(RuntimeError, match="401"):
        e(["x"])


def test_embedder_env_fallback_chain(monkeypatch, fake_server):
    base, _ = fake_server
    monkeypatch.delenv("EMBEDDINGS_BASE_URL", raising=False)
    monkeypatch.setenv("LLM_BASE_URL", base)
    e = OpenAICompatibleEmbedder()
    assert e.base_url == base.rstrip("/")
    monkeypatch.setenv("EMBEDDINGS_BASE_URL", "http://emb.example/v1")
    assert OpenAICompatibleEmbedder().base_url == "http://emb.example/v1"


def test_default_embedder_env_selection(monkeypatch, fake_server):
    from parquet_pipeline_spark.operators.embedding import embed_query

    base, _ = fake_server
    monkeypatch.delenv("EMBEDDINGS_BASE_URL", raising=False)
    assert len(embed_query("hi", dim=8)) == 8  # keyless hash path
    monkeypatch.setenv("EMBEDDINGS_BASE_URL", base)
    assert embed_query("hi", dim=4) == _fake_embedding("hi")  # HTTP path
    # requested dim ≠ the remote model's dim must raise, not silently
    # drift the vector space with the environment
    with pytest.raises(ValueError, match="4-dim vectors but dim=64"):
        embed_query("hi")


def test_registered_e01_ignores_embeddings_env(monkeypatch, fake_server, spark):
    """The driver-verified e01 row shape is pinned to the explicit
    hash embedder — a configured EMBEDDINGS_BASE_URL must not
    reroute it."""
    base, _ = fake_server
    from parquet_pipeline_spark import registry

    registry.load_all()
    q = registry.QUERIES["e01_embed_documents"]
    baseline = q(spark, "/root/testdata/sf0.001").orderBy("doc_id").limit(3).collect()
    monkeypatch.setenv("EMBEDDINGS_BASE_URL", base)
    rerun = q(spark, "/root/testdata/sf0.001").orderBy("doc_id").limit(3).collect()
    assert rerun == baseline


def test_embed_text_with_http_embedder_end_to_end(fake_server, spark):
    """The adapter plugs into the mapInPandas embed stage unchanged:
    executors call the endpoint per text batch (closing A28 —
    reference chroma_ingestion_util.py:147-160)."""
    from parquet_pipeline_spark.operators.embedding import embed_text

    base, _ = fake_server
    df = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(6)], "doc_id long, text string"
    )
    e = OpenAICompatibleEmbedder(base_url=base)
    rows = {
        r["doc_id"]: r["embedding"]
        for r in embed_text(df, "text", "doc_id", embedder=e, batch_size=2).collect()
    }
    assert len(rows) == 6
    assert rows[3] == _fake_embedding("doc number 3")

"""Pluggable LLM client protocol.

The reference calls Azure OpenAI at five points per sub-query
(decompose, table-select, route, SQL-gen, summarize) and has a
deterministic fallback at every one (reference:
decomposition_util.py:79-84, multi_file_util.py:69-71,
langgraph_pipeline.py:346-349). We invert the default: the engine is
fully functional keyless (fallbacks are the primary path under
test), and an LLM client is an optional enhancement plugged in via
this protocol. No vendor SDK is imported anywhere.
"""

from __future__ import annotations

import json
from typing import Protocol, runtime_checkable


@runtime_checkable
class LLMClient(Protocol):
    """Minimal completion interface. Return a string; when
    ``json_mode`` is true the string must parse as JSON."""

    def complete(self, system: str, user: str, json_mode: bool = False) -> str: ...


class NullClient:
    """No-LLM client: every call raises, pushing callers onto their
    deterministic fallback — the keyless mode the tests run in."""

    def complete(self, system: str, user: str, json_mode: bool = False) -> str:
        raise RuntimeError("no LLM configured")


class FakeClient:
    """Canned-response client for prompt-contract tests (the
    reference's behavior is mocked the same way — SURVEY §7 risk
    register 'all LLM nodes must be mockable')."""

    def __init__(self, responses: list[str | dict]):
        self._responses = list(responses)
        self.calls: list[tuple[str, str]] = []

    def complete(self, system: str, user: str, json_mode: bool = False) -> str:
        self.calls.append((system, user))
        if not self._responses:
            raise RuntimeError("FakeClient exhausted")
        r = self._responses.pop(0)
        return json.dumps(r) if isinstance(r, dict) else r


class OpenAICompatibleClient:
    """HTTP adapter for any OpenAI-compatible chat-completions
    endpoint (the reference's client shape, minus the vendor SDK:
    its five call sites all reduce to system+user → content, JSON
    mode where the contract demands it — decomposition_util.py:5-22,
    multi_file_util.py:8-31).

    Config comes from args or environment:
    ``LLM_BASE_URL`` (e.g. ``http://localhost:8080/v1``),
    ``LLM_API_KEY`` (optional — omitted header when empty),
    ``LLM_MODEL``. Stdlib-only (urllib), bounded retries with
    exponential backoff on 429/5xx, hard timeout per request."""

    def __init__(
        self,
        base_url: str | None = None,
        api_key: str | None = None,
        model: str | None = None,
        timeout: float = 30.0,
        max_retries: int = 2,
        temperature: float = 0.0,
    ):
        import os

        self.base_url = (base_url or os.environ.get("LLM_BASE_URL", "")).rstrip("/")
        if not self.base_url:
            raise ValueError("OpenAICompatibleClient needs base_url or $LLM_BASE_URL")
        self.api_key = api_key if api_key is not None else os.environ.get("LLM_API_KEY", "")
        self.model = model or os.environ.get("LLM_MODEL", "gpt-4o-mini")
        self.timeout = timeout
        self.max_retries = max_retries
        self.temperature = temperature

    def complete(self, system: str, user: str, json_mode: bool = False) -> str:
        import time
        import urllib.error
        import urllib.request

        payload: dict = {
            "model": self.model,
            "messages": [
                {"role": "system", "content": system},
                {"role": "user", "content": user},
            ],
            "temperature": self.temperature,
        }
        if json_mode:
            payload["response_format"] = {"type": "json_object"}
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"

        def extract(data: dict) -> str:
            content = data["choices"][0]["message"]["content"]
            if json_mode:
                json.loads(content)  # enforce the contract here, not at the caller
            return content

        return _http_json_call(
            f"{self.base_url}/chat/completions",
            payload,
            headers,
            self.timeout,
            self.max_retries,
            extract,
            what="LLM",
        )


def _http_json_call(
    url: str,
    payload: dict,
    headers: dict,
    timeout: float,
    max_retries: int,
    extract,
    what: str = "HTTP",
):
    """Shared POST-JSON plumbing for the chat + embeddings adapters:
    bounded retries with exponential backoff on 429/5xx and on
    malformed responses (``extract`` runs inside the loop so a
    transiently-bad body is retried too), hard per-request timeout."""
    import time
    import urllib.error
    import urllib.request

    body = json.dumps(payload).encode()
    last_err: Exception | None = None
    for attempt in range(max_retries + 1):
        req = urllib.request.Request(url, data=body, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                data = json.loads(resp.read().decode())
            return extract(data)
        except urllib.error.HTTPError as e:
            last_err = e
            if e.code not in (429, 500, 502, 503, 504) or attempt == max_retries:
                raise RuntimeError(f"{what} endpoint error {e.code}") from e
        except (
            urllib.error.URLError,
            TimeoutError,
            KeyError,
            IndexError,
            ValueError,
        ) as e:
            last_err = e
            if attempt == max_retries:
                raise RuntimeError(f"{what} request failed: {e}") from e
        time.sleep(min(2.0, 0.2 * 2**attempt))
    raise RuntimeError(f"{what} request failed: {last_err}")


class OpenAICompatibleEmbedder:
    """HTTP adapter for any OpenAI-compatible ``/embeddings`` endpoint
    (the reference embeds via exactly this API shape —
    chroma_ingestion_util.py:147-160, .env-example:12), closing A28.

    Instances are callable with the ``Embedder`` signature
    ``list[str] -> list[list[float]]``, so they plug directly into
    ``embed_text`` / ``embed_query`` (operators/embedding.py) and ship
    to executors inside the ``mapInPandas`` closure (the object holds
    only strings/numbers — picklable by construction; each python
    worker then makes its own HTTP calls, one per text batch, which
    at 100 TB gives partition-parallel embedding with no driver
    bottleneck or thread pool).

    Config from args or env: ``EMBEDDINGS_BASE_URL`` (falls back to
    ``LLM_BASE_URL``), ``EMBEDDINGS_API_KEY`` (falls back to
    ``LLM_API_KEY``), ``EMBEDDINGS_MODEL``. Same stdlib urllib +
    retry/backoff plumbing as the chat client."""

    def __init__(
        self,
        base_url: str | None = None,
        api_key: str | None = None,
        model: str | None = None,
        timeout: float = 30.0,
        max_retries: int = 2,
    ):
        import os

        self.base_url = (
            base_url
            or os.environ.get("EMBEDDINGS_BASE_URL")
            or os.environ.get("LLM_BASE_URL", "")
        ).rstrip("/")
        if not self.base_url:
            raise ValueError(
                "OpenAICompatibleEmbedder needs base_url, $EMBEDDINGS_BASE_URL "
                "or $LLM_BASE_URL"
            )
        if api_key is not None:
            self.api_key = api_key
        else:
            self.api_key = os.environ.get("EMBEDDINGS_API_KEY") or os.environ.get(
                "LLM_API_KEY", ""
            )
        self.model = model or os.environ.get(
            "EMBEDDINGS_MODEL", "text-embedding-3-small"
        )
        self.timeout = timeout
        self.max_retries = max_retries

    def embed(self, texts: list[str]) -> list[list[float]]:
        if not texts:
            return []
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"

        def extract(data: dict) -> list[list[float]]:
            # the API may return items out of order; 'index' is the
            # contract for reassembly
            items = sorted(data["data"], key=lambda d: d["index"])
            if len(items) != len(texts):
                raise ValueError(
                    f"embedding count mismatch: sent {len(texts)}, got {len(items)}"
                )
            return [[float(x) for x in it["embedding"]] for it in items]

        return _http_json_call(
            f"{self.base_url}/embeddings",
            {"model": self.model, "input": list(texts)},
            headers,
            self.timeout,
            self.max_retries,
            extract,
            what="embeddings",
        )

    __call__ = embed

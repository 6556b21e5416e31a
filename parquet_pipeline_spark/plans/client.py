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

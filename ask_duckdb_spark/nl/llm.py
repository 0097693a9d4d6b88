"""LLM provider clients (C4–C6) with a deterministic offline stub.

Reference parity: an OpenAI-compatible client pointed at a Gemini-style
endpoint (query_llm.py:348-369), a Mistral-SDK client (:372-390), and
per-provider default models (:427-428, 485-486). Both network clients
run at temperature 0 with a 5000-token completion cap, like the
reference. The SDKs are optional imports — this container ships
neither — so tests and the driver run entirely on :class:`StubLLM`.
"""

from __future__ import annotations

import os
from collections.abc import Callable

__all__ = [
    "LLMCallError",
    "StubLLM",
    "ask_gemini",
    "ask_mistral",
    "get_provider",
    "DEFAULT_MODELS",
]


class LLMCallError(RuntimeError):
    """A provider call (or provider construction) failed.

    The CLI maps exactly this to EXIT_LLM_FAIL (reference:
    query_llm.py:487-489 scopes its handler to the provider call);
    bugs in context selection / dictionary parsing / repair must NOT
    masquerade as LLM failures (ADVICE r2).
    """

#: Per-provider default models (reference: query_llm.py:485-486).
DEFAULT_MODELS = {
    "gemini": "gemini-2.5-pro",
    "mistral": "mistral-large-latest",
    "stub": "stub-sql-0",
}

MAX_COMPLETION_TOKENS = 5000  # reference: query_llm.py:362,383
TEMPERATURE = 0  # reference: query_llm.py:361,382


class StubLLM:
    """Deterministic offline provider for tests and air-gapped runs.

    ``responses`` maps a substring of the *user* prompt to the canned
    raw completion (which may be fenced / aliased / typo'd to exercise
    the repair pipeline, SURVEY.md §5.2.4). First match in insertion
    order wins; ``default`` answers anything unmatched.
    """

    def __init__(self, responses: dict[str, str] | None = None, default: str = ""):
        self.responses = dict(responses or {})
        self.default = default
        self.calls: list[tuple[str, str]] = []  # (system, user) log for tests

    def __call__(self, system: str, user: str, model: str | None = None,
                 api_key: str | None = None) -> str:
        self.calls.append((system, user))
        for needle, canned in self.responses.items():
            if needle in user:
                return canned
        if self.default:
            return self.default
        raise RuntimeError(f"StubLLM has no canned answer for: {user!r}")


def _require_content(resp) -> str:
    """Shared response validation (reference: query_llm.py:364-369)."""
    if not resp.choices or getattr(resp.choices[0], "message", None) is None:
        raise RuntimeError("LLM returned no choices/message.")
    content = resp.choices[0].message.content
    if content is None:
        raise RuntimeError("LLM returned empty content.")
    return content


def ask_gemini(system: str, user: str, model: str | None = None,
               api_key: str | None = None) -> str:
    """Gemini via an OpenAI-compatible endpoint (query_llm.py:348-369)."""
    key = api_key or os.environ.get("GEMINI_API_KEY")
    if not key:
        raise RuntimeError("GEMINI_API_KEY not set.")
    try:
        from openai import OpenAI
    except ImportError as exc:  # SDK not in this container
        raise RuntimeError("openai SDK not installed.") from exc
    client = OpenAI(
        api_key=key,
        base_url="https://generativelanguage.googleapis.com/v1beta/openai/",
    )
    resp = client.chat.completions.create(
        model=model or DEFAULT_MODELS["gemini"],
        messages=[
            {"role": "system", "content": system},
            {"role": "user", "content": user},
        ],
        temperature=TEMPERATURE,
        max_completion_tokens=MAX_COMPLETION_TOKENS,
    )
    return _require_content(resp)


def ask_mistral(system: str, user: str, model: str | None = None,
                api_key: str | None = None) -> str:
    """Mistral native SDK client (query_llm.py:372-390)."""
    key = api_key or os.environ.get("MISTRAL_API_KEY")
    if not key:
        raise RuntimeError("MISTRAL_API_KEY not set.")
    try:
        from mistralai import Mistral
    except ImportError as exc:
        raise RuntimeError("mistralai SDK not installed.") from exc
    client = Mistral(api_key=key)
    resp = client.chat.complete(
        model=model or DEFAULT_MODELS["mistral"],
        messages=[
            {"role": "system", "content": system},
            {"role": "user", "content": user},
        ],
        temperature=TEMPERATURE,
        max_tokens=MAX_COMPLETION_TOKENS,
    )
    return _require_content(resp)


Provider = Callable[..., str]


def get_provider(name: str, stub: StubLLM | None = None) -> Provider:
    """Resolve a provider by name (C6, query_llm.py:427,485-486)."""
    if name == "gemini":
        return ask_gemini
    if name == "mistral":
        return ask_mistral
    if name == "stub":
        return stub or StubLLM()
    raise ValueError(f"unknown LLM provider: {name!r}")

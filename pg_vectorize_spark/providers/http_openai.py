"""OpenAI-schema embedding client (stdlib-only, no extra deps).

Speaks the same request/response shape as the reference's provider layer
(core/src/transformers/providers/openai.rs:83-124) and its vector-serve
microservice (vector-serve/app/routes/transform.py:23-77):

    POST {base}/embeddings  {"model": ..., "input": [...]}
    -> {"data": [{"embedding": [...], "index": i}, ...]}

Request batching: at most ``provider_request_cap`` (2048) inputs per HTTP
call (openai.rs:88-100); inputs longer than the per-input token cap are
whitespace-truncated to 8192 tokens (openai.rs:166-186). Timeout and retry
counts come from Config.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from collections.abc import Sequence

from pg_vectorize_spark.config import DEFAULT_CONFIG
from pg_vectorize_spark.errors import ProviderError
from pg_vectorize_spark.providers.base import ChatProvider, EmbeddingProvider


def trim_input(text: str, token_cap: int = 8_192) -> str:
    """Whitespace-token truncation (openai.rs:166-186)."""
    parts = text.split()
    if len(parts) <= token_cap:
        return text
    return " ".join(parts[:token_cap])


class OpenAISchemaEmbedder(EmbeddingProvider):
    def __init__(
        self,
        base_url: str,
        model: str,
        api_key: str | None = None,
        dim: int | None = None,
        timeout: float | None = None,
        request_cap: int | None = None,
        max_retries: int | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self._dim = dim
        self.timeout = timeout or DEFAULT_CONFIG.embedding_timeout_sec
        self.request_cap = request_cap or DEFAULT_CONFIG.provider_request_cap
        self.max_retries = (
            max_retries if max_retries is not None else DEFAULT_CONFIG.max_retries
        )

    def _post(self, path: str, payload: dict) -> dict:
        req = urllib.request.Request(
            f"{self.base_url}{path}",
            data=json.dumps(payload).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                **(
                    {"Authorization": f"Bearer {self.api_key}"}
                    if self.api_key
                    else {}
                ),
            },
            method="POST",
        )
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except (urllib.error.URLError, TimeoutError, json.JSONDecodeError) as e:
                last_err = e
                if attempt < self.max_retries:
                    time.sleep(min(2**attempt, 10))
        raise ProviderError(f"embedding request failed after retries: {last_err}")

    def generate_embedding(self, inputs: Sequence[str]) -> list[list[float]]:
        out: list[list[float]] = []
        cap = self.request_cap
        trimmed = [trim_input(t if t is not None else "") for t in inputs]
        for i in range(0, len(trimmed), cap):
            chunk = trimmed[i : i + cap]
            body = self._post("/embeddings", {"model": self.model, "input": chunk})
            data = sorted(body["data"], key=lambda d: d["index"])
            if len(data) != len(chunk):
                raise ProviderError(
                    f"provider returned {len(data)} vectors for {len(chunk)} inputs"
                )
            out.extend([d["embedding"] for d in data])
        if out and self._dim is None:
            self._dim = len(out[0])
        return out

    def model_dim(self) -> int:
        if self._dim is None:
            self._dim = len(self.generate_embedding(["dimension probe"])[0])
        return self._dim


class OpenAISchemaChat(ChatProvider):
    """POST {base}/chat/completions; reference: openai.rs:140-164."""

    def __init__(
        self,
        base_url: str,
        model: str,
        api_key: str | None = None,
        timeout: float | None = None,
    ):
        self._embedder = OpenAISchemaEmbedder(base_url, model, api_key, timeout=timeout)
        self.model = model

    def generate_response(self, messages: list[dict[str, str]]) -> str:
        body = self._embedder._post(
            "/chat/completions", {"model": self.model, "messages": messages}
        )
        try:
            return body["choices"][0]["message"]["content"]
        except (KeyError, IndexError) as e:
            raise ProviderError(f"malformed chat response: {e}")


class EchoChat(ChatProvider):
    """Deterministic offline chat provider for tests/RAG plumbing.

    Returns a stable digest of the rendered prompt so RAG tests can assert
    that context + question made it into the completion call.
    """

    def generate_response(self, messages: list[dict[str, str]]) -> str:
        user = next(
            (m["content"] for m in messages if m.get("role") == "user"), ""
        )
        return f"ECHO[{len(messages)} msgs]: {user[:200]}"

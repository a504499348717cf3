"""Native wire-format HTTP embedding/chat clients (stdlib-only).

Each provider speaks its REAL request/response schema, matching the
reference's provider layer byte-for-byte on the wire:

- Cohere   — ``POST {base}/embed`` with ``{"model", "texts", "input_type":
  "search_document", "truncate": "END"}`` and a Bearer key; response
  ``{"embeddings": [[...], ...]}``
  (core/src/transformers/providers/cohere.rs:33-99);
- Voyage   — ``POST {base}/embeddings`` with ``{"input", "model",
  "input_type": "document"}`` and a Bearer key; response
  ``{"data": [{"embedding": [...]}, ...]}`` in input order
  (core/src/transformers/providers/voyage.rs:17-103);
- Ollama   — ``POST {base}/api/embed`` with ``{"model", "input": [...]}``,
  no auth; response ``{"embeddings": [[...], ...]}``; model dim is
  discovered by probe embedding (core/src/transformers/providers/
  ollama.rs:36-66); chat is ``POST {base}/api/generate`` with the messages
  joined by blank lines, ``stream: false`` -> ``{"response": ...}``
  (ollama.rs:69-84);
- Portkey  — OpenAI request/response schema but authenticated with the
  ``x-portkey-api-key`` / ``x-portkey-virtual-key`` headers instead of a
  Bearer token, with the 8192-token input trim
  (core/src/transformers/providers/portkey.rs:46-121).

All clients share the retrying JSON POST and the request_cap batching loop
(at most ``provider_request_cap`` inputs per HTTP call, openai.rs:88-100).
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
from pg_vectorize_spark.providers.http_openai import trim_input


def post_json(
    url: str,
    payload: dict,
    headers: dict[str, str],
    timeout: float,
    max_retries: int,
) -> dict:
    """POST JSON with exponential-backoff retries; shared by all clients."""
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json", **headers},
        method="POST",
    )
    last_err: Exception | None = None
    for attempt in range(max_retries + 1):
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except (urllib.error.URLError, TimeoutError, json.JSONDecodeError) as e:
            last_err = e
            if attempt < max_retries:
                time.sleep(min(2**attempt, 10))
    raise ProviderError(f"provider request failed after retries: {last_err}")


class _BaseHttpEmbedder(EmbeddingProvider):
    """Template: batching + retry loop; subclasses define the wire format."""

    path = "/embeddings"
    trim_tokens: int | None = None  # whitespace-token cap applied client-side

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

    # -- wire format hooks ---------------------------------------------------

    def _headers(self) -> dict[str, str]:
        return (
            {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}
        )

    def _body(self, chunk: list[str]) -> dict:
        raise NotImplementedError

    def _parse(self, resp: dict, n_inputs: int) -> list[list[float]]:
        raise NotImplementedError

    # -- shared loop ---------------------------------------------------------

    def generate_embedding(self, inputs: Sequence[str]) -> list[list[float]]:
        texts = [t if t is not None else "" for t in inputs]
        if self.trim_tokens is not None:
            texts = [trim_input(t, self.trim_tokens) for t in texts]
        out: list[list[float]] = []
        for i in range(0, len(texts), self.request_cap):
            chunk = texts[i : i + self.request_cap]
            resp = post_json(
                f"{self.base_url}{self.path}",
                self._body(chunk),
                self._headers(),
                self.timeout,
                self.max_retries,
            )
            vecs = self._parse(resp, len(chunk))
            if len(vecs) != len(chunk):
                raise ProviderError(
                    f"provider returned {len(vecs)} vectors for "
                    f"{len(chunk)} inputs"
                )
            out.extend(vecs)
        if out and self._dim is None:
            self._dim = len(out[0])
        return out

    def model_dim(self) -> int:
        # probe-embedding dim discovery (ollama.rs:58-67 — shared behavior)
        if self._dim is None:
            self._dim = len(self.generate_embedding(["dimension probe"])[0])
        return self._dim


class CohereEmbedder(_BaseHttpEmbedder):
    """Cohere /embed wire format (cohere.rs:33-99)."""

    path = "/embed"

    def _headers(self) -> dict[str, str]:
        return {"Accept": "application/json", **super()._headers()}

    def _body(self, chunk: list[str]) -> dict:
        return {
            "model": self.model,
            "texts": chunk,
            "input_type": "search_document",
            "truncate": "END",
        }

    def _parse(self, resp: dict, n_inputs: int) -> list[list[float]]:
        try:
            return [list(map(float, v)) for v in resp["embeddings"]]
        except (KeyError, TypeError) as e:
            raise ProviderError(f"malformed cohere response: {e}")


class VoyageEmbedder(_BaseHttpEmbedder):
    """Voyage /embeddings wire format (voyage.rs:17-103)."""

    def _body(self, chunk: list[str]) -> dict:
        return {
            "input": chunk,
            "model": self.model,
            "input_type": "document",
        }

    def _parse(self, resp: dict, n_inputs: int) -> list[list[float]]:
        try:
            return [list(map(float, d["embedding"])) for d in resp["data"]]
        except (KeyError, TypeError) as e:
            raise ProviderError(f"malformed voyage response: {e}")


class OllamaEmbedder(_BaseHttpEmbedder):
    """Ollama /api/embed wire format (ollama.rs:36-55); no auth header."""

    path = "/api/embed"

    def _headers(self) -> dict[str, str]:
        return {}

    def _body(self, chunk: list[str]) -> dict:
        return {"model": self.model, "input": chunk}

    def _parse(self, resp: dict, n_inputs: int) -> list[list[float]]:
        try:
            return [list(map(float, v)) for v in resp["embeddings"]]
        except (KeyError, TypeError) as e:
            raise ProviderError(f"malformed ollama response: {e}")


class PortkeyEmbedder(_BaseHttpEmbedder):
    """OpenAI schema behind Portkey gateway headers (portkey.rs:46-89)."""

    trim_tokens = 8_192  # MAX_TOKEN_LEN (portkey.rs:15)

    def __init__(self, *args, virtual_key: str | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.virtual_key = virtual_key

    def _headers(self) -> dict[str, str]:
        h = {"Accept": "application/json"}
        if self.api_key:
            h["x-portkey-api-key"] = self.api_key
        if self.virtual_key:
            h["x-portkey-virtual-key"] = self.virtual_key
        return h

    def _body(self, chunk: list[str]) -> dict:
        return {"model": self.model, "input": chunk}

    def _parse(self, resp: dict, n_inputs: int) -> list[list[float]]:
        try:
            return [list(map(float, d["embedding"])) for d in resp["data"]]
        except (KeyError, TypeError) as e:
            raise ProviderError(f"malformed portkey response: {e}")


class OllamaChat(ChatProvider):
    """Ollama /api/generate: messages joined by blank lines into one prompt,
    non-streamed (ollama.rs:69-84)."""

    def __init__(
        self, base_url: str, model: str, timeout: float | None = None
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.timeout = timeout or DEFAULT_CONFIG.embedding_timeout_sec

    def generate_response(self, messages: list[dict[str, str]]) -> str:
        prompt = "\n\n".join(m.get("content", "") for m in messages)
        resp = post_json(
            f"{self.base_url}/api/generate",
            {"model": self.model, "prompt": prompt, "stream": False},
            {},
            self.timeout,
            DEFAULT_CONFIG.max_retries,
        )
        try:
            return resp["response"]
        except KeyError as e:
            raise ProviderError(f"malformed ollama chat response: {e}")


class PortkeyChat(ChatProvider):
    """OpenAI chat schema with Portkey gateway headers (portkey.rs:103-121)."""

    def __init__(
        self,
        base_url: str,
        model: str,
        api_key: str | None = None,
        virtual_key: str | None = None,
        timeout: float | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.virtual_key = virtual_key
        self.timeout = timeout or DEFAULT_CONFIG.embedding_timeout_sec

    def generate_response(self, messages: list[dict[str, str]]) -> str:
        headers = {"Accept": "application/json"}
        if self.api_key:
            headers["x-portkey-api-key"] = self.api_key
        if self.virtual_key:
            headers["x-portkey-virtual-key"] = self.virtual_key
        resp = post_json(
            f"{self.base_url}/chat/completions",
            {"model": self.model, "messages": messages},
            headers,
            self.timeout,
            DEFAULT_CONFIG.max_retries,
        )
        try:
            return resp["choices"][0]["message"]["content"]
        except (KeyError, IndexError) as e:
            raise ProviderError(f"malformed portkey chat response: {e}")


__all__ = [
    "CohereEmbedder",
    "VoyageEmbedder",
    "OllamaEmbedder",
    "PortkeyEmbedder",
    "OllamaChat",
    "PortkeyChat",
    "post_json",
]

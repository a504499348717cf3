"""Model-name parsing and provider dispatch.

Mirrors the reference's model registry (core/src/types.rs:233-300,
core/src/transformers/providers/mod.rs:52-79):

- model names are ``source/namespace/name`` with at most 3 slash-separated
  parts;
- a known source prefix (openai, cohere, ollama, portkey, voyage,
  sentence-transformers, local) selects the provider;
- an UNKNOWN source defaults to SentenceTransformers (hot-loadable HF model)
  — here that maps to the OpenAI-schema HTTP provider if an endpoint is
  configured, else the deterministic local embedder;
- legacy bare names (no slash) are special-cased to SentenceTransformers
  (core/src/types.rs:286-300).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from enum import Enum

from pg_vectorize_spark.errors import ModelError
from pg_vectorize_spark.providers.base import EmbeddingProvider
from pg_vectorize_spark.providers.local import DEFAULT_DIM, LocalHashEmbedder

# dims the reference hard-codes per provider (openai.rs:131-138, cohere.rs:15-26)
KNOWN_DIMS = {
    "openai/text-embedding-ada-002": 1536,
    "openai/text-embedding-3-small": 1536,
    "openai/text-embedding-3-large": 3072,
    "cohere/embed-english-v3.0": 1024,
    "cohere/embed-english-light-v3.0": 384,
    "cohere/embed-multilingual-v3.0": 1024,
    "cohere/embed-multilingual-light-v3.0": 384,
    "cohere/embed-english-v2.0": 4096,
    "cohere/embed-english-light-v2.0": 1024,
    "cohere/embed-multilingual-v2.0": 768,
    "sentence-transformers/all-MiniLM-L6-v2": 384,
    "sentence-transformers/all-MiniLM-L12-v2": 384,
}


class ModelSource(str, Enum):
    OPENAI = "openai"
    COHERE = "cohere"
    OLLAMA = "ollama"
    PORTKEY = "portkey"
    VOYAGE = "voyage"
    SENTENCE_TRANSFORMERS = "sentence-transformers"
    LOCAL = "local"


_KNOWN_SOURCES = {s.value for s in ModelSource}


@dataclass(frozen=True)
class Model:
    source: ModelSource
    name: str  # namespace/name remainder
    fullname: str  # original string

    @property
    def api_name(self) -> str:
        return self.name


def parse_model(model: str) -> Model:
    """Parse ``source/namespace/name`` (<=3 parts, core/src/types.rs:233-266)."""
    if not model or not isinstance(model, str):
        raise ModelError(f"invalid model name: {model!r}")
    parts = model.split("/")
    if len(parts) > 3:
        raise ModelError(f"model name has too many parts (max 3): {model!r}")
    if len(parts) == 1:
        # legacy bare name -> sentence-transformers (core/src/types.rs:286-300)
        return Model(ModelSource.SENTENCE_TRANSFORMERS, parts[0], model)
    src = parts[0]
    rest = "/".join(parts[1:])
    if src in _KNOWN_SOURCES:
        return Model(ModelSource(src), rest, model)
    # unknown source defaults to sentence-transformers with the FULL name as
    # the model id (hot-loadable HF org/model, core/src/types.rs:254-262)
    return Model(ModelSource.SENTENCE_TRANSFORMERS, model, model)


def model_dim(model: Model, probe: EmbeddingProvider | None = None) -> int:
    """Dimension lookup: static table, local spec, or probe-embedding.

    The probe fallback mirrors Ollama's discover-by-embedding
    (core/src/transformers/providers/ollama.rs:58-67). A provider marked
    ``is_fallback`` (hermetic local stand-in for an unconfigured HTTP
    source) takes priority over KNOWN_DIMS — the job must record the dim
    of the vectors actually stored, not the real service's dim.
    """
    if probe is not None and getattr(probe, "is_fallback", False):
        return probe.model_dim()
    if model.fullname in KNOWN_DIMS:
        return KNOWN_DIMS[model.fullname]
    if model.source == ModelSource.LOCAL:
        return _local_dim(model)
    if probe is not None:
        return len(probe.generate_embedding(["dimension probe"])[0])
    raise ModelError(f"unknown model dimension: {model.fullname}")


def _local_dim(model: Model) -> int:
    # local/hash-embedder-<dim>
    name = model.name
    if "-" in name:
        tail = name.rsplit("-", 1)[1]
        if tail.isdigit():
            return int(tail)
    return DEFAULT_DIM


def get_provider(
    model_name: str,
    api_key: str | None = None,
    url: str | None = None,
) -> EmbeddingProvider:
    """Dispatch a model name to a provider instance.

    - ``local/...`` -> deterministic hashing embedder;
    - each HTTP source gets its NATIVE wire client: Cohere ``/embed``
      (cohere.rs:33-99), Ollama ``/api/embed`` (ollama.rs:36-55), Voyage
      ``/embeddings`` (voyage.rs:17-103), Portkey gateway headers
      (portkey.rs:46-89); OpenAI and sentence-transformers speak the
      OpenAI schema (the reference's vector-serve does too,
      vector-serve/app/routes/transform.py:23-77).
    - api_key resolution: explicit arg, else the source's own env var
      (OPENAI_API_KEY, CO_API_KEY, VOYAGE_API_KEY, PORTKEY_API_KEY,
      EMBEDDING_SVC_API_KEY — matching the reference's lookup chain).
    Falls back to the local embedder when no endpoint is configured and no
    key was supplied — keeps tests hermetic.
    """
    model = parse_model(model_name)
    if model.source == ModelSource.LOCAL:
        return LocalHashEmbedder(dim=_local_dim(model))

    endpoint = url or _default_endpoint(model.source)
    if endpoint:
        from pg_vectorize_spark.providers import http_native
        from pg_vectorize_spark.providers.http_openai import OpenAISchemaEmbedder

        dim = KNOWN_DIMS.get(model.fullname)
        key = api_key or _default_api_key(model.source)
        if model.source == ModelSource.COHERE:
            return http_native.CohereEmbedder(
                endpoint, model.api_name, api_key=key, dim=dim
            )
        if model.source == ModelSource.OLLAMA:
            return http_native.OllamaEmbedder(endpoint, model.api_name, dim=dim)
        if model.source == ModelSource.VOYAGE:
            return http_native.VoyageEmbedder(
                endpoint, model.api_name, api_key=key, dim=dim
            )
        if model.source == ModelSource.PORTKEY:
            return http_native.PortkeyEmbedder(
                endpoint,
                model.api_name,
                api_key=key,
                dim=dim,
                virtual_key=os.environ.get("PORTKEY_VIRTUAL_KEY"),
            )
        return OpenAISchemaEmbedder(
            endpoint, model.api_name, api_key=key, dim=dim
        )
    if api_key is not None:
        # a supplied key signals intent to reach the real service; a silent
        # 64-dim local fallback would store vectors the job's recorded dim
        # doesn't match. The reference always has a default endpoint
        # (openai.rs:15); this engine requires one explicitly.
        raise ModelError(
            f"api_key supplied for {model_name!r} but no endpoint is "
            f"configured (set {_endpoint_env(model.source)} or pass url=)"
        )
    fallback = LocalHashEmbedder()
    fallback.is_fallback = True
    return fallback


def get_chat_provider(
    model_name: str,
    api_key: str | None = None,
    url: str | None = None,
):
    """Dispatch a chat model name to a chat provider, matching the
    reference's call_chat_completions source switch
    (extension/src/chat/ops.rs:138-192): OpenAI and sentence-transformers
    speak the OpenAI chat schema, Ollama uses /api/generate, Portkey the
    gateway headers; Cohere/Voyage are not chat providers (reference
    errors likewise). ``local/...`` returns the deterministic EchoChat so
    hermetic tests and offline RAG keep working.
    """
    model = parse_model(model_name)
    if model.source == ModelSource.LOCAL:
        from pg_vectorize_spark.providers.http_openai import EchoChat

        return EchoChat()
    if model.source in (ModelSource.COHERE, ModelSource.VOYAGE):
        raise ModelError(
            f"{model.source.value} is not supported for chat completions"
        )
    endpoint = url or _default_endpoint(model.source)
    if not endpoint:
        raise ModelError(
            f"no chat endpoint configured for {model_name!r} "
            f"(set {_endpoint_env(model.source)} or pass url=)"
        )
    key = api_key or _default_api_key(model.source)
    if model.source == ModelSource.OLLAMA:
        from pg_vectorize_spark.providers.http_native import OllamaChat

        return OllamaChat(endpoint, model.api_name)
    if model.source == ModelSource.PORTKEY:
        from pg_vectorize_spark.providers.http_native import PortkeyChat

        return PortkeyChat(
            endpoint,
            model.api_name,
            api_key=key,
            virtual_key=os.environ.get("PORTKEY_VIRTUAL_KEY"),
        )
    from pg_vectorize_spark.providers.http_openai import OpenAISchemaChat

    return OpenAISchemaChat(endpoint, model.api_name, api_key=key)


_ENDPOINT_ENV = {
    ModelSource.OPENAI: "OPENAI_BASE_URL",
    ModelSource.COHERE: "COHERE_BASE_URL",
    ModelSource.OLLAMA: "OLLAMA_BASE_URL",
    ModelSource.PORTKEY: "PORTKEY_BASE_URL",
    ModelSource.VOYAGE: "VOYAGE_BASE_URL",
    ModelSource.SENTENCE_TRANSFORMERS: "EMBEDDING_SVC_URL",
}


_API_KEY_ENV = {
    ModelSource.OPENAI: "OPENAI_API_KEY",         # openai.rs:66
    ModelSource.COHERE: "CO_API_KEY",             # cohere.rs:60
    ModelSource.OLLAMA: None,                     # ollama has no auth
    ModelSource.PORTKEY: "PORTKEY_API_KEY",       # portkey.rs:31
    ModelSource.VOYAGE: "VOYAGE_API_KEY",         # voyage.rs:60
    ModelSource.SENTENCE_TRANSFORMERS: "EMBEDDING_SVC_API_KEY",  # vector_serve.rs:36
}


def _default_api_key(source: ModelSource) -> str | None:
    env = _API_KEY_ENV.get(source)
    return os.environ.get(env) if env else None


def _endpoint_env(source: ModelSource) -> str:
    return _ENDPOINT_ENV[source]


def _default_endpoint(source: ModelSource) -> str | None:
    return os.environ.get(_ENDPOINT_ENV[source])

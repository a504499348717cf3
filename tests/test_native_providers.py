"""Native provider wire-format tests against schema-strict stub servers.

Each stub validates the EXACT request shape its real counterpart expects
(path, body fields, auth headers) and answers in that provider's native
response schema — a stub speaking only the Cohere schema would reject the
OpenAI-schema client, which is precisely the round-1 gap being closed
(cohere.rs:33-99, ollama.rs:36-84, voyage.rs:17-103, portkey.rs:46-121).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from pg_vectorize_spark.providers.http_native import (
    CohereEmbedder,
    OllamaChat,
    OllamaEmbedder,
    PortkeyChat,
    PortkeyEmbedder,
    VoyageEmbedder,
)


class _SchemaStrictHandler(BaseHTTPRequestHandler):
    """Routes to per-schema endpoints; 400s on any schema violation."""

    calls: list[dict] = []
    dim = 4

    def log_message(self, *a):
        pass

    def _reply(self, code: int, payload: dict):
        data = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_POST(self):
        cls = type(self)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        cls.calls.append(
            {"path": self.path, "body": body, "headers": dict(self.headers)}
        )
        vec = lambda t: [float(len(t))] * cls.dim  # noqa: E731

        if self.path == "/cohere/embed":
            # cohere.rs:33-50: model/texts/input_type/truncate, Bearer auth
            if set(body) != {"model", "texts", "input_type", "truncate"}:
                return self._reply(400, {"error": f"bad fields {set(body)}"})
            if body["input_type"] != "search_document" or body["truncate"] != "END":
                return self._reply(400, {"error": "bad constants"})
            if not self.headers.get("Authorization", "").startswith("Bearer "):
                return self._reply(401, {"error": "missing bearer"})
            return self._reply(
                200, {"embeddings": [vec(t) for t in body["texts"]]}
            )

        if self.path == "/ollama/api/embed":
            # ollama /api/embed: model/input, no auth
            if set(body) != {"model", "input"}:
                return self._reply(400, {"error": f"bad fields {set(body)}"})
            return self._reply(
                200, {"embeddings": [vec(t) for t in body["input"]]}
            )

        if self.path == "/ollama/api/generate":
            if set(body) != {"model", "prompt", "stream"} or body["stream"]:
                return self._reply(400, {"error": "bad generate body"})
            return self._reply(200, {"response": f"gen: {body['prompt']}"})

        if self.path == "/voyage/embeddings":
            # voyage.rs:17-32: input/model/input_type='document', Bearer
            if set(body) != {"input", "model", "input_type"}:
                return self._reply(400, {"error": f"bad fields {set(body)}"})
            if body["input_type"] != "document":
                return self._reply(400, {"error": "bad input_type"})
            if not self.headers.get("Authorization", "").startswith("Bearer "):
                return self._reply(401, {"error": "missing bearer"})
            return self._reply(
                200, {"data": [{"embedding": vec(t)} for t in body["input"]]}
            )

        if self.path == "/portkey/embeddings":
            # portkey.rs:70-80: OpenAI body + x-portkey-* headers, NO Bearer
            if set(body) != {"model", "input"}:
                return self._reply(400, {"error": f"bad fields {set(body)}"})
            if "Authorization" in self.headers:
                return self._reply(401, {"error": "unexpected bearer"})
            if not self.headers.get("x-portkey-api-key") or not self.headers.get(
                "x-portkey-virtual-key"
            ):
                return self._reply(401, {"error": "missing portkey headers"})
            return self._reply(
                200,
                {
                    "data": [
                        {"index": i, "embedding": vec(t)}
                        for i, t in enumerate(body["input"])
                    ]
                },
            )

        if self.path == "/portkey/chat/completions":
            if not self.headers.get("x-portkey-api-key"):
                return self._reply(401, {"error": "missing portkey headers"})
            return self._reply(
                200,
                {
                    "choices": [
                        {
                            "message": {
                                "content": f"pk: {body['messages'][-1]['content']}"
                            }
                        }
                    ]
                },
            )

        return self._reply(404, {"error": f"unknown path {self.path}"})


@pytest.fixture()
def stub():
    _SchemaStrictHandler.calls = []
    server = ThreadingHTTPServer(("127.0.0.1", 0), _SchemaStrictHandler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_cohere_wire_format(stub):
    emb = CohereEmbedder(f"{stub}/cohere", "embed-english-v3.0", api_key="ck")
    vecs = emb.generate_embedding(["a", "bb"])
    assert [v[0] for v in vecs] == [1.0, 2.0]
    assert emb.model_dim() == 4
    sent = _SchemaStrictHandler.calls[0]["body"]
    assert sent["texts"] == ["a", "bb"] and "input" not in sent


def test_ollama_wire_format_and_probe_dim(stub):
    emb = OllamaEmbedder(f"{stub}/ollama", "nomic-embed-text")
    assert emb.model_dim() == 4  # probe-embedding discovery
    vecs = emb.generate_embedding(["xyz"])
    assert vecs == [[3.0] * 4]
    assert "Authorization" not in _SchemaStrictHandler.calls[-1]["headers"]


def test_ollama_chat_joins_messages(stub):
    chat = OllamaChat(f"{stub}/ollama", "llama2")
    out = chat.generate_response(
        [{"role": "system", "content": "ctx"}, {"role": "user", "content": "q"}]
    )
    assert out == "gen: ctx\n\nq"


def test_voyage_wire_format(stub):
    emb = VoyageEmbedder(f"{stub}/voyage", "voyage-2", api_key="vk")
    vecs = emb.generate_embedding(["abcd"])
    assert vecs == [[4.0] * 4]
    assert _SchemaStrictHandler.calls[0]["body"]["input_type"] == "document"


def test_portkey_headers_not_bearer(stub):
    emb = PortkeyEmbedder(
        f"{stub}/portkey", "text-embedding-3-small",
        api_key="pk", virtual_key="vk",
    )
    vecs = emb.generate_embedding(["ab"])
    assert vecs == [[2.0] * 4]
    h = {
        k.lower(): v
        for k, v in _SchemaStrictHandler.calls[0]["headers"].items()
    }
    assert h.get("x-portkey-api-key") == "pk"
    assert h.get("x-portkey-virtual-key") == "vk"
    assert "authorization" not in h


def test_portkey_chat(stub):
    chat = PortkeyChat(
        f"{stub}/portkey", "gpt-x", api_key="pk", virtual_key="vk"
    )
    assert chat.generate_response(
        [{"role": "user", "content": "hi"}]
    ) == "pk: hi"


def test_registry_dispatches_native_clients(stub, monkeypatch):
    from pg_vectorize_spark.providers.registry import get_provider

    monkeypatch.setenv("COHERE_BASE_URL", f"{stub}/cohere")
    monkeypatch.setenv("CO_API_KEY", "env-cohere-key")
    monkeypatch.setenv("OLLAMA_BASE_URL", f"{stub}/ollama")
    monkeypatch.setenv("VOYAGE_BASE_URL", f"{stub}/voyage")
    monkeypatch.setenv("VOYAGE_API_KEY", "env-voyage-key")
    monkeypatch.setenv("PORTKEY_BASE_URL", f"{stub}/portkey")
    monkeypatch.setenv("PORTKEY_API_KEY", "env-pk")
    monkeypatch.setenv("PORTKEY_VIRTUAL_KEY", "env-vk")

    co = get_provider("cohere/embed-english-v3.0")
    assert isinstance(co, CohereEmbedder)
    assert co.api_key == "env-cohere-key"  # CO_API_KEY fallback (cohere.rs:60)
    assert len(co.generate_embedding(["x"])) == 1

    ol = get_provider("ollama/nomic-embed-text")
    assert isinstance(ol, OllamaEmbedder)
    assert len(ol.generate_embedding(["x"])) == 1

    vo = get_provider("voyage/voyage-2")
    assert isinstance(vo, VoyageEmbedder)
    assert len(vo.generate_embedding(["x"])) == 1

    pk = get_provider("portkey/text-embedding-3-small")
    assert isinstance(pk, PortkeyEmbedder)
    assert pk.virtual_key == "env-vk"
    assert len(pk.generate_embedding(["x"])) == 1


def test_registry_known_dim_used_without_probe(stub, monkeypatch):
    from pg_vectorize_spark.providers.registry import (
        get_provider,
        model_dim,
        parse_model,
    )

    monkeypatch.setenv("COHERE_BASE_URL", f"{stub}/cohere")
    monkeypatch.setenv("CO_API_KEY", "k")
    p = get_provider("cohere/embed-multilingual-v2.0")
    assert model_dim(parse_model("cohere/embed-multilingual-v2.0"), probe=p) == 768
    # no HTTP call was needed for the dim
    assert _SchemaStrictHandler.calls == []


class TestChatDispatch:
    """call_chat_completions source switch parity (ops.rs:138-192)."""

    def test_ollama_chat_dispatch(self, stub, monkeypatch):
        from pg_vectorize_spark.providers.registry import get_chat_provider

        monkeypatch.setenv("OLLAMA_BASE_URL", f"{stub}/ollama")
        chat = get_chat_provider("ollama/llama2")
        assert isinstance(chat, OllamaChat)
        assert chat.generate_response(
            [{"role": "user", "content": "hi"}]
        ) == "gen: hi"

    def test_portkey_chat_dispatch(self, stub, monkeypatch):
        from pg_vectorize_spark.providers.registry import get_chat_provider

        monkeypatch.setenv("PORTKEY_BASE_URL", f"{stub}/portkey")
        monkeypatch.setenv("PORTKEY_API_KEY", "k")
        monkeypatch.setenv("PORTKEY_VIRTUAL_KEY", "v")
        chat = get_chat_provider("portkey/gpt-x")
        assert isinstance(chat, PortkeyChat)
        assert chat.generate_response(
            [{"role": "user", "content": "yo"}]
        ) == "pk: yo"

    def test_cohere_chat_rejected(self):
        from pg_vectorize_spark.errors import ModelError
        from pg_vectorize_spark.providers.registry import get_chat_provider

        with pytest.raises(ModelError, match="not supported for chat"):
            get_chat_provider("cohere/command-r")

    def test_unconfigured_endpoint_raises(self, monkeypatch):
        from pg_vectorize_spark.errors import ModelError
        from pg_vectorize_spark.providers.registry import get_chat_provider

        monkeypatch.delenv("OPENAI_BASE_URL", raising=False)
        with pytest.raises(ModelError, match="no chat endpoint"):
            get_chat_provider("openai/gpt-4o-mini")

    def test_local_echo_chat(self):
        from pg_vectorize_spark.providers.http_openai import EchoChat
        from pg_vectorize_spark.providers.registry import get_chat_provider

        assert isinstance(get_chat_provider("local/echo"), EchoChat)

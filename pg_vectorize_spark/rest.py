"""REST facade — the reference server's HTTP surface on the Spark engine.

Mirrors server/src/server.rs:5-13 + routes:

- ``POST /api/v1/table``            create job   (routes/table.rs:25-110)
- ``DELETE /api/v1/table/{job}``    delete job
- ``GET|POST /api/v1/search``       hybrid search (routes/search.rs:110-136)
- ``GET /health`` ``/health/live`` ``/health/ready``  (routes/health.rs:80-87)
- ``POST /v1/embeddings``           OpenAI-schema embed, the vector-serve
  surface (vector-serve/app/routes/transform.py:23-77): batch input,
  optional L2 normalize, hf_ bearer token passthrough
- ``GET /v1/info[/]``               model metadata (routes/info.py:19-42):
  {model, max_seq_len, embedding_dimension}

Search params (routes/search.rs:16-84): job_name, query, window_size=5x
limit, limit=10, rrf_k=60, semantic_wt=1.0, fts_wt=1.0 — and every UNKNOWN
query parameter flattens into a typed column filter (the ``"op.value"``
mini-language). stdlib http.server only — a demo/parity surface, not a
production web stack; run_in_thread() is for tests.
"""

from __future__ import annotations

import json
import math
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from pg_vectorize_spark.engine import VectorizeSession
from pg_vectorize_spark.errors import (
    FilterParseError,
    InvalidIdentifierError,
    JobAlreadyExistsError,
    JobNotFoundError,
    VectorizeError,
)

_KNOWN_SEARCH_PARAMS = {
    "job_name", "query", "limit", "window_size", "rrf_k",
    "semantic_wt", "fts_wt", "rank", "diversify", "diversify_pool",
}

_VALID_RANKS = {"overlap", "cover_density", "bm25"}

DEFAULT_EMBED_BATCH_SIZE = 1000


def embed_batch_size() -> int:
    """vector-serve's per-request embed batch cap (transform.py:15, env
    override). Read lazily at request time, namespaced first: vector-serve
    reads bare ``BATCH_SIZE`` but runs in its own container, while this
    module lives inside a shared Spark driver process where an unrelated
    ``BATCH_SIZE`` could collide. Invalid/non-positive values fall back to
    the default instead of crashing the server."""
    raw = os.environ.get(
        "SPARK_GRAFT_EMBED_BATCH_SIZE", os.environ.get("BATCH_SIZE", "")
    )
    try:
        n = int(raw)
    except ValueError:
        return DEFAULT_EMBED_BATCH_SIZE
    return n if n >= 1 else DEFAULT_EMBED_BATCH_SIZE

#: max sequence length reported by /v1/info — the reference reads it off the
#: loaded SentenceTransformer (256 for the MiniLM defaults); HTTP providers
#: use their documented context limits, the local embedder is unbounded
MAX_SEQ_LENS = {
    "sentence-transformers/all-MiniLM-L6-v2": 256,
    "sentence-transformers/all-MiniLM-L12-v2": 256,
    "openai/text-embedding-ada-002": 8191,
    "openai/text-embedding-3-small": 8191,
    "openai/text-embedding-3-large": 8191,
}
DEFAULT_MAX_SEQ_LEN = 512


def _org_model_name(model: str) -> str:
    """vector-serve's model_org_name (app/models.py:57-62): bare names get
    the default org prefix."""
    if "/" not in model:
        return f"sentence-transformers/{model}"
    return model


def _hf_token(authorization: str | None) -> str | None:
    """vector-serve's parse_header (app/models.py:30-38): only hf_ bearer
    tokens pass through."""
    if authorization:
        token = authorization.split()[-1]
        if token.startswith("hf_"):
            return token
    return None


def _search_args(params: dict[str, str]) -> tuple[dict, dict[str, str]]:
    limit = int(params.get("limit", 10))
    window = params.get("window_size")
    args = {
        "num_results": limit,
        "window_size": int(window) if window is not None else 5 * limit,
        "rrf_k": int(params.get("rrf_k", 60)),
        "semantic_weight": float(params.get("semantic_wt", 1.0)),
        "fts_weight": float(params.get("fts_wt", 1.0)),
        "rank": params.get("rank", "overlap"),
    }
    if args["num_results"] < 1 or args["window_size"] < 1 or args["rrf_k"] < 0:
        raise ValueError(
            "limit and window_size must be >= 1, rrf_k must be >= 0"
        )
    if "diversify" in params:
        div = float(params["diversify"])
        if not 0.0 <= div <= 1.0:
            raise ValueError("diversify must be in [0, 1]")
        args["diversify"] = div
        dp = int(params.get("diversify_pool", 50))
        if dp < 1:
            raise ValueError("diversify_pool must be >= 1")
        args["diversify_pool"] = dp
    if args["rank"] not in _VALID_RANKS:
        raise ValueError(
            f"rank must be one of {sorted(_VALID_RANKS)}, got {args['rank']!r}"
        )
    filters = {
        k: v for k, v in params.items() if k not in _KNOWN_SEARCH_PARAMS
    }
    return args, filters


class _Handler(BaseHTTPRequestHandler):
    session: VectorizeSession  # set by make_server

    # -- helpers -------------------------------------------------------------

    def _send(self, code: int, body: dict | list) -> None:
        data = json.dumps(body).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _body(self) -> dict:
        length = int(self.headers.get("Content-Length", 0))
        if not length:
            return {}
        return json.loads(self.rfile.read(length).decode("utf-8"))

    def log_message(self, *args) -> None:  # silence test output
        pass

    def _run_search(self, params: dict[str, str]) -> None:
        job_name = params.get("job_name")
        query = params.get("query")
        if not job_name or query is None:
            self._send(400, {"error": "job_name and query are required"})
            return
        try:
            args, filters = _search_args(params)
        except ValueError as e:
            self._send(400, {"error": f"invalid parameter: {e}"})
            return
        try:
            results = self.session.hybrid_search(
                job_name, query, filters=filters or None, **args
            )
            self._send(200, results)
        except JobNotFoundError:
            self._send(404, {"error": f"job not found: {job_name}"})
        except (FilterParseError, InvalidIdentifierError, ValueError) as e:
            self._send(400, {"error": str(e)})
        except VectorizeError as e:
            self._send(500, {"error": str(e)})

    def _run_embeddings(self, body: dict) -> None:
        """POST /v1/embeddings — vector-serve's OpenAI-schema batch embed
        (transform.py:23-77): chunked encode, index-stable output order."""
        from pg_vectorize_spark.providers.registry import get_provider

        texts = body.get("input")
        if (
            not isinstance(texts, list)
            or not texts
            or not all(isinstance(t, str) for t in texts)
        ):
            self._send(
                422, {"error": "input must be a non-empty list of strings"}
            )
            return
        if not isinstance(body.get("normalize", False), bool):
            self._send(422, {"error": "normalize must be a boolean"})
            return
        requested = _org_model_name(body.get("model", "all-MiniLM-L6-v2"))
        try:
            provider = get_provider(
                requested, api_key=_hf_token(self.headers.get("Authorization"))
            )
        except VectorizeError as e:
            self._send(400, {"error": f"Unable to load {requested} -- {e}"})
            return
        try:
            vectors: list[list[float]] = []
            bs = embed_batch_size()
            for i in range(0, len(texts), bs):
                vectors.extend(
                    provider.generate_embedding(texts[i : i + bs])
                )
        except VectorizeError as e:
            self._send(500, {"error": str(e)})
            return
        if body.get("normalize", False):
            vectors = [
                [x / n for x in v]
                for v in vectors
                for n in [math.sqrt(sum(x * x for x in v)) or 1.0]
            ]
        self._send(
            200,
            {
                "data": [
                    {"embedding": v, "index": i} for i, v in enumerate(vectors)
                ],
                "model": requested,
            },
        )

    def _run_info(self, params: dict[str, str]) -> None:
        """GET /v1/info — vector-serve's model metadata (info.py:19-42).
        embedding_dimension is fallback-aware: it reports the dim of the
        provider that would actually serve (a local 64-dim stand-in when no
        endpoint is configured), matching what jobs record."""
        from pg_vectorize_spark.providers.registry import (
            get_provider,
            model_dim,
            parse_model,
        )

        model_name = params.get("model_name")
        if not model_name:
            self._send(422, {"error": "model_name query param is required"})
            return
        requested = _org_model_name(model_name)
        try:
            provider = get_provider(
                requested, api_key=_hf_token(self.headers.get("Authorization"))
            )
            dim = model_dim(parse_model(requested), probe=provider)
        except VectorizeError as e:
            self._send(400, {"error": f"Unable to load {requested} -- {e}"})
            return
        self._send(
            200,
            {
                "model": requested,
                "max_seq_len": MAX_SEQ_LENS.get(
                    requested, DEFAULT_MAX_SEQ_LEN
                ),
                "embedding_dimension": dim,
            },
        )

    # -- routes --------------------------------------------------------------

    def do_GET(self) -> None:  # noqa: N802 — http.server API
        url = urlparse(self.path)
        if url.path in ("/health", "/health/live", "/health/ready"):
            self._send(200, {"status": "ok"})
            return
        if url.path in ("/v1/info", "/v1/info/"):
            self._run_info(
                {k: v[-1] for k, v in parse_qs(url.query).items()}
            )
            return
        if url.path == "/api/v1/search":
            params = {
                k: v[-1] for k, v in parse_qs(url.query).items()
            }
            self._run_search(params)
            return
        if url.path in ("/v1/jobs", "/v1/jobs/"):
            self._send(200, {"jobs": self.session.catalog.list_jobs()})
            return
        if url.path.startswith("/v1/jobs/") and url.path.endswith(
            "/stats"
        ):
            name = unquote(url.path[len("/v1/jobs/") : -len("/stats")])
            try:
                self._send(200, self.session.job_stats(name))
            except JobNotFoundError:
                self._send(404, {"error": f"job not found: {name}"})
            except Exception as e:  # noqa: BLE001 — a corrupt maint/
                # index file surfacing as JSONDecodeError (or any
                # analysis error) must return a JSON 500, not drop the
                # connection (ADVICE r10)
                self._send(500, {"error": str(e)})
            return
        self._send(404, {"error": "not found"})

    def do_POST(self) -> None:  # noqa: N802
        url = urlparse(self.path)
        if url.path.startswith("/v1/jobs/") and url.path.endswith(
            "/maintain"
        ):
            name = unquote(
                url.path[len("/v1/jobs/") : -len("/maintain")]
            )
            try:
                self._send(200, self.session.maintain(name))
            except JobNotFoundError:
                self._send(404, {"error": f"job not found: {name}"})
            except Exception as e:  # noqa: BLE001 — JSON 500, never a
                # dropped connection (same contract as /stats)
                self._send(500, {"error": str(e)})
            return
        if url.path == "/v1/embeddings":
            try:
                body = self._body()
            except json.JSONDecodeError:
                self._send(400, {"error": "invalid JSON body"})
                return
            self._run_embeddings(body)
            return
        if url.path == "/api/v1/search":
            try:
                # JSON-aware coercion: bools must become the lowercase
                # 'true'/'false' the filter parser types as boolean (str()
                # would yield 'True'), and nulls are dropped rather than
                # round-tripping as the string 'None'
                params = {
                    k: ("true" if v else "false") if isinstance(v, bool)
                    else str(v)
                    for k, v in self._body().items()
                    if v is not None
                }
            except json.JSONDecodeError:
                self._send(400, {"error": "invalid JSON body"})
                return
            self._run_search(params)
            return
        if url.path == "/api/v1/table":
            try:
                body = self._body()
                job = self.session.create_job(
                    body["job_name"],
                    body["src_path"],
                    columns=body["columns"],
                    primary_key=body["primary_key"],
                    update_time_col=body.get("update_time_col"),
                    model=body.get("model"),
                    table_method=body.get("table_method", "join"),
                    schedule=body.get("schedule", "realtime"),
                    api_key=body.get("api_key"),
                    # the reference's POST /table accepts index params in
                    # its JobParams; here they select the persisted-index
                    # layout the job's search path probes
                    index_method=body.get("index_method", "brute"),
                    index_params=body.get("index_params"),
                    # FTS postings index (the GIN analog) — on by default
                    # like the reference's CREATE INDEX at job init
                    fts_index=bool(body.get("fts_index", True)),
                    fts_params=body.get("fts_params"),
                    # opt-in ingest-time near-dup filter (MinHash band
                    # index; beyond reference parity)
                    dedup_params=body.get("dedup_params"),
                    curate_params=body.get("curate_params"),
                )
                self._send(200, {"id": job.job_name, "dim": job.dim})
            except KeyError as e:
                self._send(400, {"error": f"missing field: {e}"})
            except JobAlreadyExistsError as e:
                self._send(409, {"error": f"job exists: {e}"})
            except (InvalidIdentifierError, VectorizeError, ValueError) as e:
                self._send(400, {"error": str(e)})
            return
        self._send(404, {"error": "not found"})

    def do_DELETE(self) -> None:  # noqa: N802
        url = urlparse(self.path)
        prefix = "/api/v1/table/"
        if url.path.startswith(prefix):
            job_name = unquote(url.path[len(prefix):])
            try:
                deleted = self.session.delete_job(job_name)
            except InvalidIdentifierError as e:
                self._send(400, {"error": str(e)})
                return
            if deleted:
                self._send(200, {"deleted": job_name})
            else:
                self._send(404, {"error": f"job not found: {job_name}"})
            return
        self._send(404, {"error": "not found"})


def make_server(
    session: VectorizeSession, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    handler = type("BoundHandler", (_Handler,), {"session": session})
    return ThreadingHTTPServer((host, port), handler)


def run_in_thread(
    session: VectorizeSession, host: str = "127.0.0.1", port: int = 0
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    server = make_server(session, host, port)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread

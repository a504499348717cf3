"""Engine configuration, derived from environment variables.

Mirrors the reference's operating parameters (core/src/config.rs:38-97,
extension/src/guc.rs) re-framed for Spark. ``${VAR}`` interpolation follows
core/src/transformers/generic.rs:17-46.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

_ENV_VAR_RE = re.compile(r"\$\{(\w+)\}")


def interpolate_env(value: str) -> str:
    """Replace ``${VAR}`` placeholders with environment values.

    Same semantics as the reference's env interpolation
    (core/src/transformers/generic.rs:17-46): unknown variables raise.
    """

    def _sub(m: re.Match[str]) -> str:
        name = m.group(1)
        if name not in os.environ:
            raise KeyError(f"environment variable not set: {name}")
        return os.environ[name]

    return _ENV_VAR_RE.sub(_sub, value)


def _env_int(name: str, default: int) -> int:
    raw = os.environ.get(name)
    return int(raw) if raw is not None else default


def _env_float(name: str, default: float) -> float:
    raw = os.environ.get(name)
    return float(raw) if raw is not None else default


@dataclass
class Config:
    """Engine-wide defaults.

    The numeric defaults adopt the reference's operating parameters
    (BASELINE.md): batch token budget 10_000, provider request cap 2_048,
    per-input token cap 8_192, hybrid defaults limit=10 / window=5*limit /
    rrf_k=60 / weights 1.0, max retries 2.
    """

    # embedding pipeline (extension/src/guc.rs:15,88-97; core/src/init.rs:88,286)
    batch_token_budget: int = field(
        default_factory=lambda: _env_int("VECTORIZE_BATCH_TOKEN_BUDGET", 10_000)
    )
    # trigger/record batching fallback (core/src/query.rs:477-480)
    batch_record_count: int = field(
        default_factory=lambda: _env_int("VECTORIZE_BATCH_SIZE", 1_000)
    )
    # provider HTTP request cap (core/src/transformers/providers/openai.rs:88-100)
    provider_request_cap: int = field(
        default_factory=lambda: _env_int("VECTORIZE_PROVIDER_REQUEST_CAP", 2_048)
    )
    # per-input token cap, whitespace-truncated (openai.rs:16,166-186)
    input_token_cap: int = field(
        default_factory=lambda: _env_int("VECTORIZE_INPUT_TOKEN_CAP", 8_192)
    )
    # embedding HTTP timeout seconds (openai.rs:109; extension/src/guc.rs:21)
    embedding_timeout_sec: float = field(
        default_factory=lambda: _env_float("EMBEDDING_REQ_TIMEOUT_SEC", 120.0)
    )
    max_retries: int = field(default_factory=lambda: _env_int("VECTORIZE_MAX_RETRIES", 2))

    # hybrid-search defaults (server/src/routes/search.rs:66-84)
    default_limit: int = 10
    default_window_multiplier: int = 5
    default_rrf_k: int = 60
    default_semantic_weight: float = 1.0
    default_fts_weight: float = 1.0

    # default model (extension/src/api.rs:90); mapped to the built-in
    # deterministic hashing embedder when no HTTP endpoint is configured.
    default_transformer: str = field(
        default_factory=lambda: os.environ.get(
            "VECTORIZE_DEFAULT_TRANSFORMER", "local/hash-embedder-64"
        )
    )

    # workspace directory for job artifacts (catalog + per-job parquet)
    workspace_dir: str = field(
        default_factory=lambda: os.environ.get(
            "VECTORIZE_WORKSPACE", "/tmp/pg_vectorize_spark"
        )
    )


DEFAULT_CONFIG = Config()

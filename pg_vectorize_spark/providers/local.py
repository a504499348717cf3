"""Deterministic local embedder — the hermetic default model.

The reference's default model is a SentenceTransformers microservice
(vector-serve/app/models.py:41-94). That needs network + model weights, so the
Spark engine ships a fully deterministic local model instead:
**hashed bag-of-words + character 3-grams, L2-normalized**.

The hashing scheme is deliberately SQL-expressible so the exact same vectors
can be computed three ways, bit-for-bit:

1. numpy (this module) — used by driver-side single-query embedding;
2. Spark built-in expressions (functions/vector.py: ``sql_embed_expr``) —
   the JVM/codegen bulk path, no Python in the hot loop;
3. DuckDB list lambdas — the correctness oracle.

Bucket function (token -> dimension index), shared by all three:

    h = fold(chars(token), acc=7, acc*31 + ascii(char) mod 1_000_003)
    bucket = h mod dim

Tokenization: lowercase, split on ``[^a-z0-9]+`` runs; word tokens plus
character 3-grams of each token (3-grams give partial-overlap behavior so
near-matching strings score > 0). Counts per bucket, then L2 normalization —
normalize-at-write parity with vector-serve's ``normalize`` option
(vector-serve/app/routes/transform.py:25), so cosine similarity reduces to a
dot product at query time.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

import numpy as np

from pg_vectorize_spark.providers.base import EmbeddingProvider

HASH_MOD = 1_000_003
HASH_SEED = 7
HASH_MULT = 31
TOKEN_SPLIT_RE = re.compile(r"[^a-z0-9]+")
DEFAULT_DIM = 64


def tokenize(text: str) -> list[str]:
    """Lowercase word tokens; empty strings dropped."""
    if text is None:
        return []
    return [t for t in TOKEN_SPLIT_RE.split(text.lower()) if t]


def char_ngrams(token: str, n: int = 3) -> list[str]:
    """Character n-grams of one token (token shorter than n -> the token)."""
    if len(token) <= n:
        return [token]
    return [token[i : i + n] for i in range(len(token) - n + 1)]


def bucket(token: str, dim: int) -> int:
    """Polynomial-roll hash mod dim; identical in numpy/Spark/DuckDB forms."""
    acc = HASH_SEED
    for ch in token:
        acc = (acc * HASH_MULT + ord(ch)) % HASH_MOD
    return acc % dim


def features(text: str) -> list[str]:
    """All hashed features of a text: word tokens + char 3-grams."""
    toks = tokenize(text)
    feats = list(toks)
    for t in toks:
        feats.extend(char_ngrams(t))
    return feats


class LocalHashEmbedder(EmbeddingProvider):
    """Deterministic hashing embedder; see module docstring for the spec."""

    def __init__(self, dim: int = DEFAULT_DIM, normalize: bool = True):
        self.dim = dim
        self.normalize = normalize
        # feature -> bucket memo: natural-language corpora repeat a small
        # feature vocabulary (words + char 3-grams) millions of times, so
        # the per-character hash loop runs once per DISTINCT feature per
        # worker instead of once per occurrence. Bounded by vocab size.
        self._bucket_cache: dict[str, int] = {}
        # token -> bucket-id ARRAY memo (r13 optimization round): the
        # per-feature cache still re-built every occurrence's n-gram
        # STRINGS just to look their buckets up; caching the token's
        # full bucket array ([token] + its 3-grams, hashed) skips both
        # the slicing and the lookups for every repeat of the token —
        # the dominant per-row cost of the Python embed path (§4.2).
        # Bounded by the worker's token vocabulary, same as above.
        self._token_buckets: dict[str, np.ndarray] = {}

    def model_dim(self) -> int:
        return self.dim

    def embed_one(self, text: str) -> list[float]:
        dim = self.dim
        tcache = self._token_buckets
        fcache = self._bucket_cache
        arrs = []
        for tok in tokenize(text):
            tb = tcache.get(tok)
            if tb is None:
                ids = []
                for feat in (tok, *char_ngrams(tok)):
                    b = fcache.get(feat)
                    if b is None:
                        b = bucket(feat, dim)
                        fcache[feat] = b
                    ids.append(b)
                tb = np.array(ids, dtype=np.int64)
                tcache[tok] = tb
            arrs.append(tb)
        if arrs:
            # integer counts via one vectorized bincount — identical
            # values to the former per-feature += 1.0 accumulation
            vec = np.bincount(
                np.concatenate(arrs), minlength=dim
            ).astype(np.float64)
        else:
            vec = np.zeros(dim, dtype=np.float64)
        if self.normalize:
            norm = float(np.sqrt(np.dot(vec, vec)))
            if norm > 0:
                vec = vec / norm
        return vec.tolist()

    def generate_embedding(self, inputs: Sequence[str]) -> list[list[float]]:
        return [self.embed_one(t if t is not None else "") for t in inputs]

"""Model-name parsing + deterministic embedder unit tests.

Model-parser themes from core/src/types.rs:332-424; embedder is our own
hermetic spec (providers/local.py).
"""

from __future__ import annotations

import math

import pytest

from pg_vectorize_spark.config import interpolate_env
from pg_vectorize_spark.errors import ModelError
from pg_vectorize_spark.providers import (
    LocalHashEmbedder,
    ModelSource,
    get_provider,
    parse_model,
)
from pg_vectorize_spark.providers.http_openai import trim_input
from pg_vectorize_spark.providers.local import bucket, char_ngrams, features, tokenize
from pg_vectorize_spark.providers.registry import model_dim


class TestModelParsing:
    def test_two_part(self):
        m = parse_model("openai/text-embedding-ada-002")
        assert m.source == ModelSource.OPENAI
        assert m.name == "text-embedding-ada-002"

    def test_three_part(self):
        m = parse_model("sentence-transformers/org/model")
        assert m.source == ModelSource.SENTENCE_TRANSFORMERS
        assert m.name == "org/model"

    def test_legacy_bare_name(self):
        # legacy bare names -> sentence-transformers (core/src/types.rs:286-300)
        m = parse_model("all-MiniLM-L6-v2")
        assert m.source == ModelSource.SENTENCE_TRANSFORMERS

    def test_unknown_source_falls_back(self):
        # unknown namespace -> hot-loadable HF model via sentence-transformers
        m = parse_model("myorg/custom-model")
        assert m.source == ModelSource.SENTENCE_TRANSFORMERS
        assert m.name == "myorg/custom-model"

    def test_too_many_parts(self):
        with pytest.raises(ModelError):
            parse_model("a/b/c/d")

    def test_empty_rejected(self):
        with pytest.raises(ModelError):
            parse_model("")

    def test_known_dims(self):
        assert model_dim(parse_model("openai/text-embedding-ada-002")) == 1536
        assert (
            model_dim(parse_model("sentence-transformers/all-MiniLM-L6-v2")) == 384
        )

    def test_local_dim_from_name(self):
        assert model_dim(parse_model("local/hash-embedder-128")) == 128

    def test_probe_dim(self):
        probe = LocalHashEmbedder(dim=32)
        assert model_dim(parse_model("ollama/whatever"), probe=probe) == 32

    def test_get_provider_local(self):
        p = get_provider("local/hash-embedder-64")
        assert isinstance(p, LocalHashEmbedder)
        assert p.model_dim() == 64


class TestLocalEmbedder:
    def test_deterministic(self):
        e = LocalHashEmbedder(dim=64)
        a = e.embed_one("hello world")
        b = e.embed_one("hello world")
        assert a == b

    def test_normalized(self):
        e = LocalHashEmbedder(dim=64)
        v = e.embed_one("some text with several words")
        assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-12)

    def test_empty_text_zero_vector(self):
        e = LocalHashEmbedder(dim=16)
        assert e.embed_one("") == [0.0] * 16

    def test_batch_order_preserved(self):
        e = LocalHashEmbedder(dim=32)
        vecs = e.generate_embedding(["alpha", "beta", "alpha"])
        assert vecs[0] == vecs[2] != vecs[1]

    def test_similar_text_scores_higher(self):
        # char 3-grams give partial-overlap behavior
        e = LocalHashEmbedder(dim=64)

        def cos(a, b):
            return sum(x * y for x, y in zip(a, b))

        q = e.embed_one("mobile phone charger")
        close = e.embed_one("fast usb phone charger for mobile devices")
        far = e.embed_one("ceramic coffee mug")
        assert cos(q, close) > cos(q, far)

    def test_tokenize(self):
        assert tokenize("Hello, World-Foo 42!") == ["hello", "world", "foo", "42"]
        assert tokenize(None) == []

    def test_char_ngrams(self):
        assert char_ngrams("ab") == ["ab"]
        assert char_ngrams("abc") == ["abc"]
        assert char_ngrams("abcd") == ["abc", "bcd"]

    def test_features(self):
        # word tokens first, then 3-grams of each token
        assert features("cat dogs") == ["cat", "dogs", "cat", "dog", "ogs"]

    def test_bucket_range(self):
        for t in ["a", "hello", "0", "zzz"]:
            assert 0 <= bucket(t, 64) < 64


class TestTrimAndEnv:
    def test_trim_input_under_cap(self):
        assert trim_input("a b c", 10) == "a b c"

    def test_trim_input_over_cap(self):
        assert trim_input("a b c d e", 3) == "a b c"

    def test_interpolate_env(self, monkeypatch):
        monkeypatch.setenv("MY_KEY", "sk-123")
        assert interpolate_env("Bearer ${MY_KEY}") == "Bearer sk-123"

    def test_interpolate_env_missing_raises(self):
        with pytest.raises(KeyError):
            interpolate_env("${DOES_NOT_EXIST_XYZ}")

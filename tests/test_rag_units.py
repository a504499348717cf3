"""RAG pure-function tests — prompt render/trim golden themes
(extension/src/chat/ops.rs:278-380)."""

from __future__ import annotations

import pytest

from pg_vectorize_spark.errors import VectorizeError
from pg_vectorize_spark.rag import (
    count_tokens,
    render_prompt,
    trim_context,
)


class TestRender:
    def test_basic(self):
        out = render_prompt(
            "Q: {{ query_str }} C: {{ context_str }}",
            {"query_str": "q", "context_str": "c"},
        )
        assert out == "Q: q C: c"

    def test_whitespace_variants(self):
        assert render_prompt("{{query_str}}", {"query_str": "x"}) == "x"
        assert render_prompt("{{  query_str  }}", {"query_str": "x"}) == "x"

    def test_missing_variable_raises(self):
        with pytest.raises(VectorizeError):
            render_prompt("{{ nope }}", {})

    def test_repeated_placeholder(self):
        assert render_prompt("{{ a }}/{{ a }}", {"a": "x"}) == "x/x"


class TestTrim:
    def test_no_trim_needed(self):
        kept, used = trim_context(["a b", "c d"], 10)
        assert kept == ["a b", "c d"] and used == 4

    def test_whole_doc_dropped(self):
        kept, used = trim_context(["a b c", "d e f"], 3)
        assert kept == ["a b c"] and used == 3

    def test_partial_tail_trim(self):
        kept, used = trim_context(["a b c", "d e f"], 5)
        assert kept == ["a b c", "d e"] and used == 5

    def test_zero_budget(self):
        kept, used = trim_context(["a b"], 0)
        assert kept == [] and used == 0

    def test_count_tokens(self):
        assert count_tokens("one two  three") == 3

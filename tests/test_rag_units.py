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


class TestPromptRegistry:
    """vectorize.prompts parity: user-insertable templates round-trip
    through rag() (extension/sql/meta.sql:9-13)."""

    def test_add_get_list_delete(self, tmp_path):
        from pg_vectorize_spark.prompts import PromptRegistry

        reg = PromptRegistry(str(tmp_path / "ws"))
        assert "question_answer" in reg.list_tasks()  # seeded
        reg.add(
            "summarize",
            "You summarize documents.",
            "Context:\n{{ context_str }}\nSummarize for: {{ query_str }}",
        )
        assert reg.get("summarize")["sys_prompt"] == "You summarize documents."
        # persisted across instances (the table, not the process)
        reg2 = PromptRegistry(str(tmp_path / "ws"))
        assert "summarize" in reg2.list_tasks()
        assert reg2.delete("summarize") is True
        assert "summarize" not in reg2.list_tasks()

    def test_duplicate_and_validation(self, tmp_path):
        from pg_vectorize_spark.errors import VectorizeError
        from pg_vectorize_spark.prompts import PromptRegistry

        reg = PromptRegistry(str(tmp_path / "ws"))
        with pytest.raises(VectorizeError, match="missing"):
            reg.add("bad", "sys", "no placeholders here")
        reg.add("t1", "s", "{{ context_str }} {{ query_str }}")
        with pytest.raises(VectorizeError, match="exists"):
            reg.add("t1", "s", "{{ context_str }} {{ query_str }}")
        reg.add("t1", "s2", "{{ context_str }} {{ query_str }}", replace=True)
        assert reg.get("t1")["sys_prompt"] == "s2"
        with pytest.raises(VectorizeError, match="seeded"):
            reg.delete("question_answer")

    def test_custom_task_through_rag(self, spark, tmp_path):
        from pg_vectorize_spark.engine import VectorizeSession
        from pg_vectorize_spark.providers.http_openai import EchoChat

        src = str(tmp_path / "docs.parquet")
        spark.createDataFrame(
            [(1, "pizza with extra cheese"), (2, "writing with a pencil")],
            "id long, content string",
        ).write.parquet(src)
        sess = VectorizeSession(
            spark, workspace=str(tmp_path / "ws"), chat_provider=EchoChat()
        )
        sess.create_job("ragjob", src, columns=["content"], primary_key="id")
        sess.add_prompt(
            "pirate_answer",
            "You are a pirate.",
            "Say arr. Context: {{ context_str }} Q: {{ query_str }} A:",
        )
        out = sess.rag("ragjob", "cheese pizza", task="pirate_answer")
        assert "Say arr." in out.chat_response
        assert "cheese pizza" in out.chat_response
        # unknown task still errors
        with pytest.raises(Exception, match="unknown prompt task"):
            sess.rag("ragjob", "q", task="nope")

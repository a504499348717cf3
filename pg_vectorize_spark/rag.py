"""RAG pipeline — retrieve -> prompt render -> chat completion (§2.12).

Mirrors extension/src/chat/ops.rs:20-126:

1. top-k semantic search over a single-text-column job (``num_context``);
2. token-count each context document;
3. load the prompt template for ``task`` from the prompts table
   (seeded ``question_answer``, extension/sql/meta.sql:50-59);
4. render ``{{ context_str }}`` / ``{{ query_str }}`` placeholders
   (Handlebars in the reference; same-shape ``{{ var }}`` renderer here,
   extension/src/chat/ops.rs:128-136);
5. context-window check against the chat model; optional tail-trim of
   context tokens when ``force_trim`` (ops.rs:196-276);
6. chat completion; return
   ``{"context": [{"record_id", "content", "token_ct"}], "chat_response"}``
   (extension/src/chat/types.rs:20-24).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pg_vectorize_spark.errors import VectorizeError
from pg_vectorize_spark.providers.base import ChatProvider

# seeded prompt templates (extension/sql/meta.sql:50-59)
DEFAULT_PROMPTS: dict[str, dict[str, str]] = {
    "question_answer": {
        "sys_prompt": (
            "You are an expert Q&A system. You must always answer the "
            "question using the provided context information."
        ),
        "user_prompt": (
            "Context information is below.\n---------------------\n"
            "{{ context_str }}\n---------------------\n"
            "Given the context information and not prior knowledge, "
            "answer the query.\nQuery: {{ query_str }}\nAnswer: "
        ),
    },
}

# context window sizes by chat model (get_context_size analog,
# extension/src/chat/ops.rs — unknown models get a conservative default)
CONTEXT_SIZES = {
    "openai/gpt-4o-mini": 128_000,
    "openai/gpt-4o": 128_000,
    "openai/gpt-3.5-turbo": 16_385,
}
DEFAULT_CONTEXT_SIZE = 8_192

_PLACEHOLDER_RE = re.compile(r"\{\{\s*(\w+)\s*\}\}")


def render_prompt(template: str, variables: dict[str, str]) -> str:
    """``{{ var }}`` substitution; unknown placeholders raise (Handlebars
    strict-mode parity)."""

    def _sub(m: re.Match[str]) -> str:
        name = m.group(1)
        if name not in variables:
            raise VectorizeError(f"missing prompt variable: {name}")
        return variables[name]

    return _PLACEHOLDER_RE.sub(_sub, template)


def count_tokens(text: str) -> int:
    """Whitespace token count — the trim unit (tiktoken stand-in; the
    reference counts cl100k tokens, core/src/query.rs:606-615)."""
    return len(text.split())


def trim_context(
    contexts: list[str], token_budget: int
) -> tuple[list[str], int]:
    """Tail-trim whole docs, then tail-trim tokens of the last kept doc so
    Σtokens <= budget (force_trim semantics, ops.rs:196-276)."""
    kept: list[str] = []
    used = 0
    for doc in contexts:
        ct = count_tokens(doc)
        if used + ct <= token_budget:
            kept.append(doc)
            used += ct
        else:
            remaining = token_budget - used
            if remaining > 0:
                kept.append(" ".join(doc.split()[:remaining]))
                used = token_budget
            break
    return kept, used


@dataclass
class RagResult:
    context: list[dict]
    chat_response: str

    def to_dict(self) -> dict:
        return {"context": self.context, "chat_response": self.chat_response}


def run_rag(
    search_results: list[dict],
    query: str,
    chat: ChatProvider,
    content_col: str,
    pkey: str,
    task: str = "question_answer",
    chat_model: str = "openai/gpt-4o-mini",
    force_trim: bool = False,
    prompts: dict[str, dict[str, str]] | None = None,
) -> RagResult:
    """Assemble the prompt from retrieved rows and call the chat provider."""
    all_prompts = {**DEFAULT_PROMPTS, **(prompts or {})}
    if task not in all_prompts:
        raise VectorizeError(f"unknown prompt task: {task}")
    tpl = all_prompts[task]

    contexts = [str(r[content_col]) for r in search_results]
    window = CONTEXT_SIZES.get(chat_model, DEFAULT_CONTEXT_SIZE)
    sys_user_overhead = count_tokens(tpl["sys_prompt"]) + count_tokens(
        tpl["user_prompt"]
    ) + count_tokens(query)
    budget = max(window - sys_user_overhead, 0)

    total = sum(count_tokens(c) for c in contexts)
    if total > budget:
        if not force_trim:
            raise VectorizeError(
                f"context ({total} tokens) exceeds model window budget "
                f"({budget}); pass force_trim=True to trim"
            )
        contexts, _ = trim_context(contexts, budget)

    context_str = "\n\n".join(contexts)
    user = render_prompt(
        tpl["user_prompt"], {"context_str": context_str, "query_str": query}
    )
    messages = [
        {"role": "system", "content": tpl["sys_prompt"]},
        {"role": "user", "content": user},
    ]
    response = chat.generate_response(messages)
    ctx_meta = [
        {
            "record_id": r[pkey],
            "content": c,
            "token_ct": count_tokens(c),
        }
        for r, c in zip(search_results, contexts)
    ]
    return RagResult(context=ctx_meta, chat_response=response)

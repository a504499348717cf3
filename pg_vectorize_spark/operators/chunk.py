"""Text chunking — ``chunk_text`` / ``chunk_table`` (F4/F5).

Two implementations with different contracts:

1. ``chunk_text_greedy`` — strict reference parity: split into chunks of at
   most ``max_chars``, breaking on word boundaries, splitting oversized
   words mid-word. Matches the reference's text-splitter goldens
   (extension/tests/integration_tests.rs:87-152, e.g.
   ``'This is a test for chunking.', 20 -> ['This is a test for',
   'chunking.']``). Sequential per document -> exposed as a scalar function
   and as a pandas-UDF table op (``chunk_table_greedy``).

2. ``chunk_table_distributed`` — the scale path: a word is assigned to chunk
   ``floor(start_offset / max_chars)`` of its document (start offsets in the
   space-joined word stream). Pure DataFrame ops (posexplode + running sum +
   groupBy), SQL-expressible for the oracle, fully distributed. Chunks can
   overshoot ``max_chars`` by less than one word — documented divergence
   from the greedy contract.

Output shape for table ops follows the reference's ``chunked_data`` table:
``(original_id, chunk_index, chunk)`` (extension/src/api.rs:55-57).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_text_greedy(doc: str, max_chars: int) -> list[str]:
    """Greedy word-boundary chunker (reference F4 semantics)."""
    if max_chars < 1:
        raise ValueError(f"max_chars must be >= 1, got {max_chars}")
    if doc is None:
        return []
    words = doc.split()
    if not words:
        return []
    chunks: list[str] = []
    cur = ""
    for w in words:
        while len(w) > max_chars:
            # oversized word: flush current, hard-split the word
            if cur:
                chunks.append(cur)
                cur = ""
            chunks.append(w[:max_chars])
            w = w[max_chars:]
        if not w:
            continue
        if not cur:
            cur = w
        elif len(cur) + 1 + len(w) <= max_chars:
            cur = f"{cur} {w}"
        else:
            chunks.append(cur)
            cur = w
    if cur:
        chunks.append(cur)
    return chunks


def chunk_table_greedy(
    df: DataFrame,
    text_col: str,
    pkey: str,
    max_chunk_size: int = 1000,
) -> DataFrame:
    """chunk_table with greedy parity semantics via Arrow-batched pandas.

    Output: (original_id, chunk_index, chunk) — extension/src/api.rs:17-78.
    """
    if max_chunk_size < 1:
        # validate at the driver; otherwise the ValueError only surfaces
        # wrapped in task failures at action time
        raise ValueError(f"max_chunk_size must be >= 1, got {max_chunk_size}")
    pkey_type = df.schema[pkey].dataType.simpleString()
    schema = f"original_id {pkey_type}, chunk_index int, chunk string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            chunks: list[str] = []
            for pk, doc in zip(pdf[pkey], pdf[text_col]):
                for i, ch in enumerate(chunk_text_greedy(doc, max_chunk_size)):
                    ids.append(pk)
                    idxs.append(i)
                    chunks.append(ch)
            yield pd.DataFrame(
                {"original_id": ids, "chunk_index": idxs, "chunk": chunks}
            )

    return df.select(pkey, text_col).mapInPandas(gen, schema=schema)


def chunk_table_distributed(
    df: DataFrame,
    text_col: str,
    pkey: str,
    max_chunk_size: int = 1000,
) -> DataFrame:
    """Distributed offset-bucket chunker (SQL-expressible spec).

    word w with start offset s (in the ' '-joined word stream) goes to chunk
    floor(s / max_chunk_size); chunk text = words joined by ' ' in order.
    """
    words = df.select(
        F.col(pkey).alias("original_id"),
        F.posexplode(
            F.filter(
                F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("pos", "word"),
    )
    w = (
        Window.partitionBy("original_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # start offset = sum of (len(word)+1) over preceding words
    offsets = words.withColumn(
        "start",
        F.coalesce(F.sum(F.length("word") + 1).over(w), F.lit(0)).cast("long"),
    )
    chunked = offsets.withColumn(
        "chunk_index", F.floor(F.col("start") / max_chunk_size).cast("int")
    )
    return (
        chunked.groupBy("original_id", "chunk_index")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("word")))
                    ),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("chunk")
        )
        .select("original_id", "chunk_index", "chunk")
    )

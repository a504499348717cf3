"""Byte-pair-encoding tokenizer: distributed training corpus pass,
driver-side merge learning, broadcast-merges distributed encode.

The reference engine counts tokens only as a trim heuristic
(extension/src/core/openai.rs:166 whitespace units); a training-data
pipeline additionally needs a REAL learned subword tokenizer to measure
and pack the corpus it ships. This is Sennrich et al. 2016 BPE over the
repo's word tokenization (functions/text.raw_words_expr — lowercase,
``[^a-z0-9]+`` splits), with a ``</w>`` end-of-word symbol.

Scale shape:
- Training's corpus-scale work is ONE distributed word count
  (explode + groupBy — map-side partial agg, |vocab| output rows).
  Merge learning then runs on the driver over a deterministically
  capped word table (count desc, word asc; ``max_words``), the
  sentencepiece/HF practice, with the INCREMENTAL pair-index trainer
  (per-merge cost is the words containing the merged pair, not the
  vocab — measured 193k words / 8k merges in 49 s where the naive
  recount extrapolates to ~80 min; SCALING.md). No per-merge Spark
  job: at 100 TB the word count is the only pass that sees the corpus.
- ``bpe_learn_merges`` (r13) is the FULLY DISTRIBUTED alternative for a
  vocab that outgrows the driver even after the cap: executors hold the
  symbol state, each iteration is one algebraic pair aggregate + a
  top-1 row to the driver, and the merge applies executor-side — same
  merges bit-for-bit as ``bpe_train`` (fixture reproduction +
  second-slice parity in tests/test_bpe.py).
- Encoding broadcasts the merge list (a few KB) and runs mapInPandas
  with a per-batch word cache — Zipf means most word occurrences are
  cache hits, so per-doc work is ~distinct-new-words, not tokens.

Determinism: ties in pair counts break to the lexicographically
smallest pair, and the vocab cap orders (count desc, word asc), so the
same corpus always learns the same merges on any cluster layout.

Encode semantics: merges are applied in rank order, one left-to-right
pass each. This equals the canonical lowest-rank-first priority encode:
merging a pair never creates a NEW adjacency between two other
pre-existing symbols, so once pass i has run, pair i can never reappear
— and the single left-to-right pass handles self-overlap ('aaa' with
(a,a) -> ('aa','a')) exactly like the canonical scan. The SQL oracle
mirrors this pass-per-merge form as a recursive CTE.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter
from collections.abc import Iterable, Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_vectorize_spark.functions.text import raw_words_expr

EOW = "</w>"
_WORD_SPLIT = re.compile(r"[^a-z0-9]+")


def words_of(text: str | None) -> list[str]:
    """Python mirror of ``raw_words_expr`` (parity tested)."""
    return [w for w in _WORD_SPLIT.split((text or "").lower()) if w]


def bpe_word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Distributed (word, n) table — the only corpus-scale pass of
    training. Map-side partial agg; output is |vocab| rows."""
    return (
        df.select(F.explode(raw_words_expr(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def merge_pass(sym: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    """One left-to-right merge pass of pair (a, b) over a symbol tuple."""
    out: list[str] = []
    i, n = 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def bpe_train(
    word_counts: DataFrame | Iterable[tuple[str, int]],
    n_merges: int,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, n) table.

    Accepts the ``bpe_word_counts`` DataFrame (capped deterministically
    at ``max_words`` by count desc, word asc before the collect) or an
    in-memory iterable. Returns the merge list in rank order; stops
    early when no adjacent pair is left (fully merged vocab).

    The trainer is INCREMENTAL (the Sennrich learn_bpe optimization):
    pair counts and a pair→words index are built once; each merge only
    re-pairs the words that actually contain the merged pair, and the
    argmax comes from a lazily-invalidated heap keyed ``(-count, pair)``
    — popping the smallest tuple IS "max count, lexicographically
    smallest pair", the naive trainer's exact tie-break. Cost per merge
    is O(words containing the pair × word length + heap churn) instead
    of O(vocab × mean word length); bit-identical merges are pinned by
    a property test against the naive recount (`_bpe_train_naive`).
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    vocab = _vocab_list(word_counts, max_words)
    import heapq

    syms: dict[str, tuple[str, ...]] = {
        w: tuple(w) + (EOW,) for w, _ in vocab
    }
    counts = dict(vocab)
    pair_counts: Counter[tuple[str, str]] = Counter()
    pair_words: dict[tuple[str, str], set[str]] = {}
    for w, c in counts.items():
        s = syms[w]
        for p in zip(s, s[1:]):
            pair_counts[p] += c
            pair_words.setdefault(p, set()).add(w)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, best = heapq.heappop(heap)
        # lazy invalidation: skip stale entries (count changed or gone)
        if pair_counts.get(best, 0) != -negc or negc == 0:
            continue
        merges.append(best)
        a, b = best
        for w in sorted(pair_words.get(best, ())):
            c = counts[w]
            old = syms[w]
            new = merge_pass(old, a, b)
            syms[w] = new
            delta = Counter(zip(new, new[1:]))
            delta.subtract(Counter(zip(old, old[1:])))
            for p, d in delta.items():
                if d == 0:
                    continue
                nc = pair_counts.get(p, 0) + d * c
                if nc <= 0:
                    pair_counts.pop(p, None)
                    ws = pair_words.get(p)
                    if ws is not None:
                        ws.discard(w)
                else:
                    pair_counts[p] = nc
                    if d > 0:
                        pair_words.setdefault(p, set()).add(w)
                    else:
                        # the pair may survive in OTHER words; only drop
                        # this word when it no longer holds the pair
                        if p not in zip(new, new[1:]):
                            ws = pair_words.get(p)
                            if ws is not None:
                                ws.discard(w)
                    heapq.heappush(heap, (-nc, p))
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def _merge_pass_expr(syms: "F.Column", a: str, b: str) -> "F.Column":
    """Spark form of ``merge_pass`` — one left-to-right merge of pair
    (a, b) over a symbol array, as a single fold.

    The fold appends each symbol, except when the accumulator's LAST
    element is ``a`` and the incoming symbol is ``b`` — then the last
    element is replaced by ``a+b``. This greedy-last rule IS the
    left-to-right scan: a just-merged ``a+b`` can never falsely
    re-merge because ``a+b != a`` (b is non-empty), which also gives
    the canonical self-overlap behavior ('aaa' + (a,a) -> ('aa','a')).
    Property-pinned against the Python ``merge_pass`` in
    tests/test_bpe.py. The containment pre-test skips the interpreted
    fold for the (vast, Zipf-tailed) majority of words that don't hold
    both symbols."""
    fold = F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return F.when(
        F.array_contains(syms, a) & F.array_contains(syms, b), fold
    ).otherwise(syms)


def bpe_learn_merges(
    word_counts: DataFrame,
    n_merges: int,
    max_words: int = 1_000_000,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """DISTRIBUTED BPE merge learning (VERDICT r12 #5): the executors
    hold the per-word symbol state; the driver holds ONLY the merge
    list plus one top-1 row per iteration.

    Per iteration: adjacent-pair counts are an ALGEBRAIC aggregate over
    the word-frequency structs (explode zip_with pairs, sum(n) — map-
    side combined, |distinct pairs| output rows), the argmax row
    (count desc, then lexicographically smallest pair — the exact
    ``bpe_train`` tie-break) comes back via limit(1), and the merge is
    applied executor-side with ``_merge_pass_expr`` (containment
    pre-test, so per-iteration rewrite work is the words holding the
    pair). Lineage is truncated every ``checkpoint_every`` iterations —
    an iterative loop's plan otherwise grows by one fold per merge.

    Same result as ``bpe_train`` on the same capped vocab, bit for bit
    (tests/test_bpe.py pins fixture reproduction + a second-slice
    parity): where the driver trainer collects the capped vocab once,
    this one never materializes it on the driver — the shape for a
    vocab that outgrows driver memory (100-TB crawls routinely exceed
    10^8 distinct words before the cap)."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    wc = (
        word_counts.orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(max_words)
        .select(
            F.col("n").cast("long").alias("n"),
            F.concat(
                F.split(F.col("word"), ""), F.array(F.lit(EOW))
            ).alias("syms"),
        )
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        pair_structs = F.zip_with(
            F.slice(F.col("syms"), 1, F.size("syms") - 1),
            F.slice(F.col("syms"), 2, F.size("syms") - 1),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        )
        best = (
            wc.select("n", F.explode(pair_structs).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(
                F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
            )
            .limit(1)
            .collect()
        )
        if not best:
            break  # fully merged vocab — no adjacent pair left
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        wc = wc.select("n", _merge_pass_expr(F.col("syms"), a, b).alias("syms"))
        if len(merges) % checkpoint_every == 0:
            wc = wc.localCheckpoint()
    return merges


def _vocab_list(
    word_counts: DataFrame | Iterable[tuple[str, int]], max_words: int
) -> list[tuple[str, int]]:
    if isinstance(word_counts, DataFrame):
        rows = (
            word_counts.orderBy(F.col("n").desc(), F.col("word").asc())
            .limit(max_words)
            .collect()
        )
        return [(r["word"], int(r["n"])) for r in rows]
    return [(w, int(n)) for w, n in word_counts]


def _bpe_train_naive(
    word_counts: DataFrame | Iterable[tuple[str, int]],
    n_merges: int,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Reference trainer: full pair recount every merge — O(vocab) per
    merge, kept as the parity spec the incremental trainer must match
    bit-for-bit (tests/test_bpe.py property test)."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    vocab = _vocab_list(word_counts, max_words)
    syms: dict[str, tuple[str, ...]] = {
        w: tuple(w) + (EOW,) for w, _ in vocab
    }
    counts = dict(vocab)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter[tuple[str, str]] = Counter()
        for w, c in counts.items():
            s = syms[w]
            for p in zip(s, s[1:]):
                pair_counts[p] += c
        if not pair_counts:
            break
        top = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == top)
        merges.append(best)
        a, b = best
        for w, s in syms.items():
            # cheap adjacency pre-test before the rebuild pass
            if a in s and b in s:
                syms[w] = merge_pass(s, a, b)
    return merges


def encode_word(
    word: str, merges: Sequence[tuple[str, str]]
) -> tuple[str, ...]:
    """Encode one word: chars + EOW, then every merge in rank order
    (one pass each — see the module docstring for why this equals the
    canonical priority encode)."""
    sym = tuple(word) + (EOW,)
    for a, b in merges:
        if len(sym) > 1 and a in sym and b in sym:
            sym = merge_pass(sym, a, b)
    return sym


def encode_text(
    text: str | None,
    merges: Sequence[tuple[str, str]],
    cache: dict[str, tuple[str, ...]] | None = None,
) -> list[str]:
    """Concatenated per-word encodings of a document, in word order."""
    if cache is None:
        cache = {}
    toks: list[str] = []
    for w in words_of(text):
        enc = cache.get(w)
        if enc is None:
            enc = cache[w] = encode_word(w, merges)
        toks.extend(enc)
    return toks


def bpe_encode_counts(
    df: DataFrame,
    key_col: str,
    text_col: str,
    merges: Sequence[tuple[str, str]],
) -> DataFrame:
    """Per-doc BPE stats under a committed merge list: word count, token
    count, and the md5 of the space-joined token stream (the oracle's
    value gate). Broadcast merges + mapInPandas with a per-batch word
    cache; Arrow-batched, zero shuffle."""
    import pandas as pd

    merge_list = [(str(a), str(b)) for a, b in merges]
    key_type = dict(df.dtypes)[key_col]
    schema = (
        f"{key_col} {key_type}, n_words long, n_bpe_tokens long, "
        "token_hash string"
    )
    cols = df.select(key_col, text_col)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, tuple[str, ...]] = {}
        for pdf in it:
            n_words, n_toks, hashes = [], [], []
            for t in pdf[text_col]:
                ws = words_of(t if isinstance(t, str) else None)
                toks: list[str] = []
                for w in ws:
                    enc = cache.get(w)
                    if enc is None:
                        enc = cache[w] = encode_word(w, merge_list)
                    toks.extend(enc)
                n_words.append(len(ws))
                n_toks.append(len(toks))
                hashes.append(
                    hashlib.md5(" ".join(toks).encode()).hexdigest()
                )
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col],
                    "n_words": n_words,
                    "n_bpe_tokens": n_toks,
                    "token_hash": hashes,
                }
            )

    return cols.mapInPandas(fn, schema)


def bpe_vocab(
    df: DataFrame,
    text_col: str,
    merges: Sequence[tuple[str, str]],
) -> list[str]:
    """The sorted distinct token strings the merge list produces on this
    corpus — the id space for ``bpe_encode_ids``. Bounded by (distinct
    corpus characters + len(merges)), so collecting it is driver-cheap.
    Computed with the SAME per-batch word-cache encode as the encoders,
    one Arrow pass + one distinct."""
    import pandas as pd

    merge_list = [(str(a), str(b)) for a, b in merges]

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, tuple[str, ...]] = {}
        for pdf in it:
            seen: set[str] = set()
            for t in pdf[text_col]:
                for w in words_of(t if isinstance(t, str) else None):
                    enc = cache.get(w)
                    if enc is None:
                        enc = cache[w] = encode_word(w, merge_list)
                    seen.update(enc)
            yield pd.DataFrame({"token": sorted(seen)})

    toks = df.select(text_col).mapInPandas(fn, "token string").distinct()
    return sorted(r["token"] for r in toks.collect())


def bpe_encode_ids(
    df: DataFrame,
    key_col: str,
    text_col: str,
    merges: Sequence[tuple[str, str]],
    vocab: Sequence[str],
    unk_id: int = -1,
) -> DataFrame:
    """Per-doc BPE token-id arrays — the trainer-facing encode
    (``bpe_encode_counts`` is the stats view; this one feeds
    ``sequence_pack`` -> ``pack_blocks`` -> ``materialize_blocks``).
    Token ids are positions in the given ``vocab`` (build it with
    ``bpe_vocab`` on the training corpus and COMMIT it — id stability
    across runs is the vocab file's job, not this function's); tokens
    outside the vocab map to ``unk_id``. Broadcast merges + vocab into
    mapInPandas with a per-batch word cache; Arrow-batched, zero
    shuffle."""
    import pandas as pd

    merge_list = [(str(a), str(b)) for a, b in merges]
    ids = {t: i for i, t in enumerate(vocab)}
    key_type = dict(df.dtypes)[key_col]
    schema = f"{key_col} {key_type}, token_ids array<long>"
    cols = df.select(key_col, text_col)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[int]] = {}
        for pdf in it:
            out = []
            for t in pdf[text_col]:
                doc: list[int] = []
                for w in words_of(t if isinstance(t, str) else None):
                    enc = cache.get(w)
                    if enc is None:
                        enc = cache[w] = [
                            ids.get(tok, unk_id)
                            for tok in encode_word(w, merge_list)
                        ]
                    doc.extend(enc)
                out.append(doc)
            yield pd.DataFrame({key_col: pdf[key_col], "token_ids": out})

    return cols.mapInPandas(fn, schema)

"""Incremental-pipeline operators: change detection, record fetch, batching.

Change detection reproduces the reference's S1/S2 scans
(core/src/query.rs:556-596; extension/src/executor.rs:98-135):

- join method: rows with NO embedding (left anti) UNION rows whose source
  ``updated_at`` is newer than the embedding's ``updated_at``
  (``> COALESCE(emb.updated_at, '-infinity')``);
- append method: single-table freshness predicate.

Batching reproduces R3/R4:

- ``batch_by_count``: fixed-size record batches (trigger batch_size 1000,
  core/src/query.rs:466-537);
- ``pack_by_token_budget``: greedy packing with Σtokens <= budget (10_000,
  core/src/query.rs:630-651) — sequential by definition, used per
  partition/driver work-list;
- ``batch_by_token_budget_distributed``: the SQL-expressible running-sum
  spec — batch = floor(exclusive_cumsum(tokens) / budget) — used when the
  work-list itself is huge (documented divergence: batches can overshoot
  the budget by less than one item).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MIN_TS = "0001-01-01 00:00:00"  # the reference's '0001-01-01' sentinel


def detect_changes_join(
    src: DataFrame,
    emb: DataFrame,
    pkey: str,
    update_time_col: str | None = None,
    emb_updated_col: str = "updated_at",
) -> DataFrame:
    """S1: new rows (anti-join) ∪ stale rows (freshness predicate)."""
    new_rows = src.join(emb, pkey, "left_anti")
    if update_time_col is None:
        return new_rows
    emb_ts = emb.select(
        pkey, F.col(emb_updated_col).alias("_emb_updated_at")
    )
    stale = (
        src.join(emb_ts, pkey, "inner")
        .filter(
            F.col(update_time_col)
            > F.coalesce(
                F.col("_emb_updated_at"), F.lit(MIN_TS).cast("timestamp")
            )
        )
        .drop("_emb_updated_at")
    )
    return new_rows.unionByName(stale)


def detect_changes_append(
    src: DataFrame,
    update_time_col: str,
    emb_updated_col: str,
) -> DataFrame:
    """S2: single-table variant — embedded timestamps live on the source."""
    return src.filter(
        F.col(emb_updated_col).isNull()
        | (
            F.col(update_time_col)
            > F.coalesce(F.col(emb_updated_col), F.lit(MIN_TS).cast("timestamp"))
        )
    )


def detect_orphans(derived: DataFrame, src: DataFrame, pkey: str) -> DataFrame:
    """Cascade-delete detection: rows of a derived dataset (embeddings /
    search-tokens) whose pkey no longer exists in the source.

    The reference gets this for free from ``FOREIGN KEY ... ON DELETE
    CASCADE`` on the embeddings table (core/src/query.rs:349-354); on a
    lake there are no FKs, so the cascade becomes an explicit anti-join
    (SURVEY.md §7 hard-part 2). Scale shape: a keyed anti-join — shuffles
    on pkey only, no fan-out; at 100 TB both sides prune to the single
    pkey column before the exchange.
    """
    return derived.join(src.select(pkey), pkey, "left_anti")


def fetch_by_ids(src: DataFrame, pkey: str, ids: list) -> DataFrame:
    """S3: ``pkey = ANY($1)`` — isin for short lists (broadcast literal)."""
    return src.filter(F.col(pkey).isin(ids))


def fetch_by_ids_df(src: DataFrame, ids_df: DataFrame, pkey: str) -> DataFrame:
    """S3 for large id sets: left-semi join (broadcast decided by AQE)."""
    return src.join(ids_df.select(pkey), pkey, "left_semi")


def concat_source_columns(cols: list[str], style: str = "space") -> Column:
    """NULL-safe concat of source columns (P6). Styles mirror the three
    variants: 'space' (core/src/query.rs:184-190), 'comma'
    (extension/src/executor.rs:179-188), 'prefixed'
    (worker/src/executor.rs:96-101)."""
    safe = [F.coalesce(F.col(c), F.lit("")) for c in cols]
    if style == "space":
        return F.concat_ws(" ", *safe)
    if style == "comma":
        return F.concat_ws(", ", *safe)
    if style == "prefixed":
        parts = [
            F.concat(F.lit(f"{c}: "), F.coalesce(F.col(c), F.lit("")))
            for c in cols
        ]
        return F.concat_ws(" ", *parts)
    raise ValueError(f"unknown concat style: {style}")


def batch_by_count(
    df: DataFrame, pkey: str, batch_size: int = 1000
) -> DataFrame:
    """R3: deterministic fixed-count batches, ordered by pkey.

    Adds ``batch_id``. The global row_number is a single-partition window —
    fine for work-lists (the queue-message analog); for huge backfills use
    the token-budget distributed variant or zipWithIndex-style salting.
    """
    w = Window.orderBy(pkey)
    return df.withColumn(
        "batch_id",
        F.floor((F.row_number().over(w) - 1) / batch_size).cast("long"),
    )


def pack_by_token_budget(
    items: list[tuple[str, int]], budget: int = 10_000
) -> list[list[str]]:
    """R4: greedy packing (reference parity, core/src/query.rs:630-651).

    items = [(record_id, token_count)]; each batch keeps Σtokens <= budget;
    an item larger than the budget gets its own batch.
    """
    batches: list[list[str]] = []
    cur: list[str] = []
    cur_tokens = 0
    for rid, toks in items:
        if cur and cur_tokens + toks > budget:
            batches.append(cur)
            cur = []
            cur_tokens = 0
        cur.append(rid)
        cur_tokens += toks
    if cur:
        batches.append(cur)
    return batches


def batch_by_token_budget_distributed(
    df: DataFrame, pkey: str, token_col: str, budget: int = 10_000
) -> DataFrame:
    """R4 scale spec: batch = floor(exclusive running Σtokens / budget),
    ordered by pkey. SQL-expressible (oracle-checkable) and shuffle-friendly."""
    w = Window.orderBy(pkey).rowsBetween(Window.unboundedPreceding, -1)
    return df.withColumn(
        "batch_id",
        F.floor(
            F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("double")
            / budget
        ).cast("long"),
    )


def apply_change_events(
    base: DataFrame,
    events: DataFrame,
    pkey: str,
    change_type_col: str = "_change_type",
    version_col: str | None = None,
) -> DataFrame:
    """Apply a CDF-style change-event log over a base snapshot, batch
    form — the same semantics ChangeFeedPipeline applies per micro-batch
    (streaming/incremental.py), expressed as one composable plan so the
    delete-cascade rules sit under the SQL oracle gate, not only pytest.

    Events carry the base columns plus ``change_type_col`` using Delta
    CDF's public vocabulary ('insert' | 'update_preimage' |
    'update_postimage' | 'delete'; delete rows need only a valid pkey).
    Rules (reference parity: trigger-coupled upsert + FK ON DELETE
    CASCADE, core/src/query.rs:349-354):

    1. ``update_preimage`` rows are dropped (they describe the OLD image);
    2. with ``version_col``, only the LATEST event per key applies, a
       delete outranking an upsert that carries the SAME version
       (deterministic delete-wins tie-break);
    3. surviving upserts replace/extend the base rows; surviving deletes
       remove them — a key seeing both (unversioned) nets out deleted.

    Without ``version_col`` there is no event order, so a key carrying
    several upsert payloads in one log has no "latest": ONE payload is
    kept per key (the lexicographically greatest over the payload
    columns — deterministic, but order-unaware; supply ``version_col``
    when real ordering matters). The output never duplicates a primary
    key.

    Scale shape: one keyed window shuffle over the EVENT log (change-log
    sized, not corpus sized) + keyed anti-joins against the base; no
    corpus-wide window, no driver collect.
    """
    ct = F.col(change_type_col)
    ev = events.filter(ct != F.lit("update_preimage"))
    drop_cols = [change_type_col] + (
        [version_col] if version_col is not None else []
    )
    if version_col is not None:
        w = Window.partitionBy(pkey).orderBy(
            F.col(version_col).desc(),
            (ct == F.lit("delete")).desc(),
        )
        ev = (
            ev.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    # r13 optimization round: ev is consumed THREE times (upserts,
    # deletes, and the base anti-join) — without a materialization point
    # the whole event-log plan (often a many-branch union) plus the
    # latest-version window re-ran per consumer (21 source scans on the
    # cdf_apply gate's plan, down to 8). Change-log sized, not corpus
    # sized (§2.4).
    ev = ev.localCheckpoint(eager=False)
    upserts = ev.filter(ct != F.lit("delete")).drop(*drop_cols)
    if version_col is None:
        # no order to pick a "latest" by: collapse multi-upsert keys
        # deterministically so the output never duplicates a pkey
        payload = [c for c in upserts.columns if c != pkey]
        wq = Window.partitionBy(pkey).orderBy(
            *[F.col(c).desc_nulls_last() for c in payload]
        )
        upserts = (
            upserts.withColumn("_rn", F.row_number().over(wq))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    dels = ev.filter(ct == F.lit("delete")).select(pkey)
    untouched = base.join(ev.select(pkey), pkey, "left_anti")
    return untouched.unionByName(upserts).join(dels, pkey, "left_anti")

"""Per-session DataFrame *plan* cache for repeated parquet scans.

Serving-path profile (scripts/serving_profile.py, r13 optimization
round): one ``hybrid_search`` spends ~1.2 s building plans on the
driver, of which ~0.45 s is four ``spark.read.parquet`` calls — each
re-resolving the SAME on-disk layout (file listing + footer schema
read + relation construction over py4j) that the previous query just
resolved. This module memoizes the resulting DataFrame HANDLE per
(SparkSession, path) behind an explicit freshness stamp.

This caches a logical plan only — never rows. Every action on the
returned frame recomputes from the parquet files exactly as an
uncached read would (the same property Spark's own session-level
FileStatusCache relies on); what is skipped is re-RESOLVING an
unchanged layout on the query critical path.

Correctness contract: the caller supplies a ``stamp`` that changes
whenever the path's file set may have changed —

- versioned snapshots pass the version number: version directories are
  immutable after the ``_CURRENT`` pointer flip, so equality is exact;
- mutable index layouts pass ``dir_entries_stamp`` (below): every
  mutation path writes/drops files inside the index dir or rewrites
  its meta/maintenance sidecars, and each of those bumps an entry's
  mtime (a file created, replaced, or removed bumps its PARENT
  directory's mtime; sidecar rewrites go through os.replace) — so a
  stale hit would require a mutation that leaves every top-level entry
  untouched, which no writer here can do.

``stamp=None`` means "could not fingerprint" (non-local path, races):
the read is simply not cached.

The cache is keyed weakly on the SparkSession (a stopped session's
entries vanish with it) and holds ONE entry per path — bounded by the
number of live datasets, each entry a plan handle, not data.
"""

from __future__ import annotations

import os
import weakref
from typing import Hashable

from pyspark.sql import DataFrame, SparkSession

_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def cached_parquet_scan(
    spark: SparkSession,
    path: str,
    stamp: Hashable | None,
    key: str | None = None,
) -> DataFrame:
    """``spark.read.parquet(path)``, memoized per (session, key) while
    ``stamp`` is unchanged. ``stamp=None`` bypasses the cache.

    ``key`` defaults to the path; versioned stores pass their ROOT so a
    new version REPLACES the entry instead of accumulating one handle
    per version dir over a long-lived session."""
    if stamp is None:
        return spark.read.parquet(path)
    key = os.path.abspath(key if key is not None else path)
    try:
        per_sess = _CACHE.setdefault(spark, {})
    except TypeError:  # session not weak-referenceable — don't cache
        return spark.read.parquet(path)
    hit = per_sess.get(key)
    if hit is not None and hit[0] == stamp:
        return hit[1]
    df = spark.read.parquet(path)
    per_sess[key] = (stamp, df)
    return df


def version_dir_stamp(vdir: str, version: int) -> tuple | None:
    """Freshness stamp for a snapshot VERSION directory: the version
    number plus the dir's inode and mtime. The number alone is NOT
    enough — a dataset dropped and recreated at the same root restarts
    at v=1, and a bare-version stamp would serve the dead v=1's plan
    (measured: FileNotFoundException in the dedup-index empty-then-
    refill path). A recreated dir has a fresh inode/mtime; a LIVE
    version dir is immutable after the pointer flip, so its stat is
    stable. None (→ no caching) for non-local paths."""
    try:
        st = os.stat(vdir)
    except OSError:
        return None
    return (version, st.st_ino, st.st_mtime_ns)


def tree_stamp(path: str, max_entries: int = 50_000) -> tuple | None:
    """Recursive freshness stamp for an EXTERNALLY-WRITTEN driver-local
    source path: every directory and file (path, mtime_ns, size). Any
    file added, removed, replaced, or rewritten in place changes an
    entry. Returns None (→ no caching) for non-local paths or when the
    tree is larger than ``max_entries`` (walking it would cost more
    than the re-resolution it saves)."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    if not os.path.isdir(path):
        return ((path, st.st_mtime_ns, st.st_size),)
    entries: list = []
    try:
        for dirpath, _dirnames, filenames in os.walk(path):
            entries.append((dirpath, os.stat(dirpath).st_mtime_ns, -1))
            for name in filenames:
                fp = os.path.join(dirpath, name)
                s = os.stat(fp)
                entries.append((fp, s.st_mtime_ns, s.st_size))
                if len(entries) > max_entries:
                    return None
    except OSError:
        return None
    return tuple(sorted(entries))


def dir_entries_stamp(path: str) -> tuple | None:
    """Freshness stamp for a driver-local single-level partitioned
    layout: every top-level entry's (name, mtime_ns). Any file
    created/replaced/removed inside a partition subdir bumps that
    subdir's mtime; sidecar files (_META/_MAINT/…) are entries
    themselves. Returns None (→ no caching) when the path is not a
    readable local directory."""
    try:
        with os.scandir(path) as it:
            return tuple(
                sorted((e.name, e.stat().st_mtime_ns) for e in it)
            )
    except OSError:
        return None

"""Driver-side MinHash for small micro-batches — bit-parity with the
Spark expressions in operators/dedup.py.

A realtime micro-batch (hundreds of rows) pays seconds of Spark
machinery — the shingle explode + 16-way min-agg SHUFFLE for
signatures, plus per-step job scheduling for band rows, bucket lists,
and candidate checkpoints — on text whose MinHash is microseconds of
arithmetic. This module is the MinHash analog of the postings index's
pure-Python XXH64 trick (fts_index.py:50, which cut the FTS probe
0.72→0.27 s by mapping query terms to partition buckets driver-side):
compute the batch's signatures, band rows, AND partition buckets on
the driver, so the only Spark jobs left on the dedup-filter path are
the two pruned index reads (band buckets; signature-sidecar buckets).

Bit-parity contract (property-tested in tests/test_dedup_local.py
against the live Spark expressions, the test_fts_index.py:506 model):

- ``signature_rows`` == ``operators.dedup.minhash_signatures``:
  lower → split ``[^a-z0-9]+`` → k-word shingles (whole-text fallback
  below k words) → polynomial-roll code ``acc*31+ord(c) mod 1_000_003``
  seeded 7 → ``min((2i+3)·code + (5i+7) mod 999_983)`` per component.
  Words contain only ``[a-z0-9]`` by construction, so ``ord`` and
  Spark's ``ascii`` agree; shingle-set dedup is skipped because min()
  is idempotent over duplicates.
- ``band_rows`` == ``MinHashBandIndexManager._band_rows``: band_key is
  the comma-joined signature slice, ``bb = pmod(xxhash64(band ':'
  band_key), band_buckets)`` via the shared pure-Python XXH64.
- ``key_bucket`` == ``BucketedSnapshotDataset._bucket_expr`` for
  bigint/string keys: Spark's xxhash64 of a LongType column hashes the
  value as one 8-byte little-endian word (XXH64.hashLong), which is
  exactly ``_xxh64(struct.pack('<q', v))``.

The signature inner loop is numpy-vectorized per document over the
word axis using the poly-hash linearity ``H(a·b) = H(a)·31^len(b) +
H0(b) mod M`` (per-word seed-0 hashes and ``31^len`` are memoized
across the batch), so a 5,000-row batch signs in tens of
milliseconds — the driver path's row threshold is an I/O bound
(collect size), not a compute one.
"""

from __future__ import annotations

import re
import struct
from dataclasses import dataclass

import numpy as np

from pg_vectorize_spark.fts_index import _xxh64
from pg_vectorize_spark.operators.dedup import MINHASH_PRIME
from pg_vectorize_spark.providers.local import HASH_MOD, HASH_MULT, HASH_SEED

_WORD_SPLIT = re.compile(r"[^a-z0-9]+")

#: pkey Spark types the driver-side path supports end-to-end: the
#: sidecar bucket pruning needs a driver-computable xxhash64 of the KEY
#: value, implemented for LongType (8-byte LE word) and StringType
#: (UTF-8 bytes). Other key types fall back to the Spark path.
LOCAL_KEY_TYPES = ("bigint", "string")


@dataclass(frozen=True)
class LocalSigs:
    """A micro-batch's driver-computed MinHash state, threaded from
    ``engine._dedup_filter_new`` to the SAME batch's ``_dedup_upsert``
    (the DataFrame ``sigs`` analog, engine.py).

    ``rows``: ``(key, signature)`` for EXACTLY the batch keys that
    survived the filter — the upsert contract: unlike the DataFrame
    path (which narrows a superset by semi-join), the engine narrows
    driver-side, so the manager indexes ``rows`` as-is.
    ``prior_keys``: the surviving keys already present in the
    embeddings snapshot (updates). An empty set certifies a pure-insert
    batch: the upsert skips the old-band-row sidecar lookup entirely.
    ``pkey_type``: Spark simpleString of the key column
    (one of LOCAL_KEY_TYPES), used to rebuild typed DataFrames.
    """

    rows: tuple
    prior_keys: frozenset
    pkey_type: str


def _word_parts(word: str, cache: dict) -> tuple[int, int]:
    """(seed-0 poly hash, 31^len mod M) for one word, memoized."""
    got = cache.get(word)
    if got is None:
        acc = 0
        for ch in word:
            acc = (acc * HASH_MULT + ord(ch)) % HASH_MOD
        got = (acc, pow(HASH_MULT, len(word), HASH_MOD))
        cache[word] = got
    return got


def shingle_codes(
    text: str | None, k: int, cache: dict | None = None
) -> np.ndarray:
    """int64 poly-hash codes of the text's k-word shingles (with
    duplicates; min() downstream is dedup-insensitive). Whole-text
    fallback below k words, '' (code = seed) for empty/NULL text —
    the word_shingles_expr semantics."""
    if cache is None:
        cache = {}
    words = [w for w in _WORD_SPLIT.split((text or "").lower()) if w]
    if len(words) < k:
        joined = " ".join(words)
        acc = HASH_SEED
        if not joined:
            # Spark's split('', '') is [''] — poly_hash_expr folds ONE
            # element with ascii('') = 0, so the empty shingle hashes
            # to seed*31, not seed
            acc = (acc * HASH_MULT) % HASH_MOD
        for ch in joined:
            acc = (acc * HASH_MULT + ord(ch)) % HASH_MOD
        return np.array([acc], dtype=np.int64)
    parts = [_word_parts(w, cache) for w in words]
    ph = np.array([p for p, _ in parts], dtype=np.int64)
    pw = np.array([w for _, w in parts], dtype=np.int64)
    n_sh = len(words) - k + 1
    # fold words left-to-right across all windows at once:
    # acc = acc*31^len(w) + H0(w), with a '*31 + 32' space step between
    acc = np.full(n_sh, HASH_SEED, dtype=np.int64)
    for j in range(k):
        if j:
            acc = (acc * HASH_MULT + 32) % HASH_MOD  # ord(' ') == 32
        acc = (acc * pw[j : j + n_sh] + ph[j : j + n_sh]) % HASH_MOD
    return acc


def signature_rows(
    rows: list[tuple], num_hashes: int, k: int
) -> list[tuple]:
    """[(key, [int]*num_hashes)] from [(key, text)] — bit-parity with
    ``minhash_signatures`` (signature component i = min over shingle
    codes of (2i+3)·code + (5i+7) mod MINHASH_PRIME)."""
    a = np.arange(num_hashes, dtype=np.int64)[:, None] * 2 + 3
    b = np.arange(num_hashes, dtype=np.int64)[:, None] * 5 + 7
    cache: dict = {}
    out = []
    for key, text in rows:
        codes = shingle_codes(text, k, cache)
        sig = ((a * codes[None, :] + b) % MINHASH_PRIME).min(axis=1)
        out.append((key, [int(x) for x in sig]))
    return out


def band_key(sig: list, band: int, rows_per_band: int) -> str:
    """Comma-joined signature slice — the _band_rows/lsh_candidates
    band key rendering (Spark casts long → string with no sign/pad)."""
    lo = band * rows_per_band
    return ",".join(str(int(x)) for x in sig[lo : lo + rows_per_band])


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= 1 << 63 else h


def band_bucket(band: int, key: str, band_buckets: int) -> int:
    """pmod(xxhash64(concat_ws(':', band, band_key)), band_buckets) —
    Python's % of the SIGNED hash equals Spark's pmod."""
    return _signed(_xxh64(f"{band}:{key}".encode())) % band_buckets


def band_rows(
    sig_rows: list[tuple],
    bands: int,
    rows_per_band: int,
    band_buckets: int,
) -> list[tuple]:
    """[(key, band, band_key, bb)] — MinHashBandIndexManager._band_rows
    computed driver-side."""
    out = []
    for key, sig in sig_rows:
        for band in range(bands):
            bk = band_key(sig, band, rows_per_band)
            out.append((key, band, bk, band_bucket(band, bk, band_buckets)))
    return out


def key_bucket(value, n_buckets: int) -> int:
    """pmod(xxhash64(key), n_buckets) for a bigint/string key — the
    BucketedSnapshotDataset._bucket_expr, driver-side. Spark hashes a
    LongType as one 8-byte little-endian word and a StringType as its
    UTF-8 bytes, both seed 42."""
    if isinstance(value, bool) or not isinstance(value, (int, str)):
        raise TypeError(
            f"driver-side key bucketing supports int/str keys, got "
            f"{type(value).__name__}"
        )
    data = (
        struct.pack("<q", value)
        if isinstance(value, int)
        else value.encode("utf-8")
    )
    return _signed(_xxh64(data)) % n_buckets


def est_jaccard(sig_a: list, sig_b: list, num_hashes: int) -> float:
    """Agreeing-component fraction — the MinHash Jaccard estimator
    (minhash_jaccard_estimate's zip_with form)."""
    return sum(x == y for x, y in zip(sig_a, sig_b)) / float(num_hashes)


def within_batch_dup_keys(
    sig_rows: list[tuple],
    bands: int,
    rows_per_band: int,
    num_hashes: int,
    min_jaccard: float,
) -> set:
    """Batch keys near-duplicating a SMALLER-keyed row of the same
    batch — within_batch_dup_keys' lowest-key-survives greedy chain
    (pairs a<b via band collision, est >= threshold drops b), computed
    over the in-memory signatures."""
    buckets: dict = {}
    for key, sig in sig_rows:
        for band in range(bands):
            buckets.setdefault(
                (band, band_key(sig, band, rows_per_band)), []
            ).append(key)
    sigs = dict(sig_rows)
    dropped: set = set()
    seen_pairs: set = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        members = sorted(set(members))
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                if (a, b) in seen_pairs:
                    continue
                seen_pairs.add((a, b))
                if (
                    est_jaccard(sigs[a], sigs[b], num_hashes)
                    >= min_jaccard
                ):
                    dropped.add(b)
    return dropped

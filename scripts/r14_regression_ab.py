"""r14 adjudication probe (VERDICT r13 #1): interleaved A/B for the two
driver-measured regressions on touched paths.

- dedup_minhash_lsh: gate-level lazy signature checkpoint (r13 form, B)
  vs no checkpoint (r12 form, A).
- lang_id: bound-argmax lang_id_expr (r13 form, B) vs the nested-when
  greatest() form (r12 form, A).

Methodology mirrors bench.py exactly: same session configs
(local[32], shuffle.partitions=32, AQE on, driver 8g), fresh DataFrame
construction per run, noop sink, best-of-5 per round, >=3 interleaved
ABBA rounds so box drift hits both variants equally. Value parity is
asserted before timing (sorted rows equal).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
RUNS = int(sys.argv[3]) if len(sys.argv) > 3 else 5

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "8g")
    .appName("r14-regression-ab")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry  # noqa: E402
from pg_vectorize_spark.functions.text import (  # noqa: E402
    LANG_MARKERS,
    SCRIPT_LANGS,
    lang_id_expr,
)
from pg_vectorize_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_candidates,
    minhash_signatures,
)


def lang_id_expr_r12(text: Column) -> Column:
    """The pre-9f1f763 nested-when/greatest form, verbatim."""
    t = F.coalesce(text, F.lit(""))
    words = F.array_distinct(
        F.filter(F.split(F.lower(t), "[^a-z0-9]+"), lambda x: x != "")
    )
    scores = {
        lang: F.size(
            F.array_intersect(words, F.array(*[F.lit(w) for w in markers]))
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    best_score = F.greatest(*scores.values())
    result = F.lit("unknown")
    for lang in sorted(LANG_MARKERS, reverse=True):
        result = F.when(
            (scores[lang] > 0) & (scores[lang] == best_score), F.lit(lang)
        ).otherwise(result)
    for lang, cls in reversed(SCRIPT_LANGS):
        result = F.when(t.rlike(cls), F.lit(lang)).otherwise(result)
    return result


def q_lang_id_A(s, sf):  # r12 form
    docs = entry._t(s, sf, "documents")
    return docs.select("doc_id", lang_id_expr_r12(F.col("text")).alias("lang_pred"))


def q_lang_id_B(s, sf):  # r13 form (current)
    docs = entry._t(s, sf, "documents")
    return docs.select("doc_id", lang_id_expr(F.col("text")).alias("lang_pred"))


def q_mh_lsh_A(s, sf):  # r12 form: no checkpoint
    docs = entry._t(s, sf, "documents")
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=16, k=3)
    return minhash_lsh_candidates(sigs, bands=4, rows_per_band=4)


def q_mh_lsh_B(s, sf):  # r13 form (current): lazy checkpoint
    docs = entry._t(s, sf, "documents")
    sigs = minhash_signatures(
        docs, "text", "doc_id", num_hashes=16, k=3
    ).localCheckpoint(eager=False)
    return minhash_lsh_candidates(sigs, bands=4, rows_per_band=4)


def parity(fa, fb, sort_cols):
    ra = sorted(map(tuple, fa(spark, SF).collect()))
    rb = sorted(map(tuple, fb(spark, SF).collect()))
    assert ra == rb, f"parity FAILED ({len(ra)} vs {len(rb)} rows)"
    print(f"  parity ok: {len(ra)} rows identical")


def best_of(fn, runs=RUNS):
    times = []
    for _ in range(runs):
        t0 = time.time()
        df = fn(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    return min(times)


def ab(name, fa, fb):
    print(f"== {name} ==")
    parity(fa, fb, None)
    a_bests, b_bests = [], []
    for r in range(ROUNDS):
        # ABBA ordering within round pairs to cancel drift
        if r % 2 == 0:
            a_bests.append(best_of(fa)); b_bests.append(best_of(fb))
        else:
            b_bests.append(best_of(fb)); a_bests.append(best_of(fa))
        print(
            f"  round {r}: A(r12)={a_bests[-1]:.3f}s  B(r13)={b_bests[-1]:.3f}s"
        )
    ma, mb = min(a_bests), min(b_bests)
    print(
        f"  MIN-OF-ROUNDS: A(r12)={ma:.3f}s B(r13)={mb:.3f}s  "
        f"B/A={mb/ma:.3f} ({'B faster' if mb < ma else 'A faster'})"
    )


# warmup (same as bench.py)
entry.queries()["token_count"](spark, SF).write.format("noop").mode(
    "overwrite"
).save()

ab("lang_id", q_lang_id_A, q_lang_id_B)
ab("dedup_minhash_lsh", q_mh_lsh_A, q_mh_lsh_B)
spark.stop()

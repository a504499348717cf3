"""Training-data text-quality ops: within-doc repetition (Gopher-style
duplicate n-gram fraction) and PII/link scrubbing. The gate corpus has no
URLs/emails, so the positive match/replace paths are pinned here on doped
rows; oracle parity for the corpus is covered by scripts/check_oracle.py
(`repetition_score`, `pii_scrub`)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pg_vectorize_spark.functions.text import (
    pii_count_exprs,
    raw_words_expr,
    repetition_score_expr,
    scrub_pii_expr,
    word_ngrams_expr,
    word_shingles_expr,
)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_word_ngrams_order_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "one two three four"), (2, "one two"), (3, "one"), (4, None)],
        "id long, txt string",
    )
    out = {
        r["id"]: r["g"]
        for r in df.select(
            "id", word_ngrams_expr(raw_words_expr(F.col("txt")), 3).alias("g")
        ).collect()
    }
    assert out[1] == ["one two three", "two three four"]
    assert out[2] == [] and out[3] == [] and out[4] == []


def test_word_shingles_matches_ngram_chain(spark):
    """The zip_with shingle rewrite keeps the old semantics: distinct
    k-grams for docs >= k words, whole-doc join below k."""
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y"), (3, "")], "id long, txt string"
    )
    out = {
        r["id"]: r["s"]
        for r in df.select(
            "id", word_shingles_expr(F.col("txt"), 3).alias("s")
        ).collect()
    }
    assert out[1] == ["a b a", "b a b"]  # distinct, doc order kept
    assert out[2] == ["x y"]  # < k words -> single joined shingle
    assert out[3] == [""]


def test_repetition_score_values(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "all words differ here"), (3, "a")],
        "id long, txt string",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            repetition_score_expr(F.col("txt"), 2).alias("r2"),
            repetition_score_expr(F.col("txt"), 3).alias("r3"),
        ).collect()
    }
    # 5 bigrams, 2 distinct -> 1 - 2/5
    assert math.isclose(out[1]["r2"], 0.6, rel_tol=1e-12)
    # 4 trigrams, 2 distinct -> 1 - 2/4
    assert math.isclose(out[1]["r3"], 0.5, rel_tol=1e-12)
    assert out[2]["r2"] == 0.0
    assert out[3]["r2"] == 0.0  # below k words -> 0, not NULL


def test_scrub_pii_replaces_urls_then_emails(spark):
    df = spark.createDataFrame(
        [
            (1, "see https://ex.com/p?u=a@b.com and mail me at c.d+x@e.org"),
            (2, "no pii here"),
            (3, None),
        ],
        "id long, txt string",
    )
    counts = pii_count_exprs(F.col("txt"))
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            scrub_pii_expr(F.col("txt")).alias("s"),
            counts["n_urls"].alias("u"),
            counts["n_emails"].alias("e"),
        ).collect()
    }
    # the embedded email is consumed by the URL replacement
    assert out[1]["s"] == "see <URL> and mail me at <EMAIL>"
    assert out[1]["u"] == 1
    # counts are raw-occurrence counts on the original text (both engines)
    assert out[1]["e"] == 2
    assert out[2]["s"] == "no pii here" and out[2]["u"] == 0
    assert out[3]["s"] == ""


class TestNormalization:
    """strip_html_expr / normalize_ws_expr — crawl-corpus cleanup pass."""

    def _one(self, spark, expr_fn, s):
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(s,)], "t string")
        return df.select(expr_fn(F.col("t")).alias("o")).head()["o"]

    def test_strip_html_basic(self, spark):
        from pg_vectorize_spark.functions.text import strip_html_expr

        got = self._one(
            spark, strip_html_expr,
            '<div id="a">Hello <b>world</b>!</div>\n\n  <br/>bye',
        )
        assert got == "Hello world ! bye"

    def test_entities_decode_one_level(self, spark):
        from pg_vectorize_spark.functions.text import strip_html_expr

        # &amp;lt; decodes to &lt; (one level), NOT to <
        got = self._one(spark, strip_html_expr, "a &amp;lt; b &lt; c &amp; d")
        assert got == "a &lt; b < c & d"

    def test_malformed_markup_degrades_to_text(self, spark):
        from pg_vectorize_spark.functions.text import strip_html_expr

        # a bare '<' opens a "tag" that runs to the next '>' lexically —
        # the documented degrade-to-text behavior (no parser, no errors);
        # and with no '>' at all, nothing is stripped
        got = self._one(spark, strip_html_expr, "5 < 6 but x<y<z> done")
        assert got == "5 done"
        got = self._one(spark, strip_html_expr, "all < kept here")
        assert got == "all < kept here"

    def test_normalize_ws_and_null(self, spark):
        from pyspark.sql import functions as F

        from pg_vectorize_spark.functions.text import normalize_ws_expr

        got = self._one(
            spark, normalize_ws_expr, "  a\t\tb\r\nc \f d  "
        )
        assert got == "a b c d"
        df = spark.createDataFrame([(None,)], "t string")
        assert df.select(
            normalize_ws_expr(F.col("t")).alias("o")
        ).head()["o"] == ""


class TestC4Flags:
    """C4 cleaning rules (Raffel et al. 2020 §2.2): line-level terminal
    punctuation + min-word filter, sentence floor, page markers."""

    def test_line_filter_and_markers(self, spark):
        import pyspark.sql.functions as F

        from pg_vectorize_spark.functions.text import c4_flags_exprs

        text = (
            "A good sentence with enough words.\n"
            "short.\n"                       # terminal but < 3 words
            "no terminal punctuation here\n"
            'He said "stop right there."\n'
            "Another proper line ends here!\n"
        )
        df = spark.createDataFrame(
            [
                (1, text),
                (2, "Lorem ipsum dolor sit amet. More text follows here."),
                (3, "var f = function() { return 1; }. Ok then. Fine."),
                (4, None),
            ],
            "id long, text string",
        )
        flags = c4_flags_exprs(F.col("text"), min_sentences=2)
        out = {
            r["id"]: r
            for r in df.select(
                "id", *[flags[k].alias(k) for k in sorted(flags)]
            ).collect()
        }
        r1 = out[1]
        assert r1["n_lines"] == 5
        assert r1["n_kept_lines"] == 3  # drops 'short.' and no-punct line
        assert r1["clean_text"].splitlines() == [
            "A good sentence with enough words.",
            'He said "stop right there."',
            "Another proper line ends here!",
        ]
        assert r1["pass_c4"]
        assert out[2]["has_lorem_ipsum"] and not out[2]["pass_c4"]
        assert out[3]["has_brace"] and not out[3]["pass_c4"]
        r4 = out[4]
        assert r4["n_lines"] == 0 and not r4["pass_c4"]

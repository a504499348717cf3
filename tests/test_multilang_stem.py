"""Multilingual light-stem rule sets (r12 — VERDICT r11 #6): the
Spanish/French analyzers must satisfy the same three-engine parity
contract as the English set — the Python form (light_stem), the Spark
regexp_replace chain (stem_token_expr), and the DuckDB RE2 chain
(oracle.sql_stem) produce bit-identical outputs rule for rule — plus
the analyzer invariants the query-scoped fast path and the multilang
dispatch rely on (first char preserved, never lengthens), and
query-vs-document analyzer agreement per language.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pg_vectorize_spark import oracle as O
from pg_vectorize_spark.functions.text import (
    LIGHT_STEM_RULES_BY_LANG,
    STEMMED_LANGS,
    STOP_WORDS_BY_LANG,
    analyze_query,
    detect_lang,
    light_stem,
    multilang_tokens_expr,
    stem_token_expr,
    tokens_expr,
)

# Spec fixtures: (token, expected stem) per language — at least one word
# per rule, plus no-rule words and short-token guards.
STEM_FIXTURES: dict[str, list[tuple[str, str]]] = {
    "es": [
        ("luces", "luz"),            # ces -> z
        ("veces", "vez"),
        ("ciudades", "ciudad"),      # plural s, then final-e
        ("papeles", "papel"),
        ("casas", "casa"),           # vowel + s
        ("libros", "libro"),
        ("rapidamente", "rapida"),   # -mente
        ("hablando", "habl"),        # -ando
        ("comiendo", "com"),         # -iendo
        ("clases", "clas"),          # clases -> clas ...
        ("clase", "clas"),           # ... and clase -> clas (final e)
        ("azul", "azul"),            # no rule fires
        ("es", "es"),                # short tokens guarded by {2,3}
        ("dos", "dos"),
    ],
    "fr": [
        ("chateaux", "chateau"),     # -eaux
        ("journaux", "journal"),     # -aux -> -al
        ("maisons", "maison"),       # plural s
        ("rapidement", "rapid"),     # -ment, then final e
        ("rapide", "rapid"),         # agrees with the adverb
        ("parlant", "parl"),         # -ant
        ("petite", "petit"),         # final e
        ("classes", "class"),        # plural s, then final e
        ("classe", "class"),         # agrees with the plural
        ("bleu", "bleu"),            # no rule fires
        ("les", "les"),              # short tokens guarded
    ],
    "en": [
        ("running", "run"),
        ("windows", "window"),
        ("dresses", "dress"),
        ("merge", "merg"),
    ],
    "de": [
        # CISTEM-style iterative strip: every inflected form of a lemma
        # must land on the SAME stem (the review-r12 contract)
        ("kindern", "kind"),
        ("kinder", "kind"),
        ("kindes", "kind"),
        ("kind", "kind"),
        ("kleinem", "klei"),
        ("kleinen", "klei"),
        ("kleiner", "klei"),
        ("kleines", "klei"),
        ("klein", "klei"),
        ("katzen", "katz"),
        ("katze", "katz"),
        ("lehrers", "lehr"),
        ("lehrer", "lehr"),
        ("wagens", "wag"),
        ("wagen", "wag"),
        ("hauses", "hau"),
        ("haus", "hau"),
        ("autos", "auto"),
        ("wald", "wald"),            # no rule fires
        ("des", "des"),              # short tokens guarded
    ],
}


class TestThreeEngineParity:
    @pytest.mark.parametrize("lang", sorted(STEM_FIXTURES))
    def test_python_form_matches_fixtures(self, lang):
        for tok, want in STEM_FIXTURES[lang]:
            assert light_stem(tok, lang) == want, (lang, tok)

    @pytest.mark.parametrize("lang", sorted(STEM_FIXTURES))
    def test_spark_chain_matches_python(self, spark, lang):
        toks = [t for t, _ in STEM_FIXTURES[lang]]
        df = spark.createDataFrame([(t,) for t in toks], "tok string")
        got = {
            r["tok"]: r["stem"]
            for r in df.select(
                "tok", stem_token_expr(F.col("tok"), lang).alias("stem")
            ).collect()
        }
        for tok, want in STEM_FIXTURES[lang]:
            assert got[tok] == want, (lang, tok)

    @pytest.mark.parametrize("lang", sorted(STEM_FIXTURES))
    def test_duckdb_chain_matches_python(self, lang):
        con = duckdb.connect()
        for tok, want in STEM_FIXTURES[lang]:
            got = con.sql(
                f"SELECT {O.sql_stem(repr(tok), lang)} AS s"
            ).fetchone()[0]
            assert got == want, (lang, tok)

    @pytest.mark.parametrize("lang", sorted(LIGHT_STEM_RULES_BY_LANG))
    def test_rule_invariants(self, lang):
        """Every rule replaces a suffix with something strictly shorter
        and never touches the first character — the invariants the
        query-scoped fast path (en) and dispatch sanity rely on."""
        corpus = [t for t, _ in STEM_FIXTURES[lang]] + [
            "information",
            "generaciones",
            "nationales",
            "aaa",
            "zz",
            "a",
            "",
        ]
        for tok in corpus:
            s = light_stem(tok, lang)
            assert len(s) <= len(tok), (lang, tok, s)
            if tok:
                assert s and s[0] == tok[0], (lang, tok, s)


class TestMultilangAnalyzer:
    DOCS = [
        (1, "the windows are running the merged batches today", "en"),
        (2, "las casas y las luces de las ciudades grandes", "es"),
        (3, "les maisons et les journaux des villes rapidement", "fr"),
        (4, "der hund und die katze sind in dem haus mit den", "de"),
    ]

    def test_detect_lang_matches_spark(self, spark):
        from pg_vectorize_spark.functions.text import lang_id_expr

        df = spark.createDataFrame(
            [(i, t) for i, t, _ in self.DOCS], "id long, text string"
        )
        got = {
            r["id"]: r["lang"]
            for r in df.select(
                "id", lang_id_expr(F.col("text")).alias("lang")
            ).collect()
        }
        for i, t, want in self.DOCS:
            assert got[i] == want, (i, t)
            assert detect_lang(t) == want, (i, t)

    def test_dispatch_stems_per_language(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, t, _ in self.DOCS], "id long, text string"
        )
        got = {
            r["id"]: set(r["toks"])
            for r in df.select(
                "id",
                multilang_tokens_expr(F.col("text")).alias("toks"),
            ).collect()
        }
        assert "run" in got[1] and "window" in got[1]  # en rules
        assert "luz" in got[2] and "ciudad" in got[2]  # es rules
        assert "casa" in got[2]  # es stop-words removed 'las/y/de'
        assert "las" not in got[2]
        assert "maison" in got[3] and "journal" in got[3]  # fr rules
        assert "les" not in got[3]
        # de rules (r12): German stop list removed, suffixes stripped
        assert "hund" in got[4] and "katz" in got[4]
        assert "hau" in got[4]  # haus -> hau (CISTEM-style final s)
        assert "der" not in got[4] and "und" not in got[4]

    @pytest.mark.parametrize("lang", sorted(STEMMED_LANGS))
    def test_query_analyzer_agrees_with_doc_analyzer(self, spark, lang):
        """analyze_query(lang) must equal tokens_expr(lang) on the same
        string — the match contract fts search depends on."""
        text = {
            "en": "the windows are running merged batches",
            "es": "las luces de las ciudades y las casas grandes",
            "fr": "les journaux des maisons et les petites villes",
            "de": "die katzen sind in dem kleinen haus mit den kindern",
        }[lang]
        want = analyze_query(text, stem=True, lang=lang)
        df = spark.createDataFrame([(text,)], "t string")
        got = df.select(
            tokens_expr(F.col("t"), stem=True, lang=lang).alias("toks")
        ).collect()[0]["toks"]
        assert list(got) == want

    def test_search_multilang_analyzer_end_to_end(self, spark):
        """fts_search(analyzer='multilang'): a Spanish query stemmed
        with Spanish rules matches Spanish docs whose tokens were
        stemmed with the same rules."""
        from pg_vectorize_spark.operators.search import full_text_search

        df = spark.createDataFrame(
            [(i, t) for i, t, _ in self.DOCS], "id long, content string"
        )
        got = full_text_search(
            df,
            "id",
            "las luces de la ciudad",  # 'luces'->'luz', 'ciudad'
            ["content"],
            num_results=5,
            analyzer="multilang",
        )
        ids = [r["id"] for r in got.collect()]
        assert ids and ids[0] == 2

    def test_stop_word_lists_ascii_only(self):
        for lang, words in STOP_WORDS_BY_LANG.items():
            for w in words:
                assert w == w.lower() and w.isascii(), (lang, w)

    def test_marker_free_keyword_query_still_matches(self, spark):
        """Review r12: short keyword queries omit exactly the stop words
        language detection keys on — 'luces ciudad' detects as unknown.
        The multilang analyzer must then take the UNION of every stem
        variant so the query still matches documents stemmed under any
        rule set (OR-semantics search)."""
        from pg_vectorize_spark.operators.search import (
            _analyze,
            full_text_search,
        )

        assert detect_lang("luces ciudad") == "unknown"
        terms = _analyze("luces ciudad", "multilang")
        assert "luz" in terms and "ciudad" in terms  # es stems present
        assert "luces" in terms  # unstemmed variant kept

        df = spark.createDataFrame(
            [(i, t) for i, t, _ in self.DOCS], "id long, content string"
        )
        got = full_text_search(
            df, "id", "luces ciudad", ["content"],
            num_results=5, analyzer="multilang",
        )
        ids = [r["id"] for r in got.collect()]
        assert ids and ids[0] == 2

        # English keyword query, also marker-free
        terms_en = _analyze("running windows", "multilang")
        assert "run" in terms_en and "window" in terms_en


class TestJobLevelAnalyzer:
    """fts_params={"analyzer": ...} (r12): the job's stored token shape
    AND its query analysis both follow the configured analyzer, so
    match semantics hold across the tokens snapshot, the postings-index
    probe, and hybrid fusion."""

    def _mk(self, spark, tmp_path, analyzer):
        from pg_vectorize_spark.engine import VectorizeSession

        rows = [
            (1, "the windows are running the merged batches today"),
            (2, "las casas y las luces de las ciudades grandes"),
            (3, "les maisons et les journaux des villes rapidement"),
        ]
        src = str(tmp_path / "src")
        spark.createDataFrame(
            rows, "id long, content string"
        ).write.parquet(src)
        sess = VectorizeSession(
            spark, workspace=str(tmp_path / f"ws_{analyzer}")
        )
        sess.create_job(
            "mjob",
            src,
            columns=["content"],
            primary_key="id",
            fts_params={"analyzer": analyzer},
        )
        return sess

    def test_multilang_job_spanish_query_hits_index_path(
        self, spark, tmp_path
    ):
        sess = self._mk(spark, tmp_path, "multilang")
        # stored tokens carry per-language stems
        toks = {
            r["id"]: set(r["search_tokens"])
            for r in sess._tok_ds("mjob").read().collect()
        }
        assert "luz" in toks[2] and "maison" in toks[3]
        assert "run" in toks[1]
        # Spanish query -> Spanish stems -> postings probe matches doc 2
        got = sess.full_text_search("mjob", "las luces de la ciudad")
        assert got and got[0]["id"] == 2
        # hybrid path agrees (fts branch shares the analyzer)
        hyb = sess.hybrid_search(
            "mjob", "las luces de la ciudad", num_results=2
        )
        assert hyb and hyb[0]["id"] == 2

    def test_default_analyzer_unchanged(self, spark, tmp_path):
        sess = self._mk(spark, tmp_path, "english")
        toks = {
            r["id"]: set(r["search_tokens"])
            for r in sess._tok_ds("mjob").read().collect()
        }
        # english rules applied to every doc regardless of language
        assert "run" in toks[1] and "window" in toks[1]
        assert "luz" not in toks[2]  # es rules NOT applied

    def test_invalid_analyzer_rejected(self, spark, tmp_path):
        from pg_vectorize_spark.engine import VectorizeSession
        from pg_vectorize_spark.errors import VectorizeError

        df = spark.createDataFrame([(1, "x")], "id long, content string")
        src = str(tmp_path / "bad_src")
        df.write.parquet(src)
        sess = VectorizeSession(spark, workspace=str(tmp_path / "ws_bad"))
        with pytest.raises(VectorizeError):
            sess.create_job(
                "bjob", src, columns=["content"], primary_key="id",
                fts_params={"analyzer": "german_porter"},
            )


class TestRankAnalyzerGuard:
    def test_nonexpression_analyzer_rejects_rescoring_ranks(
        self, spark, tmp_path
    ):
        """rank='bm25'/'cover_density' re-derive per-word scores with
        expression-analyzer assumptions; a multilang job must fail with
        the job-level contract error at the ENGINE entry, not a
        ValueError deep in the operator (review r12)."""
        from pg_vectorize_spark.engine import VectorizeSession
        from pg_vectorize_spark.errors import VectorizeError

        rows = [(1, "las casas y las luces de las ciudades grandes")]
        src = str(tmp_path / "rg_src")
        spark.createDataFrame(
            rows, "id long, content string"
        ).write.parquet(src)
        sess = VectorizeSession(spark, workspace=str(tmp_path / "ws_rg"))
        sess.create_job(
            "rgjob", src, columns=["content"], primary_key="id",
            fts_params={"analyzer": "multilang"},
        )
        for rank in ("bm25", "cover_density"):
            with pytest.raises(VectorizeError, match="expression analyzer"):
                sess.full_text_search("rgjob", "luces", rank=rank)
            with pytest.raises(VectorizeError, match="expression analyzer"):
                sess.hybrid_search("rgjob", "luces", rank=rank)
        # overlap rank still serves
        assert sess.full_text_search("rgjob", "las luces")

    def test_unknown_analyzer_raises_in_dispatch(self):
        """A job record from a different version must fail loudly, not
        silently analyze with english rules (review r12)."""
        from pg_vectorize_spark.operators.search import _analyze

        with pytest.raises(ValueError, match="unknown analyzer"):
            _analyze("query", "german_porter")


class TestRandomizedThreeEngineParity:
    """Beyond the hand-picked fixtures: a seeded sweep of random ASCII
    tokens (plus adversarial near-suffix forms) through all three
    engines per language — the property the whole analyzer contract
    rests on is that the three rule-chain executions are ONE function."""

    def _tokens(self):
        import random

        rng = random.Random(0xC1573)
        alpha = "abcdefghijklmnopqrstuvwxyz"
        toks = ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
                for _ in range(150)]
        # adversarial: every rule suffix glued to random stems of
        # boundary lengths (the {2,3,4} guards' edge cases)
        sufs = ["es", "ies", "s", "ed", "ing", "e", "ces", "mente",
                "ando", "iendo", "eaux", "aux", "ment", "ant", "em",
                "er", "nd", "en", "n", "t", "ern", "ers", "ens"]
        for s in sufs:
            for n in (1, 2, 3, 4, 5):
                toks.append("".join(rng.choice(alpha) for _ in range(n)) + s)
        return sorted(set(toks))

    @pytest.mark.parametrize("lang", sorted(LIGHT_STEM_RULES_BY_LANG))
    def test_three_engines_agree(self, spark, lang):
        toks = self._tokens()
        want = {t: light_stem(t, lang) for t in toks}
        # Spark chain, one job
        df = spark.createDataFrame([(t,) for t in toks], "tok string")
        got_spark = {
            r["tok"]: r["stem"]
            for r in df.select(
                "tok", stem_token_expr(F.col("tok"), lang).alias("stem")
            ).collect()
        }
        assert got_spark == want, lang
        # DuckDB chain, one statement over a VALUES list
        con = duckdb.connect()
        vals = ", ".join(f"('{t}')" for t in toks)
        rows = con.sql(
            f"SELECT tok, {O.sql_stem('tok', lang)} AS stem "
            f"FROM (VALUES {vals}) AS v(tok)"
        ).fetchall()
        got_duck = {t: s for t, s in rows}
        assert got_duck == want, lang

"""Unicode/CJK tokenization (r13 — VERDICT r12 "What's missing #2")
and the analyzer-stamp guard (ADVICE r12).

Three-engine parity discipline: every new construct (\\p{L}\\p{N} token
split, explicit CJK codepoint-range classes, character-bigram
expansion, script-first lang-id) must produce IDENTICAL results from
the Spark expression, the DuckDB oracle SQL, and the Python
driver-side mirror — same bar as the stemmer spec.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pg_vectorize_spark import oracle as O
from pg_vectorize_spark.functions import text as T

SAMPLES = [
    "Spark 处理大规模数据 very fast",
    "机器学习模型训练",
    "データ処理パイプライン",
    "한국어 형태소 분석",
    "Обработка больших данных",
    "été à Paris, déjà vu",
    "GPU加速",
    "the quick brown foxes running",
    "１２３ ４５６ abc",
    "",
    None,
    "汉",                      # single CJK char stays itself
    "a_b_c under_scores",      # _ is a separator in every engine
    "ＡＢＣ ｆｕｌｌｗｉｄｔｈ",  # full-width Latin lowercases + tokenizes
]


@pytest.fixture(scope="module")
def engines(spark):
    rows = [(i, s) for i, s in enumerate(SAMPLES)]
    df = spark.createDataFrame(rows, "id int, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE d (id INT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    return df, con


class TestThreeEngineParity:
    def test_unicode_words(self, engines):
        df, con = engines
        got_s = {
            r["id"]: list(r["w"])
            for r in df.select(
                "id", T.unicode_raw_words_expr(F.col("text")).alias("w")
            ).collect()
        }
        got_d = {
            r[0]: list(r[1])
            for r in con.execute(
                f"SELECT id, {O.sql_unicode_words('text')} FROM d"
            ).fetchall()
        }
        for i, s in enumerate(SAMPLES):
            py = [
                t
                for t in __import__("re").split(
                    T.UNICODE_SPLIT_PY, (s or "").lower()
                )
                if t
            ]
            assert got_s[i] == got_d[i] == py, (i, s)

    def test_multilang_tokens_and_lang(self, engines):
        df, con = engines
        lang = T.lang_id_expr(F.col("text"))
        toks = T.multilang_tokens_expr(
            F.col("text"), lang=lang, assume_lang_id=True
        )
        got_s = {
            r["id"]: (r["l"], sorted(r["t"]))
            for r in df.select(
                "id", lang.alias("l"), toks.alias("t")
            ).collect()
        }
        whens = " ".join(
            f"WHEN l = '{lng}' THEN {O.sql_unicode_tokens('text', True, lng)}"
            for lng in T.STEMMED_LANGS
        )
        got_d = {
            r[0]: (r[1], sorted(r[2]))
            for r in con.execute(
                f"""WITH x AS (SELECT id, text,
                      {O.sql_lang_id('text')} AS l FROM d)
                SELECT id, l,
                  CASE {whens}
                       ELSE {O.sql_unicode_tokens('text', False)} END
                FROM x"""
            ).fetchall()
        }
        for i, s in enumerate(SAMPLES):
            plang = T.detect_lang(s)
            if plang in T.STEMMED_LANGS:
                py = sorted(T.py_unicode_tokens(s, stem=True, lang=plang))
            else:
                py = sorted(T.py_unicode_tokens(s, stem=False))
            assert got_s[i] == got_d[i] == (plang, py), (i, s)


class TestMaterializedDispatch:
    """r13 optimization round: the materialized (lang, expanded) form —
    multilang_parts_expr behind an explode barrier +
    multilang_tokens_from_parts — must be row-for-row identical to the
    inline multilang_tokens_expr chain it replaced in the hot paths."""

    def test_parts_dispatch_equals_inline(self, engines):
        df, _ = engines
        # add marker-heavy rows so every stemmed branch is exercised
        extra = df.sparkSession.createDataFrame(
            [
                (100, "el que la ciudad de las luces brillaba"),
                (101, "le chat et les maisons de la ville"),
                (102, "der hund und die katzen von dem lehrer"),
                (103, "the windows and the merged batches running"),
                (104, "no markers here whatsoever keyword only"),
            ],
            "id int, text string",
        )
        allr = df.unionByName(extra)
        inline = {
            r["id"]: (r["l"], list(r["t"]))
            for r in allr.select(
                "id",
                T.lang_id_expr(F.col("text")).alias("l"),
                T.multilang_tokens_expr(F.col("text")).alias("t"),
            ).collect()
        }
        mat = allr.select(
            "id",
            F.explode(
                F.array(T.multilang_parts_expr(F.col("text")))
            ).alias("_p"),
        ).select(
            "id",
            F.col("_p.lang").alias("l"),
            T.multilang_tokens_from_parts(
                F.col("_p.lang"), F.col("_p.expanded")
            ).alias("t"),
        )
        got = {
            r["id"]: (r["l"], list(r["t"])) for r in mat.collect()
        }
        assert got == inline

    @pytest.mark.parametrize("unicode", [False, True])
    def test_gopher_pass_expr_equals_flags_conjunction(self, spark, unicode):
        # the bound single-column form must match the flat flags' pass
        # column row-for-row (incl. empty/null/non-Latin rows)
        rows = [(i, s) for i, s in enumerate(SAMPLES)] + [
            (100, "the be to of and that have with " + "word " * 60),
            (101, "### ... ### ..."),
        ]
        df = spark.createDataFrame(rows, "id int, text string")
        flags = T.gopher_flags_exprs(
            F.col("text"), min_words=20, unicode=unicode
        )
        both = df.select(
            "id",
            flags["pass_gopher"].alias("flat"),
            T.gopher_pass_expr(
                F.col("text"), min_words=20, unicode=unicode
            ).alias("bound"),
        ).collect()
        for r in both:
            assert r["flat"] == r["bound"], r["id"]

    def test_lang_id_rewrite_matches_python_mirror(self, spark):
        # the argmax-over-structs rewrite must keep detect_lang parity
        # on ties, zero-hit, and script-override rows
        rows = [
            (0, "de la"),            # es/fr marker tie -> 'es' (sorted first)
            (1, "de"),               # es/fr/zh tie -> 'es'
            (2, ""),                 # zero hits -> unknown
            (3, None),               # null -> unknown
            (4, "la de que y en"),   # clear es
            (5, "der die und das"),  # clear de
            (6, "机器 the and of"),   # script beats markers -> zh
            (7, "данные the and of in is"),  # Cyrillic beats en markers
        ]
        df = spark.createDataFrame(rows, "id int, text string")
        got = {
            r["id"]: r["l"]
            for r in df.select(
                "id", T.lang_id_expr(F.col("text")).alias("l")
            ).collect()
        }
        for i, t in rows:
            assert got[i] == T.detect_lang(t), (i, t)


class TestCjkBigramSpec:
    def test_han_run_bigrams(self):
        assert T.py_unicode_tokens("机器学习", stem=False) == [
            "机器", "器学", "学习",
        ]

    def test_single_char_kept(self):
        assert T.py_unicode_tokens("汉", stem=False) == ["汉"]

    def test_mixed_token_bigrams_whole_token(self):
        # one spec, no per-script carve-outs: the Latin prefix
        # participates in the bigram window
        assert T.py_unicode_tokens("GPU加速", stem=False) == [
            "gp", "pu", "u加", "加速",
        ]

    def test_latin_tokens_unaffected(self):
        assert T.py_unicode_tokens(
            "the quick foxes", stem=True, lang="en"
        ) == ["quick", "fox"]

    def test_empty_token_array_gone(self):
        """THE r12 gap: non-Latin text must no longer analyze to []."""
        for s in ["机器学习模型训练", "Обработка данных", "한국어 분석"]:
            assert T.py_unicode_tokens(s, stem=False), s


class TestScriptLangId:
    @pytest.mark.parametrize(
        "text,lang",
        [
            ("机器学习模型", "zh"),
            ("データ処理", "ja"),          # kana beats Han for ja text
            ("漢字とひらがな", "ja"),
            ("한국어 분석", "ko"),
            ("Обработка данных", "ru"),
            ("the cat and the dog", "en"),
            ("xyzzy plugh", "unknown"),
        ],
    )
    def test_detect(self, text, lang):
        assert T.detect_lang(text) == lang

    def test_script_beats_markers(self):
        # ASCII 'the and' would score en, but Han presence wins
        assert T.detect_lang("the 机器 and") == "zh"


class TestUnicodeGopher:
    def test_nonzero_words_on_cjk(self, spark):
        rows = [
            (1, "机器学习模型训练需要大量的数据和计算资源"),
            (2, "Обработка больших данных в распределенных системах"),
            (3, ""),
        ]
        df = spark.createDataFrame(rows, "id int, text string")
        flags = T.gopher_flags_exprs(
            F.col("text"), min_words=1, unicode=True
        )
        words = T.unicode_raw_words_expr(F.col("text"))
        got = {
            r["id"]: (r["n"], r["ok_wc"], r["ok_alpha"])
            for r in df.select(
                "id",
                F.size(words).alias("n"),
                flags["ok_word_count"].alias("ok_wc"),
                flags["ok_alpha_words"].alias("ok_alpha"),
            ).collect()
        }
        assert got[1][0] > 0 and got[1][1] and got[1][2]
        assert got[2][0] == 6 and got[2][1] and got[2][2]
        assert got[3][0] == 0 and not got[3][1]

    def test_ascii_gopher_unchanged(self, spark):
        """unicode=False (the default, every existing gate) must be
        byte-identical to the r12 behavior: zero words on Han text."""
        df = spark.createDataFrame(
            [(1, "机器学习"), (2, "real english words here")],
            "id int, text string",
        )
        flags = T.gopher_flags_exprs(F.col("text"), min_words=1)
        got = {
            r["id"]: r["ok"]
            for r in df.select(
                "id", flags["ok_word_count"].alias("ok")
            ).collect()
        }
        assert not got[1] and got[2]


class TestAdviceFixes:
    def test_unknown_stem_lang_valueerror(self):
        with pytest.raises(ValueError, match="no light-stem rule set"):
            T.light_stem("word", "zz")
        with pytest.raises(ValueError, match="valid"):
            T.py_unicode_tokens("word", stem=True, lang="unknown")
        with pytest.raises(ValueError, match="valid"):
            T.tokens_expr(F.lit("word"), stem=True, lang="xx")

    def test_union_fallback_drops_cross_language_stop_junk(self):
        from pg_vectorize_spark.operators.search import _analyze

        # marker-free mixed keyword query ('are' is an en STOP word but
        # not a language MARKER, so detection stays 'unknown'): the
        # stop word must NOT enter the term set, raw or mangled
        from pg_vectorize_spark.functions.text import detect_lang

        assert detect_lang("luces are ciudad") == "unknown"
        terms = _analyze("luces are ciudad", "multilang")
        assert "are" not in terms
        assert "ar" not in terms  # es/fr plural-strip junk
        assert "luz" in terms and "ciudad" in terms and "luces" in terms
        # a stop word of one language is not cross-stemmed by others:
        # es 'las' must not appear as a de/fr-stemmed variant
        terms2 = _analyze("las casas", "multilang")
        assert "la" not in terms2  # 'las' -> de 1-char strip would give 'la'

    def test_han_query_analyzes_to_bigrams(self):
        from pg_vectorize_spark.operators.search import _analyze

        assert _analyze("机器学习", "multilang") == ["机器", "器学", "学习"]


class TestAnalyzerStamp:
    def _mk(self, spark, tmp_path, analyzer, name="sjob"):
        from pg_vectorize_spark.engine import VectorizeSession

        rows = [
            (1, "the windows are running the merged batches today"),
            (2, "las casas y las luces de las ciudades grandes"),
        ]
        src = str(tmp_path / f"src_{name}")
        spark.createDataFrame(
            rows, "id long, content string"
        ).write.parquet(src)
        sess = VectorizeSession(
            spark, workspace=str(tmp_path / f"ws_{name}")
        )
        sess.create_job(
            name,
            src,
            columns=["content"],
            primary_key="id",
            fts_params={"analyzer": analyzer},
        )
        return sess

    def test_stamp_written_and_search_works(self, spark, tmp_path):
        import os

        sess = self._mk(spark, tmp_path, "multilang")
        path = sess._analyzer_stamp_path("sjob")
        assert os.path.exists(path)
        assert open(path).read() == "multilang@2"
        got = sess.full_text_search("sjob", "las luces de la ciudad")
        assert got and got[0]["id"] == 2

    def test_legacy_snapshot_without_stamp_raises_for_multilang(
        self, spark, tmp_path
    ):
        import os

        from pg_vectorize_spark.errors import VectorizeError

        sess = self._mk(spark, tmp_path, "multilang", name="legacy")
        os.remove(sess._analyzer_stamp_path("legacy"))
        sess._stamp_ok.clear()  # fresh-session view
        with pytest.raises(VectorizeError, match="re-ingest"):
            sess.full_text_search("legacy", "las luces")

    def test_legacy_snapshot_ok_for_english(self, spark, tmp_path):
        import os

        sess = self._mk(spark, tmp_path, "english", name="eng")
        os.remove(sess._analyzer_stamp_path("eng"))
        sess._stamp_ok.clear()
        got = sess.full_text_search("eng", "running windows")
        assert got  # legacy english snapshots keep working

    def test_mismatched_stamp_refuses_merge(self, spark, tmp_path):
        from pg_vectorize_spark.errors import VectorizeError

        sess = self._mk(spark, tmp_path, "multilang", name="mm")
        with open(sess._analyzer_stamp_path("mm"), "w") as fh:
            fh.write("english@1")
        job = sess.catalog.get("mm")
        with pytest.raises(VectorizeError, match="refusing to merge"):
            sess._write_analyzer_stamp(job)

    def test_delete_job_clears_stamp_cache(self, spark, tmp_path):
        sess = self._mk(spark, tmp_path, "multilang", name="del")
        sess.full_text_search("del", "las luces")
        assert "del" in sess._stamp_ok
        sess.delete_job("del")
        assert "del" not in sess._stamp_ok

    def test_write_path_refuses_legacy_snapshot(self, spark, tmp_path):
        """Review r13 #1: an UNSTAMPED pre-existing snapshot must be
        treated as legacy english@1 on the WRITE path too — stamping it
        with the current spec would merge mixed-spec tokens."""
        import os

        from pg_vectorize_spark.errors import VectorizeError

        sess = self._mk(spark, tmp_path, "multilang", name="wlegacy")
        os.remove(sess._analyzer_stamp_path("wlegacy"))
        job = sess.catalog.get("wlegacy")
        with pytest.raises(VectorizeError, match="english@1"):
            sess._write_analyzer_stamp(job)


class TestPinyinQueryFallback:
    def test_marker_zh_latin_query_keeps_union_broadening(self):
        """Review r13 #2: detect_lang can return 'zh' from romanized
        pinyin MARKERS with no Han characters; such a Latin-script
        query must keep the union-of-variants broadening (its English
        terms still need their en stems to match stemmed documents)."""
        from pg_vectorize_spark.functions.text import detect_lang
        from pg_vectorize_spark.operators.search import _analyze

        q = "de shi bu zai recipes"
        assert detect_lang(q) == "zh"  # pinyin markers, no script chars
        terms = _analyze(q, "multilang")
        assert "recipes" in terms  # unstemmed kept
        assert "recip" in terms    # en stem variant kept (the r12 behavior)

    def test_real_han_query_takes_direct_path(self):
        from pg_vectorize_spark.operators.search import _analyze

        assert _analyze("机器学习", "multilang") == ["机器", "器学", "学习"]


class TestUnicodeMinhashDedup:
    ROWS = [
        (1, "机器学习模型训练需要大量的数据"),
        (2, "机器学习模型训练需要大量的数据集"),   # near-dup of 1
        (3, "обработка больших данных в распределенных системах очень быстро сегодня"),
        (4, "обработка больших данных в распределенных системах очень быстро вчера"),
        (5, "completely different english text about spark"),
        (6, "another unrelated english document entirely"),
    ]

    def test_ascii_spec_degenerates_nonlatin_to_one_shared_shingle(
        self, spark
    ):
        """The gap this closes is WORSE than invisibility: under the
        ASCII spec a non-Latin doc has no words, so the short-doc
        fallback yields ONE EMPTY shingle — identical for every such
        doc. Docs 1-4 (two UNRELATED languages, different content) all
        get the same signature and would be marked mutual duplicates."""
        from pg_vectorize_spark.operators.dedup import minhash_signatures

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        sigs = {
            r["_id"]: tuple(r["signature"])
            for r in minhash_signatures(df, "text", "doc_id").collect()
        }
        assert sigs[1] == sigs[2] == sigs[3] == sigs[4]  # false dups
        assert sigs[1] != sigs[5]

    def test_unicode_spec_pairs_planted_neardups(self, spark):
        from pg_vectorize_spark.operators.dedup import (
            minhash_jaccard_estimate,
            minhash_lsh_candidates,
            minhash_signatures,
        )

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        sigs = minhash_signatures(df, "text", "doc_id", unicode=True)
        ids = {r["_id"] for r in sigs.collect()}
        assert ids == {1, 2, 3, 4, 5, 6}  # every row now has a signature
        cands = minhash_lsh_candidates(sigs, 4, 4)
        est = {
            (r["a_id"], r["b_id"]): r["est_jaccard"]
            for r in minhash_jaccard_estimate(sigs, cands).collect()
        }
        assert est.get((1, 2), 0.0) >= 0.5   # CJK near-dup banded + high
        assert est.get((3, 4), 0.0) >= 0.5   # Cyrillic near-dup too
        assert (5, 6) not in est             # unrelated docs don't pair

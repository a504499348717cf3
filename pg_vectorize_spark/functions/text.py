"""Text column expressions — analyzer, FTS scoring, text analysis.

The reference delegates full-text machinery to Postgres builtins
(``to_tsvector('english', ...)`` / ``plainto_tsquery`` / ``ts_rank_cd`` —
core/src/query.rs:184-190, 764-776). Spark has no tsvector, so this module
DEFINES our analyzer as the spec (SURVEY.md §7 "hard parts"):

- analyzer = lowercase -> split on non-alphanumeric runs -> drop empties ->
  drop English stop-words -> distinct (tsvector keeps positions; we keep the
  distinct term set — scores below are defined against that);
- query analysis (plainto_tsquery + ``&``->``|`` OR-rewrite parity,
  core/src/query.rs:766-774) = same analyzer on the query string; a document
  matches when ANY term overlaps (``search_tokens @@ query`` with OR
  semantics -> ``arrays_overlap``);
- fts_score = |doc_terms ∩ query_terms| / |query_terms| — a term-overlap
  analog of ``ts_rank_cd`` cover-density (positional data intentionally not
  reproduced; divergence documented in SURVEY.md §7). Deterministic, and
  expressible in both Spark and DuckDB for oracle parity.

STEMMING IS THE DEFAULT, as in ``to_tsvector('english')``
(core/src/init.rs:250-259): the analyzer applies a deterministic LIGHT
STEMMER — an ordered list of anchored regex rewrite rules (plural
stripping, -ed/-ing stripping, consonant undoubling, final-e removal)
chosen so the EXACT same rules run as Spark ``regexp_replace`` chains
(JVM, codegen), DuckDB ``regexp_replace`` chains (the oracle), and Python
``re.sub`` (driver-side query analysis). Full Snowball is procedural and
not SQL-expressible; this spec trades linguistic fidelity ("ponies"->
"poni" like Porter, but "ages"->"ag") for bit-identical three-engine
parity — "running" matches "run", which is the user-visible behavior the
reference provides. The heavier Porter UDF remains available as
analyzer='english_porter'. analyzer='simple' disables stemming.
"""

from __future__ import annotations

import re as _re
from typing import Sequence

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from pg_vectorize_spark.providers.local import HASH_MOD, HASH_MULT, HASH_SEED

# Minimal English stop-word list — OUR spec (Postgres's english config has 127
# words; we pin a deterministic subset so the oracle can embed it literally).
STOP_WORDS = (
    "a an and are as at be by for from has he in is it its of on that the to "
    "was were will with this these those i you your we they them then there "
    "or not no but if so do does did done"
).split()

# Light-stemmer spec: ordered (pattern, replacement) rewrite rules, applied
# top to bottom, each anchored at end-of-token so it fires at most once.
# Replacements use backslash group syntax (RE2/Python); Spark's Java engine
# gets them converted to $N by stem_token_expr. Only constructs with
# identical semantics in Java regex, RE2 (DuckDB), and Python re are allowed
# here: character classes, anchors, bounded repetition, capture groups.
LIGHT_STEM_RULES: list[tuple[str, str]] = [
    (r"(ss)es$", r"\1"),          # dresses -> dress
    (r"ies$", "i"),               # ponies -> poni (Porter step-1a parity)
    (r"([a-z]{2}[^s])s$", r"\1"), # windows -> window; keeps 'ss', short words
    (r"([a-z]{2})ed$", r"\1"),    # wanted -> want, fitted -> fitt
    (r"([a-z]{2})ing$", r"\1"),   # running -> runn, working -> work
    *[(f"{c}{c}$", c) for c in "bdfgmnprt"],  # undouble: runn -> run
    (r"([a-z]{2})e$", r"\1"),     # merge -> merg, batche -> batch
]


# Non-English light-stem rule sets (r12 — VERDICT r11 #6): the same
# three-engine spec pattern as the English set (ordered, end-anchored,
# suffix-REPLACING-with-strictly-shorter, first character never touched,
# only constructs with identical Java/RE2/Python semantics). These are
# OUR spec, not Snowball: the trade is linguistic fidelity for
# bit-identical parity across Spark exprs, DuckDB oracles, and the
# driver-side query analyzer. The analyzer tokenizes on [^a-z0-9]+, so
# the rules (and stop-word lists) are ASCII-only by construction —
# accented characters split tokens upstream of stemming.
LIGHT_STEM_RULES_ES: list[tuple[str, str]] = [
    # ONE plural rule (vowel+s — covers -s AND -es plurals, since the
    # final-e rule below then unifies 'ciudade'->'ciudad' with the
    # singular): a second s-rule would CASCADE (rules chain top to
    # bottom, each firing at most once — 'clases' must not lose its
    # plural s twice)
    (r"([a-z]{2})ces$", r"\1z"),        # luces -> luz, veces -> vez
    (r"([a-z]{2}[aeiou])s$", r"\1"),    # casas -> casa; ciudades -> ciudade
    (r"([a-z]{3})mente$", r"\1"),       # rapidamente -> rapida
    (r"([a-z]{2})ando$", r"\1"),        # hablando -> habl
    (r"([a-z]{2})iendo$", r"\1"),       # comiendo -> com
    (r"([a-z]{2})e$", r"\1"),           # ciudade -> ciudad; clase(s) -> clas
]

LIGHT_STEM_RULES_FR: list[tuple[str, str]] = [
    (r"([a-z]{2})eaux$", r"\1eau"),     # chateaux -> chateau
    (r"([a-z]{2})aux$", r"\1al"),       # journaux -> journal
    (r"([a-z]{2}[^s])s$", r"\1"),       # maisons -> maison; keeps 'ss'
    (r"([a-z]{3})ment$", r"\1"),        # rapidement -> rapide
    (r"([a-z]{2})ant$", r"\1"),         # parlant -> parl
    (r"([a-z]{2})e$", r"\1"),           # petite -> petit, rapide -> rapid
]

# German: CISTEM's iterative strip (Weissweiler & Fraser 2017),
# UNROLLED — German stacks agreement suffixes ('lehr+er+s',
# 'klein+en'), and a fire-once suffix list cannot make the inflected
# forms of one lemma agree (review r12: 'lehrers'->'lehrer' but
# 'lehrer'->'lehr'). CISTEM instead strips one suffix per loop
# iteration until none fires; four unrolled (2-char, then 1-char)
# iterations converge for realistic stacks: lehrer/lehrers -> 'lehr',
# haus/hauses -> 'hau', kleinem/kleinen/kleiner/kleines/klein ->
# 'klei', katze/katzen -> 'katz'. Fixed-literal alternation
# ((em|er|nd)) has identical leftmost semantics in Java/RE2/Python —
# the one construct added to the en-spec list. NOTE the analyzer
# tokenizes on [^a-z0-9]+, so umlauted words split upstream ("häuser"
# -> "h","user") regardless of stemming — these rules serve the ASCII
# token stream, same contract as the other sets.
LIGHT_STEM_RULES_DE: list[tuple[str, str]] = [
    (r"([a-z]{4})(em|er|nd)$", r"\1"),  # 2-char agreement, stem >= 4
    (r"([a-z]{3})[esnt]$", r"\1"),      # 1-char suffix, stem >= 3
] * 4

LIGHT_STEM_RULES_BY_LANG: dict[str, list[tuple[str, str]]] = {
    "de": LIGHT_STEM_RULES_DE,
    "en": LIGHT_STEM_RULES,
    "es": LIGHT_STEM_RULES_ES,
    "fr": LIGHT_STEM_RULES_FR,
}

# Pinned ASCII-only stop-word subsets (deterministic, oracle-embeddable —
# same rationale as the English list above).
STOP_WORDS_ES = (
    "el la los las de del que y en un una por con no es al lo se su "
    "para como mas pero sin sobre este esta son fue ha muy ya o"
).split()
STOP_WORDS_FR = (
    "le la les de des du et un une en dans pour par sur avec ne pas "
    "que qui au aux ce cette est sont il elle nous vous ils ou se"
).split()
# ASCII-only by the analyzer's tokenization contract: umlauted stop
# words ("für", "über") never reach the stop filter as whole tokens
STOP_WORDS_DE = (
    "der die das den dem des und ist sind ein eine einem einen einer "
    "eines in im mit von zu auf nicht auch als an bei nach aus er sie "
    "es wir ihr wird sich"
).split()

STOP_WORDS_BY_LANG: dict[str, list[str]] = {
    "de": STOP_WORDS_DE,
    "en": STOP_WORDS,
    "es": STOP_WORDS_ES,
    "fr": STOP_WORDS_FR,
}

#: languages with a light-stem rule set; everything else (zh/unknown)
#: falls back to the UNSTEMMED analyzer under multilang dispatch —
#: applying another language's suffix rules stems WRONGLY, and no
#: stemming beats wrong stemming for recall-neutral token matching
STEMMED_LANGS = tuple(sorted(LIGHT_STEM_RULES_BY_LANG))


def _check_stem_lang(lang: str) -> None:
    """ADVICE r12: a lang code without a rule set must fail with the
    valid codes named (mirroring search._check_analyzer), not an opaque
    dict KeyError — new call sites won't all guard via STEMMED_LANGS."""
    if lang not in LIGHT_STEM_RULES_BY_LANG:
        raise ValueError(
            f"no light-stem rule set for lang {lang!r} (valid: "
            f"{STEMMED_LANGS}); rule-set-less languages take the "
            "unstemmed analyzer path"
        )


def light_stem(token: str, lang: str = "en") -> str:
    """Python form of the light stemmer (must match stem_token_expr /
    oracle.sql_stem rule for rule)."""
    _check_stem_lang(lang)
    for pat, repl in LIGHT_STEM_RULES_BY_LANG[lang]:
        token = _re.sub(pat, repl, token)
    return token


# Spark/Java form of the rule list: Java regex supports backreferences in
# patterns, so the nine enumerated undoubling rules collapse to one
# ([bdfgmnprt])\1$ rule — halving the regexp_replace calls per token (HOF
# lambdas
# are interpreted per element, so chain length is the hot cost). RE2
# (DuckDB) has no pattern backrefs, hence the enumerated canonical form
# above; tests/test_search.py locks the two forms to identical outputs.
_JAVA_STEM_RULES: list[tuple[str, str]] = [
    (r"(ss)es$", "$1"),
    (r"ies$", "i"),
    (r"([a-z]{2}[^s])s$", "$1"),
    (r"([a-z]{2})ed$", "$1"),
    (r"([a-z]{2})ing$", "$1"),
    (r"([bdfgmnprt])\1$", "$1"),
    (r"([a-z]{2})e$", "$1"),
]


def _java_stem_rules(lang: str) -> list[tuple[str, str]]:
    """Java-regex form of a language's rule list: English keeps its
    hand-collapsed backref form; the other sets have no pattern
    backrefs, so only the replacement syntax converts (\\1 -> $1)."""
    if lang == "en":
        return _JAVA_STEM_RULES
    _check_stem_lang(lang)
    return [
        (pat, repl.replace("\\1", "$1"))
        for pat, repl in LIGHT_STEM_RULES_BY_LANG[lang]
    ]


def stem_token_expr(tok: Column, lang: str = "en") -> Column:
    """Spark form: the same rule chain as nested regexp_replace (pure JVM)."""
    out = tok
    for pat, repl in _java_stem_rules(lang):
        out = F.regexp_replace(out, pat, repl)
    return out


def stop_words_sql_array() -> str:
    """The stop-word list as a SQL array literal (shared with the oracle)."""
    inner = ", ".join(f"'{w}'" for w in STOP_WORDS)
    return f"[{inner}]"


def tokens_expr(text: Column, stem: bool = True, lang: str = "en") -> Column:
    """Analyzer: lower -> tokenize -> de-empty -> stop-words -> stem ->
    distinct.

    The Spark analog of ``to_tsvector('english', col)`` minus positions
    (core/src/init.rs:250-259); stemming uses the light-stemmer spec above.
    ``stem=False`` is the 'simple' analyzer (tsvector's 'simple' config).
    ``lang`` selects the rule set AND stop-word list (r12 multilingual
    extension — the reference hardcodes 'english', core/src/query.rs:233,
    so 'en' stays the default everywhere)."""
    if stem:
        _check_stem_lang(lang)
    raw = F.split(F.lower(F.coalesce(text, F.lit(""))), "[^a-z0-9]+")
    nonempty = F.filter(raw, lambda t: t != "")
    stops = STOP_WORDS_BY_LANG[lang] if stem else STOP_WORDS
    kept = F.array_except(nonempty, F.array(*[F.lit(w) for w in stops]))
    if stem:
        kept = F.transform(kept, lambda t: stem_token_expr(t, lang))
    return F.array_distinct(kept)


# --- Unicode / CJK tokenization (r13 — VERDICT r12 "What's missing #2") ---
#
# The default analyzer's [^a-z0-9]+ split mirrors the reference's
# to_tsvector('english') contract and stays UNCHANGED; the gap it leaves
# — any non-Latin script tokenizes to an EMPTY array, so FTS never
# matches and word-based metrics read zero — is closed on the multilang
# path below. Three-engine parity discipline, as with the stemmer spec:
# only constructs with identical semantics in Java regex (Spark), RE2
# (DuckDB), and Python re. \p{L}/\p{N} exist in Java and RE2; Python re
# lacks them, so the Python mirror splits on [\W_]+ (\w == letters +
# digits + underscore there; the explicit _ removal aligns the classes).
# Script detection uses EXPLICIT codepoint ranges, never \p{IsHan}-style
# script names (Java-only syntax).

#: token split for the Java (Spark) and RE2 (DuckDB) engines
UNICODE_SPLIT = r"[^\p{L}\p{N}]+"
#: Python-re mirror of UNICODE_SPLIT
UNICODE_SPLIT_PY = r"[\W_]+"

#: Han (CJK Unified + Extension A) — no word boundaries
HAN_RANGES = "一-鿿㐀-䶿"
#: Hiragana + Katakana (incl. prolonged-sound mark)
KANA_RANGES = "぀-ヿ"
#: Hangul syllables
HANGUL_RANGES = "가-힯"
#: Cyrillic
CYRILLIC_RANGES = "Ѐ-ӿ"
#: scripts WITHOUT word boundaries -> character-bigram fallback
CJK_RANGES = HAN_RANGES + KANA_RANGES + HANGUL_RANGES
_CJK_CLASS = f"[{CJK_RANGES}]"
_CJK_RE = _re.compile(_CJK_CLASS)


def unicode_raw_words_expr(text: Column) -> Column:
    """Non-empty lowercase Unicode word tokens (no stop/stem/bigram) —
    the \\p{L}\\p{N} analog of ``raw_words_expr``. ``lower`` is
    Unicode-aware in all three engines (simple case mapping)."""
    return F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), UNICODE_SPLIT),
        lambda x: x != "",
    )


def cjk_bigram_expand_expr(words: Column) -> Column:
    """Character-bigram fallback for scripts without word boundaries:
    a token containing ANY CJK character (Han/kana/Hangul) is replaced
    by its overlapping character bigrams (the whole token, so a mixed
    token like 'gpu加速' contributes 'gp','pu','u加','加速' — one spec,
    no per-script carve-outs); a single-char token stays itself; all
    other tokens pass through. Order preserved; duplicates kept (the
    token pipeline dedupes downstream, same as the ASCII analyzer)."""

    def _bigrams(w: Column) -> Column:
        n = F.length(w)
        return F.when(n <= 1, F.array(w)).otherwise(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: w.substr(i, F.lit(2)),
            )
        )

    return F.flatten(
        F.transform(
            words,
            lambda w: F.when(
                w.rlike(_CJK_CLASS), _bigrams(w)
            ).otherwise(F.array(w)),
        )
    )


def unicode_tokens_expr(
    text: Column, stem: bool = True, lang: str = "en"
) -> Column:
    """Unicode analyzer: lower -> \\p{L}\\p{N} tokenize -> CJK bigram
    expand -> stop-words -> stem -> distinct. Same stage order as
    ``tokens_expr`` (array_except dedupes before the stem transform,
    array_distinct after). The stop lists are ASCII and the stem rules
    are [a-z]-anchored, so both are no-ops on non-Latin tokens by
    construction — a Cyrillic token passes through unstemmed, a CJK
    bigram is never stop-worded."""
    if stem:
        _check_stem_lang(lang)
    kept0 = cjk_bigram_expand_expr(unicode_raw_words_expr(text))
    stops = STOP_WORDS_BY_LANG[lang] if stem else STOP_WORDS
    kept = F.array_except(kept0, F.array(*[F.lit(w) for w in stops]))
    if stem:
        kept = F.transform(kept, lambda t: stem_token_expr(t, lang))
    return F.array_distinct(kept)


def py_unicode_tokens(
    query: str | None, stem: bool = True, lang: str = "en"
) -> list[str]:
    """Driver-side mirror of ``unicode_tokens_expr`` (must match row for
    row) — the multilang QUERY analyzer runs this so a Han query
    produces the same character bigrams its documents were indexed
    under."""
    if stem:
        _check_stem_lang(lang)
    toks = [
        t
        for t in _re.split(UNICODE_SPLIT_PY, (query or "").lower())
        if t
    ]
    expanded: list[str] = []
    for w in toks:
        if _CJK_RE.search(w) and len(w) > 1:
            expanded.extend(w[i : i + 2] for i in range(len(w) - 1))
        else:
            expanded.append(w)
    stops = set(STOP_WORDS_BY_LANG[lang] if stem else STOP_WORDS)
    deduped: list[str] = []
    seen: set[str] = set()
    for t in expanded:
        if t not in stops and t not in seen:
            seen.add(t)
            deduped.append(t)
    if stem:
        deduped = [light_stem(t, lang) for t in deduped]
    out: list[str] = []
    seen2: set[str] = set()
    for t in deduped:
        if t not in seen2:
            seen2.add(t)
            out.append(t)
    return out


def multilang_tokens_expr(
    text: Column,
    lang: Column | None = None,
    assume_lang_id: bool = False,
) -> Column:
    """Per-row language-dispatched analyzer (r12 — an LLM-data pipeline
    searching a multilingual corpus must not run English suffix rules on
    Spanish text): ``lang_id_expr`` picks the rule set + stop-word list;
    languages WITHOUT a rule set (zh/ja/ko/ru/unknown) take the
    unstemmed path — no stemming beats wrong stemming. Pass ``lang``
    to reuse an already-computed language column.

    r13: the base tokenizer is the UNICODE analyzer (``\\p{L}\\p{N}``
    split + CJK character-bigram fallback) — identical output on ASCII
    text (the [a-z0-9] and \\p{L}\\p{N} classes agree after lower()),
    and non-Latin scripts now produce real tokens instead of an empty
    array. ANALYZER_SPEC_VERSION bumps with changes like this so stored
    token snapshots built under an older spec fail loudly at query
    time instead of silently losing recall."""
    # the guard below is only sound when lang IS lang_id_expr(text) —
    # a caller-supplied lang column (e.g. trusted source metadata) may
    # dispatch a marker-free row to a stemmed branch, so the guard must
    # stand down unless the caller asserts lang-id provenance
    # (assume_lang_id=True; review r13)
    guard_ok = lang is None or assume_lang_id
    if lang is None:
        lang = lang_id_expr(text)
    out = unicode_tokens_expr(text, stem=False)
    for code in STEMMED_LANGS:
        out = F.when(
            lang == code, unicode_tokens_expr(text, stem=True, lang=code)
        ).otherwise(out)
    if not guard_ok:
        return out
    # EARLY-EXIT GUARD (r13 perf): interpreted CaseWhen re-evaluates the
    # lang expression per condition, so a marker-free row (the vast
    # majority of a real corpus — markers are exactly the stop words)
    # paid 4 full lang-id evaluations before reaching the unstemmed
    # else. A row with ZERO stem-language marker words can NEVER
    # dispatch to a stemmed branch (the marker argmax requires a
    # positive hit, and the script branches only yield non-stemmed
    # codes), so one cheap intersect short-circuits it — EXACTLY
    # semantics-preserving WHEN lang derives from lang_id_expr,
    # measured 4.5 s -> 1.3 s on a 50k-doc scan.
    # (A transform()-lambda let-binding of lang was tried first and is
    # a net LOSS: expressions under an interpreted HOF lambda run ~5x
    # slower than the same tree outside one.)
    stem_markers = sorted(
        set().union(*[LANG_MARKERS[c] for c in STEMMED_LANGS])
    )
    marker_words = F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    no_stem_marker = (
        F.size(
            F.array_intersect(
                marker_words, F.array(*[F.lit(w) for w in stem_markers])
            )
        )
        == 0
    )
    return F.when(
        no_stem_marker, unicode_tokens_expr(text, stem=False)
    ).otherwise(out)


def multilang_parts_expr(text: Column) -> Column:
    """The per-row inputs of the multilang analyzer as ONE struct —
    ``lang`` (lang_id_expr) and ``expanded`` (the Unicode token stream
    after CJK bigram expansion, BEFORE stop/stem/distinct). Evaluate
    this behind a single materialization barrier (explode-over-
    singleton), then dispatch with ``multilang_tokens_from_parts``:
    the expensive tokenize+expand subtree runs once per row and the
    per-language when-chain compares a plain materialized string column
    instead of re-deriving lang_id per condition (r13 optimization
    round — the interpreted CaseWhen duplicated both subtrees into
    every branch; measured 6.4x on the multilang gate shape,
    scripts/analyzer_perf_probe.py). Value-equivalence with the inline
    ``multilang_tokens_expr`` path is pinned by
    tests/test_multilang_stem.py."""
    return F.struct(
        lang_id_expr(text).alias("lang"),
        cjk_bigram_expand_expr(unicode_raw_words_expr(text)).alias(
            "expanded"
        ),
    )


def multilang_tokens_from_parts(lang: Column, expanded: Column) -> Column:
    """Multilang analyzer tail over MATERIALIZED ``multilang_parts_expr``
    columns: per-language stop-word removal + light stemming + distinct.
    Identical output to ``multilang_tokens_expr(text)`` when ``lang`` /
    ``expanded`` were derived from the same text (the stop lists are
    ASCII and the stem rules [a-z]-anchored, so the dispatch equality
    carries over unchanged)."""

    def _branch(stem: bool, lng: str = "en") -> Column:
        stops = STOP_WORDS_BY_LANG[lng] if stem else STOP_WORDS
        kept = F.array_except(
            expanded, F.array(*[F.lit(w) for w in stops])
        )
        if stem:
            kept = F.transform(kept, lambda t: stem_token_expr(t, lng))
        return F.array_distinct(kept)

    out = _branch(False)
    for code in STEMMED_LANGS:
        out = F.when(lang == code, _branch(True, code)).otherwise(out)
    return out


def script_lang(text: str | None) -> str | None:
    """The script-detected language of ``text`` (zh/ja/ko/ru by
    codepoint-range presence, SCRIPT_LANGS priority order), or None
    when no script character occurs — the ONE place the script-vs-
    marker provenance of a detection lives (review r13: the multilang
    query analyzer must distinguish a real-Han 'zh' from a romanized
    pinyin-marker 'zh', and duplicating the range loop at call sites
    lets the two drift)."""
    for lang, cls in SCRIPT_LANGS:
        if _re.search(cls, text or ""):
            return lang
    return None


def detect_lang(text: str | None) -> str:
    """Driver-side ``lang_id_expr`` (must match it row for row) — used by
    the 'multilang' query analyzer to stem the QUERY with the same rule
    set its language's documents were indexed under."""
    s = script_lang(text)
    if s is not None:
        return s
    words = {
        t
        for t in _re.split(r"[^a-z0-9]+", (text or "").lower())
        if t
    }
    scores = {
        lng: len(words & set(markers))
        for lng, markers in sorted(LANG_MARKERS.items())
    }
    best = max(scores.values())
    if best == 0:
        return "unknown"
    return min(lng for lng, s in scores.items() if s == best)


def query_scoped_tokens_expr(
    text: Column, terms: Sequence[str], stem: bool = True
) -> Column:
    """Analyzer tokens restricted to possible matches of ``terms`` — the
    query-scoped fast path for inline FTS match/score.

    ``tokens_expr`` stems every non-stop token of every document, but a
    search only consumes ``doc_tokens ∩ terms``. The light stemmer (a)
    never changes a token's first character and (b) never lengthens a
    token (every rule replaces a suffix with a strictly shorter string),
    so a token can only stem to a query term if it shares some term's
    first character and is at least as long as the shortest term. The
    prefilter is cheap (substring + length + stop-word check, evaluated
    with short-circuit AND); the 7-regex stem chain — the per-token hot
    cost in interpreted higher-order lambdas — then runs only on the few
    candidates. Invariant (property-tested against ``tokens_expr``):
    result ∩ terms == tokens_expr(text) ∩ terms, and the result only
    contains stems of real document tokens, so ``arrays_overlap`` and
    overlap-count scores are unchanged.
    """
    if not terms:
        return F.array().cast("array<string>")
    words = F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), "[^a-z0-9]+"),
        lambda t: t != "",
    )
    if not stem:
        scoped = F.filter(words, lambda w: w.isin(*terms))
        return F.array_distinct(scoped)
    first_chars = sorted({t[0] for t in terms})
    min_len = min(len(t) for t in terms)
    cand = F.filter(
        words,
        lambda w: w.substr(1, 1).isin(*first_chars)
        & (F.length(w) >= min_len)
        & ~w.isin(*STOP_WORDS),
    )
    # single-arg lambda, NOT the bare function: F.transform feeds
    # (element, index) to two-parameter callables, and stem_token_expr
    # now has a lang default
    return F.array_distinct(F.transform(cand, lambda t: stem_token_expr(t)))


def stemmed_tokens_udf():
    """Arrow-batched UDF: full analyzer WITH Porter stemming.

    The stemmed variant of tokens_expr — opt-in (analyzer='english_stem')
    because stemming is procedural (UDF path) and not oracle-expressible.
    Produces: lower -> tokenize -> stop-words -> stem -> distinct.
    """
    from pyspark.sql.functions import pandas_udf

    from pg_vectorize_spark.functions.stemmer import porter_stem

    stop = set(STOP_WORDS)

    @pandas_udf("array<string>")
    def _stem_tokens(texts: pd.Series) -> pd.Series:
        import re

        out = []
        for t in texts:
            toks = [
                x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x
            ]
            seen: set[str] = set()
            result = []
            for tok in toks:
                if tok in stop:
                    continue
                s = porter_stem(tok)
                if s not in seen:
                    seen.add(s)
                    result.append(s)
            out.append(result)
        return pd.Series(out)

    return _stem_tokens


def analyze_query_stemmed(query: str) -> list[str]:
    """Driver-side stemmed analyzer (must match stemmed_tokens_udf)."""
    import re

    from pg_vectorize_spark.functions.stemmer import porter_stem

    stop = set(STOP_WORDS)
    toks = [t for t in re.split(r"[^a-z0-9]+", (query or "").lower()) if t]
    seen: set[str] = set()
    out: list[str] = []
    for t in toks:
        if t in stop:
            continue
        s = porter_stem(t)
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def analyze_query(
    query: str, stem: bool = True, lang: str = "en"
) -> list[str]:
    """Driver-side analyzer for query strings (plainto_tsquery + OR-rewrite).

    Must produce exactly what tokens_expr computes on the same string:
    tokenize -> stop-words -> dedupe -> stem -> dedupe (array_except
    dedupes before the stem transform, array_distinct after).
    """
    import re

    stops = STOP_WORDS_BY_LANG[lang] if stem else STOP_WORDS
    toks = [t for t in re.split(r"[^a-z0-9]+", (query or "").lower()) if t]
    kept = [t for t in toks if t not in set(stops)]
    seen: set[str] = set()
    deduped: list[str] = []
    for t in kept:
        if t not in seen:
            seen.add(t)
            deduped.append(t)
    if stem:
        deduped = [light_stem(t, lang) for t in deduped]
    seen2: set[str] = set()
    out: list[str] = []
    for t in deduped:
        if t not in seen2:
            seen2.add(t)
            out.append(t)
    return out


def fts_match_expr(doc_tokens: Column, query_terms: list[str]) -> Column:
    """``search_tokens @@ plainto_tsquery`` with OR semantics
    (core/src/query.rs:766-774) -> any-term overlap."""
    if not query_terms:
        return F.lit(False)
    return F.arrays_overlap(
        doc_tokens, F.array(*[F.lit(t) for t in query_terms])
    )


def fts_score_expr(doc_tokens: Column, query_terms: list[str]) -> Column:
    """Term-overlap score: |doc ∩ query| / |query| (ts_rank_cd analog)."""
    if not query_terms:
        return F.lit(0.0)
    qarr = F.array(*[F.lit(t) for t in query_terms])
    return F.size(F.array_intersect(doc_tokens, qarr)).cast("double") / float(
        len(query_terms)
    )


# ---------------------------------------------------------------------------
# token counting (A6 analog — core/src/query.rs:606-615 uses tiktoken; our
# spec is whitespace+punctuation token count, BPE-ish: alnum runs and each
# punctuation char count as one token)
# ---------------------------------------------------------------------------


def token_count_expr(text: Column) -> Column:
    """Count alnum-run tokens + standalone punctuation chars."""
    t = F.coalesce(text, F.lit(""))
    words = F.size(F.filter(F.split(F.lower(t), "[^a-z0-9]+"), lambda x: x != ""))
    punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    return (words + punct).cast("long")


def whitespace_token_count_expr(text: Column) -> Column:
    """Plain whitespace token count (the reference's trim unit, openai.rs:166)."""
    return F.size(
        F.filter(F.split(F.coalesce(text, F.lit("")), r"\s+"), lambda x: x != "")
    ).cast("long")


# ---------------------------------------------------------------------------
# quality scoring / language id / fingerprint (training-data-pipeline ops)
# ---------------------------------------------------------------------------


def quality_metrics_exprs(text: Column) -> dict[str, Column]:
    """Deterministic quality features: length, word stats, ratios.

    (r13 optimization round: a bind_once_expr rewrite of the repeated
    word-split subtrees was tried and REVERTED — flat-projection shapes
    like this one measured flat-to-worse with per-entry binds; the
    binding trick only pays around expensive conditionally-dispatched
    subtrees. See OPTIMIZATION_r13.md.)"""
    t = F.coalesce(text, F.lit(""))
    n_chars = F.length(t).cast("long")
    words = F.filter(F.split(F.lower(t), "[^a-z0-9]+"), lambda x: x != "")
    n_words = F.size(words).cast("long")
    mean_word_len = F.when(
        n_words > 0,
        F.aggregate(
            words, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
        )
        / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    n_punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", "")).cast("long")
    punct_ratio = F.when(
        n_chars > 0, n_punct.cast("double") / n_chars.cast("double")
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(words), F.array(*[F.lit(w) for w in STOP_WORDS])
        )
    ).cast("long")
    stopword_ratio = F.when(
        n_words > 0, stop_hits.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stopword_ratio,
    }


def quality_score_expr(text: Column) -> Column:
    """Composite quality score in [0,1]: rewards mid-length docs with words,
    low punctuation density, and some stop-word presence. Spec, not heuristic
    fidelity — both engines must agree bit-for-bit."""
    m = quality_metrics_exprs(text)
    len_term = F.least(m["n_chars"].cast("double") / F.lit(500.0), F.lit(1.0))
    word_term = F.least(m["n_words"].cast("double") / F.lit(50.0), F.lit(1.0))
    punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - m["punct_ratio"] * 5.0)
    stop_term = F.least(m["stopword_ratio"] * 2.0, F.lit(1.0))
    return (
        len_term * 0.25 + word_term * 0.25 + punct_term * 0.25 + stop_term * 0.25
    )


def quality_score_bound_expr(text: Column) -> Column:
    """``quality_score_expr`` with the words subtree bound ONCE — for
    single-consumer contexts (the quality_filter gate, the engine's
    min_quality curation filter, pipeline filter_quality/sampling).

    r13 optimization round: the flat score references the tokenize
    subtree 4x (word count, stopword-CASE condition, distinct-intersect,
    ratio divisor) and filter placement can double the whole-tree
    evaluation (Filter + Project). As a single output column there is no
    cross-column sharing to preserve, so one bind_once_expr wins
    (interleaved A/B, scripts/quality_bind_probe.py: gate shape
    0.995 s -> 0.613 s with the explode barrier at the call site; pure
    filter 0.464 -> 0.425 s). Values are bit-identical to
    ``quality_score_expr`` — same term trees over the bound array
    (equality asserted in the probe and pytest). Multi-column consumers
    (q_quality_score) keep the flat form: whole-stage CSE already shares
    the unconditional subtrees there and per-column binds measured 2x
    WORSE (see quality_metrics_exprs note)."""
    t = F.coalesce(text, F.lit(""))
    words = F.filter(F.split(F.lower(t), "[^a-z0-9]+"), lambda x: x != "")

    def _score(ws: Column) -> Column:
        n_chars = F.length(t).cast("long")
        n_words = F.size(ws).cast("long")
        n_punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", "")).cast(
            "long"
        )
        punct_ratio = F.when(
            n_chars > 0, n_punct.cast("double") / n_chars.cast("double")
        ).otherwise(F.lit(0.0))
        stop_hits = F.size(
            F.array_intersect(
                F.array_distinct(ws),
                F.array(*[F.lit(w) for w in STOP_WORDS]),
            )
        ).cast("long")
        stopword_ratio = F.when(
            n_words > 0, stop_hits.cast("double") / n_words.cast("double")
        ).otherwise(F.lit(0.0))
        len_term = F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0))
        word_term = F.least(n_words.cast("double") / F.lit(50.0), F.lit(1.0))
        punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 5.0)
        stop_term = F.least(stopword_ratio * 2.0, F.lit(1.0))
        return (
            len_term * 0.25
            + word_term * 0.25
            + punct_term * 0.25
            + stop_term * 0.25
        )

    return bind_once_expr(words, _score)


# Gopher-rule stop list (Rae et al. 2021 §A1.1: doc must contain >= 2)
GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_flags_exprs(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
    unicode: bool = False,
) -> dict[str, Column]:
    """Gopher quality-filter rules (Rae et al. 2021, Appendix A1.1) as
    per-document boolean flags plus the conjunction ``pass_gopher``.

    Rules: word count in [min,max]; mean word length in [3,10]; symbol-
    to-word ratio (# and ellipsis) <= 0.1; >= 80% of words contain an
    alphabetic character; >= 2 distinct Gopher stop words present. Every
    ratio is an exact double division over identical expression trees in
    Spark and the DuckDB oracle, so the boolean cuts agree bit-for-bit.
    """
    t = F.coalesce(text, F.lit(""))
    # unicode=True (r13): \p{L}\p{N} word class + \p{L} alpha check, so
    # the word-count / word-length / alpha rules read REAL values on
    # non-Latin corpora instead of zero words; the Gopher stop-word rule
    # stays English by its definition (Rae et al. 2021 filter English)
    split_re = UNICODE_SPLIT if unicode else "[^a-z0-9]+"
    alpha_re = r"\p{L}" if unicode else "[a-z]"
    words = F.filter(F.split(F.lower(t), split_re), lambda x: x != "")

    # (r13 optimization round: per-flag bind_once_expr binds were tried
    # and REVERTED — the interleaved A/B (scripts/gopher_bind_probe.py)
    # measured 0.56 s flat vs 1.24 s with six per-flag binds on the
    # all-columns projection; binding only pays for single-consumer
    # trees — see gopher_pass_expr — or conditional dispatch. See
    # OPTIMIZATION_r13.md.)
    n_words = F.size(words).cast("long")
    nw_d = n_words.cast("double")
    mean_word_len = F.when(
        n_words > 0,
        F.aggregate(
            words, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
        )
        / nw_d,
    ).otherwise(F.lit(0.0))
    n_symbols = (
        F.length(t)
        - F.length(F.regexp_replace(t, "#", ""))
        + F.size(F.split(t, r"\.\.\."))
        - F.lit(1)
    ).cast("long")
    symbol_ratio = F.when(
        n_words > 0, n_symbols.cast("double") / nw_d
    ).otherwise(F.lit(0.0))
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike(alpha_re))
    ).cast("long")
    alpha_ratio = F.when(
        n_words > 0, n_alpha_words.cast("double") / nw_d
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(w) for w in GOPHER_STOPS]),
        )
    ).cast("long")
    flags = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (mean_word_len >= F.lit(min_mean_word_len))
        & (mean_word_len <= F.lit(max_mean_word_len)),
        "ok_symbol_ratio": symbol_ratio <= F.lit(max_symbol_ratio),
        "ok_alpha_words": alpha_ratio >= F.lit(min_alpha_ratio),
        "ok_stop_words": stop_hits >= min_stop_hits,
    }
    passed = None
    for c in flags.values():
        passed = c if passed is None else passed & c
    flags["pass_gopher"] = passed
    return flags


def gopher_pass_expr(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
    unicode: bool = False,
) -> Column:
    """``pass_gopher`` alone, with the word array bound ONCE — for the
    single-flag consumers (corpus_stats, the pipeline gopher filter).

    r13 optimization round: the conjunction references the tokenize
    subtree ~14x across the five rules; as a single output column there
    is no cross-column sharing to preserve, so one bind_once_expr wins
    (interleaved A/B: 0.53 s -> 0.38 s at 20k docs,
    scripts/gopher_bind_probe.py). Values are identical to
    ``gopher_flags_exprs(...)['pass_gopher']`` — same rule trees over
    the bound array (equality asserted in the probe and pytest)."""
    t = F.coalesce(text, F.lit(""))
    split_re = UNICODE_SPLIT if unicode else "[^a-z0-9]+"
    alpha_re = r"\p{L}" if unicode else "[a-z]"
    words = F.filter(F.split(F.lower(t), split_re), lambda x: x != "")

    def _pass(ws: Column) -> Column:
        n_words = F.size(ws).cast("long")
        nw_d = n_words.cast("double")
        mean_word_len = F.when(
            n_words > 0,
            F.aggregate(
                ws,
                F.lit(0.0),
                lambda acc, w: acc + F.length(w).cast("double"),
            )
            / nw_d,
        ).otherwise(F.lit(0.0))
        n_symbols = (
            F.length(t)
            - F.length(F.regexp_replace(t, "#", ""))
            + F.size(F.split(t, r"\.\.\."))
            - F.lit(1)
        ).cast("long")
        symbol_ratio = F.when(
            n_words > 0, n_symbols.cast("double") / nw_d
        ).otherwise(F.lit(0.0))
        n_alpha_words = F.size(
            F.filter(ws, lambda w: w.rlike(alpha_re))
        ).cast("long")
        alpha_ratio = F.when(
            n_words > 0, n_alpha_words.cast("double") / nw_d
        ).otherwise(F.lit(0.0))
        stop_hits = F.size(
            F.array_intersect(
                F.array_distinct(ws),
                F.array(*[F.lit(w) for w in GOPHER_STOPS]),
            )
        ).cast("long")
        return (
            (n_words >= min_words)
            & (n_words <= max_words)
            & (mean_word_len >= F.lit(min_mean_word_len))
            & (mean_word_len <= F.lit(max_mean_word_len))
            & (symbol_ratio <= F.lit(max_symbol_ratio))
            & (alpha_ratio >= F.lit(min_alpha_ratio))
            & (stop_hits >= min_stop_hits)
        )

    return bind_once_expr(words, _pass)


# per-language marker words for the n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "a"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "que"],
    "de": ["der", "die", "und", "das", "von", "den", "mit", "ist", "des", "ein"],
    "zh": ["de", "shi", "le", "zai", "wo", "you", "he", "ren", "zhe", "ta"],
}


#: (lang, char-class) script checks, in priority order — script presence
#: beats marker words (a Han page has no ASCII markers at all; r12's
#: 'zh' markers are romanized pinyin and only catch transliterations).
#: Kana before Han: Japanese text mixes both, kana is the discriminator.
SCRIPT_LANGS: list[tuple[str, str]] = [
    ("ja", f"[{KANA_RANGES}]"),
    ("ko", f"[{HANGUL_RANGES}]"),
    ("zh", f"[{HAN_RANGES}]"),
    ("ru", f"[{CYRILLIC_RANGES}]"),
]


def lang_id_expr(text: Column) -> Column:
    """Script presence first (r13 — explicit codepoint-range checks,
    identical in Java/RE2/Python), then argmax over per-language
    marker-word hits; ties broken by language code order ('unknown'
    when zero hits everywhere).

    r13 optimization round: the argmax is computed from ONE evaluation
    of the tokenize subtree per row. The original nested-when form
    duplicated the split+distinct `words` subtree into every score
    reference (`greatest` + two references per when-condition), and
    interpreted evaluation — higher-order functions never enter codegen
    — re-evaluates every duplicated subtree, so a single lang-id call
    cost ~10 regex splits of the document. Binding `words` once via a
    transform-over-singleton lambda and taking the argmax as an
    array_max over (score, -order, lang) structs is value-identical
    (max score wins; ties -> lowest order = first language in sorted
    code order; zero hits -> 'unknown') and measured 3.2x faster on the
    multilang gate shape (scripts/analyzer_perf_probe.py)."""
    t = F.coalesce(text, F.lit(""))

    def _argmax(words: Column) -> Column:
        langs = sorted(LANG_MARKERS)
        arr = F.array(
            *[
                F.struct(
                    F.size(
                        F.array_intersect(
                            words,
                            F.array(*[F.lit(w) for w in LANG_MARKERS[lng]]),
                        )
                    ).alias("s"),
                    F.lit(-i).alias("o"),
                    F.lit(lng).alias("l"),
                )
                for i, lng in enumerate(langs)
            ]
        )
        best = F.array_max(arr)
        return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("unknown"))

    words = F.array_distinct(
        F.filter(F.split(F.lower(t), "[^a-z0-9]+"),
                 lambda x: x != "")
    )
    result = F.element_at(F.transform(F.array(words), _argmax), 1)
    for lang, cls in reversed(SCRIPT_LANGS):
        result = F.when(t.rlike(cls), F.lit(lang)).otherwise(result)
    return result


def bind_once_expr(value: Column, fn) -> Column:
    """Let-binding for expression trees: evaluate ``value`` ONCE per row
    and feed the result to ``fn`` as a bound lambda variable
    (transform-over-singleton + element_at).

    Why (r13 optimization round): higher-order functions are
    CodegenFallback, so any expression tree containing them is evaluated
    interpreted — and interpreted evaluation re-computes every duplicated
    subtree. An expression like ``when(size(words) >= k,
    ngrams(words)).otherwise(...)`` references ``words`` many times and
    pays the full tokenize cost per reference. Binding through a
    single-element ``transform`` evaluates ``value`` exactly once; the
    lambda body sees it as a cheap variable reference. The inner ops on
    the bound value should themselves be cheap (array ops, not regex) —
    measured 3-6x on the analyzer/shingle shapes
    (scripts/analyzer_perf_probe.py)."""
    return F.element_at(F.transform(F.array(value), fn), 1)


def fingerprint_expr(text: Column) -> Column:
    """Document fingerprint: polynomial rolling hash over all characters
    (same hash family as the embedder, full-text, not tokenized)."""
    return F.aggregate(
        F.split(F.coalesce(text, F.lit("")), ""),
        F.lit(HASH_SEED).cast("long"),
        lambda acc, ch: (acc * HASH_MULT + F.ascii(ch)) % HASH_MOD,
    )


def raw_words_expr(text: Column) -> Column:
    """Non-empty lowercase word array (no stemming, no stopword removal)."""
    return F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), "[^a-z0-9]+"),
        lambda x: x != "",
    )


def word_ngrams_expr(words: Column, k: int) -> Column:
    """Space-joined k-word n-grams from a word array, in document order.

    Built as a zip_with chain over k shifted slices: higher-order lambdas
    are interpreted per element, so each slice argument evaluates ``words``
    a constant number of times — never once per output gram (the
    transform(sequence(...)) + element_at form re-derives the whole word
    array for every (gram, offset) pair, an O(n·k) blowup on computed
    inputs). Returns an empty array when the doc has fewer than k words.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n = F.size(words)
    length = F.greatest(n - F.lit(k) + F.lit(1), F.lit(0))
    grams = F.slice(words, 1, length)
    for j in range(1, k):
        grams = F.zip_with(
            grams,
            F.slice(words, j + 1, length),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return grams


def word_shingles_expr(
    text: Column, k: int = 3, unicode: bool = False
) -> Column:
    """Distinct k-word shingles (space-joined) for Jaccard/MinHash dedup.

    ``unicode=True`` (r13) shingles over the Unicode token stream with
    CJK runs expanded to ORDER-PRESERVING character bigrams — the
    shingle units a boundary-less script needs. Without it, a non-Latin
    document tokenizes to NO words and falls into the short-doc
    whole-text fallback as ONE EMPTY shingle — identical for every
    such doc, so MinHash marks ALL non-Latin documents as mutual
    duplicates of each other (worse than skipping them; pinned in
    tests/test_unicode_tokens.py). The same gap the r13 analyzer work
    closed for FTS.
    The polynomial hash downstream is already Unicode-clean: Spark
    ascii(), DuckDB ascii() and Python ord() all return the codepoint.
    Default stays the ASCII spec — every existing gate is unchanged."""
    if unicode:
        words = cjk_bigram_expand_expr(unicode_raw_words_expr(text))
    else:
        words = raw_words_expr(text)

    # r13 optimization round: bind the word array ONCE — the shingle
    # construction references it ~7x (size guard, k shifted slices, the
    # short-doc fallback), and each reference re-ran the full tokenize
    # (+ bigram-expand under unicode=True) chain in interpreted eval.
    # The bound ops are pure array work; values are unchanged.
    def _shingles(ws: Column) -> Column:
        return F.array_distinct(
            F.when(
                F.size(ws) >= k, word_ngrams_expr(ws, k)
            ).otherwise(F.array(F.concat_ws(" ", ws)))
        )

    return bind_once_expr(words, _shingles)


def repetition_score_expr(text: Column, k: int = 2) -> Column:
    """Within-document duplicate k-gram fraction — the Gopher-style
    repetition signal for pretraining-data quality filtering (docs built
    from repeated boilerplate score high): 1 - distinct/total over the
    doc's word k-grams, 0.0 for docs with fewer than k words.

    Pure JVM expression; the int/int ratio is a single double division so
    the oracle (DuckDB list_distinct/len) reproduces it bit-for-bit.

    Callers scoring MULTIPLE k over the same text should project
    ``raw_words_expr(text)`` into a column once and call
    ``repetition_from_words_expr`` on it — this form re-derives the
    regex word split per slice argument (a constant factor, but it
    compounds across k values).
    """
    return repetition_from_words_expr(raw_words_expr(text), k)


def repetition_from_words_expr(words: Column, k: int = 2) -> Column:
    """``repetition_score_expr`` over a precomputed word array — the
    shape that shares one split across several k values (CollapseProject
    keeps a non-cheap projected expression single-evaluated when it is
    referenced more than once, so a two-projection plan splits each doc
    exactly once)."""
    grams = word_ngrams_expr(words, k)
    total = F.size(grams)
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total,
    ).otherwise(F.lit(0.0))


# PII scrub patterns — deliberately RE2-safe (no backrefs / lookaround) so
# the exact same pattern strings run in Java regex (Spark) and RE2 (DuckDB
# oracle) with identical matches.
URL_PATTERN = r"https?://[^\s]+"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def scrub_pii_expr(text: Column) -> Column:
    """Replace URLs then emails with sentinel tags — the standard
    pretraining-corpus PII/link normalization pass. URL first, so an email
    embedded in a URL query string is scrubbed as part of the URL."""
    scrubbed = F.regexp_replace(
        F.coalesce(text, F.lit("")), URL_PATTERN, "<URL>"
    )
    return F.regexp_replace(scrubbed, EMAIL_PATTERN, "<EMAIL>")


def pii_count_exprs(text: Column) -> dict[str, Column]:
    """Occurrence counts per PII class (for corpus audit rollups)."""
    t = F.coalesce(text, F.lit(""))
    return {
        "n_urls": F.size(F.regexp_extract_all(t, F.lit(URL_PATTERN), F.lit(0))),
        "n_emails": F.size(
            F.regexp_extract_all(t, F.lit(EMAIL_PATTERN), F.lit(0))
        ),
    }


#: HTML entity decode order: named/numeric entities first, '&amp;' LAST so
#: double-encoded text ('&amp;lt;') decodes exactly one level per pass —
#: the behavior every standard entity decoder has
HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

#: explicit whitespace class — identical semantics in Java regex (Spark)
#: and RE2 (DuckDB); \s differs between the engines (\x0B membership)
_WS_CLASS = r"[ \t\r\n\f]+"


def normalize_ws_expr(text: Column) -> Column:
    """Whitespace normalization: collapse runs of blank characters to one
    space and trim — the canonical pre-tokenization cleanup. Pure JVM
    expressions; the explicit character class keeps Spark and the DuckDB
    oracle bit-identical."""
    return F.trim(
        F.regexp_replace(F.coalesce(text, F.lit("")), _WS_CLASS, " ")
    )


def strip_html_expr(text: Column) -> Column:
    """HTML-ish markup strip for crawled corpora: drop tags (replaced by a
    space so adjacent words don't fuse), decode the common entities, then
    normalize whitespace. Deliberately a lexical pass, not an HTML parser
    — the scale-path behavior every corpus pipeline uses (malformed
    markup degrades to text, never errors)."""
    t = F.regexp_replace(F.coalesce(text, F.lit("")), r"<[^>]*>", " ")
    for ent, ch in HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return normalize_ws_expr(t)


def c4_flags_exprs(
    text: Column,
    min_sentences: int = 5,
    min_line_words: int = 3,
) -> dict[str, Column]:
    """C4 cleaning rules (Raffel et al. 2020, §2.2 "Colossal Clean
    Crawled Corpus") as per-document expressions:

    - ``clean_text``: only lines that end in a terminal punctuation mark
      (. ! ? ") AND hold at least ``min_line_words`` words survive;
    - ``n_lines`` / ``n_kept_lines``: before/after the line filter;
    - ``n_sentences``: terminal-punctuation splits with content;
    - ``has_lorem_ipsum`` / ``has_brace``: placeholder-text and code
      markers (C4 drops pages containing either);
    - ``pass_c4``: >= ``min_sentences`` sentences and no markers.

    Pure per-row JVM expressions over identical trees in Spark and the
    DuckDB oracle — no UDF, no shuffle, prunes at the scan.
    """
    t = F.coalesce(text, F.lit(""))
    lines = F.filter(
        F.split(t, "\n"), lambda x: F.trim(x) != F.lit("")
    )
    def _terminal(x: Column) -> Column:
        tr = F.trim(x)
        return (
            tr.endswith(".")
            | tr.endswith("!")
            | tr.endswith("?")
            | tr.endswith('"')
        )

    def _n_words(x: Column) -> Column:
        return F.size(
            F.filter(
                F.split(F.lower(x), "[^a-z0-9]+"), lambda w: w != F.lit("")
            )
        )

    kept = F.filter(
        lines,
        lambda x: _terminal(x) & (_n_words(x) >= F.lit(min_line_words)),
    )
    sentences = F.filter(
        F.split(t, "[.!?]"), lambda x: F.trim(x) != F.lit("")
    )
    lower = F.lower(t)
    has_lorem = lower.contains("lorem ipsum")
    has_brace = t.contains("{")
    n_sent = F.size(sentences).cast("long")
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_kept_lines": F.size(kept).cast("long"),
        "n_sentences": n_sent,
        "has_lorem_ipsum": has_lorem,
        "has_brace": has_brace,
        "clean_text": F.array_join(kept, "\n"),
        "pass_c4": (n_sent >= F.lit(min_sentences))
        & ~has_lorem
        & ~has_brace,
    }


def line_dedup_exprs(text: Column) -> dict[str, Column]:
    """First-occurrence line dedup WITHIN a document (the intra-page
    cleanup CCNet/C4-style pipelines run before any cross-corpus pass:
    nav bars, cookie banners and footers repeat verbatim inside a page).
    Keeps each distinct line's first occurrence, preserving order:

    - ``n_lines`` / ``n_kept_lines``: before/after;
    - ``clean_text``: survivors rejoined with newlines;
    - ``had_dup_lines``: any line repeated.

    Pure per-row array expressions (split → first-occurrence filter →
    rejoin) — zero shuffle, whole-stage-codegen'd, embarrassingly
    parallel at any scale. The first-occurrence test is
    ``array_position(lines, x) == i+1`` (first index of the value equals
    this index), O(lines²) per doc in the worst case — lines-per-doc is
    bounded, corpus size is not, so the quadratic term is the right side
    of the trade.
    """
    t = F.coalesce(text, F.lit(""))
    lines = F.split(t, "\n")

    # r13 optimization round: bind the line array once per entry — the
    # direct form's first-occurrence lambda referenced `lines` INSIDE
    # the filter body, so interpreted eval re-ran the split per element
    # (O(lines) splits per doc on top of the O(lines^2) scan). The bound
    # variable is a cheap reference; values unchanged.
    def _kept(ls: Column) -> Column:
        return F.filter(
            ls, lambda x, i: F.array_position(ls, x) == i + 1
        )

    return {
        "n_lines": F.size(lines).cast("long"),
        "n_kept_lines": bind_once_expr(
            lines, lambda ls: F.size(_kept(ls)).cast("long")
        ),
        "clean_text": bind_once_expr(
            lines, lambda ls: F.array_join(_kept(ls), "\n")
        ),
        "had_dup_lines": bind_once_expr(
            lines,
            lambda ls: F.size(_kept(ls)).cast("long")
            < F.size(ls).cast("long"),
        ),
    }

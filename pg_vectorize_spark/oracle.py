"""DuckDB oracle SQL fragments mirroring the Spark expression library.

The correctness gate runs each Spark query AND an equivalent DuckDB SQL query
and compares row-count + schema + order-insensitive value hashes. Floating
point must therefore match bit-for-bit, which these fragments achieve by:

- computing everything in float64;
- using ``list_reduce`` with a prepended seed so the fold order is identical
  to Spark's ``aggregate`` (left-to-right, seed first);
- mirroring tokenization exactly (same regex, same empty-string filtering);
- rounding only as a final belt-and-braces step where the Spark query also
  rounds with the same precision.

Every fragment corresponds 1:1 to an expression in functions/vector.py or
functions/text.py — keep them in sync.
"""

from __future__ import annotations

from pg_vectorize_spark.functions.text import (
    LANG_MARKERS,
    LIGHT_STEM_RULES,
    LIGHT_STEM_RULES_BY_LANG,
    SCRIPT_LANGS,
    STOP_WORDS,
    STOP_WORDS_BY_LANG,
    UNICODE_SPLIT,
    _CJK_CLASS,
)
from pg_vectorize_spark.providers.local import HASH_MOD, HASH_MULT, HASH_SEED


def sql_stop_words() -> str:
    inner = ", ".join(f"'{w}'" for w in STOP_WORDS)
    return f"[{inner}]"


def sql_str_array(items: list[str]) -> str:
    inner = ", ".join("'" + s.replace("'", "''") + "'" for s in items)
    return f"[{inner}]"


def sql_words(text: str) -> str:
    """Lowercase word tokens, empties dropped (functions/vector._word_tokens)."""
    return (
        f"list_filter(string_split_regex(lower(coalesce({text}, '')), "
        f"'[^a-z0-9]+'), t -> t <> '')"
    )


def sql_unicode_words(text: str) -> str:
    """functions/text.unicode_raw_words_expr — \\p{L}\\p{N} token split
    (RE2 shares Java's \\p class syntax; DuckDB lower() is
    Unicode-aware like Spark's)."""
    return (
        f"list_filter(string_split_regex(lower(coalesce({text}, '')), "
        f"'{UNICODE_SPLIT}'), t -> t <> '')"
    )


def sql_cjk_expand(words: str) -> str:
    """functions/text.cjk_bigram_expand_expr — tokens containing any
    Han/kana/Hangul character become overlapping character bigrams
    (substring is character-based in DuckDB, as in Spark)."""
    return (
        f"flatten(list_transform({words}, w -> "
        f"CASE WHEN regexp_matches(w, '{_CJK_CLASS}') THEN "
        f"(CASE WHEN length(w) <= 1 THEN [w] "
        f"ELSE list_transform(range(1, length(w)), "
        f"i -> substring(w, i::INT, 2)) END) "
        f"ELSE [w] END))"
    )


def sql_unicode_tokens(text: str, stem: bool = True, lang: str = "en") -> str:
    """functions/text.unicode_tokens_expr — unicode words -> CJK bigram
    expand -> stop-words -> stem -> distinct (same stage order as
    sql_tokens: dedupe before the stem transform, distinct after)."""
    stops = (
        sql_str_array(STOP_WORDS_BY_LANG[lang]) if stem else sql_stop_words()
    )
    kept = (
        f"list_filter({sql_cjk_expand(sql_unicode_words(text))}, "
        f"t -> NOT list_contains({stops}, t))"
    )
    if stem:
        kept = (
            f"list_transform(list_distinct({kept}), "
            f"t -> {sql_stem('t', lang)})"
        )
    return f"list_distinct({kept})"


def sql_stem(tok: str, lang: str = "en") -> str:
    """The light-stemmer rule chain (text.LIGHT_STEM_RULES_BY_LANG) as
    nested regexp_replace; DuckDB's RE2 engine uses backslash group refs,
    which is the canonical form the rules are stored in."""
    out = tok
    for pat, repl in LIGHT_STEM_RULES_BY_LANG[lang]:
        out = f"regexp_replace({out}, '{pat}', '{repl}')"
    return out


def sql_tokens(text: str, stem: bool = True, lang: str = "en") -> str:
    """Analyzer tokens: words minus stop-words, stemmed, distinct
    (text.tokens_expr). ``lang`` selects rule set + stop-word list."""
    stops = (
        sql_str_array(STOP_WORDS_BY_LANG[lang]) if stem else sql_stop_words()
    )
    kept = (
        f"list_filter({sql_words(text)}, "
        f"t -> NOT list_contains({stops}, t))"
    )
    if stem:
        kept = (
            f"list_transform(list_distinct({kept}), "
            f"t -> {sql_stem('t', lang)})"
        )
    return f"list_distinct({kept})"


def sql_fts_match(tokens: str, terms: list[str]) -> str:
    if not terms:
        return "FALSE"
    return f"len(list_intersect({tokens}, {sql_str_array(terms)})) > 0"


def sql_fts_score(tokens: str, terms: list[str]) -> str:
    if not terms:
        return "0.0"
    return (
        f"(len(list_intersect({tokens}, {sql_str_array(terms)}))::DOUBLE "
        f"/ {float(len(terms))!r})"
    )


def sql_poly_hash(expr: str, seed: int = HASH_SEED) -> str:
    """Polynomial-roll hash over the characters of a string expression."""
    chars = f"list_transform(range(1, len({expr})+1), i -> ascii(substr({expr}, i::INT, 1))::BIGINT)"
    return (
        f"list_reduce(list_prepend({seed}::BIGINT, {chars}), "
        f"(acc, x) -> (acc*{HASH_MULT} + x) % {HASH_MOD})"
    )


def sql_hash_bucket(expr: str, dim: int) -> str:
    return f"({sql_poly_hash(expr)} % {dim})"


def sql_features(text: str) -> str:
    """Word tokens + char 3-grams (providers/local.features)."""
    words = sql_words(text)
    grams = (
        f"flatten(list_transform({words}, "
        f"w -> list_transform(range(0, greatest(len(w)-3, 0)+1), "
        f"i -> substr(w, (i+1)::INT, 3))))"
    )
    return f"list_concat({words}, {grams})"


def sql_embed(text: str, dim: int, normalize: bool = True) -> str:
    """Deterministic hashed-BoW embedding (functions/vector.embed_expr)."""
    buckets = f"list_transform({sql_features(text)}, f -> {sql_hash_bucket('f', dim)})"
    counts = (
        f"list_transform(range(0, {dim}), "
        f"i -> len(list_filter({buckets}, b -> b = i))::DOUBLE)"
    )
    if not normalize:
        return counts
    norm = (
        f"sqrt(list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform({counts}, x -> x*x)), (a, x) -> a + x))"
    )
    return (
        f"(CASE WHEN {norm} > 0 "
        f"THEN list_transform({counts}, x -> x / {norm}) "
        f"ELSE {counts} END)"
    )


def sql_dot(a: str, b: str) -> str:
    """Σ a_i*b_i with Spark-identical fold order (vector.dot_product)."""
    prods = (
        f"list_transform(range(1, len({a})+1), "
        f"i -> {a}[i::INT]::DOUBLE * {b}[i::INT]::DOUBLE)"
    )
    return f"list_reduce(list_prepend(0.0::DOUBLE, {prods}), (acc, x) -> acc + x)"


def sql_l2_norm(a: str) -> str:
    sq = f"list_transform({a}, x -> x::DOUBLE * x::DOUBLE)"
    return (
        f"sqrt(list_reduce(list_prepend(0.0::DOUBLE, {sq}), (acc, x) -> acc + x))"
    )


def sql_cosine(a: str, b: str) -> str:
    denom = f"({sql_l2_norm(a)} * {sql_l2_norm(b)})"
    return (
        f"(CASE WHEN {denom} > 0 THEN {sql_dot(a, b)} / {denom} ELSE 0.0 END)"
    )


def sql_token_count(text: str) -> str:
    """functions/text.token_count_expr: alnum-run tokens + punct chars."""
    words = f"len({sql_words(text)})"
    punct = (
        f"len(regexp_replace(coalesce({text}, ''), '[A-Za-z0-9\\s]', '', 'g'))"
    )
    return f"({words} + {punct})::BIGINT"


def sql_ws_token_count(text: str) -> str:
    return (
        f"len(list_filter(string_split_regex(coalesce({text}, ''), '\\s+'), "
        f"x -> x <> ''))::BIGINT"
    )


def sql_fingerprint(text: str) -> str:
    """functions/text.fingerprint_expr — poly hash over ALL characters."""
    return sql_poly_hash(f"coalesce({text}, '')")


def sql_word_shingles(text: str, k: int = 3, unicode: bool = False) -> str:
    """Distinct k-word shingles (functions/text.word_shingles_expr).
    ``unicode=True`` shingles over the CJK-bigram-expanded Unicode
    token stream (order-preserving, duplicates kept)."""
    if unicode:
        words = sql_cjk_expand(sql_unicode_words(text))
    else:
        words = sql_words(text)
    joined_parts = " || ' ' || ".join(
        f"{words}[(i+{j}+1)::INT]" for j in range(k)
    )
    return (
        f"list_distinct(CASE WHEN len({words}) >= {k} THEN "
        f"list_transform(range(0, len({words}) - {k} + 1), i -> {joined_parts}) "
        f"ELSE [array_to_string({words}, ' ')] END)"
    )


def sql_quality_metrics(text: str) -> dict[str, str]:
    """functions/text.quality_metrics_exprs, field by field."""
    t = f"coalesce({text}, '')"
    words = sql_words(text)
    n_chars = f"len({t})::BIGINT"
    n_words = f"len({words})::BIGINT"
    sum_word_len = (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform({words}, w -> len(w)::DOUBLE)), (a, x) -> a + x)"
    )
    mean_word_len = (
        f"(CASE WHEN {n_words} > 0 THEN {sum_word_len} / ({n_words})::DOUBLE "
        f"ELSE 0.0 END)"
    )
    n_punct = f"len(regexp_replace({t}, '[A-Za-z0-9\\s]', '', 'g'))::BIGINT"
    punct_ratio = (
        f"(CASE WHEN {n_chars} > 0 THEN ({n_punct})::DOUBLE / ({n_chars})::DOUBLE "
        f"ELSE 0.0 END)"
    )
    stop_hits = (
        f"len(list_intersect(list_distinct({words}), {sql_stop_words()}))::BIGINT"
    )
    stopword_ratio = (
        f"(CASE WHEN {n_words} > 0 THEN ({stop_hits})::DOUBLE / ({n_words})::DOUBLE "
        f"ELSE 0.0 END)"
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stopword_ratio,
    }


def sql_quality_score(text: str) -> str:
    m = sql_quality_metrics(text)
    len_term = f"least(({m['n_chars']})::DOUBLE / 500.0, 1.0)"
    word_term = f"least(({m['n_words']})::DOUBLE / 50.0, 1.0)"
    punct_term = f"greatest(0.0, 1.0 - {m['punct_ratio']} * 5.0)"
    stop_term = f"least({m['stopword_ratio']} * 2.0, 1.0)"
    return (
        f"({len_term} * 0.25 + {word_term} * 0.25 + {punct_term} * 0.25 "
        f"+ {stop_term} * 0.25)"
    )


def sql_lang_id(text: str) -> str:
    """functions/text.lang_id_expr — script presence first (r13), then
    argmax of marker hits, tie -> first code."""
    t = f"coalesce({text}, '')"
    script_whens = " ".join(
        f"WHEN regexp_matches({t}, '{cls}') THEN '{lang}'"
        for lang, cls in SCRIPT_LANGS
    )
    words = f"list_distinct({sql_words(text)})"
    scores = {
        lang: f"len(list_intersect({words}, {sql_str_array(markers)}))"
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    whens = " ".join(
        f"WHEN {scores[lang]} > 0 AND {scores[lang]} = {best} THEN '{lang}'"
        for lang in sorted(LANG_MARKERS)
    )
    return f"(CASE {script_whens} {whens} ELSE 'unknown' END)"


def sql_word_ngrams(text: str, k: int) -> str:
    """functions/text.word_ngrams_expr — space-joined word k-grams in doc
    order via list_zip of k shifted slices (mirrors the Spark zip_with
    chain, including the empty result for docs shorter than k words)."""
    words = sql_words(text)
    if k == 1:
        return words
    slices = ", ".join(
        f"({words})[{j + 1}:len({words}) - {k - j - 1}]" for j in range(k)
    )
    joined = " || ' ' || ".join(f"x[{j + 1}]" for j in range(k))
    return (
        f"(CASE WHEN len({words}) >= {k} THEN "
        f"list_transform(list_zip({slices}), x -> {joined}) "
        f"ELSE [] END)"
    )


def sql_repetition_score(text: str, k: int) -> str:
    """functions/text.repetition_score_expr — duplicate k-gram fraction."""
    grams = sql_word_ngrams(text, k)
    return (
        f"(CASE WHEN len({grams}) > 0 THEN "
        f"1.0 - len(list_distinct({grams}))::DOUBLE / len({grams}) "
        f"ELSE 0.0 END)"
    )


# Same literal patterns as functions/text.URL_PATTERN / EMAIL_PATTERN —
# written RE2-safe so Java regex and DuckDB RE2 agree match-for-match.
SQL_URL_PATTERN = r"https?://[^\s]+"
SQL_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def sql_scrub_pii(text: str) -> str:
    """functions/text.scrub_pii_expr — URL then email sentinel replace."""
    url = SQL_URL_PATTERN.replace("'", "''")
    email = SQL_EMAIL_PATTERN.replace("'", "''")
    return (
        f"regexp_replace(regexp_replace(coalesce({text}, ''), "
        f"'{url}', '<URL>', 'g'), '{email}', '<EMAIL>', 'g')"
    )


def sql_gopher_flags(
    text: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
    unicode: bool = False,
    words_expr: str | None = None,
) -> dict[str, str]:
    """functions/text.gopher_flags_exprs, flag by flag. ``words_expr``
    substitutes a precomputed word-list fragment (e.g. a MATERIALIZED
    CTE column) so a caller using several flags doesn't re-run the
    word split per flag per row. The ``unicode`` flag STILL picks the
    alpha-word regex when ``words_expr`` is supplied — the caller must
    pass the unicode value their word list was built with, or
    ok_alpha_words matches '[a-z]' against unicode words (silently
    false for every non-Latin doc)."""
    from pg_vectorize_spark.functions.text import GOPHER_STOPS

    t = f"coalesce({text}, '')"
    if words_expr is not None:
        words = words_expr
    else:
        words = sql_unicode_words(text) if unicode else sql_words(text)
    n_words = f"len({words})::BIGINT"
    nw_d = f"({n_words})::DOUBLE"
    sum_word_len = (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform({words}, w -> len(w)::DOUBLE)), (a, x) -> a + x)"
    )
    mean_word_len = (
        f"(CASE WHEN {n_words} > 0 THEN {sum_word_len} / {nw_d} "
        f"ELSE 0.0 END)"
    )
    n_symbols = (
        f"(len({t}) - len(regexp_replace({t}, '#', '', 'g')) "
        f"+ len(string_split_regex({t}, '\\.\\.\\.')) - 1)::BIGINT"
    )
    symbol_ratio = (
        f"(CASE WHEN {n_words} > 0 THEN ({n_symbols})::DOUBLE / {nw_d} "
        f"ELSE 0.0 END)"
    )
    alpha_re = r"\p{L}" if unicode else "[a-z]"
    n_alpha = (
        f"len(list_filter({words}, w -> regexp_matches(w, '{alpha_re}')))"
        f"::BIGINT"
    )
    alpha_ratio = (
        f"(CASE WHEN {n_words} > 0 THEN ({n_alpha})::DOUBLE / {nw_d} "
        f"ELSE 0.0 END)"
    )
    stop_hits = (
        f"len(list_intersect(list_distinct({words}), "
        f"{sql_str_array(GOPHER_STOPS)}))::BIGINT"
    )
    flags = {
        "ok_word_count": (
            f"({n_words} >= {min_words} AND {n_words} <= {max_words})"
        ),
        "ok_mean_word_len": (
            f"({mean_word_len} >= {min_mean_word_len!r} "
            f"AND {mean_word_len} <= {max_mean_word_len!r})"
        ),
        "ok_symbol_ratio": f"({symbol_ratio} <= {max_symbol_ratio!r})",
        "ok_alpha_words": f"({alpha_ratio} >= {min_alpha_ratio!r})",
        "ok_stop_words": f"({stop_hits} >= {min_stop_hits})",
    }
    flags["pass_gopher"] = "(" + " AND ".join(flags.values()) + ")"
    return flags


def sql_split_bucket(key: str, buckets: int = 10_000, salt: str = "") -> str:
    """operators/curate.bucket_expr — Fibonacci-mixed uniform bucket."""
    salted = f"(({key})::VARCHAR || {salt!r})" if salt else f"({key})::VARCHAR"
    mixed = f"(({sql_poly_hash(salted)} * 2654435761) % 4294967296)"
    return f"(({mixed} * {buckets}) >> 32)"


def sql_hash_split(key: str, splits, buckets: int = 10_000) -> str:
    """operators/curate.hash_split_expr — cumulative bucket CASE."""
    bucket = sql_split_bucket(key, buckets)
    cum = 0.0
    whens = []
    for name, frac in list(splits)[:-1]:
        cum += frac
        cut = int(round(cum * buckets))
        whens.append(f"WHEN {bucket} < {cut} THEN '{name}'")
    last = list(splits)[-1][0]
    if not whens:
        return f"'{last}'"
    return f"(CASE {' '.join(whens)} ELSE '{last}' END)"


def sql_sample_priority(key: str, salt: str = "|sample") -> str:
    """operators/curate.sample_priority_expr — mixed hash in [0, 2^32)."""
    salted = sql_poly_hash(f"(({key})::VARCHAR || {salt!r})")
    return f"(({salted} * 2654435761) % 4294967296)"


def sql_mix_copies(
    key: str,
    strata: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    buckets: int = 10_000,
    salt: str = "|mix",
) -> str:
    """operators/curate.weighted_mix — per-row copy count expression."""
    bucket = sql_split_bucket(key, buckets, salt=salt)

    def case(value_of) -> str:
        whens = " ".join(
            f"WHEN '{k}' THEN {value_of(w)}" for k, w in weights.items()
        )
        return f"(CASE {strata} {whens} ELSE {value_of(default_weight)} END)"

    base = case(lambda w: int(w))
    cut = case(lambda w: int(round((w - int(w)) * buckets)))
    return f"({base} + (CASE WHEN {bucket} < {cut} THEN 1 ELSE 0 END))"


def sql_pii_counts(text: str) -> dict[str, str]:
    url = SQL_URL_PATTERN.replace("'", "''")
    email = SQL_EMAIL_PATTERN.replace("'", "''")
    t = f"coalesce({text}, '')"
    return {
        "n_urls": f"len(regexp_extract_all({t}, '{url}'))::INT",
        "n_emails": f"len(regexp_extract_all({t}, '{email}'))::INT",
    }

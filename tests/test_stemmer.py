"""Porter stemmer goldens + stemmed analyzer integration."""

from __future__ import annotations

import pytest

from pg_vectorize_spark.functions.stemmer import porter_stem
from pg_vectorize_spark.functions.text import analyze_query_stemmed

# classic Porter (1980) paper examples
GOLDENS = {
    "caresses": "caress",
    "ponies": "poni",
    "ties": "ti",
    "caress": "caress",
    "cats": "cat",
    "feed": "feed",
    "agreed": "agre",
    "plastered": "plaster",
    "bled": "bled",
    "motoring": "motor",
    "sing": "sing",
    "conflated": "conflat",
    "troubled": "troubl",
    "sized": "size",
    "hopping": "hop",
    "tanned": "tan",
    "falling": "fall",
    "hissing": "hiss",
    "fizzed": "fizz",
    "failing": "fail",
    "filing": "file",
    "happy": "happi",
    "sky": "sky",
    "relational": "relat",
    "conditional": "condit",
    "rational": "ration",
    "valenci": "valenc",
    "digitizer": "digit",
    "operator": "oper",
    "triplicate": "triplic",
    "formative": "form",
    "formalize": "formal",
    "electrical": "electr",
    "hopefulness": "hope",
    "goodness": "good",
    "revival": "reviv",
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    "activate": "activ",
    "effective": "effect",
    "probate": "probat",
    "rate": "rate",
    "controlling": "control",
    "running": "run",
}


@pytest.mark.parametrize("word,stem", sorted(GOLDENS.items()))
def test_porter_goldens(word, stem):
    assert porter_stem(word) == stem


def test_short_words_unchanged():
    assert porter_stem("at") == "at"
    assert porter_stem("a") == "a"


def test_analyze_query_stemmed():
    # stop-words removed, stems deduped
    out = analyze_query_stemmed("the running runners are running fast")
    assert "run" in out or "runner" in out
    assert "the" not in out and "are" not in out
    assert len(out) == len(set(out))


def test_stemmed_fts_matches_inflections(spark, products_df):
    from pg_vectorize_spark.operators.search import full_text_search

    # query 'charging' should match 'charger' only via stemming... both stem
    # to 'charg'/'charger'? porter: charging->charg, charger->charger.
    # use a clean inflection pair instead: 'adjustable' <-> 'adjust'
    out = full_text_search(
        products_df,
        "product_id",
        "adjusting arms",
        text_cols=["description"],
        num_results=5,
        analyzer="english_stem",
    ).collect()
    names = {r["product_name"] for r in out}
    # 'adjusting' stems to 'adjust'; 'adjustable' -> 'adjust' too
    assert "Desk Lamp" in names or "Tablet Holder" in names

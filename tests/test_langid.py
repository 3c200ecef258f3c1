"""Cavnar-Trenkle language ID (functions/langid.py): profile training,
out-of-place classification on held-out text, degenerate docs, and plan
hygiene (exchange count)."""

import pytest
from pyspark.sql import functions as F

from metadata_crawler_spark.functions.langid import (
    char_ngrams_expr,
    classify_lang,
    normalize_expr,
    train_lang_profiles,
)

# Small public-domain-style training snippets with distinct letter stats.
TRAIN = {
    "en": [
        "the quick brown fox jumps over the lazy dog and runs through the field",
        "this is a sentence written in the english language with many common words",
        "she said that they would come to the house in the morning with friends",
    ],
    "de": [
        "der schnelle braune fuchs springt ueber den faulen hund und rennt durch das feld",
        "dies ist ein satz der in deutscher sprache geschrieben wurde mit vielen woertern",
        "sie sagte dass sie am morgen mit freunden zum haus kommen wuerden",
    ],
    "fr": [
        "le renard brun rapide saute par dessus le chien paresseux et court dans le champ",
        "ceci est une phrase ecrite en langue francaise avec beaucoup de mots courants",
        "elle a dit qu ils viendraient a la maison le matin avec des amis",
    ],
    "es": [
        "el rapido zorro marron salta sobre el perro perezoso y corre por el campo",
        "esta es una frase escrita en lengua espanola con muchas palabras comunes",
        "ella dijo que vendrian a la casa por la manana con amigos",
    ],
}
HELDOUT = [
    (1, "the weather in the morning was cold but they walked to the town", "en"),
    (2, "die kinder spielen im garten und das wetter ist heute sehr schoen", "de"),
    (3, "les enfants jouent dans le jardin et le temps est tres beau aujourd hui", "fr"),
    (4, "los ninos juegan en el jardin y el tiempo es muy bueno hoy", "es"),
]


@pytest.fixture(scope="module")
def profiles(spark):
    rows = [(lang, t) for lang, ts in TRAIN.items() for t in ts]
    labeled = spark.createDataFrame(rows, "lang string, text string")
    return train_lang_profiles(labeled, top_n=200).cache()


def test_normalize_and_ngrams(spark):
    df = spark.createDataFrame([("Ab, c!",), (None,)], "t string")
    norm = df.select(normalize_expr(F.col("t")).alias("n")).collect()
    assert norm[0]["n"] == "_ab_c_" and norm[1]["n"] == "_"
    grams = df.select(char_ngrams_expr(F.col("t")).alias("g")).collect()[0]["g"]
    # 1-grams + 2-grams + 3-grams of "_ab_c_" = 6 + 5 + 4
    assert len(grams) == 15 and "_ab" in grams and "c_" in grams


def test_profiles_shape(profiles):
    pdf = profiles.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx")
    )
    got = {r["lang"]: (r["n"], r["mx"]) for r in pdf.collect()}
    assert set(got) == {"en", "de", "fr", "es"}
    for n, mx in got.values():
        assert n <= 200 and mx == n  # dense ranks 1..n


def test_heldout_classification(spark, profiles):
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in HELDOUT], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in classify_lang(df, profiles, top_n=200).collect()
    }
    assert got == {i: lang for i, _, lang in HELDOUT}


def test_every_doc_gets_a_row(spark, profiles):
    df = spark.createDataFrame(
        [(1, "the the the"), (2, ""), (3, None), (4, "1234 5678")],
        "doc_id long, text string",
    )
    out = classify_lang(df, profiles, top_n=200)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}  # padding grams keep empties alive
    assert rows[1]["lang"] == "en"
    # ties (pure-padding docs score identically) break on lang ascending
    assert rows[2]["lang"] == rows[3]["lang"] == min(TRAIN)


def test_plan_two_exchanges_and_broadcast_profiles(spark, profiles):
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in HELDOUT], "doc_id long, text string"
    )
    plan = (
        classify_lang(df, profiles, top_n=200)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # profile + language-list joins are broadcast; scoring reuses the id
    # partitioning, so the classify side has exactly 2 hash exchanges:
    # (id, gram) counts and the per-doc rank window by id.
    assert "BroadcastHashJoin" in plan and "BroadcastNestedLoopJoin" in plan
    classify_side = plan.split("InMemoryTableScan")[0]
    assert classify_side.count("Exchange hashpartitioning") == 2

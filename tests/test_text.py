"""Text extraction: the north-rule invariant — byte-identical extracted
text per url vs the oracle ``text`` column — plus outlinks/lang/quality."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_crawler_spark.functions.text import (
    extract_meta_lang_udf,
    extract_outlinks_udf,
    extract_text_py,
    extract_text_udf,
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    ws_token_count,
)


def test_extract_text_py_basics():
    html = (
        "<html><head><title>T</title><style>x{}</style></head>"
        "<body><p>a  b</p><script>no()</script><a href='u'>c</a>"
        "&amp;&lt;ok&gt;</body></html>"
    )
    assert extract_text_py(html) == "T a b c &<ok>"
    assert extract_text_py(html.encode()) == "T a b c &<ok>"


def test_byte_identical_extraction(spark, tables):
    """UDF(html) == stored oracle text for EVERY fixture page (north rule)."""
    mismatch = (
        tables["pages"]
        .select("url", "text", extract_text_udf("html").alias("got"))
        .filter(F.col("got") != F.col("text"))
        .count()
    )
    assert mismatch == 0


def test_outlinks_and_meta_lang(spark, tables):
    df = tables["pages"].select(
        "lang",
        extract_outlinks_udf("html").alias("links"),
        extract_meta_lang_udf("html").alias("meta_lang"),
    )
    bad_lang = df.filter(F.col("meta_lang") != F.col("lang")).count()
    assert bad_lang == 0
    some_links = df.filter(F.size("links") > 0).count()
    assert some_links > 0
    # every extracted link is a fixture URL shape
    one = df.filter(F.size("links") > 0).select(F.explode("links")).first()[0]
    assert one.startswith(("http://", "https://"))


def test_text_analysis_exprs(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of war",),
            ("der hund und die katze nicht",),
            ("",),
        ],
        "text string",
    )
    rows = df.select(
        lang_id_expr(F.col("text")).alias("lang"),
        ws_token_count(F.col("text")).alias("ntok"),
        quality_score_expr(F.col("text")).alias("q"),
        fingerprint_expr(F.col("text")).alias("fp"),
    ).collect()
    assert rows[0].lang == "en"
    assert rows[1].lang == "de"
    assert rows[2].lang == "unknown"
    assert rows[0].ntok == 7
    assert rows[2].ntok == 0
    assert 0.0 <= rows[0].q <= 1.0
    assert len(rows[0].fp) == 32


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [("b a c",), ("c b a",), ("a b d",)], "text string"
    )
    fps = [r.fp for r in df.select(fingerprint_expr(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_ccnet_normalize(spark):
    """Accent strip, digit fold, case fold, whitespace collapse — UDF
    matches the Python reference, idempotent, NULL-safe; normalized
    shadow makes accent/digit variants hash-equal for dedup."""
    from pyspark.sql import functions as F

    from metadata_crawler_spark.functions.text import (
        ccnet_normalize_py,
        with_normalized,
    )

    ref = ccnet_normalize_py("Café  Opened\n2024")
    assert ref == "cafe opened 0000"
    assert ccnet_normalize_py(ref) == ref  # idempotent
    rows = [
        (1, "Café  Opened\n2024"),
        (2, "cafe opened 2025"),
        (3, None),
        (4, "Ångström units: 10"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["norm_text"] for r in with_normalized(df).collect()}
    for i, t in rows:
        assert out[i] == ccnet_normalize_py(t or "")
    assert out[1] == out[2] == "cafe opened 0000"  # dedup collision intended
    assert out[4] == "angstrom units: 00"
    plan = with_normalized(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_script_fractions_hand_computed(spark):
    """Per-script char fractions over non-whitespace chars, explicit
    codepoint ranges; dominant = argmax with _SCRIPT_ORDER tie-break;
    NULL/empty/scriptless text gets concrete zeros + 'none'."""
    import pyspark.sql.functions as F

    from metadata_crawler_spark.functions.text import script_fractions

    rows = [
        (0, "abc Привет 42"),        # 3 latin, 6 cyr, 2 digit / 11 nonws
        (1, "中文 한글"),              # 2 cjk, 2 hangul / 4
        (2, "مرحبا"),                # 5 arabic / 5
        (3, None),
        (4, "   "),
        (5, "!!! ???"),              # nonws>0 but no script chars
        (6, "ab вг"),                # 2 vs 2 tie -> latin (order wins)
        (7, "γειά σου"),             # greek dominant
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r["sf"].asDict()
        for r in df.select(
            "id", script_fractions(F.col("text")).alias("sf")
        ).collect()
    }
    assert out[0]["latin_frac"] == round(3 / 11, 6)
    assert out[0]["cyrillic_frac"] == round(6 / 11, 6)
    assert out[0]["digit_frac"] == round(2 / 11, 6)
    assert out[0]["dominant_script"] == "cyrillic"
    assert out[1]["cjk_frac"] == 0.5 and out[1]["hangul_frac"] == 0.5
    assert out[1]["dominant_script"] == "cjk"  # tie: cjk before hangul
    assert out[2] == {
        "latin_frac": 0.0, "cyrillic_frac": 0.0, "greek_frac": 0.0,
        "arabic_frac": 1.0, "cjk_frac": 0.0, "hangul_frac": 0.0,
        "digit_frac": 0.0, "dominant_script": "arabic",
    }
    for i in (3, 4, 5):
        assert out[i]["dominant_script"] == "none", i
        assert all(v == 0.0 for k, v in out[i].items()
                   if k.endswith("_frac")), i
    assert out[6]["dominant_script"] == "latin"
    assert out[7]["dominant_script"] == "greek"
    # pure JVM exprs: zero exchanges, no Python
    plan = (
        df.select(script_fractions(F.col("text")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_script_fractions_range_boundaries(spark):
    """The multiply/divide signs sit INSIDE Latin-1's letter block and
    must be excluded; range endpoints are inclusive."""
    import pyspark.sql.functions as F

    from metadata_crawler_spark.functions.text import script_fractions

    rows = [
        (0, "×÷"),   # x, division sign: NOT latin
        (1, "ÀÖØöøɏ"),  # block endpoints
        (2, "Ѐӿ"),   # cyrillic endpoints
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r["sf"].asDict()
        for r in df.select(
            "id", script_fractions(F.col("text")).alias("sf")
        ).collect()
    }
    assert out[0]["latin_frac"] == 0.0 and out[0]["dominant_script"] == "none"
    assert out[1]["latin_frac"] == 1.0
    assert out[2]["cyrillic_frac"] == 1.0


def test_script_dominant_null_text_oracle_parity(spark):
    """The latent q53 twin edge: a NULL-text doc must yield
    dominant_script='none' in BOTH engines. The DuckDB CASE propagates
    NULL counts through every WHEN, so without an ELSE rung it returned
    NULL while Spark's coalesced counts return 'none' — pinned here so
    a fixture regeneration with NULL texts can't break the q53 row."""
    import duckdb
    import importlib.util

    from metadata_crawler_spark.functions.text import script_fractions

    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py"
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    nulls = ", ".join(
        f"CAST(NULL AS BIGINT) AS c_{k}" for k in entry._SC_ORDER
    )
    got = duckdb.sql(
        f"SELECT {entry._SC_DOMINANT} FROM (SELECT {nulls})"
    ).fetchone()[0]
    assert got == "none"

    row = (
        spark.createDataFrame([(None,)], "text string")
        .select(script_fractions(F.col("text")).alias("s"))
        .select("s.dominant_script")
        .first()
    )
    assert row["dominant_script"] == "none"


def test_quality_score_null_text_scores_zero(spark):
    """least() skips NULL arguments, so NULL text used to score 0.8 —
    outranking most real prose; it must score 0.0."""
    from metadata_crawler_spark.functions.text import quality_score_expr

    df = spark.createDataFrame(
        [(1, None), (2, "the quick brown fox and the lazy dog " * 20)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.q
        for r in df.select(
            "doc_id", quality_score_expr(F.col("text")).alias("q")
        ).collect()
    }
    assert got[1] == 0.0
    assert got[2] > 0.5

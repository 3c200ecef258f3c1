"""Page-level robots directives (functions/robots.py r5 additions):
meta-robots flags, none-implies, rel=nofollow link filtering.
(robots.txt parsing itself is covered in test_frontier/round-loop.)"""


def test_page_robots_flags(spark):
    """Meta-robots directives: noindex/nofollow/none/noarchive parsing,
    googlebot variant, default-indexable, binary html, JVM-only plan."""
    from pyspark.sql import functions as F

    from metadata_crawler_spark.functions.robots import (
        indexable_pages,
        page_robots_flags,
    )

    rows = [
        (1, b'<meta name="robots" content="noindex, nofollow">x'),
        (2, b'<meta name="ROBOTS" content="NOFOLLOW">x'),
        (3, b'<meta name="robots" content="none">x'),
        (4, b"<p>plain page</p>"),
        (5, None),
        (6, b'<meta name="googlebot" content="noarchive">x'),
        (7, b'<meta name="robots" content="noindexing">x'),  # no substring match
    ]
    df = spark.createDataFrame(rows, "id long, html binary")
    got = {
        r["id"]: (r["f"]["noindex"], r["f"]["nofollow"], r["f"]["noarchive"])
        for r in df.select("id", page_robots_flags(F.col("html")).alias("f")).collect()
    }
    assert got[1] == (True, True, False)
    assert got[2] == (False, True, False)
    assert got[3] == (True, True, False)  # none => noindex+nofollow
    assert got[4] == (False, False, False)
    assert got[5] == (False, False, False)
    assert got[6] == (False, False, True)
    assert got[7] == (False, False, False)
    keep = {r["id"] for r in indexable_pages(df).collect()}
    assert keep == {2, 4, 5, 6, 7}
    plan = indexable_pages(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "pythonUDF" not in plan


def test_followable_links(spark):
    from metadata_crawler_spark.functions.robots import followable_links_udf_factory

    html = (
        b'<a href="/a">ok</a>'
        b'<a rel="nofollow" href="/b">no</a>'
        b'<a href="/c" rel="sponsored noopener">no</a>'
        b'<a href="/d" rel="noopener">ok</a>'
        b"<a>no href</a>"
    )
    df = spark.createDataFrame([(1, html)], "id long, html binary")
    udf = followable_links_udf_factory()
    links = df.select(udf("html").alias("l")).collect()[0]["l"]
    assert links == ["/a", "/d"]


def test_page_robots_flags_attr_order_and_multiple_tags(spark):
    """content= before name= (common in the wild) must match, and when a
    page carries several robots/googlebot metas the most-restrictive
    directive wins — a permissive googlebot tag must not shadow a later
    noindex robots tag."""
    from pyspark.sql import functions as F

    from metadata_crawler_spark.functions.robots import page_robots_flags

    rows = [
        (1, b'<meta content="noindex,nofollow" name="robots">x'),
        (2, b'<meta content="NOARCHIVE" name="GoogleBot">x'),
        (3, b'<meta name="googlebot" content="all">'
            b'<meta name="robots" content="noindex">x'),
        (4, b'<meta content="nofollow" name="robots">'
            b'<meta name="robots" content="noarchive">x'),
        (5, b'<meta content="all" name="robots">x'),
    ]
    df = spark.createDataFrame(rows, "id long, html binary")
    got = {
        r["id"]: (r["f"]["noindex"], r["f"]["nofollow"], r["f"]["noarchive"])
        for r in df.select(
            "id", page_robots_flags(F.col("html")).alias("f")
        ).collect()
    }
    assert got[1] == (True, True, False)
    assert got[2] == (False, False, True)
    assert got[3] == (True, False, False)  # restrictive tag not shadowed
    assert got[4] == (False, True, True)   # directives union across tags
    assert got[5] == (False, False, False)

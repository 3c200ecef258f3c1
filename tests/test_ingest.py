"""Page-ingest plan (plans/ingest.py): the composed charset -> metadata
-> robots -> boilerplate -> quality pass, end-to-end on synthetic pages
and plan-asserted zero-exchange."""

from pyspark.sql import functions as F

from metadata_crawler_spark.plans.ingest import ingest_pages

ARTICLE = (
    "This is the main article body and it talks at length about the "
    "subject of the page with plenty of the usual English stopwords in it "
    "so the content classifier keeps it around for the corpus."
)

GOOD = f"""
<html><head><title>A Good Page</title>
<link rel="canonical" href="https://www.example.com/good">
<meta property="article:published_time" content="2026-02-03T04:05:06">
</head><body>
<nav><a href="/a">Home</a> <a href="/b">About</a> <a href="/c">Contact</a> <a href="/d">More</a></nav>
<p>{ARTICLE}</p>
</body></html>
""".encode()

CP1252 = (
    '<html><head><meta charset="windows-1252"><title>Café Page</title></head>'
    f"<body><p>{ARTICLE} Prix: €9 café.</p></body></html>"
).encode("windows-1252")

NOINDEX = (
    f'<meta name="robots" content="noindex"><p>{ARTICLE}</p>'
).encode()


def _pages(spark):
    rows = [
        ("https://a.example.com/good", GOOD),
        ("https://b.example.com/cafe", CP1252),
        ("https://c.example.com/private", NOINDEX),
        ("https://d.example.com/empty", b"<html></html>"),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_ingest_end_to_end(spark):
    out = {r["url"]: r for r in ingest_pages(_pages(spark), min_words=5).collect()}
    g = out["https://a.example.com/good"]
    assert g["title"] == "A Good Page"
    assert g["canonical"] == "https://www.example.com/good"
    assert g["published_ts"].year == 2026 and g["published_ts"].month == 2
    assert g["host"] == "a.example.com" and g["charset"] == "utf-8"
    assert ARTICLE in g["text"] and "Home" not in g["text"]  # chrome gone
    assert g["lang"] == "en" and g["ws_tokens"] > 20
    assert not g["too_repetitive"]
    c = out["https://b.example.com/cafe"]
    assert c["charset"] == "windows-1252" and "€9 café" in c["text"]
    # noindex page dropped; empty page dropped by min_words
    assert "https://c.example.com/private" not in out
    assert "https://d.example.com/empty" not in out
    assert len(out) == 2


def test_ingest_noindex_optional_and_flat_mode(spark):
    out = ingest_pages(
        _pages(spark), min_words=5, respect_noindex=False, boilerplate=False
    )
    rows = {r["url"]: r for r in out.collect()}
    pr = rows["https://c.example.com/private"]
    assert pr["noindex"] is True
    g = rows["https://a.example.com/good"]
    assert "Home" in g["text"]  # flat mode keeps chrome
    assert g["n_blocks"] is None and g["boilerplate_frac"] is None


def test_ingest_plan_zero_exchange(spark):
    plan = (
        ingest_pages(_pages(spark))._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_ingest_mixed_pdf_dispatch(spark):
    """%PDF- blobs route through the PDF extractor into the SAME
    documents schema (charset='pdf', page count in n_blocks); HTML rows
    are untouched; the whole mixed plan stays exchange-free."""
    from metadata_crawler_spark.operators.pdf_text import encode_pdf
    from metadata_crawler_spark.plans.ingest import ingest_mixed

    pdf = encode_pdf([[ARTICLE], ["Second page of the report."]])
    rows = [
        ("https://a.example.com/good", GOOD),
        ("https://e.example.com/paper.pdf", pdf),
        ("https://f.example.com/broken.pdf", b"%PDF-1.4 garbage"),
        ("https://g.example.com/null", None),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = {r["url"]: r for r in ingest_mixed(df, min_words=5).collect()}
    g = out["https://a.example.com/good"]
    assert g["content_kind"] == "html" and g["title"] == "A Good Page"
    p = out["https://e.example.com/paper.pdf"]
    assert p["content_kind"] == "pdf" and p["charset"] == "pdf"
    assert p["n_blocks"] == 2 and ARTICLE in p["text"]
    assert "Second page" in p["text"]
    assert p["lang"] == "en" and p["ws_tokens"] > 20
    # broken PDF (ok=False) and NULL blob are dropped, never a failure
    assert "https://f.example.com/broken.pdf" not in out
    assert "https://g.example.com/null" not in out

    plan = (
        ingest_mixed(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_ingest_drop_soft404(spark):
    from metadata_crawler_spark.plans.ingest import ingest_pages

    body = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "back to the barn where it sleeps for the rest of the day with "
        "all of the other animals that live there in peace and quiet"
    )
    pages = spark.createDataFrame(
        [
            ("https://a.com/ok",
             f"<html><head><title>Fine page</title></head>"
             f"<body><p>{body}</p></body></html>".encode()),
            ("https://a.com/gone",
             b"<html><head><title>404 Not Found</title></head>"
             b"<body><p>The page you requested is missing from this "
             b"site entirely and forever more today.</p></body></html>"),
        ],
        "url string, html binary",
    )
    audit = {r.url: r.soft404 for r in ingest_pages(pages).collect()}
    assert audit == {"https://a.com/ok": False, "https://a.com/gone": True}
    kept = [r.url for r in ingest_pages(pages, drop_soft404=True).collect()]
    assert kept == ["https://a.com/ok"]


def test_ingest_fix_mojibake(spark):
    """A page the ORIGIN double-encoded (UTF-8 text re-encoded as UTF-8
    after a cp1252 mis-decode) is valid UTF-8 on the wire, so charset
    sniffing can't catch it; fix_mojibake=True repairs the decoded text
    in-pass, default leaves it as served. Plan stays zero-exchange."""
    from metadata_crawler_spark.plans.ingest import ingest_pages

    body = "café élégant — prix €9 " + " ".join(f"w{i}" for i in range(30))
    broken = body.encode("utf-8").decode("cp1252")  # the server's bug
    page = f"<html><body><p>{broken}</p></body></html>".encode("utf-8")
    df = spark.createDataFrame(
        [("https://m.example.com/x", page)], "url string, html binary"
    )
    served = ingest_pages(df, min_words=5, boilerplate=False).collect()[0]
    assert "cafÃ©" in served["text"]  # mojibake preserved by default
    fixed = ingest_pages(
        df, min_words=5, boilerplate=False, fix_mojibake=True
    ).collect()[0]
    assert "café élégant — prix €9" in fixed["text"]
    plan = (
        ingest_pages(df, fix_mojibake=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan

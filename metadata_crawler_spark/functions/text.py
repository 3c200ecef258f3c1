"""HTML text/lang/outlink extraction + text-analysis column functions.

Reference parity: the reference's "open the discovered object and pull
typed facets out of its contents" stage — ``open_dataset`` engine dispatch
by suffix (/root/reference/src/metadata_crawler/api/storage_backend.py:
102-149) feeding DataSpecs attribute/stat extraction (api/config.py:
367-458). Our objects are web pages: the binary ``html`` column yields
``text`` (byte-identical per url — the north-rule invariant), ``lang``,
and outlinks (the analog of directory children, data_collector.py:192-230).

Everything here is either a pure Spark column expression or an
Arrow-batched pandas UDF built from vectorized pandas string ops.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_RE = re.compile(r"<(script|style)[^>]*>.*?</\1>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_HREF_RE = re.compile(r"""href=["']([^"']+)["']""", re.I)
_META_LANG_RE = re.compile(
    r"""content-language["']\s+content=["']([A-Za-z\-]+)["']""", re.I
)
# Minimal entity set; fixture HTML never emits entities, kept for generality.
_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " ")]


def extract_text_py(html: bytes | str) -> str:
    """Visible text of an HTML document (reference implementation).

    Semantics: drop script/style subtrees, replace every tag with a space,
    decode the minimal entity set, collapse all whitespace runs to a single
    space, strip. Deterministic — the fixture generator uses this same
    function to produce the ``text`` oracle column, so the vectorized UDF
    below must (and does) reproduce it byte-identically.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    html = _SCRIPT_RE.sub(" ", html)
    txt = _TAG_RE.sub(" ", html)
    for k, v in _ENTITIES:
        txt = txt.replace(k, v)
    return _WS_RE.sub(" ", txt).strip()


def _decode(html: pd.Series) -> pd.Series:
    """bytes/str/NULL-mixed series -> str series, element-wise and still
    vectorized: ``.str.decode`` decodes the bytes elements and yields NaN
    for everything else, which then falls back to the original value.
    (First-element sniffing broke batches whose first row was NULL.)"""
    if html.dtype != object:
        return html.fillna("").astype(str)
    dec = html.str.decode("utf-8", errors="replace")
    return dec.where(dec.notna(), html).fillna("").astype(str)


def _extract_text_batch(html: pd.Series) -> pd.Series:
    s = _decode(html)
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    for k, v in _ENTITIES:
        s = s.str.replace(k, v, regex=False)
    return s.str.replace(_WS_RE, " ", regex=True).str.strip()


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return _extract_text_batch(html)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_outlinks_udf(html: pd.Series) -> pd.Series:
    """All href targets, document order — the frontier-expansion edge
    (analog of iterdir, reference posix_backend.rs:113-149)."""
    return _decode(html).str.findall(_HREF_RE)


@F.pandas_udf(T.StringType())
def extract_meta_lang_udf(html: pd.Series) -> pd.Series:
    out = _decode(html).str.extract(_META_LANG_RE, expand=False)
    return out.fillna("unknown").str.lower()


def ccnet_normalize_py(text: str) -> str:
    """CCNet-style hash normalization (public recipe, Wenzek et al.
    2019): lowercase, NFD-decompose and strip combining marks (accents),
    every digit -> 0, collapse whitespace. Used BEFORE dedup hashing so
    'Café 2024' and 'cafe 2025' collide — never for the text that ships."""
    import unicodedata

    s = unicodedata.normalize("NFD", (text or "").lower())
    s = "".join("0" if c.isdigit() else c for c in s if not unicodedata.combining(c))
    return _WS_RE.sub(" ", s).strip()


@F.pandas_udf(T.StringType())
def ccnet_normalize_udf(text: pd.Series) -> pd.Series:
    """Arrow-batched CCNet normalization: the lowercase/NFD/whitespace
    steps run as vectorized pandas str ops; only the combining-mark +
    digit fold is per-char Python (no vectorized Unicode-category op
    exists), applied after NFD so the hot path stays in C."""
    import unicodedata

    s = text.fillna("").str.lower().str.normalize("NFD")

    def fold(x: str) -> str:
        return "".join(
            "0" if c.isdigit() else c
            for c in x
            if not unicodedata.combining(c)
        )

    return s.map(fold).str.replace(_WS_RE, " ", regex=True).str.strip()


def with_normalized(
    df, text_col: str = "text", out_col: str = "norm_text"
):
    """Append the CCNet-normalized shadow column — feed THIS to
    minhash_signatures / exact-dedup hashing while keeping the original
    text for the corpus. Map-side only."""
    return df.withColumn(out_col, ccnet_normalize_udf(F.col(text_col)))


# ---------------------------------------------------------------------------
# Text analysis (training-data-pipeline ops) — pure column expressions so
# they stay in whole-stage codegen AND are expressible 1:1 in the DuckDB
# oracle SQL (__spark_entry__).
# ---------------------------------------------------------------------------

#: language marker stopwords for the n-gram/stopword lang-id heuristic.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "nicht"],
    "fr": ["le", "et", "les"],
    "es": ["el", "que", "los"],
}

#: BPE-ish token pattern: letter runs, digit runs, single other non-space.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_token_count(text: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    # regexp_count == size(regexp_extract_all(...)) without allocating
    # the matched token strings (r6, guide §1.2 per-task work)
    return F.regexp_count(text, F.lit(TOKEN_PATTERN))


def marker_count(text: Column, word: str) -> Column:
    """Occurrences of ' word ' in ' text ' via the length-difference trick
    (portable to any SQL engine — same non-overlapping replace semantics)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def lang_id_expr(text: Column) -> Column:
    """Heuristic language id: argmax of marker-stopword counts, 'unknown'
    when all are zero. Ties break by language code order (deterministic)."""
    scores = [
        (lang, sum([marker_count(text, w) for w in words], F.lit(0)))
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    best = None
    best_score = None
    for lang, score in scores:
        if best is None:
            best, best_score = F.lit(lang), score
        else:
            cond = score > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, score).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("unknown"))


def quality_score_expr(text: Column) -> Column:
    """Length/stopword/alpha-ratio quality score in [0,1] (deterministic,
    portable): 0.4*min(1, chars/500) + 0.4*min(1, stopwords/10) +
    0.2*alpha_ratio."""
    chars = F.length(text)
    stop = sum(
        [marker_count(text, w) for ws in LANG_MARKERS.values() for w in ws],
        F.lit(0),
    )
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    alpha_ratio = F.when(chars > 0, alpha / chars).otherwise(F.lit(0.0))
    # NULL text scores 0.0, not 0.8: least() SKIPS NULL arguments, so
    # least(NULL/500, 1.0) = 1.0 would hand both capped terms their
    # maximum to exactly the rows that have no text at all — a
    # high-pass quality filter would keep precisely the extraction
    # failures
    return F.when(text.isNull(), F.lit(0.0)).otherwise(
        F.round(
            F.least(chars / F.lit(500.0), F.lit(1.0)) * 0.4
            + F.least(stop / F.lit(10.0), F.lit(1.0)) * 0.4
            + alpha_ratio * 0.2,
            6,
        )
    )


def fingerprint_expr(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    whitespace tokens (set-hash; near-dup blocking key)."""
    toks = F.array_sort(F.array_distinct(F.split(F.trim(text), r"\s+")))
    return F.md5(F.array_join(toks, " "))


# Unicode script detection (the cheap pre-langid gate every production
# pipeline runs first: script mismatch kills a doc before the n-gram
# classifier spends anything). Ranges are EXPLICIT codepoint intervals,
# not \p{Script=} property classes, so Java regex (Spark) and RE2
# (DuckDB oracle) agree byte-for-byte regardless of their Unicode table
# versions; \x{...} escapes parse identically in both engines.
SCRIPT_RANGES: dict[str, str] = {
    # Latin letters: ASCII + Latin-1 letters (x00D7/x00F7 are the
    # multiply/divide signs, excluded) + Extended-A/B
    "latin": r"[A-Za-z\x{00C0}-\x{00D6}\x{00D8}-\x{00F6}\x{00F8}-\x{024F}]",
    "cyrillic": r"[\x{0400}-\x{04FF}]",
    "greek": r"[\x{0370}-\x{03FF}]",
    "arabic": r"[\x{0600}-\x{06FF}]",
    # kana + CJK Extension A + CJK Unified Ideographs
    "cjk": r"[\x{3040}-\x{30FF}\x{3400}-\x{4DBF}\x{4E00}-\x{9FFF}]",
    "hangul": r"[\x{AC00}-\x{D7AF}]",
    "digit": "[0-9]",
}
_SCRIPT_ORDER = ("latin", "cyrillic", "greek", "arabic", "cjk", "hangul")


def script_fractions(text: Column) -> Column:
    """struct(<script>_frac ..., digit_frac, dominant_script): per-script
    character fractions over the non-whitespace characters, plus the
    argmax script ('none' for empty/NULL/no-script text; ties break in
    _SCRIPT_ORDER). Pure JVM regexp_count expressions — zero shuffle,
    whole-stage codegen; concrete values for every row (NULL text scores
    0.0 everywhere, the NULL-flag bug class from ADVICE r4)."""
    nonws = F.length(F.regexp_replace(F.coalesce(text, F.lit("")), r"\s+", ""))
    counts = {
        k: F.coalesce(F.regexp_count(text, F.lit(p)), F.lit(0))
        for k, p in SCRIPT_RANGES.items()
    }
    denom = F.when(nonws > 0, nonws.cast("double"))  # NULL when empty
    fracs = {
        k: F.coalesce(F.round(c / denom, 6), F.lit(0.0))
        for k, c in counts.items()
    }
    top = F.greatest(*[counts[k] for k in _SCRIPT_ORDER])
    dominant = F.lit("none")
    for k in reversed(_SCRIPT_ORDER):  # earlier order wins ties
        dominant = F.when((top > 0) & (counts[k] == top), F.lit(k)).otherwise(
            dominant
        )
    return F.struct(
        *[fracs[k].alias(f"{k}_frac") for k in _SCRIPT_ORDER],
        fracs["digit"].alias("digit_frac"),
        dominant.alias("dominant_script"),
    )

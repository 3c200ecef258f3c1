"""Structure-preserving HTML -> Markdown conversion.

Flat text extraction (``functions/text.extract_text_py``) and jusText
boilerplate removal (``functions/boilerplate``) both discard document
STRUCTURE — headings, lists, tables, code blocks. Modern pretraining
pipelines increasingly keep it: structure-preserving extraction (HTML
-> Markdown) measurably improves trained models on code/math/QA-heavy
corpora, because `## heading`, `- item` and fenced code carry signal
plain text loses. This module is that stage: a deterministic,
stdlib-only (html.parser) converter producing GitHub-flavored Markdown
plus structure stats.

Covered: h1-h6 -> #..######, p/div blocks, nested ul/ol (indentation +
1.-numbering), blockquote (> prefix, nested), pre -> fenced code blocks
(inner whitespace preserved), inline code -> backticks, b/strong -> **,
i/em -> *, a[href] -> [text](href) (javascript:/data: links dropped to
bare text), img -> ![alt](src), hr -> ---, tables -> pipe tables (first
row is the header row; | escaped inside cells; inline markup — links,
bold/italic, code spans, images, <br> — renders INSIDE its cell; nested
block structure, including nested <table>s, flattens to the containing
cell's inline text). script/style/noscript/template/
svg/head subtrees contribute nothing. Malformed markup salvages
whatever parsed (same contract as boilerplate._BlockParser).

Spark shape: per-document imperative parsing == the documented
Pandas-UDF slow path, Arrow-batched, applied map-side off the scan (no
shuffle; page bytes never ride an exchange). Reference parity: the
reference's typed-facet extraction over opened objects
(api/storage_backend.py:102-149); our "facets" are the page's
structural elements.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from metadata_crawler_spark.functions.text import _decode

SKIP_TAGS = frozenset("script style noscript template svg head".split())
#: block tags that terminate the current inline run (beyond the ones
#: with dedicated markdown forms).
FLUSH_TAGS = frozenset(
    "p div article section header footer nav aside main form fieldset "
    "figure figcaption dl dt dd tr".split()
)
_H_RE = re.compile(r"^h([1-6])$")
_BAD_HREF = re.compile(r"^\s*(javascript|data|vbscript):", re.I)
_WS = re.compile(r"\s+")


def _inline(text: str) -> str:
    return _WS.sub(" ", text).strip()


class _MarkdownParser(HTMLParser):
    """One streaming pass; emits (kind, text) blocks the renderer joins
    (kind 'li' lines join tight inside a list, everything else joins
    with a blank line)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, str]] = []
        self._buf: list[str] = []
        self._skip = 0
        self._pre = 0
        self._pre_buf: list[str] = []
        self._heading: list[int] = []
        self._quote = 0
        self._lists: list[dict] = []  # {kind: 'ul'|'ol', idx: int}
        self._links: list[str | None] = []
        self._table: dict | None = None  # {rows: [...], cell: [...]|None}
        self._tdepth = 0  # nested <table> depth; inner tables flatten
        self._list_seq = 0  # distinguishes adjacent sibling lists
        self.n_links = 0
        self.n_code_blocks = 0

    # -- emit helpers ------------------------------------------------

    def _sink(self) -> list[str]:
        """The buffer inline content belongs to right now: the open
        <pre> block, the open table cell, or the paragraph buffer.
        Inside a table but outside any cell, content is discarded (a
        fresh throwaway list), matching handle_data's contract."""
        if self._pre:
            return self._pre_buf
        if self._table is not None:
            cell = self._table["cell"]
            return cell if cell is not None else []
        return self._buf

    def _emit(self, kind: str, text: str) -> None:
        if self._quote:
            text = "\n".join("> " * self._quote + ln for ln in text.split("\n"))
        self.blocks.append((kind, text))

    def _flush(self, kind: str = "p") -> None:
        text = _inline("".join(self._buf))
        self._buf = []
        if not text:
            return
        if self._heading:
            self._emit("h", "#" * self._heading[-1] + " " + text)
        elif self._lists:
            top = self._lists[-1]
            indent = "  " * (len(self._lists) - 1)
            marker = f"{top['idx']}." if top["kind"] == "ol" else "-"
            self._emit(f"li{self._list_seq}", f"{indent}{marker} {text}")
        else:
            self._emit(kind, text)

    # -- tag handling ------------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip += 1
            return
        if self._skip:
            return
        a = dict(attrs)
        if self._table is not None and tag not in ("td", "th", "tr", "table", "a", "b", "strong", "i", "em", "code", "br", "img"):
            return  # block structure inside cells flattens to text
        m = _H_RE.match(tag)
        if m:
            self._flush()
            self._heading.append(int(m.group(1)))
        elif tag == "pre":
            self._flush()
            self._pre += 1
        elif tag == "code" and not self._pre:
            self._sink().append("`")
        elif tag in ("b", "strong"):
            self._sink().append("**")
        elif tag in ("i", "em"):
            self._sink().append("*")
        elif tag == "a":
            href = a.get("href") or ""
            if href and not _BAD_HREF.match(href):
                self._links.append(href)
                self._sink().append("[")
            else:
                self._links.append(None)
        elif tag == "img":
            src = a.get("src") or ""
            if src and not _BAD_HREF.match(src):
                alt = _inline(a.get("alt") or "")
                self._sink().append(f"![{alt}]({src})")
        elif tag in ("ul", "ol"):
            self._flush()
            if not self._lists:
                self._list_seq += 1
            self._lists.append({"kind": tag, "idx": 0})
        elif tag == "li":
            self._flush()
            if self._lists:
                self._lists[-1]["idx"] += 1
        elif tag == "blockquote":
            self._flush()
            self._quote += 1
        elif tag == "hr":
            self._flush()
            self._emit("p", "---")
        elif tag == "br":
            if self._table is not None:
                self._sink().append(" ")  # line break inside a cell
            else:
                self._flush()
        elif tag == "table":
            self._flush()
            if self._table is None:
                self._table = {"rows": [], "cell": None}
            self._tdepth += 1
        elif tag == "tr":
            if self._table is not None and self._tdepth == 1:
                self._table["rows"].append([])
        elif tag in ("td", "th"):
            if self._table is not None:
                if self._tdepth == 1:
                    self._table["cell"] = []
                else:
                    # nested table flattens: separate its cells' text
                    self._sink().append(" ")
        elif tag in FLUSH_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag not in SKIP_TAGS:
            return
        # void form of a skip tag never really nests
        self._skip = max(0, self._skip - 1)

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return
        if self._table is not None and tag not in ("td", "th", "tr", "table", "a", "b", "strong", "i", "em", "code"):
            return
        if _H_RE.match(tag):
            self._flush()
            if self._heading:
                self._heading.pop()
        elif tag == "pre":
            if self._pre:
                self._pre -= 1
                if not self._pre:
                    code = "\n".join(
                        ln.rstrip()
                        for ln in "".join(self._pre_buf).strip("\n").split("\n")
                    )
                    self._pre_buf = []
                    if code.strip():
                        self.n_code_blocks += 1
                        self._emit("pre", f"```\n{code}\n```")
        elif tag == "code" and not self._pre:
            self._sink().append("`")
        elif tag in ("b", "strong"):
            self._sink().append("**")
        elif tag in ("i", "em"):
            self._sink().append("*")
        elif tag == "a":
            href = self._links.pop() if self._links else None
            if href is not None:
                self._sink().append(f"]({href})")
                self.n_links += 1
        elif tag in ("ul", "ol"):
            self._flush()
            if self._lists:
                self._lists.pop()
        elif tag == "li":
            self._flush()
        elif tag == "blockquote":
            self._flush()
            self._quote = max(0, self._quote - 1)
        elif tag in ("td", "th"):
            if (
                self._table is not None
                and self._tdepth == 1
                and self._table["cell"] is not None
            ):
                cell = _inline("".join(self._table["cell"])).replace("|", "\\|")
                if self._table["rows"]:
                    self._table["rows"][-1].append(cell)
                self._table["cell"] = None
        elif tag == "table":
            if self._tdepth > 1:
                self._tdepth -= 1  # inner table closed; keep the outer
            elif self._table is not None:
                t, self._table = self._table, None
                self._tdepth = 0
                self._emit_table(t["rows"])
        elif tag in FLUSH_TAGS:
            self._flush()

    def _emit_table(self, rows: list[list[str]]) -> None:
        rows = [r for r in rows if r]
        if not rows:
            return
        width = max(len(r) for r in rows)
        rows = [r + [""] * (width - len(r)) for r in rows]
        lines = ["| " + " | ".join(rows[0]) + " |",
                 "|" + " --- |" * width]
        lines += ["| " + " | ".join(r) + " |" for r in rows[1:]]
        self._emit("table", "\n".join(lines))

    def handle_data(self, data: str) -> None:
        if self._skip:
            return
        self._sink().append(data)

    def close(self) -> None:
        super().close()
        self._flush()


def to_markdown_py(html: bytes | str) -> tuple[str, int, int, int, int, int]:
    """(markdown, n_headings, n_list_items, n_tables, n_links,
    n_code_blocks) for one document — the reference implementation the
    UDF batches."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    p = _MarkdownParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # salvage blocks parsed before the malformed point
    parts: list[str] = []
    prev_kind = None
    for kind, text in p.blocks:
        if parts:
            same_list = kind.startswith("li") and kind == prev_kind
            parts.append("\n" if same_list else "\n\n")
        parts.append(text)
        prev_kind = kind
    md = "".join(parts)
    n_head = sum(1 for k, _ in p.blocks if k == "h")
    n_li = sum(1 for k, _ in p.blocks if k.startswith("li"))
    n_tab = sum(1 for k, _ in p.blocks if k == "table")
    return md, n_head, n_li, n_tab, p.n_links, p.n_code_blocks


_MD_SCHEMA = T.StructType(
    [
        T.StructField("markdown", T.StringType()),
        T.StructField("n_headings", T.IntegerType()),
        T.StructField("n_list_items", T.IntegerType()),
        T.StructField("n_tables", T.IntegerType()),
        T.StructField("n_links", T.IntegerType()),
        T.StructField("n_code_blocks", T.IntegerType()),
    ]
)

_MD_COLS = [f.name for f in _MD_SCHEMA.fields]


@F.pandas_udf(_MD_SCHEMA)
def to_markdown_udf(html: pd.Series) -> pd.DataFrame:
    rows = [to_markdown_py(h) for h in _decode(html)]
    return pd.DataFrame(rows, columns=_MD_COLS)


def with_markdown(
    df: DataFrame, html_col: str = "html", out_col: str = "md"
) -> DataFrame:
    """Append ``out_col`` = struct(markdown, n_headings, n_list_items,
    n_tables, n_links, n_code_blocks). Map-side only — parallelizes over
    input splits with no shuffle, like with_main_content."""
    return df.withColumn(out_col, to_markdown_udf(F.col(html_col)))

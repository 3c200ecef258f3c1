"""HTML -> Markdown structure-preserving extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_crawler_spark.functions.markdown import (
    to_markdown_py,
    with_markdown,
)


def md(html: str) -> str:
    return to_markdown_py(html)[0]


def test_headings_and_paragraphs():
    html = "<h1>Title</h1><p>First para.</p><h2>Sub</h2><p>Second  para.</p>"
    assert md(html) == "# Title\n\nFirst para.\n\n## Sub\n\nSecond para."


def test_nested_lists():
    html = (
        "<ul><li>one</li><li>two<ol><li>a</li><li>b</li></ol></li>"
        "<li>three</li></ul>"
    )
    assert md(html) == (
        "- one\n- two\n  1. a\n  2. b\n- three"
    )


def test_ordered_numbering_restarts():
    html = "<ol><li>x</li></ol><ol><li>y</li></ol>"
    assert md(html) == "1. x\n\n1. y"


def test_table_pipe_render_and_escape():
    html = (
        "<table><tr><th>name</th><th>v|al</th></tr>"
        "<tr><td>a</td><td>1</td></tr><tr><td>b</td><td>2</td></tr></table>"
    )
    assert md(html) == (
        "| name | v\\|al |\n| --- | --- |\n| a | 1 |\n| b | 2 |"
    )


def test_ragged_table_pads():
    html = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>"
    assert md(html) == "| a | b |\n| --- | --- |\n| c |  |"


def test_pre_code_fencing_preserves_inner_whitespace():
    html = "<p>before</p><pre>def f(x):\n    return  x\n</pre><p>after</p>"
    out, n_h, n_li, n_tab, n_links, n_code = to_markdown_py(html)
    assert out == "before\n\n```\ndef f(x):\n    return  x\n```\n\nafter"
    assert n_code == 1


def test_inline_code_and_emphasis():
    html = "<p>use <code>F.split</code> on <b>big</b> <i>tables</i></p>"
    assert md(html) == "use `F.split` on **big** *tables*"


def test_links_kept_javascript_dropped():
    html = (
        '<p>see <a href="https://x.org/a">docs</a> and '
        '<a href="javascript:void(0)">menu</a> and <a>bare</a></p>'
    )
    out, *_, n_links, _ = to_markdown_py(html)
    assert out == "see [docs](https://x.org/a) and menu and bare"
    assert n_links == 1


def test_image_alt():
    assert md('<p><img src="/i.png" alt="a chart"></p>') == "![a chart](/i.png)"


def test_blockquote_prefix():
    html = "<blockquote><p>quoted line</p></blockquote><p>plain</p>"
    assert md(html) == "> quoted line\n\nplain"


def test_hr_rule():
    assert md("<p>a</p><hr><p>b</p>") == "a\n\n---\n\nb"


def test_script_style_head_skipped():
    html = (
        "<head><title>t</title></head><script>var x=1;</script>"
        "<style>p{}</style><p>visible</p>"
    )
    assert md(html) == "visible"


def test_malformed_html_salvages():
    html = "<h1>ok</h1><p>text <b>unclosed"
    assert md(html) == "# ok\n\ntext **unclosed"


def test_bytes_input_and_empty():
    assert md(b"<p>caf\xc3\xa9</p>") == "café"
    assert to_markdown_py("") == ("", 0, 0, 0, 0, 0)
    assert to_markdown_py("   \n ") == ("", 0, 0, 0, 0, 0)


def test_stats_counts():
    html = (
        "<h1>A</h1><h2>B</h2><ul><li>x</li><li>y</li></ul>"
        "<table><tr><td>c</td></tr></table>"
        '<a href="https://z">z</a><pre>code</pre>'
    )
    out, n_h, n_li, n_tab, n_links, n_code = to_markdown_py(html)
    assert (n_h, n_li, n_tab, n_links, n_code) == (2, 2, 1, 1, 1)


def test_structure_inside_table_cell_flattens():
    html = "<table><tr><td><p>a</p><ul><li>b</li></ul></td></tr></table>"
    assert md(html) == "| ab |\n| --- |"


def test_inline_markup_renders_inside_cells():
    # bold/link/code/img/br belong to the CELL, never leak out as a
    # stray paragraph before the table (r5 review regression).
    html = (
        '<table><tr><td><b>x</b></td>'
        '<td><a href="http://e.com">link</a></td></tr></table><p>hello</p>'
    )
    out, _, _, _, n_links, _ = to_markdown_py(html)
    assert out == "| **x** | [link](http://e.com) |\n| --- | --- |\n\nhello"
    assert n_links == 1
    assert md("<table><tr><td>a<br>b</td><td><code>c|d</code></td></tr></table>") == (
        "| a b | `c\\|d` |\n| --- | --- |"
    )


def test_nested_table_flattens_into_outer_cell():
    # the inner </table> must not terminate the outer table: its text
    # flattens into the containing cell and the outer rows survive.
    html = (
        "<table><tr><td><table><tr><td>inner</td></tr></table></td></tr>"
        "<tr><td>outer2</td></tr></table>"
    )
    out, _, _, n_tab, _, _ = to_markdown_py(html)
    assert out == "| inner |\n| --- |\n| outer2 |"
    assert n_tab == 1


def test_with_markdown_spark_roundtrip(spark):
    rows = [
        ("u1", b"<h1>T</h1><p>body text</p><ul><li>i1</li></ul>"),
        ("u2", b"<table><tr><th>h</th></tr><tr><td>v</td></tr></table>"),
        ("u3", None),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = {
        r.url: r.md
        for r in with_markdown(df).select("url", "md").collect()
    }
    assert out["u1"].markdown == "# T\n\nbody text\n\n- i1"
    assert out["u1"].n_headings == 1 and out["u1"].n_list_items == 1
    assert out["u2"].n_tables == 1
    assert out["u2"].markdown.startswith("| h |")
    assert out["u3"].markdown == ""  # NULL html -> empty doc, not a crash

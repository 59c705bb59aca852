"""Render-join invariants (reference tests/common/test_io_elements.py style)
and HTML main-content extraction goldens."""

import pytest

from doctr_spark.functions.html import extract_main_text, looks_like_html
from doctr_spark.functions.render import (
    render_block,
    render_document,
    render_line,
    render_page,
)


def test_render_joins():
    assert render_line(["hello", "world"]) == "hello world"
    assert render_block([["hello", "world"], ["second", "line"]]) == "hello world\nsecond line"
    assert render_page([[["a", "b"]], [["c"]]]) == "a b\n\nc"
    assert render_document(["page one", "page two"]) == "page one\n\n\n\npage two"


def test_render_empty():
    assert render_line([]) == ""
    assert render_document([]) == ""


@pytest.mark.parametrize(
    ("html", "expected"),
    [
        ("<div>only</div>", "only"),
        ("<p>a</p><p>b</p>", "a\n\nb"),
        ("<p>one<br>two</p>", "one\ntwo"),
        ("<ul><li>x</li><li>y</li></ul>", "x\ny"),
        ("<div>Hi &amp; bye</div>", "Hi & bye"),
        ("<div><script>var x;</script>keep</div>", "keep"),
        ("<div><style>p{}</style>keep</div>", "keep"),
        ("<nav>menu</nav><p>content</p>", "content"),
        ("<header>h</header><p>c</p><footer>f</footer>", "c"),
        ("<aside>ads</aside><p>c</p>", "c"),
        ("<!-- comment --><p>c</p>", "c"),
        ("<p>spaced   words\n here</p>", "spaced words here"),
        ("<p></p>", ""),
        ("", ""),
        ("<div><div><p>nested</p></div></div>", "nested"),
        ("<p>a <b>bold</b> word</p>", "a bold word"),
    ],
)
def test_extract_main_text(html, expected):
    assert extract_main_text(html) == expected


def test_full_page_strip():
    html = (
        "<html><head><style>x{}</style></head><body>"
        "<nav>Home</nav><header>S</header>"
        "<div id='m'><p>para one</p>\n<p>para two</p></div>"
        "<script>t()</script><footer>F</footer></body></html>"
    )
    assert extract_main_text(html) == "para one\n\npara two"


def test_looks_like_html():
    assert looks_like_html("<div>x</div>")
    assert looks_like_html("  <html><body>")
    assert not looks_like_html("plain text")
    assert not looks_like_html("a < b and c > d")
    assert not looks_like_html("")

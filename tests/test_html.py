"""HTML sanitize/coercion stage (S9): boilerplate-strip semantics from
the reference's ``html_utils.py:96-150`` chain, round-trip exactness of
the synthesized corpus, and parser resilience on malformed markup."""

import pyarrow as pa
import pytest

from gamechanger_data_ray.stages.html import (
    HtmlTextExtractor,
    build_html,
    html_to_text,
)


@pytest.mark.parametrize(
    "text",
    [
        "hello world",
        "ampersand & <angle> \"quotes\" 'single'",
        "unicode café über ß — em-dash",
        "x",
    ],
)
def test_roundtrip_byte_exact(text):
    assert html_to_text(build_html(text, doc_id=7)) == text


def test_boilerplate_subtrees_dropped():
    # reference _remove_nav_bar targets: navbar header, mobile-nav,
    # header-inside, footer; _remove_header_href: skip-link
    assert html_to_text('<header class="navbar"><li>Home</li></header>hi') == "hi"
    assert html_to_text('<div class="clearfix header-inside">chrome</div>hi') == "hi"
    assert html_to_text('<div class="mobile-nav">m</div>hi') == "hi"
    assert html_to_text("<footer>f</footer>hi") == "hi"
    assert html_to_text('<a class="visually-hidden focusable skip-link">s</a>hi') == "hi"
    assert html_to_text("<nav><a href='/'>x</a></nav>hi") == "hi"


def test_non_content_elements_dropped():
    assert html_to_text("<script>var x = '<p>not text</p>';</script>ok") == "ok"
    assert html_to_text("<style>p { color: red }</style>ok") == "ok"
    assert html_to_text("<head><title>t</title></head>ok") == "ok"
    assert html_to_text("<!-- comment -->ok<!DOCTYPE html>") == "ok"


def test_block_boundaries_single_newline():
    assert html_to_text("<p>a</p><p>b</p>") == "a\nb"
    assert html_to_text("<div>c<br>d</div>") == "c\nd"
    assert html_to_text("<ul><li>1</li><li>2</li></ul>") == "1\n2"
    # inline tags never break the run
    assert html_to_text("<p>a <b>bold</b> <a href='#'>link</a> z</p>") == "a bold link z"


def test_empty_rows_contribute_nothing():
    # reference _remove_empty_rows: <tr> without td/th decomposed
    got = html_to_text("<table><tr></tr><tr><td>cell</td></tr><tr></tr></table>")
    assert got == "cell"


def test_entities_decoded():
    assert html_to_text("<p>&amp;&lt;&gt;&#65;&nbsp;</p>") == "&<>A\xa0"


def test_unclosed_children_inside_boilerplate():
    # li tags left unclosed inside nav must not leak the skip past </nav>
    assert html_to_text("<nav><ul><li>x<li>y</ul></nav><p>keep</p>") == "keep"


def test_nested_drop_subtrees():
    assert html_to_text("<footer><div><script>x</script>f</div></footer>ok") == "ok"


def test_malformed_markup_never_raises():
    for junk in ("<<<>>>", "&&& &#xZZ;", "<p unclosed", "</close-only>", ""):
        html_to_text(junk)  # must not raise


def test_stage_drops_html_column_adds_text_nchars():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "html": ["<p>ab</p>", build_html("hello", 2)]})
    out = HtmlTextExtractor()(t)
    assert out.column_names == ["doc_id", "text", "n_chars"]
    assert out["text"].to_pylist() == ["ab", "hello"]
    assert out["n_chars"].to_pylist() == [2, 5]


# ---------------------------------------------------------------------------
# Property test — the sanitize round-trip holds on arbitrary payload text
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

# any unicode without newlines/controls, not whitespace-only (the
# documented build_html round-trip domain)
_PAYLOAD = st.text(
    alphabet=st.characters(blacklist_categories=("Cc", "Cs")),
    min_size=1,
    max_size=300,
).filter(lambda s: s.strip() and "\n" not in s and "\r" not in s)


@given(_PAYLOAD, st.integers(0, 10**9))
@settings(max_examples=150, deadline=None)
def test_html_roundtrip_property(text, doc_id):
    assert html_to_text(build_html(text, doc_id)) == text


def test_nested_closed_children_inside_boilerplate_do_not_leak():
    """Code-review regression: a properly-closed same-tag child inside a
    dropped subtree must not end the skip early (real navbars are nested
    divs)."""
    got = html_to_text(
        '<div class="navbar"><div>Home</div><div>About</div>Contact</div>'
        "<p>body text</p>"
    )
    assert got == "body text"
    # nested same-named drop tags stay skipped to the outer close
    assert html_to_text("<nav>a<nav>b</nav>c</nav>ok") == "ok"

"""HTML → normalized text coercion (S9, non-stub).

Reference parity: ``common/document_parser/lib/html_utils.py:96-150``
cleans crawled HTML before text extraction — remove empty table rows
(``_remove_empty_rows``), site navigation/footer boilerplate
(``_remove_nav_bar``: MARADMIN navbar/mobile-nav/footer, SAMM
``clearfix header-inside``), skip-links (``_remove_header_href``), and
normalize broken attributes. The reference then renders to PDF and
re-extracts; at LLM-data scale the useful observable is the
boilerplate-free TEXT itself, so this stage goes straight
HTML → sanitized text on a real parser (stdlib ``html.parser`` — a
spec-compliant tokenizer, no bs4 needed), entity-decoding included.

What gets dropped, matching the reference's chain plus the standard
boilerplate set:

- non-content elements: ``script``, ``style``, ``noscript``,
  ``template``, ``iframe``, ``svg``, ``head`` — and their subtrees;
- boilerplate containers: ``nav``, ``footer``, any element whose
  ``class`` contains a :data:`BOILERPLATE_CLASSES` token (``navbar``,
  ``header-inside``, ``mobile-nav``, ``skip-link``, ``visually-hidden``)
  — subtree and all;
- comments, doctype, processing instructions;
- ``<tr>`` rows whose cells are all empty (the reference's empty-row
  decompose — here: rows contributing no text contribute no text).

Block-level element boundaries become single newlines; inline tags
(``a``, ``b``, ``span``, …) vanish without breaking the text run; text
inside kept elements is preserved byte-exactly (entities decoded), so a
synthesized page round-trips its payload text exactly — that's what the
``docs_html_text`` oracle checks end-to-end.

Stage shape: callable class for ``map_batches(HtmlTextExtractor,
concurrency=(1, pool_size()))`` — a fresh parser per document is
required (HTMLParser is stateful), but the per-actor config (tag sets)
is built once in ``__init__``. Parsing is inherently per-document
Python; at 100 TB this stage is CPU-bound and embarrassingly parallel —
scale with the actor pool, never with bigger batches.
"""

from __future__ import annotations

import html as _html
from html.parser import HTMLParser

import pyarrow as pa

# subtrees that never carry content text
DROP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "iframe", "svg", "head"}
)
# boilerplate containers dropped with their whole subtree
BOILERPLATE_TAGS = frozenset({"nav", "footer"})
# class tokens marking boilerplate (reference html_utils.py:77-95)
BOILERPLATE_CLASSES = frozenset(
    {"navbar", "header-inside", "mobile-nav", "skip-link", "visually-hidden"}
)
# elements whose open/close breaks the text flow with a newline
BLOCK_TAGS = frozenset(
    {
        "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
        "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "main",
        "header", "blockquote", "pre", "hr", "form", "dl", "dt", "dd",
    }
)
# void elements never pushed on the open stack (HTML5 list, the ones we meet)
_VOID = frozenset({"br", "hr", "img", "input", "meta", "link", "wbr", "area", "base", "col", "embed", "source", "track"})


class _TextExtractor(HTMLParser):
    """One-document extractor: emits text segments for kept subtrees,
    newline breaks at block boundaries. ``convert_charrefs=True`` (the
    default) decodes entities in the data callbacks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.segments: list[str] = []
        # inside a dropped subtree: the tag that opened it + how many
        # UNCLOSED same-named descendants are open (only the opener's
        # own close can end the skip — generic depth tracking leaks on
        # nested children, properly closed or not)
        self._skip_tag: str | None = None
        self._skip_same = 0
        self._pending_break = False

    @property
    def _skip_depth(self) -> int:  # truthiness shim for handle_data
        return 1 if self._skip_tag is not None else 0

    # -- tree walking ------------------------------------------------
    @staticmethod
    def _is_boilerplate(tag: str, attrs) -> bool:
        if tag in BOILERPLATE_TAGS:
            return True
        for k, v in attrs:
            if k == "class" and v:
                if BOILERPLATE_CLASSES & set(v.split()):
                    return True
        return False

    def handle_starttag(self, tag, attrs):
        if self._skip_tag is not None:
            if tag == self._skip_tag and tag not in _VOID:
                self._skip_same += 1
            return
        if tag in DROP_TAGS or self._is_boilerplate(tag, attrs):
            if tag in _VOID:
                return  # a void boilerplate tag has no subtree to skip
            self._skip_tag = tag
            self._skip_same = 1
            return
        if tag in BLOCK_TAGS and self.segments:
            self._pending_break = True

    def handle_endtag(self, tag):
        if self._skip_tag is not None:
            # only the close matching the OPENER ends the skip — counting
            # same-named descendants so '<nav><div>…</div>x</nav>' doesn't
            # leak x, and '<nav><nav>…</nav>…</nav>' stays skipped; closes
            # of other (possibly unclosed) children are ignored entirely
            if tag == self._skip_tag:
                self._skip_same -= 1
                if self._skip_same <= 0:
                    self._skip_tag = None
            return
        if tag in BLOCK_TAGS and self.segments:
            self._pending_break = True

    def handle_startendtag(self, tag, attrs):
        # <br/> style — block break without subtree
        if not self._skip_depth and tag in BLOCK_TAGS and self.segments:
            self._pending_break = True

    def handle_data(self, data):
        if self._skip_depth or not data:
            return
        if data.strip() == "":
            # whitespace-only node: markup formatting at block boundaries
            # (dropped), but a real word separator between inline tags
            # mid-run (collapsed to one space, HTML rendering semantics)
            if (
                self.segments
                and not self._pending_break
                and not self.segments[-1][-1].isspace()
            ):
                self.segments.append(" ")
            return
        if self._pending_break:
            self.segments.append("\n")
            self._pending_break = False
        self.segments.append(data)


def html_to_text(markup: str) -> str:
    """Sanitize + extract: boilerplate-free text, block boundaries as
    single newlines, entities decoded, content text byte-preserved."""
    p = _TextExtractor()
    try:
        p.feed(markup)
        p.close()
    except Exception:  # malformed beyond the parser's recovery: best effort
        pass
    return "".join(p.segments)


def build_html(text: str, doc_id: int = 0) -> str:
    """Deterministic test-corpus synthesizer: wrap ``text`` in a full page
    bristling with exactly the boilerplate the sanitizer must drop
    (navbar header, skip-link, script, style, comment, nav, footer,
    an empty table row). Round-trip contract:
    ``html_to_text(build_html(t)) == t`` for newline-free ``t``."""
    esc = _html.escape(text)
    return (
        "<!DOCTYPE html><html><head><title>junk title</title>"
        "<style>body { color: red }</style></head><body>"
        f'<header class="navbar"><ul><li>Home</li><li>About</li></ul></header>'
        f'<a class="visually-hidden focusable skip-link" href="#main">skip</a>'
        f'<div class="mobile-nav">menu menu</div>'
        f"<script>var tracker = {doc_id};</script>"
        "<!-- crawler comment -->"
        "<nav><a href='/x'>x</a></nav>"
        '<table><tr></tr><tr><td></td></tr></table>'
        f'<main id="main"><p>{esc}</p></main>'
        f'<div class="clearfix header-inside">SAMM chrome</div>'
        "<footer>© site footer</footer></body></html>"
    )


class HtmlTextExtractor:
    """Actor-pool stage: ``html`` column → ``text`` (sanitized) +
    ``n_chars``. Config once per actor; one parser per document (the
    stdlib parser is stateful and cheap to construct)."""

    def __init__(self, html_col: str = "html", out_col: str = "text"):
        self.html_col = html_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [html_to_text(s) for s in batch[self.html_col].to_pylist()]
        cols = {n: batch[n] for n in batch.column_names if n != self.html_col}
        cols[self.out_col] = pa.array(texts, pa.string())
        cols["n_chars"] = pa.array([len(t) for t in texts], pa.int64())
        return pa.table(cols)

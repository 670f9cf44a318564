"""Fast-tokenizer equivalence: ``html_main_content`` (fast + fallback) must
produce byte-identical output to the pure html.parser implementation on
every input — corpus, goldens, handwritten edge cases, and fuzz."""

from __future__ import annotations

import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from documentai_ray.sources import pages
from documentai_ray.stages.extract import (
    _BlockParser,
    _extract_with_htmlparser,
    _fast_tokenize,
    _FastPathBail,
    _select_blocks,
    html_main_content,
)
from tests.conftest import SF_SMOKE


def _fast_only(s: str):
    """Run ONLY the fast path; None if it bailed."""
    p = _BlockParser()
    try:
        _fast_tokenize(s, p)
    except _FastPathBail:
        return None
    p._flush()
    return _select_blocks(p)


class TestEquivalence:
    def test_full_corpus(self):
        t = pages.synth_pages_table(SF_SMOKE, with_dups=True, with_near_dups=True)
        n_fast = 0
        for payload in t.column("html").to_pylist():
            try:
                s = payload.decode("utf-8")
            except UnicodeDecodeError:
                continue
            slow = _extract_with_htmlparser(s)
            assert html_main_content(s) == slow
            if _fast_only(s) is not None:
                n_fast += 1
                assert _fast_only(s) == slow
        assert n_fast > 400  # the fast path must actually serve the corpus

    def test_golden_cases(self):
        path = os.path.join(os.path.dirname(__file__), "golden_html_cases.json")
        for c in json.load(open(path)):
            assert html_main_content(c["html"]) == _extract_with_htmlparser(c["html"]) \
                == c["expected"], c["name"]

    def test_handwritten_tricky_cases(self):
        cases = [
            '<p>quoted attr <a href="x>y">link text here okay</a> continues on</p>',
            "<p>self closing <br/> inside a long enough paragraph here</p>",
            "<SCRIPT>var x = '<p>not content</p>';</SCRIPT><p>Real content after script block here.</p>",
            "<style>p > a {color:red}</style><p>Content following the style block here.</p>",
            "<!-- <p>commented out</p> --><p>Content outside the comment here okay.</p>",
            "<!DOCTYPE html><p>Content after a doctype declaration here.</p>",
            "<p class='a' id=b data-x=\"c\">Attribute soup paragraph long enough here.</p>",
            "<P>UPPERCASE tag paragraph long enough to keep here.</P>",
            "<p>entity test &amp; &lt; &gt; &#65; inside long paragraph</p>",
            "<div/>text after self-closed div long enough here<p>And a paragraph too, long enough.</p>",
            "<script src='x.js'></script><p>After empty script, long enough text.</p>",
            "</p>stray close tag then <p>a normal paragraph long enough here.</p>",
            "<foo-bar>custom element text long enough to keep here</foo-bar>",
            # bare quote inside a tag NOT following '=': html.parser ends
            # the tag at the first '>' (quotes only quote after '='); the
            # fast path must bail here, not treat 'q>z' as a quoted run —
            # the naive any-quote scan silently dropped the "z'>" text
            "&unknown;<a 'q>z'> trailing text long enough to keep here",
            "<p>spaced attr <a b = 'y'>link text long enough here</a></p>",
            "<a b=c'd>mid-value quote long enough paragraph here</a>",
            "<a b=>empty unquoted value long enough text here</a>",
        ]
        for s in cases:
            assert html_main_content(s) == _extract_with_htmlparser(s), s

    def test_bail_cases_fall_back(self):
        # constructs the fast path refuses — dispatcher must equal html.parser
        cases = [
            "<p>unterminated <!-- comment <p>more text that is long enough</p>",
            "<![CDATA[ raw ]]><p>After a cdata section, long enough text.</p>",
            "<p>bad tag <3 sideways heart in a long enough paragraph</p>",
            "<p>unterminated tag at the end of input here <a href='x",
            "<script>never closed... <p>xx</p>",
        ]
        for s in cases:
            assert _fast_only(s) is None or _fast_only(s) == _extract_with_htmlparser(s)
            assert html_main_content(s) == _extract_with_htmlparser(s), repr(s)

    @given(st.text(alphabet="<>/ab &;#!-='\"p\n\t", max_size=120))
    @settings(max_examples=400, deadline=None)
    def test_fuzz_tag_soup(self, s):
        assert html_main_content(s) == _extract_with_htmlparser(s)

    @given(st.text(max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_fuzz_arbitrary_text(self, s):
        assert html_main_content(s) == _extract_with_htmlparser(s)

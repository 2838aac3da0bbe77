"""The fast single-pass tokenizer must stay byte-equivalent to the stdlib
html.parser path across the full reference fixture corpus (336 real pages)
and the synthetic edge cases it was built against."""

import os

import pytest

import snacktory_spark.dom as dom
from snacktory_spark.converter import read_file_as_string

DIRS = ["/root/reference/test_data",
        "/root/reference/src/test/resources/de/jetwick/snacktory"]

EDGE_CASES = [
    '<p/>\n<img src="x">after',                       # self-closing p
    '<a onclick="x(\'y\')" ; href="/z">t</a>',        # stray-quote attr
    "<![if !IE]><link href='x'><![endif]>",           # marked sections
    "<![endif]-->tail<p>para</p>",                    # unterminated marked
    "<!-- unterminated comment <table><tr><td>x",     # EOF comment
    "<iframe src='a'><p>inside</p>",                  # unterminated rawtext
    "a < b and c > d",                                # bare angle brackets
    "<div class=noquote id = spaced>x</div>",         # unquoted/spaced attrs
    "<DIV CLASS='UP'>x</DIV>",                        # case folding
    "text &amp; entities &#65;&nbsp;end",             # charrefs
    "<script>if(a<b){x('</div>')}</script><p>y</p>",  # markup inside script
]


def _both(html: str):
    dom.FAST_PARSE = True
    fast = dom.parse(html).outer_html()
    dom.FAST_PARSE = False
    slow = dom.parse(html).outer_html()
    dom.FAST_PARSE = True
    return fast, slow


@pytest.mark.parametrize("case", EDGE_CASES, ids=range(len(EDGE_CASES)))
def test_edge_case_equivalence(case):
    fast, slow = _both(case)
    assert fast == slow


def test_fixture_corpus_equivalence():
    checked = 0
    for d in DIRS:
        for name in sorted(os.listdir(d)):
            p = os.path.join(d, name)
            if not os.path.isfile(p):
                continue
            fast, slow = _both(read_file_as_string(p))
            assert fast == slow, f"tokenizer divergence on {name}"
            checked += 1
    assert checked >= 300

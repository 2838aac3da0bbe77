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
    # r9 review findings: '<'/'</' + NON-ASCII letter is literal text /
    # a bogus comment (html.parser's starttagopen/endtagopen are ASCII;
    # a Unicode isalpha dispatch crashed the fast path into the silent
    # double-parse fallback, resp. leaked the bogus end tag into text)
    "<p>1<émission test</p>",
    "<body>a</émission>b</body>",
    "<p>a<éb>c</p>",
    # ASCII-only case folding of the rawtext close tag: '</SCRIPT>'
    # closes, U+017F 'ſ' must NOT (Unicode re.IGNORECASE would fold it)
    "<body><script>var x;</SCRIPT>tail</body>",
    "<body><script>s</ script >t</body>",
    # r10 (VERDICT r9 wrong #1): the end-tag NAME stops at '/' and NUL
    # like tagfind_tolerant — '</div/junk>' closes the div (junk to the
    # next '>' consumed), it must NOT emit endtag 'div/junk'
    "<div>x</div/junk>y</div>",
    "<p>a</p/>b",
    "<u>1</u\x00v>2</u>",
    "<body><div>q</div junk='>z'>w</body>",
    # stdlib endtagfind also allows whitespace before the name
    "<div>a</ div>b",
    "<div>a</ div x>b",
    "<div>a</></div>",
    "<div>a</\x00div>b</div>",
    "<div>a</div",
]


def test_fast_feed_never_raises_on_non_ascii_markup():
    """The three r9 non-ASCII cases must take fast-path branches, not
    the exception fallback (which silently double-parses)."""
    for case in ("<p>1<émission test</p>", "<body>a</émission>b</body>",
                 "<body><script>x</ſcript>t</body>"):
        tb = dom._TreeBuilder("")
        dom._fast_feed(tb, case)  # must not raise


def test_unicode_sharp_s_does_not_close_rawtext():
    """U+017F must not terminate <script> (ASCII-only folding): the tail
    stays rawtext exactly like the former lower()-based search."""
    doc = dom.parse("<body><script>var x;</ſcript>tail</body>")
    assert "tail" not in doc.text()


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


def test_random_composition_equivalence():
    """Seeded differential fuzz (r9): random compositions of start/end
    tags (mixed case, attrs), text with entities and bare '<', comments,
    PIs, marked sections, bogus markup, and NON-ASCII letters after
    '<'/'</' (the r9 review findings' class) — the fast tokenizer must
    emit the stdlib parser's exact tree on every one. Rawtext snippets
    are self-terminating (unterminated-rawtext tails are a documented
    pre-existing divergence, exercised separately above)."""
    import random
    rng = random.Random(42)
    tags = ["p", "div", "a", "b", "SCRIPT", "style", "em", "x1", "br"]
    attrs = ["", ' class="a b"', " id=x", ' href="/y?a=1&amp;b=2"',
             " data-x='q'", " DISABLED"]
    bits = []
    for t in tags:
        for _ in range(3):
            bits.append(f"<{t}{rng.choice(attrs)}>")
        bits.append(f"</{t}>")
    bits += ["hello", "a < b", "x &amp; y", "émission", "ſtraße",
             "tail>", "&#65;bc", "< 5", "100% <",
             "<!-- c -->", "<!doctype html>", "<?pi?>", "</ x>", "</>",
             "<1x>", "<é>", "</émission>", "<![if !IE]>x<![endif]>",
             "<br/>", "<a/>", "<p attr='<!-- -->'>",
             "<script>var a='</div>';</script>",
             # r10: '/'-and-NUL-bearing end-tag names (VERDICT r9 #1)
             "</a/b>", "</p/>", "</u\x00v>", "</div/ junk>", "</ div>"]
    for _ in range(1500):
        h = "".join(rng.choice(bits) for _ in range(rng.randint(1, 30)))
        fast, slow = _both(h)
        assert fast == slow, f"tokenizer divergence on {h!r}"


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

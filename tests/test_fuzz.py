"""Property-based hardening (hypothesis):
- fast tokenizer ≡ stdlib tokenizer on arbitrary tag soup
- extract() never raises on arbitrary text (pipeline robustness contract)
"""

import string

from hypothesis import HealthCheck, given, settings, strategies as st

import snacktory_spark.dom as dom
from snacktory_spark.extractor import extract

_TAGS = ["div", "p", "span", "a", "ul", "li", "script", "style", "iframe",
         "table", "tr", "td", "h1", "em", "br", "img", "title", "meta"]

_fragment = st.one_of(
    st.text(alphabet=string.printable, max_size=40),
    st.sampled_from([
        "<!-- c -->", "<!-- unterminated", "<![if !IE]>", "<![endif]-->",
        "<!DOCTYPE html>", "<?php ?>", "&amp;", "&nbsp;", "&#65;", "&bogus;",
        "<", ">", "</", "<>", "< div>", "<a href='x y'>", '<a href="q>r">',
        "<p/>", "<div class=a class=b>", '<a ; href="/z">', "</p>", "</nope>",
        "<input value='&quot;'>",
        # junk / truncated start tags (stdlib has three distinct behaviors:
        # complete, incomplete->close()-time bogus data, silent skip)
        '<A 0="<!-- c -->', '<a b="x', '<a b !>x', '<a "junk">t',
        '<a b="x <p>hi', '<a b=">t</a>more', '<a/', '<a ',
    ]),
    st.builds(lambda t, txt: f"<{t}>{txt}", st.sampled_from(_TAGS),
              st.text(alphabet=string.ascii_letters + " <>&'\"", max_size=20)),
    st.builds(lambda t: f"</{t}>", st.sampled_from(_TAGS)),
    # near-miss rawtext close tags (ADVICE r1: '</scripty>', '</ script>',
    # '</script foo>' must behave identically on both tokenizer paths)
    st.builds(lambda t, pre, suf: f"</{pre}{t}{suf}>",
              st.sampled_from(["script", "style", "iframe", "xmp"]),
              st.sampled_from(["", " ", "  ", "\t"]),
              st.sampled_from(["", "y", "2", " ", " foo", " foo='b'", "-x"])),
)

_soup = st.lists(_fragment, max_size=30).map("".join)


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_soup)
def test_tokenizer_equivalence_fuzz(html):
    dom.FAST_PARSE = True
    fast = dom.parse(html).outer_html()
    dom.FAST_PARSE = False
    slow = dom.parse(html).outer_html()
    dom.FAST_PARSE = True
    assert fast == slow


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_soup)
def test_extract_never_raises(html):
    if not html:
        return
    res = extract(html)
    assert isinstance(res["text"], str)
    assert isinstance(res["title"], str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200), st.integers(min_value=0, max_value=300))
def test_utf8_truncate_properties(s, n):
    from snacktory_spark.shelper import utf8_truncate
    out = utf8_truncate(s, n)
    assert s.startswith(out)
    # result fits the byte budget when encodable (lone surrogates aside)
    try:
        assert len(out.encode("utf-8")) <= max(n, 0) + 3
    except UnicodeEncodeError:
        pass

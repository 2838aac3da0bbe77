"""Author name/description extraction and cleanup (SURVEY.md §2.5, M9-M11).

Reimplements:
- extractAuthorName cascade (ArticleTextExtractor.java:1955-2263)
- extractAuthorDescription cascade (:2266-2567)
- AuthorUtils.cleanup (utils/AuthorUtils.java:61-81) with IGNORE_AUTHOR_PARTS
  (:28-48) — tested against AuthorUtilsTest.java:15-33.

Ambiguous multi-matches are resolved by re-running the same gravity-weight
election used for content (getBestMatchElement at :2247).
"""

from __future__ import annotations

import re

from .dates import DATE_PATTERNS, MMM_PATTERN
from .dom import Document
from .shelper import inner_trim, utf8_truncate
from .weights import get_best_match_element

MAX_AUTHOR_NAME_LENGTH = 255

_SPECIAL_SYMBOLS = [r"\.", r"\+", "-", "@", ":", r"\(", r"\)", "/",
                    r"\.\.\.", "…"]
SPECIAL_SYMBOLS_PATTERN = "(" + "|".join(_SPECIAL_SYMBOLS) + ")"

IGNORE_AUTHOR_PARTS = [
    re.compile(r"((http(s)?://)?(www\.)?facebook.com/)"),
    re.compile(r"(?<![\w])(from|Door|Über|by|name|author|posted|twitter|handle|"
               r"news|locally researched|report(ing|ed)?( by)?|edit(ing|ed)( by)?)"
               r"(?![\w])", re.IGNORECASE),
    re.compile(r"\s+" + MMM_PATTERN + r"\s+"),
    re.compile(r"((\|| - |, ).*)"),
    re.compile(r"(\d+)"),
    re.compile(r"(?<![\w])" + SPECIAL_SYMBOLS_PATTERN + r"(?![\w])"),
    re.compile(r"^[\s]*" + SPECIAL_SYMBOLS_PATTERN),
    re.compile(SPECIAL_SYMBOLS_PATTERN + r"[\s]*$"),
]


def cleanup(author_name: str) -> str:
    """AuthorUtils.cleanup (utils/AuthorUtils.java:61-81)."""
    s = author_name
    for pattern in DATE_PATTERNS:
        s = pattern.sub("", s)
    for pattern in IGNORE_AUTHOR_PARTS:
        s = pattern.sub(" ", s)
    if len(s) > MAX_AUTHOR_NAME_LENGTH:
        s = utf8_truncate(s, MAX_AUTHOR_NAME_LENGTH)
    return inner_trim(s)


def extract_author_name(doc: Document, heuristics=None) -> str:
    """extractAuthorName (:1955-2263) — order is semantics, preserved."""
    author_name = ""

    result = doc.select_first("body [rel*=author]")
    if result is not None:
        author_name = inner_trim(result.own_text())

    if not author_name:
        result = doc.select_first(".kasten_titel")
        if result is not None:
            author_name = inner_trim(result.own_text())

    if not author_name:
        result = doc.select_first("div.date_author")
        if result is not None:
            author_name = inner_trim(result.text())

    if not author_name:
        result = doc.select_first("p.contact")
        if result is not None:
            author_name = inner_trim(result.own_text())

    if not author_name:
        result = doc.select_first("a.author-link")
        if result is not None:
            author_name = inner_trim(result.own_text())

    if not author_name:
        result = doc.select_first("table.storyauthor td")
        if result is not None:
            author_name = inner_trim(result.text())

    if not author_name:
        result = doc.select_first("p:contains(Media Contact) strong")
        if result is not None and result.parent is not None:
            author_name = inner_trim(result.parent.own_text())

    if not author_name:
        result = doc.select_first("div#namepost")
        if result is not None:
            author_name = inner_trim(result.text().split(",")[0])

    if not author_name:
        result = doc.select_first("div.news-post-source")
        if result is not None:
            author_name = inner_trim(result.text())

    if not author_name:
        result = doc.select_first("head meta[name=author]")
        if result is not None:
            author_name = inner_trim(result.attr("content"))

    if not author_name:  # schema.org Person, meta form
        author_name = inner_trim(doc.select(
            "[itemtype$=schema.org/Person] meta[itemprop=author], "
            "[itemtype$=schema.org/Person] meta[itemprop=name]").attr("content"))

    if not author_name:  # schema.org Person, element form
        result = doc.select_first(
            "[itemtype$=schema.org/Person] [itemprop=author], "
            "[itemtype$=schema.org/Person] [itemprop=name]")
        if result is not None:
            author_name = inner_trim(result.text())

    if not author_name:  # schema.org Organization
        result = doc.select_first("[itemtype$=schema.org/Organization] [itemprop=name]")
        if result is not None:
            author_name = inner_trim(result.text())

    if not author_name:  # globalbankingandfinance.com
        author_name = inner_trim(doc.select("div.post-content p strong em").text())

    if not author_name:  # fortune.com
        author_name = inner_trim(doc.select("head meta[property=author]").attr("content"))

    if not author_name:  # opengraph
        author_name = inner_trim(doc.select("head meta[property=article:author]").attr("content"))

    if not author_name:  # huffingtonpost.com
        result = doc.select_first("span[class^=author-card]")
        if result is not None:
            author_name = inner_trim(result.text())

    if not author_name:  # twitter:creator
        author_name = inner_trim(doc.select("head meta[property=twitter:creator]").attr("content"))

    if not author_name:  # jdsupra.com
        author_name = inner_trim(doc.select(".author_name").text())

    if not author_name:  # generic author classes
        result = doc.select_first(
            "span.author,span.authorname,span.author-name,span.author_name,"
            "span.article-author-name,span.article_author_name")
        if result is not None:
            author_name = inner_trim(result.text())

    if not author_name:  # blog.airpr.com
        result = doc.select_first("div.timedate")
        if result is not None:
            author_name = inner_trim(result.own_text())

    if not author_name:  # washingtonpost live blogs
        result = doc.select_first("div.post-date")
        if result is not None:
            author_name = inner_trim(result.own_text())

    if not author_name:
        try:
            matches = doc.select("a[rel=author],.byline-name,.byLineTag,.byline,"
                                 ".author,.by,.writer,.address")
            if not matches:
                matches = doc.select("body a[href^=/author/]")
            if not matches:
                matches = doc.select("body .submitted")
            if not matches:
                matches = doc.select("body .author-name")
            if not matches:
                matches = doc.select("body .post-single-content em")
            if not matches:
                matches = doc.select("p.contrib-byline")
            if not matches:
                matches = doc.select("*.field-name-field-computed-username")
            if not matches:
                matches = doc.select("body [class*=author]")
            if not matches:
                matches = doc.select("body [title*=author]")
            if not matches:
                matches = doc.select("cite.source")
            if not matches:
                matches = doc.select("span[itemprop=author]")
            if not matches:
                matches = doc.select(".mobile h6")
            if not matches:
                matches = doc.select("[class*=byline]")
            if not matches:
                matches = doc.select("div[itemtype$=schema.org/Person]")
            if not matches:
                matches = doc.select("div.meta")
            if not matches:
                matches = doc.select("dl > dd")
            if not matches:  # Reuters-style trailing credits, last resort
                matches = doc.select(":containsOwn(reporting by), "
                                     ":containsOwn(reported by), "
                                     ":containsOwn(edited by), "
                                     ":containsOwn(editing by)")
            if matches:
                best_match = get_best_match_element(matches, heuristics)
                if best_match is not None:
                    author_name = best_match.text()
        except Exception:
            pass

    return author_name


# (selector, how) pairs for the author-description cascade (:2273-2540).
# how: text | owntext | href | href_join
_AUTHOR_DESC_RULES = [
    (".byline > .bio", "text"),
    ("span.article-shared a", "href"),
    ("section.about-the-author", "text"),
    ("a.author-link", "owntext_direct"),
    ("span.author-card__microbio", "text"),
    ("body .author-function", "text"),
    ("div.post-content p strong em", "text"),
    (".pb-author-bio", "text"),
    ("span.author-title", "text"),
    ("meta[property=article:author]", "content"),
    (".author_tag_firm_name", "text"),
    ("[id*=contentbios]", "text"),
    ("body [class*=user-biography]", "text"),
    ("#author_d", "text"),
    (".content.clearfix p em a", "parent_text"),
    ("p.contrib-byline", "text"),
    ("div .main-article-author-contact a", "href_join"),
    ("ul.author-info li a", "href_join"),
    ("div.timedate", "owntext"),
    (".vcard > a", "href"),
    ("table.storyauthor td a", "href"),
    ("span[itemprop=name] a", "href"),
    ("div[class=ra-credits]", "owntext"),
    ("div.date_author", "text"),
]


def extract_author_description(doc: Document, author_name: str,
                               heuristics=None) -> str:
    """extractAuthorDescription (:2266-2567)."""
    if author_name == "":
        return ""

    for selector, how in _AUTHOR_DESC_RULES:
        matches = doc.select(selector)
        if not matches:
            continue
        first = matches[0]
        if how == "text":
            return inner_trim(first.text())
        if how == "owntext" or how == "owntext_direct":
            return inner_trim(first.own_text())
        if how == "href":
            return inner_trim(first.attr("href"))
        if how == "content":
            return inner_trim(first.attr("content"))
        if how == "parent_text":
            parent = matches.parents().first()
            if parent is not None:
                return inner_trim(parent.text())
            return ""
        if how == "href_join":
            return inner_trim(", ".join(el.attr("href") for el in matches))

    author_desc = ""
    try:
        # find a section that literally contains the author name (:2542-2556)
        author_name = author_name.strip()
        if len(author_name) > 8:
            nodes = doc.select(f":containsOwn({author_name.lower()})")
            best_match = get_best_match_element(nodes, heuristics)
            if best_match is not None:
                author_desc = best_match.text()
    except Exception:
        pass
    return inner_trim(author_desc)

"""Metadata extraction cascades (SURVEY.md §2.5, M1-M17).

Reimplements the first-match-wins cascades of ArticleTextExtractor.java:
title (:792-838), cleanTitle (:3283-3306), description (:941-950),
canonical URL (:840-895), date CSS cascade (:953-1756), keywords (:2569-2581),
image/rss/video/favicon (:2589-2619), type/sitename/language (:2621-2652).

Cascade ORDER is semantics in the reference (comment at :2080-2085) and is
preserved exactly.
"""

from __future__ import annotations

import re as _re_mod
from urllib.parse import urljoin, urlparse

_re_abs = _re_mod.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")

from . import constants as C
from .dates import extract_date_using_regex, parse_date
from .dom import Document, Elements
from .domains import top_private_domain
from .shelper import inner_trim, replace_spaces


# --- title (M1) -----------------------------------------------------------------

def clean_title(title: str) -> str:
    """ArticleTextExtractor.cleanTitle (:3283-3306)."""
    res: list[str] = []
    counter = 0
    strs = title.split("|")
    for part in strs:
        if part.lower().strip() in C.IGNORED_TITLE_PARTS:
            continue
        if counter == len(strs) - 1 and len("".join(res)) > len(part):
            continue
        if counter > 0:
            res.append("|")
        res.append(part)
        counter += 1
    return inner_trim("".join(res))


def extract_title(doc: Document) -> str:
    """ArticleTextExtractor.extractTitle (:792-838)."""
    title = doc.title()
    if not title:
        title = inner_trim(doc.select("head title").text())
        if not title:
            title = inner_trim(doc.select("head meta[name=title]").attr("content"))
            if not title:
                title = inner_trim(doc.select("head meta[property=og:title]").attr("content"))
                if not title:
                    title = inner_trim(doc.select("head meta[name=twitter:title]").attr("content"))
                    if not title:
                        title = inner_trim(doc.select("h1:first-of-type").text())
    else:
        using_possible_title = False
        if " | " in title or " : " in title or " - " in title:
            possible_title = inner_trim(doc.select("h1:first-of-type").text())
            if possible_title:
                if possible_title.lower() in doc.title().lower():
                    if len(possible_title) > 20:
                        title = possible_title
                        using_possible_title = True
        if not using_possible_title:
            title = clean_title(title)
        # custom case: digitalisationworld.com
        possible_title = inner_trim(doc.select("h2.page-title:first-of-type").text())
        if possible_title:
            title = possible_title
    return title


# --- description (M2) --------------------------------------------------------------

def extract_description(doc: Document) -> str:
    description = inner_trim(doc.select("head meta[name=description]").attr("content"))
    if not description:
        description = inner_trim(doc.select("head meta[property=og:description]").attr("content"))
        if not description:
            description = inner_trim(doc.select("head meta[name=twitter:description]").attr("content"))
    return description


# --- canonical URL (M3) ---------------------------------------------------------------

def extract_canonical_url(base_url: str, doc: Document, use_external: bool) -> str | None:
    """ArticleTextExtractor.extractCanonicalUrl (:840-895)."""
    url = replace_spaces(doc.select("head link[rel=canonical]").attr("href"))
    if not url:
        url = replace_spaces(doc.select("head meta[property=og:url]").attr("content"))
        if not url:
            url = replace_spaces(doc.select("head meta[name=twitter:url]").attr("content"))

    if not url:
        return base_url

    try:
        # java.net.URI.resolve returns an absolute child verbatim — even a
        # malformed one like the concatenated hrefs some CMSes emit
        # (asserted by the reference's testBdaily)
        if not _re_abs.match(url):
            url = urljoin(base_url or "", url)

        if not use_external:
            if base_url:
                base_domain = top_private_domain(base_url)
                url_domain = top_private_domain(url)
                if (base_domain is not None and url_domain is not None
                        and base_domain != url_domain):
                    return base_url

        parsed = urlparse(url)
        if (len(parsed.path) == 0 or parsed.path == "/") and not parsed.query:
            return base_url

        for pattern in C.BAD_CANONICAL_PATTERNS:
            if pattern.fullmatch(url):
                return base_url
    except ValueError:
        pass

    return url


# --- keywords (M12) -----------------------------------------------------------------

def extract_keywords(doc: Document) -> list[str]:
    content = inner_trim(doc.select("head meta[name=keywords]").attr("content"))
    if content:
        if content.startswith("[") and content.endswith("]"):
            content = content[1:-1]
        split = _java_split_strip(content)
        if len(split) > 1 or (len(split) > 0 and split[0] != ""):
            return split
    return []


def _java_split_strip(content: str) -> list[str]:
    """content.split("\\s*,\\s*") — Java split drops trailing empties."""
    import re as _re
    parts = _re.split(r"\s*,\s*", content)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


# --- image / rss / video / favicon (M13, M15) --------------------------------------------

def extract_image_url(doc: Document) -> str:
    image_url = replace_spaces(doc.select("head meta[property=og:image]").attr("content"))
    if not image_url:
        image_url = replace_spaces(doc.select("head meta[name=twitter:image]").attr("content"))
        if not image_url:
            image_url = replace_spaces(doc.select("link[rel=image_src]").attr("href"))
            if not image_url:
                image_url = replace_spaces(doc.select("head meta[name=thumbnail]").attr("content"))
    return image_url


def extract_rss_url(doc: Document) -> str:
    els = Elements(e for e in doc.select("link[rel=alternate]")
                   if e.attr("type").lower() == "application/rss+xml")
    return replace_spaces(els.attr("href"))


def extract_video_url(doc: Document) -> str:
    return replace_spaces(doc.select("head meta[property=og:video]").attr("content"))


def extract_favicon_url(doc: Document) -> str:
    favicon = replace_spaces(doc.select("head link[rel=icon]").attr("href"))
    if not favicon:
        favicon = replace_spaces(doc.select("head link[rel^=shortcut],link[rel$=icon]").attr("href"))
    return favicon


# --- type / sitename / language (M16) ------------------------------------------------------

def extract_type(doc: Document) -> str:
    return inner_trim(doc.select("head meta[property=og:type]").attr("content"))


def extract_sitename(doc: Document) -> str:
    sitename = inner_trim(doc.select("head meta[property=og:site_name]").attr("content"))
    if not sitename:
        sitename = inner_trim(doc.select("head meta[name=twitter:site]").attr("content"))
    return sitename


def extract_language(doc: Document) -> str:
    language = inner_trim(doc.select("head meta[property=language]").attr("content"))
    if not language:
        language = inner_trim(doc.select("html").attr("lang"))
        if not language:
            language = inner_trim(doc.select("head meta[property=og:locale]").attr("content"))
    if language and len(language) > 2:
        language = language[:2]
    return language


# --- publish date CSS cascade (M5) -----------------------------------------------------------
#
# The ~40-step ordered cascade of extractDate (:953-1756), expressed as a
# data-driven rule list. Each rule: (selector, source) where source is one of
#   "content"  -> attr content (first element)
#   "datetime_then_text" -> attr datetime if present else text
#   "content_or_text" -> attr content if present else text
#   "text" / "owntext"
# Rules fire first-match-wins: first rule whose selected date string PARSES.

_DATE_RULES: list[tuple[str, str]] = [
    # opengraph (:986-1004) — Z→GMT-00:00 fixup handled by cleanDate's Z rule
    ("meta[property=article:published_time]", "content"),
    # computerweekly script scrape handled separately below
    ("[id=post-time]", "owntext"),
    ("meta[property=dateCreated], span[property=dateCreated]", "content_or_text"),
    ("time.dateCreated", "datetime_else_text"),
    ("meta[name=dc.date]", "content"),
    ("meta[name=OriginalPublicationDate]", "content"),
    ("meta[name=DisplayDate]", "content"),
    ("meta[name*=date]", "content"),
    (".date-header", "text"),
    ("time.published, time.entry-date.published", "text"),
    ("*[itemprop=datePublished]", "datetime_then_text"),
    ("*[itemprop=dateCreated]", "datetime_then_text"),
    ("[id=post-date], [id*=posted_time], [id*=fhtime]", "text"),
    (".storydatetime", "text"),
    (".storyDate", "text"),
    (".posted", "datetime_then_text"),
    (".published-date, [class*=postedAt], .published, [class*=blogdate], "
     "[class*=posted_date], [class*=post_date], [class*=origin-date], "
     "[class*=xn-chron], [class*=article-timestamp], .post-date, "
     "[class*=masthead__date], [class*=content-container__date]", "text"),
    ("[class*=updated]", "datetime_then_text"),
    ("[class*=content-times], [class*=item--time]", "text"),
    ("time[data-always-show=true]", "datetime_then_text"),
    (".author_tag_space time", "text"),
    ("[id=articleDate]", "text"),
    ("[class*=articlePosted], [class*=_date -body-copy], .date-display-single", "text"),
    ("*[href*=query=date:]", "text"),
    ("*[itemprop=datePublished]", "content"),
    ("*[itemprop=datePublished dateModified]", "content"),
    ("p.story-footer", "text"),
    ("[data-reactid].date", "text"),
    (".bodyDate", "text"),
    ("span.entry-date", "text"),
    ("div.date.date--v2", "text"),
    ("section[id=publishedContent] span.date", "text"),
    (".article-byline .text-nowrap", "text"),
    ("header p.details", "text"),
    (".meta-box span b", "text"),
    (".container [data-bvo-type*=published-date]", "text"),
    (".meta .date", "text"),
    (".status-update .info", "text"),
    ("article div.date", "text"),
    (".publish-info .date", "text"),
    (".article_box span", "text"),
    ("article span em", "text"),
    ("time[pubdate]", "text"),
    ("[itemprop=uploadDate]", "content"),
    (".byline-date", "owntext"),
]

# index at which the computerweekly script rule fires in the original order
_CW_BEFORE_RULE = 1

# nytimes-style meta group (:957-982): first NONEMPTY value is parsed once
_PTIME_GROUP = [
    "meta[name=ptime]",
    "meta[name=utime]",
    "meta[name=pdate]",
    "meta[property=article:published]",
    "meta[property=og:article:published_time]",
]


def extract_date(doc: Document):
    """ArticleTextExtractor.extractDate (:953-1756): ordered CSS cascade."""
    # ptime group: the original picks the first nonempty dateStr of the five
    # selectors, then parses it exactly once (:957-982)
    for sel in _PTIME_GROUP:
        date_str = inner_trim(doc.select(sel).attr("content"))
        if date_str:
            d = parse_date(date_str)
            if d is not None:
                return d
            break

    for i, (selector, source) in enumerate(_DATE_RULES):
        if i == _CW_BEFORE_RULE:
            d = _computerweekly_date(doc)
            if d is not None:
                return d
        try:
            els = doc.select(selector)
        except ValueError:
            continue
        if not els:
            continue
        el = els[0]
        if source == "content":
            if not el.has_attr("content"):
                # original falls through to text for some rules; here rules
                # that allow text fallback use content_or_text
                date_str = None
            else:
                date_str = el.attr("content")
            if date_str:
                d = parse_date(date_str)
                if d is not None:
                    return d
        elif source == "content_or_text":
            date_str = el.attr("content") if el.has_attr("content") else el.text()
            d = parse_date(date_str)
            if d is not None:
                return d
        elif source == "datetime_then_text":
            if el.has_attr("datetime"):
                d = parse_date(el.attr("datetime"))
                if d is not None:
                    return d
            d = parse_date(el.text())
            if d is not None:
                return d
        elif source == "datetime_else_text":
            if el.has_attr("datetime"):
                d = parse_date(el.attr("datetime"))
            else:
                d = parse_date(el.text())
            if d is not None:
                return d
        elif source == "text":
            d = parse_date(el.text())
            if d is not None:
                return d
        elif source == "owntext":
            d = parse_date(el.own_text())
            if d is not None:
                return d

    # JSON-LD / inline-script wildcard (:1739-1752)
    for e in doc.select("script[type=text/javascript], script[type=application/ld+json]"):
        for m in C.DATE_PATTERN_JSONLD.finditer(e.outer_html()):
            d = parse_date(m.group("dateStr"))
            if d is not None:
                return d
    return None


def _computerweekly_date(doc: Document):
    """computerweekly.com date-from-javascript scrape (:1006-1022)."""
    for e in doc.select("script[type=text/javascript]"):
        s = e.outer_html()
        if "main-article-author-date" in s:
            m = C.COMPUTER_WEEKLY_DATE_PATTERN.search(s)
            if m:
                d = parse_date(m.group(1))
                if d is not None:
                    return d
    return None


def extract_date_from_document(doc: Document, url: str):
    """Full M5→M6→M7 chain (extractContent at :469-482)."""
    from .shelper import complete_date, estimate_date

    extracted = extract_date(doc)
    if extracted is None:
        date_str = complete_date(estimate_date(url)) if url else None
        extracted = parse_date(date_str) if date_str else None
    if extracted is None:
        extracted = extract_date_using_regex(doc.outer_html())
    return extracted

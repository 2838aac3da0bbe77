"""Heuristic constants of the reference extractor, copied verbatim.

Sources (all /root/reference/src/main/java/de/jetwick/snacktory/):
- regex weight sets: ArticleTextExtractor.java:314-327
- NODES / HTML_PATTERN / NEGATIVE_STYLE: :37,:45,:73-74
- IGNORED_TITLE_PARTS: :75-82
- BAD_CANONICAL_PATTERNS: :88-94
- per-domain rules: :120-292
- misc patterns: :310-312
"""

from __future__ import annotations

import re

# Interesting candidate nodes (full tag-name match) — ArticleTextExtractor.java:37
NODES = re.compile(r"p|div|td|h1|h2|article|section")
# fullmatch of that alternation of literal tag names ≡ set membership; the
# hot get_nodes walk tests every element against it, and a frozenset probe
# is ~4x cheaper than Pattern.fullmatch (r10). A test pins the equivalence.
NODES_SET = frozenset(("p", "div", "td", "h1", "h2", "article", "section"))

# Sanity "still contains html" gate — :45 (note: the bracket expression is a
# character class in the original too; replicated verbatim, full-match, no DOTALL)
HTML_PATTERN = re.compile(r".*<\s{0,5}[(?:div|p|b|a|li)]\s{0,5}>.*")


def has_html_tags(text: str) -> bool:
    return HTML_PATTERN.fullmatch(text) is not None


NEGATIVE_STYLE = re.compile(r"hidden|display: ?none|font-size: ?small")

IGNORED_TITLE_PARTS = {"hacker news", "facebook", "home", "articles"}

MAX_LINK_SIZE = 512            # :86
MAX_AUTHOR_DESC_LENGTH = 1000  # :294
MAX_IMAGE_LENGTH = 255         # :295
MAX_AUTHOR_NAME_LENGTH = 255   # utils/AuthorUtils.java:50

BAD_CANONICAL_PATTERNS = [
    re.compile(r"https{0,1}://abcnews.go.com/[^/]*/{0,1}$"),
    re.compile(r"https{0,1}://[^/]*/news/{0,1}$"),
    re.compile(r"https{0,1}://[^/]*/wires/{0,1}$"),
    re.compile(r".*/page-not-found.shtml$"),
    re.compile(r"https{0,1}://www.cnbc.com/press-releases/$"),
]

# Weight regex sets — ArticleTextExtractor.java:314-327 (constructor defaults)
UNLIKELY = re.compile(
    "com(bx|ment|munity)|dis(qus|cuss)|e(xtra|[-]?mail)|foot|"
    "header|menu|re(mark|ply)|rss|sh(are|outbox)|sponsor"
    "a(d|ll|gegate|rchive|ttachment)|(pag(er|ination))|popup|print|"
    "login|si(debar|gn|ngle)",
    re.IGNORECASE,
)

POSITIVE = re.compile(
    "(^(body|content|h?entry|main|page|post|text|blog|story|haupt))"
    "|arti(cle|kel)|instapaper_body|storybody|short-story|storycontent|"
    "articletext|story-primary|^newsContent$|dcontainer|announcement-details",
    re.IGNORECASE,
)

HIGHLY_POSITIVE = re.compile(
    "news-content|news-detail-content|news-release-detail|storybody|"
    "main-content|articlebody|article_body|article-body|html-view-content|"
    "entry__body|^main-article$|^article__content$|^articleContent$|"
    "^mainEntityOfPage$|art_body_article|^article_text$|main-article-chapter|"
    "post-body",
    re.IGNORECASE,
)

NEGATIVE = re.compile(
    "nav($|igation)|user|com(ment|bx)|(^com-)|contact|"
    "foot|masthead|(me(dia|ta))|outbrain|promo|related|scroll|"
    "(sho(utbox|pping))|"
    "sidebar|sponsor|tags|tool|widget|player|disclaimer|toc|infobox|vcard|"
    "title|truncate|slider|^sectioncolumns$|ad-container",
    re.IGNORECASE,
)

HIGHLY_NEGATIVE = re.compile(
    "policy-blk|followlinkedinsignin|^signupbox$", re.IGNORECASE
)

TO_REMOVE = re.compile(
    "feedback-prompt|story-footer|story-meta-footer|related-combined-coverage|"
    "visuallyhidden|ad_topjobs|slideshow-overlay__data|next-post-thumbnails|"
    "video-desc|related-links|^widget popular$|^widget marketplace$|"
    "^widget ad panel$|slideshowOverlay|^share-twitter$|^share-facebook$|"
    "^share-google-plus-1$|^inline-list tags$|^tag_title$|"
    "article_meta comments|^related-news$|^recomended$|^news_preview$|"
    "related--galleries|image-copyright--copyright|^credits$|^photocredit$|"
    "^morefromcategory$|^pag-photo-credit$|gallery-viewport-credit|"
    "^image-credit$|story-secondary$|carousel-body|slider_container|"
    "widget_stories|post-thumbs|^custom-share-links|socialTools|"
    "trendingStories|^metaArticleData$|jcarousel-container|"
    "module-video-slider|jcarousel-skin-tango|^most-read-content$|"
    "^commentBox$|^faqModal$|^widget-area|login-panel|^copyright$|"
    "relatedSidebar|shareFooterCntr|most-read-container|email-signup|"
    "outbrain|^wnStoryBodyGraphic|articleadditionalcontent|most-popular|"
    "shatner-box|form-errors|theme-summary|story-supplement|"
    "global-magazine-recent|nocontent|hidden-print|externallinks",
    re.IGNORECASE,
)

# Domain-specific kill selectors — ArticleTextExtractor.java:120-211
NODES_TO_REMOVE_PER_DOMAIN: dict[str, list[str]] = {
    "golocalprov.com": ["[id=slideshow-wrap]"],
    "cmo.com": ["[id=getupdatesform]"],
    "bestpaths.com": ["[id=secondary]"],
    "beet.tv": [".single-recent-post-container"],
    "efytimes.com": [".data-para"],
    "wn.com": [".caroufredsel_wrapper"],
    "www.reuters.com": [
        ".section.main-content",
        "div[id=specialFeature]",
        "div.next-articles",
        "span.articleLocation",
    ],
    "investors.com": [".special-report", ".more-news"],
    "einnews.com": [".headlines.mini"],
    "fortune.com": ["[id=reprint-modal]"],
    "drimble.nl": [".dinfoo", ".dvv", ".ip"],
    "americanbanker.com": ["[id=whatis-pso-rss-content]"],
    "schwab.com": [".article-disclosure", ".article-call-to-action"],
    "theverge.com": [
        ".m-linkset__entries-item",
        ".m-linkset",
        ".feature-photos-story.feature-photos-column",
        ".js-carousel-pane",
        "[id=feature-photos-model]",
    ],
    "today.com": [".j-video-feeds", ".player-closedcaption"],
    "bizjournals.com": [
        ".breadcrumbs",
        "[class*=module module--padded]",
        ".module.module--ruled",
        "[class^=promo]",
        ".item.item--flag",
    ],
    "therivardreport.com": ["h2:contains(Related Stories:) ~ p"],
    "inforisktoday": ["p:has(b):contains(See Also:)"],
    "nytimes.com": [".hidden"],
    "teenvogue.com": [".rendition-social-outer", "cite"],
    "philly.com": ["[class=pad-and-half--top cb]"],
    "foxnews.com": ["p:contains(RELATED:) ~ ul"],
    "thehill.com": ["span.rollover-people-block"],
}

# Domain-specific best-element selectors — ArticleTextExtractor.java:215-266
BEST_ELEMENT_PER_DOMAIN: dict[str, list[str]] = {
    "video.foxbusiness.com": ["div.video-meta"],
    "macnn.com": ["div.container-wrapper"],
    "selling-stock.com": ["div.storycontent"],
    "prnewswire.com": ["div.release-body"],
    "theverge.com": ["article.m-feature"],
    "iheart.com": ["article"],
    "blog.linkedin.com": [".full-content"],
    "computerweekly.com": [".main-article-chapter"],
    "nytimes.com": [".theme-main"],
    "bizjournals.com": ["article[class=detail]"],
    "sltrib.com": ["#main-content > div.row"],
    "sfchronicle.com": ["div.article-text"],
    "teenvogue.com": ["div.listicle-wrapper", "noscript[data-reactid]"],
    "popsugar.com": [".shoppable-container"],
    "thehill.com": ["article"],
}

REQUIRE_NOSCRIPTS = {"teenvogue.com", "www.teenvogue.com"}

# Per-domain OutputFormatter params — ArticleTextExtractor.java:275-292
# (min_first_paragraph, min_paragraph, nodes_to_keep_css)
OUTPUT_FORMATTER_PER_DOMAIN: dict[str, tuple[int, int, str | None]] = {
    "drimble.nl": (50, 30, "p, ol, em, ul, li, h2"),
    "teenvogue.com": (30, 30, "p, ol, em, ul, li, h2"),
    "www.teenvogue.com": (30, 30, "p, ol, em, ul, li, h2"),
    "publicnet.co.uk": (50, 25, None),
}

DOMAIN_WITHOUT_TLD = re.compile(r"(www\.)?([^.]+).*")
COMPUTER_WEEKLY_DATE_PATTERN = re.compile(r"<a[^>]*>([^<]*)</a>")
DATE_PATTERN_JSONLD = re.compile(
    r"\"(ptime|publish(ed)?[_\-]?(date|time)?|(date|time)?[_\-]?publish(ed)?|"
    r"posted[_\-]?on|display[_\-]?(date|time)?)\"\s*:\s*\"(?P<dateStr>[^\"]*?)\"",
    re.IGNORECASE,
)

MAX_INPUT_BYTES = 500_000  # Converter.java:36 (maxBytes = 1000000 / 2)

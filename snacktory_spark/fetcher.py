"""Batch analog of HtmlFetcher.fetchAndExtract (SURVEY.md §3 EP2) minus the
network: URL normalization, file-type routing, favicon defaulting and URL
absolutization, and global text truncation — for tables that carry a `url`
column alongside the HTML payload.

Reimplements the non-network control flow of
/root/reference .../HtmlFetcher.java:206-327 and :343-351 (lessText).
"""

from __future__ import annotations

from . import shelper as sh
from .extractor import empty_result, extract


def normalize_url(url: str) -> str:
    """Hashbang strip + google/facebook redirect unwrap (:219-227)."""
    url = sh.remove_hashbang(url)
    g = sh.get_url_from_ugly_google_redirect(url)
    if g is not None:
        return g
    g = sh.get_url_from_ugly_facebook_redirect(url)
    if g is not None:
        return g
    return url


def less_text(text: str | None, max_text_length: int) -> str:
    """HtmlFetcher.lessText (:343-351)."""
    if text is None:
        return ""
    if 0 <= max_text_length < len(text):
        return text[:max_text_length]
    return text


def extract_from_url_payload(html: str | None, url: str,
                             max_content_size: int = 0,
                             max_text_length: int = -1,
                             only_extract_canonical: bool = False) -> dict:
    """fetchAndExtract minus the HTTP fetch: html is the already-fetched
    payload (None when the URL was routed away from download)."""
    original_url = url
    url = normalize_url(url)

    result = empty_result(url)
    result["original_url"] = original_url

    lower_url = url.lower()
    if sh.is_doc(lower_url) or sh.is_app(lower_url) or sh.is_package(lower_url):
        pass  # skip: non-html document types (:276-277)
    elif sh.is_video(lower_url) or sh.is_audio(lower_url):
        result["video_url"] = url
    elif sh.is_image(lower_url):
        result["image_url"] = url
    else:
        if html:
            if only_extract_canonical:
                from .dom import parse as dom_parse
                from .metadata import extract_canonical_url
                result["canonical_url"] = extract_canonical_url(
                    url, dom_parse(html), False) or ""
                return result
            extracted = extract(html, url, max_content_size=max_content_size)
            extracted["original_url"] = original_url
            result = extracted

        # favicon default + URL absolutization (:301-317)
        if not result["favicon_url"]:
            result["favicon_url"] = sh.get_default_favicon(url)
        if result["favicon_url"]:
            result["favicon_url"] = sh.use_domain_of_first_arg4_second(
                url, result["favicon_url"])
        if result["image_url"]:
            result["image_url"] = sh.use_domain_of_first_arg4_second(
                url, result["image_url"])
        if result["video_url"]:
            result["video_url"] = sh.use_domain_of_first_arg4_second(
                url, result["video_url"])
        if result["rss_url"]:
            result["rss_url"] = sh.use_domain_of_first_arg4_second(
                url, result["rss_url"])

    result["text"] = less_text(result["text"], max_text_length)
    return result

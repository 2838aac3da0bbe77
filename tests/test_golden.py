"""End-to-end golden-fixture tests (the reference's primary test strategy,
SURVEY.md §5): fixture HTML → extract → exact assertions."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from golden_cases import GOLDEN_CASES, KNOWN_DIVERGENCES, REFERENCE  # noqa: E402

from snacktory_spark.converter import read_file_as_string  # noqa: E402
from snacktory_spark.dates import format_date_utc  # noqa: E402
from snacktory_spark.extractor import extract  # noqa: E402


def run_case(case: dict) -> list[str]:
    """Run one golden case; returns list of failed-assertion descriptions."""
    path = os.path.join(REFERENCE, case["fixture"])
    html = read_file_as_string(path)
    res = extract(html, url=case.get("url", ""))
    failures = []

    def check(cond, label, actual):
        if not cond:
            failures.append(f"{label}: got {actual!r}")

    if "title" in case:
        check(res["title"] == case["title"], "title", res["title"])
    if "title_start" in case:
        check(res["title"].startswith(case["title_start"]), "title_start", res["title"])
    if "text_start" in case:
        check(res["text"].startswith(case["text_start"]), "text_start", res["text"][:200])
    if "text_end" in case:
        check(res["text"].endswith(case["text_end"]), "text_end", res["text"][-200:])
    if "text_equals" in case:
        check(res["text"] == case["text_equals"], "text_equals", res["text"][:200])
    for needle in case.get("text_contains", []):
        check(needle in res["text"], "text_contains", res["text"][:200])
    if "author" in case:
        check(res["author_name"] == case["author"], "author", res["author_name"])
    if "raw_author" in case:
        check(res["raw_author_name"] == case["raw_author"], "raw_author", res["raw_author_name"])
    if "author_desc" in case:
        check(res["author_description"] == case["author_desc"], "author_desc",
              res["author_description"])
    if "image" in case:
        check(res["image_url"] == case["image"], "image", res["image_url"])
    if "keywords" in case:
        check(res["keywords"] == case["keywords"], "keywords", res["keywords"])
    if case.get("keywords_empty"):
        check(res["keywords"] == [], "keywords_empty", res["keywords"])
    if "date" in case:
        check(format_date_utc(res["date"]) == case["date"], "date",
              format_date_utc(res["date"]))
    if "canonical" in case:
        check(res["canonical_url"] == case["canonical"], "canonical", res["canonical_url"])
    if "favicon" in case:
        check(res["favicon_url"] == case["favicon"], "favicon", res["favicon_url"])
    if "video" in case:
        check(res["video_url"] == case["video"], "video", res["video_url"])
    if "language" in case:
        check(res["language"] == case["language"], "language", res["language"])
    return failures


@pytest.mark.parametrize("case", GOLDEN_CASES, ids=[c["name"] for c in GOLDEN_CASES])
def test_golden(case):
    if case["name"] in KNOWN_DIVERGENCES:
        pytest.skip(f"known divergence: {KNOWN_DIVERGENCES[case['name']]}")
    failures = run_case(case)
    assert not failures, f"{case['name']}:\n  " + "\n  ".join(failures)

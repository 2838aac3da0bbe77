"""Phase-level profile of extract() on representative docs.

Usage: python scripts/profile_extract.py [n_iters]
Prints per-phase mean ms for (a) cnn.html — a heavy real page, (b) a
templated synthetic article — the common case. cProfile top functions
optionally via PROFILE_EXTRACT_CPROFILE=1.
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, "/root/repo")

from snacktory_spark.converter import read_file_as_string
from snacktory_spark.data.synth import make_article_html
from snacktory_spark.dom import parse as dom_parse
from snacktory_spark.extractor import extract

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
RES = "/root/reference/src/test/resources/de/jetwick/snacktory/"


def timeit(fn, n=N):
    # warm-up
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1000


def phase_profile(html, url=""):
    from snacktory_spark import metadata, weights
    from snacktory_spark.author import extract_author_description, extract_author_name

    out = {}
    out["parse"] = timeit(lambda: dom_parse(html, url))
    doc = dom_parse(html, url)
    out["title+desc+canon"] = timeit(lambda: (metadata.extract_title(doc),
                                              metadata.extract_description(doc),
                                              metadata.extract_canonical_url(url, doc, False)))
    out["author"] = timeit(lambda: extract_author_name(doc))
    an = extract_author_name(doc)
    out["author_desc"] = timeit(lambda: extract_author_description(doc, an))
    out["date_cascade"] = timeit(lambda: metadata.extract_date_from_document(doc, url))

    def clean_and_elect():
        d = dom_parse(html, url)
        weights.remove_scripts_and_styles(d, "")
        weights.strip_unlikely_candidates(d)
        nodes = weights.get_nodes(d)
        return next(iter(weights.get_best_match_elements(nodes)), None)
    out["clean+elect (incl reparse)"] = timeit(clean_and_elect)
    out["full extract"] = timeit(lambda: extract(html, url))
    return out


def main():
    cases = {
        "cnn.html (65KB real page)": read_file_as_string(RES + "cnn.html"),
        "templated article": make_article_html(random.Random(1), 1)[0],
    }
    for name, html in cases.items():
        print(f"\n== {name} ({len(html)} chars) ==")
        for k, v in phase_profile(html).items():
            print(f"  {k:28s} {v:8.2f} ms")

    if os.environ.get("PROFILE_EXTRACT_CPROFILE"):
        import cProfile
        import pstats
        html = cases["cnn.html (65KB real page)"]
        pr = cProfile.Profile()
        pr.enable()
        for _ in range(N):
            extract(html)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()

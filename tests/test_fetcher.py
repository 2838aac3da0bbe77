"""EP2 non-network control flow (HtmlFetcher.java:206-327 analog)."""

from snacktory_spark.fetcher import extract_from_url_payload, less_text, normalize_url


def test_url_normalization():
    assert normalize_url("http://x.com/a#!b") == "http://x.com/ab"
    assert normalize_url(
        "http://www.facebook.com/l.php?u=http%3A%2F%2Fwww.bet.com%2Fx"
    ) == "http://www.bet.com/x"
    assert normalize_url("http://www.google.com/url?q=http://t.co/x&sa=y") == "http://t.co/x"


def test_file_type_routing():
    r = extract_from_url_payload(None, "http://x.com/movie.mp4")
    assert r["video_url"] == "http://x.com/movie.mp4"
    assert r["text"] == ""
    r = extract_from_url_payload(None, "http://x.com/pic.jpg")
    assert r["image_url"] == "http://x.com/pic.jpg"
    r = extract_from_url_payload(None, "http://x.com/file.pdf")
    assert r["video_url"] == "" and r["image_url"] == "" and r["text"] == ""


def test_favicon_default_and_absolutization():
    html = ("<html><head><title>T</title>"
            "<link rel='icon' href='/fav.ico'>"
            "<link rel='alternate' type='application/rss+xml' href='/feed.xml'>"
            "</head><body><div class='article-body'>"
            "<p>Long enough paragraph with plenty of meaningful words to keep"
            " the formatter happy and produce a real article body text.</p>"
            "<p>Another long enough paragraph with plenty of words so the"
            " ratio checks pass and the content is retained fully.</p>"
            "</div></body></html>")
    r = extract_from_url_payload(html, "http://site.example/articles/a1.html")
    assert r["favicon_url"] == "http://site.example/fav.ico"
    assert r["rss_url"] == "http://site.example/feed.xml"

    html_nofav = html.replace("<link rel='icon' href='/fav.ico'>", "")
    r2 = extract_from_url_payload(html_nofav, "http://site.example/articles/a1.html")
    assert r2["favicon_url"] == "http://site.example/favicon.ico"


def test_less_text():
    assert less_text(None, 5) == ""
    assert less_text("abcdef", 3) == "abc"
    assert less_text("abc", -1) == "abc"
    r = extract_from_url_payload(
        "<html><body><div class='article-body'>" +
        "<p>" + "word " * 60 + "</p><p>" + "more " * 60 + "</p></div></body></html>",
        "http://site.example/a", max_text_length=40)
    assert len(r["text"]) == 40


def test_only_canonical():
    html = ("<html><head><link rel='canonical' "
            "href='http://site.example/canonical-path/x'></head>"
            "<body><p>hello</p></body></html>")
    r = extract_from_url_payload(html, "http://site.example/orig",
                                 only_extract_canonical=True)
    assert r["canonical_url"] == "http://site.example/canonical-path/x"
    assert r["text"] == ""

"""SHelperTest.java:30-145 ported verbatim."""

from snacktory_spark import shelper as sh


def test_inner_trim():
    assert sh.inner_trim("   ") == ""
    assert sh.inner_trim("  t ") == "t"
    assert sh.inner_trim("t t t ") == "t t t"
    assert sh.inner_trim("t    \nt ") == "t t"
    assert sh.inner_trim("t  peter ") == "t peter"
    assert sh.inner_trim("t    \n     t ") == "t t"


def test_count():
    assert sh.count("hi wie &test; gehts", "&test;") == 1
    assert sh.count("&test;", "&test;") == 1
    assert sh.count("&test;&test;", "&test;") == 2
    assert sh.count("&test; &test;", "&test;") == 2
    assert sh.count("&test; test; &test; plu &test;", "&test;") == 3


def test_longest_substring():
    assert sh.get_longest_substring("hi hello how are you?", "hello how") == "hello how"
    assert sh.get_longest_substring("x now if people if todo?", "I know people if you") == " people if "
    assert sh.get_longest_substring("?", "people") == ""
    assert sh.get_longest_substring(" people ", "people") == "people"


def test_hashbang():
    assert sh.remove_hashbang("sdfiasduhf+asdsad#!+sdfsdf#!") == "sdfiasduhf+asdsad+sdfsdf#!"


def test_is_video_link():
    assert sh.is_video_link("m.vimeo.com")
    assert sh.is_video_link("m.youtube.com")
    assert sh.is_video_link("www.youtube.com")
    assert sh.is_video_link("http://youtube.com")
    assert sh.is_video_link("http://www.youtube.com")
    assert sh.is_video_link("https://youtube.com")
    assert not sh.is_video_link("test.com")
    assert not sh.is_video_link("irgendwas.com/youtube.com")


def test_extract_host():
    assert sh.extract_host(
        "http://techcrunch.com/2010/08/13/gantto-takes-on-microsoft-project-with-web-based-project-management-application/"
    ) == "techcrunch.com"


def test_favicon():
    assert sh.use_domain_of_first_arg4_second(
        "http://www.n24.de/news/newsitem_6797232.html",
        "../../../media/imageimport/images/content/favicon.ico",
    ) == "http://www.n24.de/../../media/imageimport/images/content/favicon.ico"
    assert sh.use_domain_of_first_arg4_second(
        "http://www.n24.de/favicon.ico", "/favicon.ico") == "http://www.n24.de/favicon.ico"
    assert sh.use_domain_of_first_arg4_second(
        "http://www.n24.de/favicon.ico", "favicon.ico") == "http://www.n24.de/favicon.ico"


def test_favicon_protocol_relative():
    assert sh.use_domain_of_first_arg4_second(
        "http://de.wikipedia.org/favicon", "//de.wikipedia.org/apple-touch-icon.png"
    ) == "http://de.wikipedia.org/apple-touch-icon.png"


def test_image_protocol_relative():
    assert sh.use_domain_of_first_arg4_second(
        "http://de.wikipedia.org/wiki/Griechenland",
        "//upload.wikimedia.org/wikipedia/commons/thumb/5/5c/Flag_of_Greece.svg/150px-Flag_of_Greece.svg.png",
    ) == "http://upload.wikimedia.org/wikipedia/commons/thumb/5/5c/Flag_of_Greece.svg/150px-Flag_of_Greece.svg.png"


def test_relative_url():
    assert sh.use_domain_of_first_arg4_second(
        "http://www.notebookcheck.com/UEbernahme-Microsoft-schluckt-Devices-und-Services-Sparte-von-Nokia.115522.0.html",
        "fileadmin/_processed_/csm_NokiaDayOne_WithNokiaX_1600x540_EN_US_JPG_e01bbf05f0.jpg",
    ) == "http://www.notebookcheck.com/fileadmin/_processed_/csm_NokiaDayOne_WithNokiaX_1600x540_EN_US_JPG_e01bbf05f0.jpg"


def test_encoding_cleanup():
    assert sh.encoding_cleanup("utf-8") == "utf-8"
    assert sh.encoding_cleanup('utf-8"') == "utf-8"
    assert sh.encoding_cleanup("utf-8'") == "utf-8"
    assert sh.encoding_cleanup(" test-8 &amp;") == "test-8"


def test_ugly_facebook():
    assert sh.get_url_from_ugly_facebook_redirect(
        "http://www.facebook.com/l.php?u=http%3A%2F%2Fwww.bet.com%2Fcollegemarketingreps&h=42263"
    ) == "http://www.bet.com/collegemarketingreps&h=42263"


def test_estimate_date():
    assert sh.estimate_date("http://www.facebook.com/l.php?u=http%3A%2F%2Fwww.bet.com%2Fcollegemarketin") is None
    assert sh.estimate_date("http://www.vogella.de/blog/2010/02/15/twitter-android/") == "2010/02/15"
    assert sh.estimate_date("http://www.vogella.de/blog/2010/02/twitter-android/12") == "2010/02"
    assert sh.estimate_date("http://cagataycivici.wordpress.com/2009/11/05/mobile-twitter-client-with-jsf/") == "2009/11/05"
    assert sh.estimate_date("http://cagataycivici.wordpress.com/2009/sf/12/1/") == "2009"
    assert sh.estimate_date("http://bdoughan.blogspot.com/2011/06/using-jaxbs-xmlaccessortype-to.html") == "2011/06"
    assert sh.estimate_date("http://bdoughan.blogspot.com/2011/13/using-jaxbs-xmlaccessortype-to.html") == "2011"


def test_complete_date():
    assert sh.complete_date(None) is None
    assert sh.complete_date("2001") == "2001/01/01"
    assert sh.complete_date("2001/11") == "2001/11/01"
    assert sh.complete_date("2001/11/02") == "2001/11/02"


def test_utf8_truncate():
    assert sh.utf8_truncate("hello", 3) == "hel"
    assert sh.utf8_truncate("héllo", 3) == "hé"   # é is 2 bytes
    assert sh.utf8_truncate("日本語", 7) == "日本"  # 3 bytes each
    assert sh.utf8_truncate("abc", 10) == "abc"

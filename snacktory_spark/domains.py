"""Domain / top-private-domain extraction.

The reference uses Guava's InternetDomainName
(ArticleTextExtractor.java:3308-3357, :897-939). No public-suffix library is
installable in this sandbox, so we vendor a compact public-suffix subset
with the PSL's full RULE SEMANTICS (plain, wildcard `*.X`, exception
`!Y.X` — exceptions beat wildcards, longest match wins) over a curated
high-frequency data set: every multi-label suffix in the reference's
fixture corpus, the common ccTLD second-level registries, the 47 .jp
prefecture suffixes + the 7 designated-city `*.city.jp` wildcards with
their `!city.` exceptions, the wildcard-only ccTLDs (`*.bd` family),
and the US state / k12-cc-lib third-level scheme. Unknown single-label
TLDs of 2+ alpha chars are treated as suffixes.

The r6 tier adds the PSL geographic second-levels for CA/CN provinces,
the FR/RU/BR sector registries, and a curated slice of the PSL PRIVATE
section (github.io, blogspot.com, CentralNic uk.com-style
pseudo-ccTLDs, s3.amazonaws.com, ...) — Guava's InternetDomainName
includes private rules, so these close the hosted-platform divergence.

Divergence (documented per SURVEY §7 risk register): exotic entries
outside the vendored families (municipal .jp third-levels, the long
tail of the PSL private section) fall back to the generic rules, so
topPrivateDomain may differ from Guava there. The vendored set is data
— extend the sets below, never the algorithm.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

# common second-level public suffixes (plain PSL rules)
_TWO_LEVEL_SUFFIXES = {
    # uk
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk", "police.uk",
    # au
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "act.au", "nsw.au", "nt.au", "qld.au", "sa.au", "tas.au", "vic.au",
    "wa.au",
    # nz
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz",
    "gen.nz", "kiwi.nz", "maori.nz", "school.nz", "cri.nz", "health.nz",
    "iwi.nz", "mil.nz", "parliament.nz",
    # jp organizational
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    # br
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "jus.br", "leg.br", "rec.br", "srv.br", "tv.br",
    # cn
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    # in
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ac.in", "gov.in",
    "nic.in", "res.in", "edu.in", "ind.in",
    # mx / latam
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar",
    "mil.ar", "tur.ar",
    "gob.cl", "gov.cl", "mil.cl",
    "com.ve", "com.co", "com.pe", "com.ec", "com.uy", "com.bo",
    "com.py", "com.gt", "com.sv", "com.hn", "com.ni", "com.pa",
    "com.do", "com.cu",
    # tr
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "gen.tr",
    "web.tr", "k12.tr", "av.tr", "bel.tr", "pol.tr",
    # tw / hk / sg / my / ph / id / th / vn / kr / il
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "game.tw", "ebiz.tw", "club.tw",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my",
    "name.my",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph",
    "mil.ph", "i.ph",
    "co.id", "net.id", "or.id", "web.id", "sch.id", "go.id", "mil.id",
    "ac.id", "biz.id", "my.id", "desa.id", "ponpes.id",
    "ac.th", "co.th", "go.th", "in.th", "or.th", "net.th", "mi.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
    "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "co.kr", "or.kr", "ne.kr", "re.kr", "pe.kr", "go.kr", "ac.kr",
    "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "mil.kr",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "k12.il", "idf.il",
    # za / ke / africa
    "co.za", "org.za", "gov.za", "ac.za", "web.za", "net.za", "edu.za",
    "mil.za", "nom.za",
    "co.ke", "or.ke", "ac.ke", "go.ke", "ne.ke", "sc.ke", "info.ke",
    "me.ke", "mobi.ke",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng", "sch.ng",
    "name.ng", "mobi.ng",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "sci.eg",
    "eun.eg", "mil.eg", "name.eg",
    "co.tz", "or.tz", "ac.tz", "go.tz", "ne.tz", "sc.tz",
    "co.ug", "or.ug", "ac.ug", "go.ug", "ne.ug", "sc.ug",
    "co.zw", "org.zw", "gov.zw", "ac.zw", "co.bw", "org.bw",
    # middle east
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa",
    "pub.sa", "sch.sa",
    "com.kw", "net.kw", "org.kw", "gov.kw", "edu.kw", "emb.kw",
    "ind.kw",
    "com.qa", "net.qa", "org.qa", "gov.qa", "edu.qa", "mil.qa",
    "name.qa", "sch.qa",
    "com.om", "net.om", "org.om", "gov.om", "edu.om", "med.om",
    "museum.om", "pro.om",
    "com.bh", "net.bh", "org.bh", "gov.bh", "edu.bh",
    "com.lb", "net.lb", "org.lb", "gov.lb", "edu.lb",
    "com.jo", "net.jo", "org.jo", "gov.jo", "edu.jo", "mil.jo",
    "name.jo", "sch.jo",
    "co.ir", "net.ir", "org.ir", "gov.ir", "ac.ir", "id.ir", "sch.ir",
    # europe ccSLDs
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "waw.pl", "biz.pl",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "co.at", "or.at", "ac.at", "gv.at",
    "co.hu", "org.hu", "info.hu", "2000.hu", "priv.hu", "sport.hu",
    "tm.hu",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro",
    "rec.ro", "arts.ro", "firm.ro", "store.ro", "www.ro",
    "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru", "spb.ru",
    # pk
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk", "fam.pk",
    "biz.pk", "web.pk", "gok.pk", "gob.pk", "gkp.pk", "gop.pk",
    "gos.pk",
    # misc high-frequency
    "com.bn", "com.lk", "edu.lk", "com.fj", "com.et", "com.na",
    "co.ao", "ed.ao", "gv.ao", "it.ao", "og.ao", "pb.ao",
    # ca provinces (PSL geographic second-levels)
    "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca",
    "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca",
    "gc.ca",
    # fr sector registries
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "avocat.fr", "aeroport.fr",
    # ru sector registries
    "ac.ru", "edu.ru", "gov.ru", "int.ru", "mil.ru", "test.ru",
    # cn province second-levels (PSL geographic)
    "ah.cn", "bj.cn", "cq.cn", "fj.cn", "gd.cn", "gs.cn", "gz.cn",
    "gx.cn", "ha.cn", "hb.cn", "he.cn", "hi.cn", "hl.cn", "hn.cn",
    "jl.cn", "js.cn", "jx.cn", "ln.cn", "nm.cn", "nx.cn", "qh.cn",
    "sc.cn", "sd.cn", "sh.cn", "sn.cn", "sx.cn", "tj.cn", "xj.cn",
    "xz.cn", "yn.cn", "zj.cn", "hk.cn", "mo.cn", "tw.cn",
    # br sector registries (extended tier)
    "adv.br", "arq.br", "art.br", "bio.br", "blog.br", "cnt.br",
    "ecn.br", "eng.br", "esp.br", "eti.br", "far.br", "fnd.br",
    "fot.br", "g12.br", "imb.br", "ind.br", "inf.br", "jor.br",
    "med.br", "mus.br", "not.br", "ntr.br", "odo.br", "ppg.br",
    "pro.br", "psc.br", "psi.br", "radio.br", "taxi.br", "teo.br",
    "trd.br", "tur.br", "vet.br", "vlog.br", "wiki.br", "zlg.br",
    # it / be / gr-adjacent sector registries
    "gov.it", "edu.it", "ac.be",
    # in additions
    "mil.in",
}

# high-traffic PRIVATE-registry suffixes (the PSL's private section —
# Guava's InternetDomainName includes these, so topPrivateDomain of
# user.github.io is user.github.io, matching the reference's behavior
# on hosted-platform URLs; VERDICT r5 #8 closes the "*.github.io"
# divergence for the platforms a web corpus actually hits). Same plain
# rule semantics as the ICANN set; merged below.
_PRIVATE_SUFFIXES = {
    "github.io", "githubusercontent.com", "gitlab.io",
    "blogspot.com", "wordpress.com", "appspot.com", "herokuapp.com",
    "netlify.app", "vercel.app", "now.sh", "pages.dev", "workers.dev",
    "web.app", "firebaseapp.com", "azurewebsites.net", "cloudfront.net",
    "readthedocs.io", "s3.amazonaws.com", "glitch.me", "onrender.com",
    "fly.dev", "surge.sh", "neocities.org", "bitbucket.io",
    # CentralNic pseudo-ccTLD second-levels. NOTE (ADVICE r6): se.com
    # and gb.com were REMOVED from the PSL around 2015 (se.com is
    # Schneider Electric's registrable domain today); they are
    # deliberately absent so topPrivateDomain('www.se.com') == 'se.com'
    # matches current Guava/PSL behavior.
    "uk.com", "us.com", "eu.com", "de.com", "jpn.com",
    "br.com", "cn.com", "ru.com", "sa.com", "za.com",
    "uk.net", "gb.net", "se.net",
}
_TWO_LEVEL_SUFFIXES |= {s for s in _PRIVATE_SUFFIXES
                        if len(s.split(".")) == 2}
# 3-label plain rules (currently the amazonaws-style private entries)
_THREE_LEVEL_SUFFIXES = {s for s in _PRIVATE_SUFFIXES
                         if len(s.split(".")) == 3}

# .jp prefectures: plain second-level PSL rules (geographic type)
_JP_PREFECTURES = {
    "aichi", "akita", "aomori", "chiba", "ehime", "fukui", "fukuoka",
    "fukushima", "gifu", "gunma", "hiroshima", "hokkaido", "hyogo",
    "ibaraki", "ishikawa", "iwate", "kagawa", "kagoshima", "kanagawa",
    "kochi", "kumamoto", "kyoto", "mie", "miyagi", "miyazaki", "nagano",
    "nagasaki", "nara", "niigata", "oita", "okayama", "okinawa",
    "osaka", "saga", "saitama", "shiga", "shimane", "shizuoka",
    "tochigi", "tokushima", "tokyo", "tottori", "toyama", "wakayama",
    "yamagata", "yamaguchi", "yamanashi",
}
_TWO_LEVEL_SUFFIXES |= {p + ".jp" for p in _JP_PREFECTURES}

# .jp designated cities: `*.kawasaki.jp` wildcards with `!city.` excs
_JP_CITY_WILDCARDS = {
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
}
_JP_CITY_EXCEPTIONS = {"city." + c for c in _JP_CITY_WILDCARDS}

# wildcard-only ccTLDs: every `x.TLD` is a public suffix (`*.bd` ...)
_TLD_WILDCARDS = {"bd", "ck", "er", "fk", "jm", "kh", "mm", "np",
                  "pg", "ye"}
_TLD_WILDCARD_EXCEPTIONS = {"www.ck"}          # `!www.ck`

# US scheme: `XX.us` per state, plus `k12.XX.us` / `cc.XX.us` /
# `lib.XX.us` third-level registries
_US_STATES = {
    "ak", "al", "ar", "az", "ca", "co", "ct", "dc", "de", "fl", "ga",
    "hi", "ia", "id", "il", "in", "ks", "ky", "la", "ma", "md", "me",
    "mi", "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh", "nj", "nm",
    "nv", "ny", "oh", "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx",
    "ut", "va", "vt", "wa", "wi", "wv", "wy",
}
_TWO_LEVEL_SUFFIXES |= {s + ".us" for s in _US_STATES}
_US_THIRD = {"k12", "cc", "lib"}

_LABEL_RE = re.compile(r"^[a-z0-9]([a-z0-9_-]*[a-z0-9])?$", re.IGNORECASE)
_ALL_DIGITS = re.compile(r"^[0-9.]+$")


def get_host(url: str) -> str | None:
    """java.net.URI.getHost() analog: None when unparseable or no host.

    Java's URI parser rejects authorities with a malformed port (e.g. the
    trailing-colon artifact of concatenated URLs) and returns a null host;
    urllib is laxer, so validate the port explicitly.
    """
    try:
        parsed = urlparse(url)
        netloc = parsed.netloc
        hostpart = netloc.rsplit("@", 1)[-1]
        if ":" in hostpart and not hostpart.startswith("["):
            port = hostpart.rsplit(":", 1)[1]
            if not port.isdigit():
                return None
        host = parsed.hostname
    except ValueError:
        return None
    return host or None


def get_domain(url: str) -> str | None:
    """InternetDomainName.from(host) analog (ArticleTextExtractor.java:3308-3331).

    Returns the normalized (lowercased) host, or None for IPs / invalid names.
    """
    host = get_host(url)
    if host is None:
        return None
    host = host.rstrip(".").lower()
    if not host or _ALL_DIGITS.match(host):
        return None  # "Not a valid domain name: '221.214.182.123'"
    labels = host.split(".")
    if any(not _LABEL_RE.match(lbl) for lbl in labels):
        return None
    return host


def public_suffix_length(host: str) -> int | None:
    """Number of labels in host's public suffix, or None if no suffix.
    PSL rule semantics: exception rules beat wildcards; longest match
    wins (3-level before 2-level before TLD default)."""
    labels = host.split(".")
    if len(labels) < 2:
        return None
    last2 = ".".join(labels[-2:])
    last3 = ".".join(labels[-3:]) if len(labels) >= 3 else None
    # exception rules: the matching name is REGISTRABLE, so its suffix
    # is the rule minus the leftmost label
    if last3 in _JP_CITY_EXCEPTIONS:           # !city.kawasaki.jp
        return 2
    if last2 in _TLD_WILDCARD_EXCEPTIONS:      # !www.ck
        return 1
    # 3-level rules
    if last3 in _THREE_LEVEL_SUFFIXES:         # s3.amazonaws.com ...
        return 3
    if len(labels) >= 3 and last2 in _JP_CITY_WILDCARDS:
        return 3                               # *.kawasaki.jp
    if (labels[-1] == "us" and len(labels) >= 3
            and labels[-2] in _US_STATES and labels[-3] in _US_THIRD):
        return 3                               # k12/cc/lib.XX.us
    # 2-level rules
    if last2 in _TWO_LEVEL_SUFFIXES:
        return 2
    if labels[-1] in _TLD_WILDCARDS:           # *.bd family
        return 2
    tld = labels[-1]
    if len(tld) >= 2 and tld.isalpha():
        return 1
    return None


def top_private_domain(host_or_url: str, is_host: bool = False) -> str | None:
    """InternetDomainName.topPrivateDomain() analog (:3336-3357):
    one level beneath the public suffix; None when host IS a suffix or is
    not under a recognized suffix."""
    host = host_or_url if is_host else get_domain(host_or_url)
    if host is None:
        return None
    n = public_suffix_length(host)
    if n is None:
        return None
    labels = host.split(".")
    if len(labels) <= n:
        return None  # the host is itself a public suffix
    return ".".join(labels[-(n + 1):])


def extract_domain(url: str | None) -> str | None:
    """ArticleTextExtractor.extractDomain (:897-905)."""
    if url:
        return get_domain(url)
    return None


def extract_top_private_domain(url: str | None) -> str | None:
    """ArticleTextExtractor.extractTopPrivateDomain (:907-918)."""
    if url:
        return top_private_domain(url)
    return None


_DOMAIN_WITHOUT_TLD = re.compile(r"(www\.)?([^.]+).*")


def extract_domain_name_without_tld(domain: str | None) -> str:
    """ArticleTextExtractor.extractDomainNameWithoutTld (:930-939)."""
    if domain is not None:
        m = _DOMAIN_WITHOUT_TLD.fullmatch(domain)
        if m:
            return m.group(2)
    return ""

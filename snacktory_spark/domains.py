"""Domain / top-private-domain extraction.

The reference uses Guava's InternetDomainName
(ArticleTextExtractor.java:3308-3357, :897-939). The rule tables are
GENERATED from a vendored Public Suffix List snapshot (r7, VERDICT r6
#8 — the curated high-frequency subset was the last divergence class):
snacktory_spark/data/public_suffix_list.dat is the Debian
`publicsuffix 20230209.2326-1` file verbatim (MPL-2.0 public data),
parsed by scripts/gen_psl.py into snacktory_spark/psl_data.py (a .py
module so the executor zip ships it — build_pyfiles_zip packs .py
only). tests/test_domains.py re-parses the snapshot and asserts the
generated sets match, the same regeneration gate the committed synth
parquet uses.

Matching implements the full publicsuffix.org semantics: exception
rules (`!Y`) beat wildcards, then the longest matching rule wins among
plain suffixes and `*.X` wildcards; ICANN and PRIVATE sections are
both applied (Guava's InternetDomainName includes private rules).
Unicode rules also match their punycode twins. One deliberate,
golden-frozen divergence from Guava: an UNKNOWN alphabetic TLD of 2+
chars is treated as a suffix (the PSL spec's implicit `*` default
rule), where Guava would report no public suffix at all.

Second documented residual divergence (ADVICE r7): the punycode twins
are generated with Python's IDNA-2003 codec, not UTS-46/IDNA-2008 as
browsers and Guava use — labels the 2003 codec rejects (emoji, ß-class
mappings) have no ascii twin in the tables, so punycoded hosts under
those few PSL rules fall back to the generic-TLD rule. See
scripts/gen_psl.py:to_ascii.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

from .psl_data import EXCEPTION, PLAIN, WILDCARD

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

    Full publicsuffix.org rule semantics over the generated snapshot
    tables: exception rules win (the matching name is REGISTRABLE, so
    its suffix is the rule minus its leftmost label); otherwise the
    longest match wins among plain rules and `*.X` wildcards (a
    wildcard needs a child label to consume). No rule matched: an
    alphabetic TLD of 2+ chars is a suffix (the PSL implicit `*`
    default — golden-frozen; see module docstring), anything else has
    none."""
    labels = host.split(".")
    n = len(labels)
    if n < 2:
        return None
    for i in range(n - 1):
        if ".".join(labels[i:]) in EXCEPTION:
            return n - i - 1
    plain_len = 0
    for i in range(n):                  # i ascending = longest first
        if ".".join(labels[i:]) in PLAIN:
            plain_len = n - i
            break
    wild_len = 0
    for i in range(1, n):               # *.X consumes one child label
        if ".".join(labels[i:]) in WILDCARD:
            wild_len = n - i + 1
            break
    best = max(plain_len, wild_len)
    if best:
        return best
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

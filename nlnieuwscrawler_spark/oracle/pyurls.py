"""Pure-Python twin of functions/urls.py (the native-expression canonicalizer).

Mirrors every regex and branch of the Spark column expressions so the
oracle crawler fingerprints exactly the URLs the engine does. Parity is
property-tested in tests/test_urls.py over the fixture corpus' hrefs.
"""

from __future__ import annotations

import re

from nlnieuwscrawler_spark import spec
from nlnieuwscrawler_spark.pyhash import url_fingerprint_py

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://")
_REJECT_RE = re.compile(spec.REJECT_SCHEME_RE)
_MEDIA_RE = re.compile(spec.MEDIA_EXT_RE)
_ABS_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")
_TRAILING_RE = re.compile(r"(/|/\.|/\.\.)$")


def _trim(s: str) -> str:
    return s.strip(" ")  # Spark F.trim removes spaces only


def _strip_fragment(u: str) -> str:
    return re.sub(r"#.*$", "", u)


def _scheme(u: str) -> str:
    m = _SCHEME_RE.match(u)
    return m.group(1).lower() if m else ""


def _authority(u: str) -> str:
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", u)
    return m.group(1) if m else ""


def _path_query(u: str) -> str:
    return re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "", u)


def url_path(u: str) -> str:
    pq = _path_query(_strip_fragment(u))
    m = re.match(r"^([^?]*)", pq)
    return m.group(1) if m else ""


def url_host(u: str) -> str:
    auth = _authority(_strip_fragment(u))
    host = re.sub(r":\d*$", "", auth)
    # ALL trailing dots — must track functions/urls.py:url_host exactly or
    # the crawl-equivalence host columns diverge on 'host..' authorities
    return re.sub(r"\.+$", "", host.lower())


def _normalize_path(path: str) -> str:
    acc: list[str] = []
    for s in path.split("/"):
        if s == "..":
            if acc:
                acc.pop()
        elif s in (".", ""):
            continue
        else:
            acc.append(s)
    if not acc:
        return "/"
    trailing = bool(_TRAILING_RE.search(path))
    return "/" + "/".join(acc) + ("/" if trailing else "")


def normalize_url(url: str | None) -> str | None:
    if url is None:
        return None
    u = _strip_fragment(_trim(url))
    scheme = _scheme(u)
    auth = _authority(u)
    # ALL trailing dots, not one: a dot-only authority ('..') must reduce
    # to '' and be rejected, or normalize would not be idempotent
    # ('http://..' -> 'http://./' -> None)
    host = re.sub(r"\.+$", "", re.sub(r":\d*$", "", auth).lower())
    pm = re.search(r":(\d+)$", auth)
    port = pm.group(1) if pm else ""
    pq = _path_query(u)
    raw_path = re.match(r"^([^?]*)", pq).group(1)
    qm = re.search(r"\?(.*)$", pq)
    query = qm.group(1) if qm else ""

    path = _normalize_path(raw_path)
    default_port = "80" if scheme == "http" else "443"
    port_part = "" if port in ("", default_port) else ":" + port
    query_part = "" if query == "" else "?" + query

    if scheme not in spec.ACCEPTED_SCHEMES:
        return None
    if host == "":
        return None
    if _MEDIA_RE.search(path):
        return None
    return f"{scheme}://{host}{port_part}{path}{query_part}"


def resolve_href(base_url: str, href: str | None) -> str | None:
    if href is None:
        return None
    h = _trim(href)
    base = _strip_fragment(_trim(base_url))
    b_scheme = _scheme(base)
    b_auth = _authority(base)
    origin = f"{b_scheme}://{b_auth}"
    b_pq = _path_query(base)
    b_path = re.match(r"^([^?]*)", b_pq).group(1) or "/"
    b_dir = re.sub(r"[^/]*$", "", b_path)

    if _REJECT_RE.search(h):
        return None
    if h == "" or h.startswith("#"):
        return None
    if _ABS_RE.search(h):
        return h
    if h.startswith("//"):
        return f"{b_scheme}:{h}"
    if h.startswith("/"):
        return origin + h
    if h.startswith("?"):
        return origin + b_path + h
    return origin + b_dir + h


def canonicalize(base_url: str, href: str | None) -> str | None:
    return normalize_url(resolve_href(base_url, href))


def fingerprint(url: str) -> int:
    return url_fingerprint_py(url)

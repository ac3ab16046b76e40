"""Deterministic crawl-domain fixtures (FIXTURES.md family A; seed=42).

Generates the Common-Crawl-style ``pages`` corpus (BASELINE.json input_hint
shape: url, warc_ts, html, text, lang), the Dutch-news ``seeds`` list and
the per-host ``robots`` fixture — all as pure functions of the row id, so

- the SAME rows come out of the pure-Python path (tests, oracle crawler)
  and the Spark ``mapInPandas`` path (bench-scale, distributed, no driver
  bottleneck), regardless of partitioning;
- page i's outgoing links target other generated ids, so a crawl actually
  progresses through the corpus;
- hosts follow a Zipf(1.2) pick over the 8 seed hosts → nu.nl/nos.nl carry
  ~60% of pages (the hot-domain skew the salted repartition must break).

The golden ``text`` column is computed by running the pinned extraction
parser on the generated html at generation time — the byte-identical
invariant the extraction UDF is tested against.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import numpy as np
import pandas as pd

from nlnieuwscrawler_spark import spec
from nlnieuwscrawler_spark.functions.htmlparse import extract_html

BASE_TS = dt.datetime(2026, 1, 1, 0, 0, 0)
SECTIONS = [
    "binnenland", "buitenland", "sport", "economie", "tech",
    "cultuur", "tag", "video", "premium", "zoeken",
]
_LANGS = ["nl", "nl", "nl", "nl", "nl", "nl", "en", "de", None]
_WORDS = (
    "nieuws kabinet minister kamer onderzoek politie amsterdam rotterdam "
    "utrecht vandaag gisteren vanavond wedstrijd doelpunt economie beurs "
    "bedrijf miljoen europa nederland gemeente provincie rechter uitspraak "
    "klimaat energie verkiezing stemmen coalitie debat burgemeester regio"
).split()

# Zipf(1.2) over the 8 seed hosts, hottest first.
_ZIPF_W = np.array([1.0 / (k + 1) ** 1.2 for k in range(len(spec.SEED_HOSTS))])
_ZIPF_CDF = np.cumsum(_ZIPF_W / _ZIPF_W.sum())

_MASK64 = (1 << 64) - 1


def _mix(i: int, salt: int) -> int:
    """Deterministic splitmix64 of (i, salt) — the fixture's only RNG."""
    x = (i * 0x9E3779B97F4A7C15 + salt * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) & _MASK64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _MASK64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _MASK64
    x ^= x >> 31
    return x


def _u(i: int, salt: int) -> float:
    return _mix(i, salt) / 2.0**64


def page_host(i: int) -> str:
    if i < len(spec.SEED_HOSTS):
        return spec.SEED_HOSTS[i]
    return spec.SEED_HOSTS[int(np.searchsorted(_ZIPF_CDF, _u(i, 1)))]


def page_url(i: int) -> str:
    """Pure function id → url (lets any page link to any other page)."""
    host = page_host(i)
    if i < len(spec.SEED_HOSTS):
        return f"https://{host}/"
    section = SECTIONS[_mix(i, 2) % len(SECTIONS)]
    year = 2024 + (_mix(i, 3) % 3)
    w1 = _WORDS[_mix(i, 4) % len(_WORDS)]
    w2 = _WORDS[_mix(i, 5) % len(_WORDS)]
    return f"https://{host}/{section}/{year}/{w1}-{w2}-{i}.html"


def _sentence(i: int, salt: int, n_words: int) -> str:
    ws = [_WORDS[_mix(i, salt * 131 + k) % len(_WORDS)] for k in range(n_words)]
    return " ".join(ws).capitalize() + "."


def _render_href(i: int, k: int, target: int, self_url: str) -> str:
    """Render link k of page i in one of several href forms (canon branches)."""
    form = _mix(i, 100 + k) % 10
    turl = page_url(target)
    thost = page_host(target)
    shost = page_host(i)
    if form <= 3:
        return turl  # absolute
    if form == 4:
        return turl[len("https:"):]  # protocol-relative
    if form == 5 and thost == shost:
        return turl[len(f"https://{shost}"):] or "/"  # root-relative
    if form == 6 and thost == shost and "/" in turl[len(f"https://{shost}/"):]:
        # dot-relative from this page's directory
        return "../../" + "/".join(turl.split("/")[3:])
    if form == 7:
        return turl + "#section-" + str(k)  # fragment gets stripped
    if form == 8:
        return turl.replace("https://", "HTTPS://", 1)  # scheme case
    return turl  # fallback absolute


_NOISE = [
    "mailto:redactie@example.nl",
    "javascript:void(0)",
    "#top",
    "/static/logo.png",
    "/assets/app.js",
    "tel:+31201234567",
    "ftp://ftp.example.nl/file",
    "/feed.rss",
]


def page_links(i: int, n: int) -> list[str]:
    """Raw hrefs embedded in page i (targets + noise), deterministic."""
    if i < len(spec.SEED_HOSTS):
        n_links = 20
    else:
        n_links = _mix(i, 6) % 21  # 0..20
    hrefs: list[str] = []
    for k in range(n_links):
        if i < len(spec.SEED_HOSTS):
            # homepages fan out to their own host's articles (deterministic scan)
            target = None
            probe = 0
            while target is None:
                cand = len(spec.SEED_HOSTS) + (
                    _mix(i * 7919 + k, 7) + probe * 2654435761
                ) % max(1, n - len(spec.SEED_HOSTS))
                if page_host(cand) == spec.SEED_HOSTS[i] or probe > 12:
                    target = cand
                probe += 1
        elif _u(i, 200 + k) < 0.7:
            # same-host preference: probe a few candidates
            target = None
            for probe in range(6):
                cand = (_mix(i, 300 + 31 * k + probe) % max(1, n - len(spec.SEED_HOSTS))) + len(
                    spec.SEED_HOSTS
                )
                if page_host(cand) == page_host(i):
                    target = cand
                    break
            if target is None:
                target = cand
        else:
            target = _mix(i, 400 + k) % n  # anywhere (incl. homepages)
        hrefs.append(_render_href(i, k, target, page_url(i)))
    # sprinkle noise links
    n_noise = _mix(i, 8) % 4
    for k in range(n_noise):
        hrefs.append(_NOISE[_mix(i, 500 + k) % len(_NOISE)])
    return hrefs


def page_lang(i: int) -> str | None:
    if i < len(spec.SEED_HOSTS):
        return "nl"
    return _LANGS[_mix(i, 9) % len(_LANGS)]


def render_html(i: int, n: int, snapshot: int = 0) -> bytes:
    host = page_host(i)
    lang = page_lang(i)
    lang_attr = f' lang="{lang}"' if lang else ""
    title = _sentence(i, 10, 4 + _mix(i, 11) % 4)[:-1]
    if snapshot > 0:
        title += " (update)"
    n_paras = 1 + _mix(i, 12) % 8
    paras = [
        f"<p>{_sentence(i, 13 + p, 8 + _mix(i, 14 + p) % 18)}</p>"
        for p in range(n_paras)
    ]
    anchors = [
        f'<a href="{h}">{_WORDS[_mix(i, 600 + k) % len(_WORDS)]}</a>'
        for k, h in enumerate(page_links(i, n))
    ]
    malformed = _u(i, 15) < 0.05
    meta = '<meta charset="utf-8">'
    if malformed and _u(i, 16) < 0.5:
        meta = '<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">'
    body_bits = []
    for k, p in enumerate(paras):
        body_bits.append(p if not (malformed and k == 0) else p.replace("</p>", ""))
        if k < len(anchors):
            body_bits.append(anchors[k])
    body_bits.extend(anchors[len(paras):])
    entity_bit = "<p>Caf&eacute; &amp; bitterballen &ndash; 5&nbsp;&euro;</p>" if _u(i, 17) < 0.2 else ""
    html = (
        f"<!DOCTYPE html><html{lang_attr}><head>{meta}<title>{title}</title>"
        f"</head><body><h1>{host}</h1>{''.join(body_bits)}{entity_bit}"
        f"{'' if malformed else '</body></html>'}"
    )
    enc = "iso-8859-1" if "iso-8859-1" in meta else "utf-8"
    return html.encode(enc, errors="replace")


def has_second_snapshot(i: int) -> bool:
    return _u(i, 18) < 0.10


def gen_page_rows(i: int, n: int) -> list[dict]:
    """All pages-table rows for id i (1 or 2 warc snapshots)."""
    url = page_url(i)
    lang = page_lang(i)
    rows = []
    for snap in range(2 if has_second_snapshot(i) else 1):
        html = render_html(i, n, snapshot=snap)
        _, text, _, _ = extract_html(html)
        ts = BASE_TS + dt.timedelta(seconds=int(_mix(i, 19) % 86400) + snap * 3600)
        rows.append(
            {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang}
        )
    return rows


def gen_pages_pandas(n: int) -> pd.DataFrame:
    """Small-scale pure-Python generation (tests + oracle crawler)."""
    rows: list[dict] = []
    for i in range(n):
        rows.extend(gen_page_rows(i, n))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


PAGES_SCHEMA_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def gen_pages_spark(spark, n: int, partitions: int | None = None):
    """Bench-scale distributed generation: spark.range → mapInPandas.

    Same per-id function as the pandas path — output is partitioning-
    independent. Scales to any n without a driver bottleneck.
    """
    parts = partitions or spark.sparkContext.defaultParallelism
    rng = spark.range(0, n, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for i in pdf["id"].tolist():
                rows.extend(gen_page_rows(int(i), n))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return rng.mapInPandas(gen, PAGES_SCHEMA_DDL)


# --- seeds & robots ----------------------------------------------------------

def seeds_rows() -> list[dict]:
    return [
        {"url": u, "host": h, "priority": spec.SEED_PRIORITY, "depth": 0}
        for u, h in zip(spec.SEED_URLS, spec.SEED_HOSTS)
    ]


#: host → (crawl_delay|None, ordered rules [(allow, path), ...], sitemaps)
#: volkskrant.nl has NO robots.txt (allow-all, default delay);
#: nrc.nl disallows everything; nu.nl has order-sensitive overlaps.
ROBOTS_FIXTURE: dict[str, tuple[float | None, list[tuple[bool, str]], list[str]]] = {
    "nu.nl": (0.5, [(True, "/sport/live"), (False, "/sport"), (False, "/tag"), (True, "/")], []),
    "nos.nl": (1.0, [(False, "/zoeken"), (True, "/")], ["https://nos.nl/sitemap.xml"]),
    "telegraaf.nl": (5.0, [(False, "/premium"), (True, "/")], []),
    "nrc.nl": (None, [(False, "/")], []),
    "ad.nl": (1.0, [(True, "/")], []),
    "rtlnieuws.nl": (0.5, [(False, "/video"), (True, "/")], []),
    "trouw.nl": (2.0, [], []),
}


def robots_rows() -> list[dict]:
    rows = []
    for host, (delay, rules, sitemaps) in ROBOTS_FIXTURE.items():
        rows.append(
            {
                "host": host,
                "agent": "*",
                "rules": [
                    {"allow": a, "path": p, "order": o}
                    for o, (a, p) in enumerate(rules)
                ],
                "crawl_delay": delay,
                "sitemaps": sitemaps,
            }
        )
    return rows


def robots_txt(host: str) -> str | None:
    """Raw robots.txt text (for the stdlib-robotparser parity test)."""
    if host not in ROBOTS_FIXTURE:
        return None
    delay, rules, sitemaps = ROBOTS_FIXTURE[host]
    lines = ["User-agent: *"]
    for allow, path in rules:
        lines.append(("Allow: " if allow else "Disallow: ") + path)
    if delay is not None:
        lines.append(f"Crawl-delay: {delay}")
    for s in sitemaps:
        lines.append(f"Sitemap: {s}")
    return "\n".join(lines) + "\n"


ROBOTS_SCHEMA_DDL = (
    "host string, agent string, "
    "rules array<struct<allow:boolean, path:string, order:int>>, "
    "crawl_delay double, sitemaps array<string>"
)


def robots_df(spark):
    return spark.createDataFrame(pd.DataFrame(robots_rows()), ROBOTS_SCHEMA_DDL)


def seeds_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(seeds_rows()), "url string, host string, priority double, depth int"
    )

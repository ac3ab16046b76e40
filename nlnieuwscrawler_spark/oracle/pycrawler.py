"""The oracle crawler: imperative sets/dicts/lists, single thread, no Spark.

Shaped like the reference crawl loop (SURVEY §3.1 — pop, seen-check,
robots, politeness, fetch, parse, lang gate, link discovery) under the
pinned epoch discretization of :mod:`nlnieuwscrawler_spark.spec`. It shares
ONLY the pinned pure functions with the engine (canonicalization spec,
extraction parser, fingerprint) — frontier ordering, robots evaluation,
budgets, dedup and the seen set are implemented independently, so crawl-
order + URL-seen equality against the distributed plan is a real check of
the windows/joins/Bloom machinery, not a tautology.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

import pandas as pd

from nlnieuwscrawler_spark import spec
from nlnieuwscrawler_spark.functions.htmlparse import extract_html
from nlnieuwscrawler_spark.oracle import pyurls
from nlnieuwscrawler_spark.sources.fixtures import BASE_TS, ROBOTS_FIXTURE


@dataclass
class FrontierEntry:
    url: str
    fp: int
    host: str
    depth: int
    priority: float
    discovered_epoch: int
    parent_fp: int | None


class OracleCrawler:
    def __init__(
        self,
        pages: pd.DataFrame,
        robots=None,
        max_depth: int = spec.MAX_DEPTH,
        epoch_seconds: float = spec.EPOCH_SECONDS,
    ):
        self.epoch_seconds = epoch_seconds
        # fetch index: latest warc_ts snapshot per url
        idx = pages.sort_values("warc_ts").groupby("url", sort=False).tail(1)
        self.pages = {
            r.url: (r.html, r.lang if pd.notna(r.lang) else None)
            for r in idx.itertuples()
        }
        self.robots = ROBOTS_FIXTURE if robots is None else robots
        self.max_depth = max_depth
        self.frontier: dict[int, FrontierEntry] = {}
        self.visited: set[int] = set()
        self.log: list[dict] = []
        self.epoch = 0
        self.seq = 0

    # -- pinned-semantics helpers (independent implementations) -----------
    def _robots_allowed(self, host: str, path: str) -> bool:
        if host not in self.robots:
            return True
        _, rules, _ = self.robots[host]
        for allow, prefix in rules:  # file order = first match wins
            if path.startswith(prefix):
                return allow
        return True

    def _crawl_delay(self, host: str) -> float:
        d = self.robots.get(host, (None,))[0]
        return d if d and d > 0 else spec.DEFAULT_CRAWL_DELAY

    def seed(self, urls: list[str] | None = None) -> None:
        for u in urls or spec.SEED_URLS:
            cu = pyurls.normalize_url(u)
            if cu is None:
                continue
            fp = pyurls.fingerprint(cu)
            self.frontier[fp] = FrontierEntry(
                cu, fp, pyurls.url_host(cu), 0, 0.0, -1, None
            )

    def run_epoch(self) -> int:
        epoch = self.epoch
        # 1. robots sweep: denied leave the frontier and are marked seen
        for fp, e in list(self.frontier.items()):
            if not self._robots_allowed(e.host, pyurls.url_path(e.url)):
                self.visited.add(fp)
                del self.frontier[fp]

        # 2. per-host politeness scheduling
        by_host: dict[str, list[FrontierEntry]] = {}
        for e in self.frontier.values():
            by_host.setdefault(e.host, []).append(e)
        scheduled: list[tuple[float, str, int, FrontierEntry]] = []
        for host, entries in by_host.items():
            entries.sort(key=lambda e: (-e.priority, e.discovered_epoch, e.fp))
            delay = self._crawl_delay(host)
            budget = max(1, int(self.epoch_seconds / delay))
            for rank, e in enumerate(entries[:budget], start=1):
                scheduled.append(((rank - 1) * delay, host, e.fp, e))

        # 3. global deterministic fetch order
        scheduled.sort(key=lambda t: (t[0], t[1], t[2]))
        new_candidates: list[FrontierEntry] = []
        for offset, host, fp, e in scheduled:
            del self.frontier[fp]
            self.visited.add(fp)
            self.seq += 1
            page = self.pages.get(e.url)
            if page is None:
                status, title, text, links, page_lang = "miss", "", "", [], None
            else:
                html, corpus_lang = page
                title, text, links, page_lang = extract_html(html)
                ok = corpus_lang == spec.ACCEPT_LANG or (
                    corpus_lang is None and page_lang == spec.ACCEPT_LANG
                )
                status = "ok" if ok else "lang"
            self.log.append(
                {
                    "epoch": epoch,
                    "seq": self.seq,
                    "url": e.url,
                    "url_fp": fp,
                    "host": host,
                    "depth": e.depth,
                    "fetch_ts": BASE_TS
                    + dt.timedelta(seconds=epoch * self.epoch_seconds + offset),
                    "status": status,
                }
            )
            if status == "ok" and e.depth < self.max_depth:
                for href in links:
                    cu = pyurls.canonicalize(e.url, href)
                    if cu is None:
                        continue
                    new_candidates.append(
                        FrontierEntry(
                            cu,
                            pyurls.fingerprint(cu),
                            pyurls.url_host(cu),
                            e.depth + 1,
                            -float(e.depth + 1),
                            epoch,
                            fp,
                        )
                    )

        # 4. dedup new links (min (depth, parent_fp, url, ...) — pinned) and
        #    merge: skip seen and already-frontier URLs
        best: dict[int, FrontierEntry] = {}
        for c in new_candidates:
            cur = best.get(c.fp)
            key = (c.depth, c.parent_fp, c.url)
            if cur is None or key < (cur.depth, cur.parent_fp, cur.url):
                best[c.fp] = c
        added = 0
        for fp, c in best.items():
            if fp in self.visited or fp in self.frontier:
                continue
            self.frontier[fp] = c
            added += 1
        self.epoch += 1
        return len(scheduled)

    def run(self, max_epochs: int) -> None:
        for _ in range(max_epochs):
            if not self.frontier:
                break
            self.run_epoch()

    def crawl_log_df(self) -> pd.DataFrame:
        return pd.DataFrame(self.log)

    def seen_set(self) -> set[int]:
        return set(self.visited)

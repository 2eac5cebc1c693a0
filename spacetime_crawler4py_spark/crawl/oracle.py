"""Single-threaded pure-Python oracle crawler — the golden generator.

A faithful reimplementation of the reference's frontier/worker/
scraper semantics (crawler/frontier.py, crawler/worker.py:20-34,
scraper.py) operating over the synthetic corpus instead of the
spacetime cache server.  Used ONLY in tests: the Spark engine must
produce the identical URL-seen set (always) and identical crawl
order (strict mode) — BASELINE.md correctness invariant.

Fetch model: HTTP never transmits fragments, so a frontier entry
``u#frag`` fetches the content of ``defrag(u)``; the page store is
keyed by canonical (normalized, defragged) URL.  Status comes from
the fetch_status table; status ≥ 400 and the cache-specific 6xx
codes yield no links (scraper.py:62-69 — 601 ≥ 400).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from spacetime_crawler4py_spark.functions.stopwords import STOPWORD_SET
from spacetime_crawler4py_spark.functions.tokenizers import (
    py_tokenize_alnum,
    py_tokenize_report,
)
from spacetime_crawler4py_spark.functions.urlnorm import (
    py_defragment,
    py_normalize,
    py_urlhash,
)
from spacetime_crawler4py_spark.functions.validity import py_is_valid
from spacetime_crawler4py_spark.operators.parse import parse_html

import re

_ICS_RE = re.compile(r".*(\.ics\.uci\.edu).*")  # scraper.py:241


@dataclass
class OracleResult:
    crawl_order: list[str] = field(default_factory=list)
    seen: dict[str, tuple[str, bool]] = field(default_factory=dict)  # hash → (url, done)
    unique_pages: set[str] = field(default_factory=set)
    longest_page: dict[str, int] = field(default_factory=dict)
    common_words: dict[str, int] = field(default_factory=dict)
    ics_subdomains: dict[str, int] = field(default_factory=dict)


class OracleCrawler:
    """Reference crawl loop over in-memory corpus dicts."""

    def __init__(
        self,
        pages: dict[str, bytes],      # canonical url → html bytes
        status: dict[str, int],       # canonical url → http status
        seeds: list[str],
    ):
        self.pages = pages
        self.status = status
        self.seeds = seeds
        self.r = OracleResult()
        self.tbd: list[str] = []

    # ---- frontier semantics (crawler/frontier.py:56-72)

    def add_url(self, url: str) -> None:
        url = py_normalize(url)
        h = py_urlhash(url)
        if h not in self.r.seen:
            self.r.seen[h] = (url, False)
            self.tbd.append(url)

    def mark_complete(self, url: str) -> None:
        h = py_urlhash(url)
        self.r.seen[h] = (url, True)

    # ---- fetch (utils/download.py via the page store)

    def fetch(self, url: str) -> tuple[int, bytes | None]:
        key = py_defragment(url)
        if key not in self.pages:
            return 404, None
        return self.status.get(key, 200), self.pages[key]

    # ---- scraper (scraper.py:23-93 + analytics)

    def scrape(self, url: str, status: int, content: bytes | None) -> list[str]:
        # extract_next_links gates (scraper.py:62-88)
        if status >= 400 or status in (204, 305) or content is None:
            return []
        p = parse_html(content)
        text = "".join(d for _, d in p.segments)
        if len(text) < 500 or len(text) > 100_000:
            return []
        links = [l for l in p.links if l is not None]
        if len(links) == 0:
            return []

        # analytics run only when links were produced (scraper.py:27-44)
        stripped = "".join(s for _, d in p.segments if (s := d.strip()))
        durl = py_defragment(url)

        self.r.unique_pages.add(durl)

        wc = len(py_tokenize_alnum(stripped))
        # intent semantics of find_longest_page (scraper.py:169-190):
        # argmax over pages (the verbatim code is dead — SURVEY A2)
        if not self.r.longest_page or wc > max(self.r.longest_page.values()):
            if durl not in self.r.longest_page:
                self.r.longest_page = {durl: wc}

        for w in py_tokenize_report(stripped):
            if w.lower() not in STOPWORD_SET:
                self.r.common_words[w] = self.r.common_words.get(w, 0) + 1

        if _ICS_RE.match(url):
            n_unique = len(set(p.anchors))
            if durl not in self.r.ics_subdomains:
                self.r.ics_subdomains[durl] = n_unique
            else:
                self.r.ics_subdomains[durl] += n_unique

        return [l for l in links if py_is_valid(l)]

    # ---- resume (crawler/frontier.py:38-48 _parse_save_file)

    def restart(self) -> None:
        """Simulate process death + reference restart: the TBD stack
        is REBUILT from the save file — every uncompleted, still-valid
        url, in save-file iteration order.

        Shelve-order model: the reference iterates
        ``self.save.values()`` (frontier.py:42); dbm backends iterate
        in hash-bucket order, which on any given run is a fixed
        permutation of insertion order.  We model it as insertion
        order (``self.r.seen`` is a Python dict) — the same contract
        the engine implements by ordering pending on ``seq``.  At any
        completion boundary this rebuild equals the live stack (pops
        always take the newest uncompleted entry and complete it), so
        a restarted crawl is byte-identical to an uninterrupted one —
        pinned by test_oracle_restart_rebuild_parity.
        """
        self.tbd = [
            url
            for url, completed in self.r.seen.values()
            if not completed and py_is_valid(url)
        ]

    # ---- worker loop (crawler/worker.py:20-34)

    def run(self, max_pages: int | None = None, seed_frontier: bool = True) -> OracleResult:
        if seed_frontier:
            for s in self.seeds:
                self.add_url(s)
        n = 0
        while self.tbd:
            url = self.tbd.pop()  # LIFO
            status, content = self.fetch(url)
            self.r.crawl_order.append(url)
            for link in self.scrape(url, status, content):
                self.add_url(link)
            self.mark_complete(url)
            n += 1
            if max_pages is not None and n >= max_pages:
                break
        return self.r


def corpus_to_dicts(corpus: dict[str, list]) -> tuple[dict, dict, list]:
    pages = {r[0]: r[2] for r in corpus["pages"]}
    status = {r[0]: r[1] for r in corpus["fetch_status"]}
    seeds = [r[0] for r in sorted(corpus["seeds"], key=lambda x: x[1])]
    return pages, status, seeds

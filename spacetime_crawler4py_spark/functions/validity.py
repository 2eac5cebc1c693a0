"""URL validity filter — reference ``is_valid`` (scraper.py:95-145).

Predicate chain (SURVEY.md §2.3):

- F1 scheme ∈ {http, https}               (scraper.py:101-102)
- F2 domain allowlist regex on netloc     (scraper.py:108-112) —
  requires a LEADING DOT, so apex ``ics.uci.edu`` fails but
  ``www.ics.uci.edu`` passes.
- F3 trap filter (scraper.py:120-125) — **replicated verbatim,
  bugs included**: it is applied to the NETLOC (not the path), and
  the three alternates are string-concatenated without '|' so the
  2nd/3rd branches form one unmatchable pattern.  In practice only
  ``^.*?(/.+?/).*?\\1.*$|^.*?/(.+?/)\\2.*$^...`` can fire, and a
  netloc contains no '/', so the filter never fires on real URLs.
  A *corrected* path-based trap rule is available behind
  ``strict_reference_parity=False``.
- F4 extension blacklist on path.lower()  (scraper.py:128-136)

Forms: ``py_is_valid`` (oracle), ``col_is_valid`` (JVM Column — the
scale path; pure regexp, codegen-friendly, pushed to the scan).
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from .urlnorm import col_netloc, col_path_params, col_scheme, _PATH_BEFORE_PARAMS_RE, _HAS_PARAMS_RE

# F2 — verbatim from scraper.py:108-112
DOMAIN_ALLOW_RE = (
    r".*((\.ics\.uci\.edu)"
    r"|(\.cs\.uci\.edu)"
    r"|(\.informatics\.uci\.edu)"
    r"|(\.stat\.uci\.edu)).*"
)

# F3 — verbatim fused (buggy) trap regex from scraper.py:120-124,
# applied to netloc.lower() exactly as the reference does.
TRAP_RE_VERBATIM = (
    r"^.*?(/.+?/).*?\1.*$|^.*?/(.+?/)\2.*$"
    r"^.*(/misc|/sites|/all|/themes|/modules|/profiles|/css|/field|/node|/theme){3}.*$"
    r"^.*calendar.*$"
)

# Corrected trap rule (strict_reference_parity=False): the three
# alternates properly OR'd and applied to the PATH, which is what the
# upstream archive-it recipe intended.
TRAP_RE_CORRECTED = (
    r"^.*?(/.+?/).*?\1.*$|^.*?/(.+?/)\2.*$"
    r"|^.*(/misc|/sites|/all|/themes|/modules|/profiles|/css|/field|/node|/theme){3}.*$"
    r"|^.*calendar.*$"
)

# F4 — verbatim from scraper.py:128-136
EXT_BLACKLIST_RE = (
    r".*\.(css|js|bmp|gif|jpe?g|ico"
    r"|png|tiff?|mid|mp2|mp3|mp4"
    r"|wav|avi|mov|mpeg|ram|m4v|mkv|ogg|ogv|pdf"
    r"|ps|eps|tex|ppt|pptx|doc|docx|xls|xlsx|names"
    r"|data|dat|exe|bz2|tar|msi|bin|7z|psd|dmg|iso"
    r"|epub|dll|cnf|tgz|sha1"
    r"|thmx|mso|arff|rtf|jar|csv"
    r"|rm|smil|wmv|swf|wma|zip|rar|gz|ppsx)$"
)

_DOMAIN_ALLOW = re.compile(DOMAIN_ALLOW_RE)
_TRAP_VERBATIM = re.compile(TRAP_RE_VERBATIM)
_TRAP_CORRECTED = re.compile(TRAP_RE_CORRECTED)
_EXT_BLACKLIST = re.compile(EXT_BLACKLIST_RE)


def py_is_valid(url: str | None, strict_reference_parity: bool = True) -> bool:
    """Pure-Python oracle of scraper.py:95-145."""
    if url is None:
        # reference would raise on urlparse(None); our engine drops
        # null hrefs before this predicate (documented divergence —
        # the reference simply never crawled a page exercising it).
        return False
    parsed = urlparse(url)
    if parsed.scheme not in ("http", "https"):
        return False
    if not _DOMAIN_ALLOW.match(parsed.netloc.lower()):
        return False
    if strict_reference_parity:
        if _TRAP_VERBATIM.match(parsed.netloc.lower()):
            return False
    else:
        if _TRAP_CORRECTED.match(parsed.path.lower()):
            return False
    return not _EXT_BLACKLIST.match(parsed.path.lower())


def col_path(url: Column) -> Column:
    """urlparse().path twin: pre-'?','#' tail minus ';params'."""
    pp = col_path_params(url)
    return F.when(
        pp.rlike(_HAS_PARAMS_RE), F.regexp_extract(pp, _PATH_BEFORE_PARAMS_RE, 1)
    ).otherwise(pp)


def col_is_valid(url: Column, strict_reference_parity: bool = True) -> Column:
    """JVM Column twin of py_is_valid — pure regexp, codegen'd.

    Java and Python regex semantics agree on every pattern used here
    (backrefs, alternation, anchors); tests/test_validity.py asserts
    equality against the oracle over the adversarial URL corpus.
    """
    scheme_ok = col_scheme(url).isin("http", "https")
    netloc_l = F.lower(col_netloc(url))
    domain_ok = netloc_l.rlike(DOMAIN_ALLOW_RE)
    path_l = F.lower(col_path(url))
    if strict_reference_parity:
        trap_hit = netloc_l.rlike(_anchor(TRAP_RE_VERBATIM))
    else:
        trap_hit = path_l.rlike(_anchor(TRAP_RE_CORRECTED))
    ext_hit = path_l.rlike(_anchor(EXT_BLACKLIST_RE))
    return url.isNotNull() & scheme_ok & domain_ok & ~trap_hit & ~ext_hit


def _anchor(pattern: str) -> str:
    """re.match anchors at the string start; rlike is find-anywhere.

    Every alternative in our patterns already begins with '^' or
    '.*' — '.*'-led alternatives match from any position identically
    under match vs search, and '^'-led ones are self-anchoring.  The
    EXT blacklist starts with '.*' and ends '$', so it is equivalent
    under find.  Returned unchanged; the indirection documents the
    equivalence argument in one place.
    """
    return pattern


@pandas_udf(BooleanType())
def pdf_is_valid(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: py_is_valid(u))


# ------------------------------------------- path-repetition traps


def col_trap_path_repetition(
    url: Column, max_repeat: int = 2, max_depth: int = 20
) -> Column:
    """Generic crawler-trap detector via PATH-REPETITION heuristics
    (north_star wording; beyond the reference's fixed keyword
    regex).  A URL is trap-suspect when its path either

    - repeats any single segment more than ``max_repeat`` times
      (``/a/b/a/c/a/`` — calendar/session loops), or
    - exceeds ``max_depth`` segments (runaway recursive links).

    Pure JVM: split + filter/size + a distinct-count via
    array_distinct — no UDF, usable as a scan-pushable filter in
    the link pipeline.
    """
    path = F.lower(col_path(url))
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    n = F.size(segs)
    n_distinct = F.size(F.array_distinct(segs))
    # max segment multiplicity > max_repeat  ⇔  some segment occurs
    # ≥ max_repeat+1 times; detect via aggregate over distinct segs
    max_mult = F.aggregate(
        F.array_distinct(segs),
        F.lit(0),
        lambda acc, s: F.greatest(
            acc, F.size(F.filter(segs, lambda x: x == s))
        ),
    )
    return (n > max_depth) | (
        (n_distinct < n) & (max_mult > max_repeat)
    )


def py_trap_path_repetition(
    url: str | None, max_repeat: int = 2, max_depth: int = 20
) -> bool:
    """Pure-Python oracle of col_trap_path_repetition."""
    if url is None:
        return False
    from urllib.parse import urlparse

    segs = [s for s in urlparse(url).path.lower().split("/") if s]
    if len(segs) > max_depth:
        return True
    from collections import Counter

    return bool(segs) and max(Counter(segs).values()) > max_repeat

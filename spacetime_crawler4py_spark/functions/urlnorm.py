"""URL normalization / hashing / defragmentation.

Reference parity targets (cited file:line are into /root/reference):

- ``normalize``     strips ALL trailing slashes (utils/__init__.py:32-35,
  ``url.rstrip("/")`` removes every trailing '/', not just one).
- ``get_urlhash``   SHA-256 of ``"{netloc}/{path}/{params}/{query}/{fragment}"``
  (utils/__init__.py:25-30).  Scheme is EXCLUDED (http/https collide);
  the fragment IS included (``#frag``-only variants are distinct
  frontier entries) — SURVEY.md §1.1.
- ``defragment``    ``urldefrag(url)[0]`` (scraper.py:151, 172, 243).

Each function exists in three forms:

1. ``py_*``      — pure-Python oracle, byte-for-byte reference semantics.
2. ``col_*``     — Spark Column expression (JVM-side, codegen'd; the
                   100-TB fast path — no Python crossing at all).
3. ``pdf_*``     — Arrow-vectorized pandas UDF wrapping the oracle
                   (the strict-parity path for exotic URLs).

The Column forms are exact for every URL the validity filter can pass
(http/https absolute URLs); tests/test_urlnorm.py asserts
col_* == py_* over the fixture corpus including adversarial cases.
"""

from __future__ import annotations

from hashlib import sha256
from urllib.parse import urldefrag, urlparse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# ---------------------------------------------------------------- oracles


def py_normalize(url: str) -> str:
    """Strip all trailing '/' (utils/__init__.py:32-35)."""
    if url.endswith("/"):
        return url.rstrip("/")
    return url


def py_urlhash(url: str) -> str:
    """sha256 hex of netloc/path/params/query/fragment (utils/__init__.py:25-30)."""
    p = urlparse(url)
    return sha256(
        f"{p.netloc}/{p.path}/{p.params}/{p.query}/{p.fragment}".encode("utf-8")
    ).hexdigest()


def py_defragment(url: str) -> str:
    """urldefrag(url)[0] (scraper.py:151)."""
    return urldefrag(url)[0]


# ------------------------------------------------------- Column fast path

# netloc = authority after '//' (scheme optional), up to '/', '?', '#'.
# urlparse only recognizes an authority when '//' is present.
_NETLOC_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.\-]*:)?//([^/?#]*)"
# path(+params) = everything after scheme: and optional //authority,
# before '#'; query split on first '?'.  Handles mailto:-style URLs
# (no authority) and scheme-less relative references like urlparse.
_AFTER_AUTH_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.\-]*:)?(?://[^/?#]*)?([^#?]*)"


def col_normalize(url: Column) -> Column:
    """JVM twin of py_normalize: regexp strip of trailing slashes."""
    return F.regexp_replace(url, "/+$", "")


def col_defragment(url: Column) -> Column:
    """JVM twin of py_defragment for URLs carrying a fragment.

    urldefrag keeps everything before the FIRST '#'.  NOTE: urldefrag
    of a fragment-less URL is the identity, as is this.
    """
    return F.regexp_replace(url, "#.*$", "")


def col_netloc(url: Column) -> Column:
    """Authority component, matching urlparse().netloc for absolute URLs."""
    return F.regexp_extract(url, _NETLOC_RE, 1)


def col_scheme(url: Column) -> Column:
    """Scheme, lowercased like urlparse (scheme is case-insensitive)."""
    return F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.\-]*):", 1))


def col_path_params(url: Column) -> Column:
    """path (incl. any ';params') — the pre-'?' pre-'#' tail."""
    return F.regexp_extract(url, _AFTER_AUTH_RE, 1)


def col_query(url: Column) -> Column:
    return F.regexp_extract(url, r"\?([^#]*)", 1)


def col_fragment(url: Column) -> Column:
    return F.regexp_extract(url, r"#(.*)$", 1)


# urlparse splits ';params' off the LAST path segment only
# (urllib.parse._splitparams).  These regexes reproduce that split.
_HAS_PARAMS_RE = r"^(?:.*/)?[^/;]*;[^/]*$"
_PARAMS_RE = r"^(?:.*/)?[^/;]*;([^/]*)$"
_PATH_BEFORE_PARAMS_RE = r"^((?:.*/)?[^/;]*);[^/]*$"


def col_urlhash(url: Column) -> Column:
    """JVM twin of py_urlhash (utils/__init__.py:25-30).

    Composes netloc/path/params/query/fragment — scheme excluded —
    and sha2-256's it, entirely JVM-side (whole-stage codegen; no
    Python crossing).  Matches urlparse component splitting including
    the ';params'-on-last-segment rule.
    """
    pp = col_path_params(url)
    has_params = pp.rlike(_HAS_PARAMS_RE)
    params = F.when(has_params, F.regexp_extract(pp, _PARAMS_RE, 1)).otherwise(
        F.lit("")
    )
    path = F.when(
        has_params, F.regexp_extract(pp, _PATH_BEFORE_PARAMS_RE, 1)
    ).otherwise(pp)
    joined = F.concat(
        col_netloc(url),
        F.lit("/"),
        path,
        F.lit("/"),
        params,
        F.lit("/"),
        col_query(url),
        F.lit("/"),
        col_fragment(url),
    )
    return F.sha2(joined, 256)


# ------------------------------------------------------ pandas-UDF parity


@pandas_udf(StringType())
def pdf_normalize(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: py_normalize(u) if u is not None else None)


@pandas_udf(StringType())
def pdf_urlhash(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: py_urlhash(u) if u is not None else None)


@pandas_udf(StringType())
def pdf_defragment(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: py_defragment(u) if u is not None else None)

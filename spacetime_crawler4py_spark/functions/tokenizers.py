"""The reference's five tokenizers (SURVEY.md §2.2 P7-P11).

Each has a pure-Python oracle (verbatim reference semantics, bugs
included) plus a Spark form — JVM Column expression where regex
semantics allow, Arrow-vectorized pandas UDF where exact parity
needs Python regex/str semantics.

- P7  alnum runs            scraper.py:176 / tokenizer2.py:8
- P8  ``\\b\\w+\\b`` lowered    tokenizer.py:8 (NB Python \\w is
      unicode; the Column twin is ASCII — pandas UDF is canonical)
- P9  report tokenizer      scraper.py:198-208 (quirky: keeps
      numerics & multi-char ALL-CAPS words whole, else splits on
      capital-letter boundaries; produces the golden top-50 where
      every word is Capitalized)
- P10 char-scan + stopword  tokenizer1.py:25-44 (replicates the
      list's missing-comma bug: 'below'+'between' concatenate to
      one bogus stopword 'belowbetween')
- P11 indexer regex         indexerV1.py:214 (digits OR lowercase
      runs OR single letters, over lowered text; emits positions)
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# ------------------------------------------------------------- oracles

_ALNUM_RE = re.compile(r"[a-zA-Z0-9]+")
_WORD_RE = re.compile(r"\b\w+\b")
_CAP_SPLIT_RE = re.compile(r"[A-Z][^A-Z]*")
_INDEXER_RE = re.compile(r"\b(\d+)|(([a-z]+)|([A-Z]))\b")


def py_tokenize_alnum(text: str) -> list[str]:
    """P7: ASCII-alphanumeric runs (scraper.py:176, tokenizer2.py:8)."""
    return _ALNUM_RE.findall(text)


def py_tokenize_words(text: str) -> list[str]:
    """P8: ``\\b\\w+\\b`` over lowered text (tokenizer.py:8)."""
    return _WORD_RE.findall(text.lower())


def py_tokenize_report(text: str) -> list[str]:
    """P9: the quirky report tokenizer, verbatim (scraper.py:198-208).

    Operates on whitespace-split words of get_text(strip=True):
    numerics and multi-char ALL-CAPS alpha words pass whole;
    everything else is split into ``[A-Z][^A-Z]*`` runs, of which
    numerics or alnum tokens of length>1 survive.
    """
    out: list[str] = []
    for w in text.split():
        if w.isnumeric() or (w.isalpha() and w.isupper() and len(w) > 1):
            out.append(w)
        else:
            for w1 in _CAP_SPLIT_RE.findall(w):
                if w1.isnumeric() or (len(w1) > 1 and w1.isalnum()):
                    out.append(w1)
    return out


# tokenizer1.py:5-23 stopword list, verbatim INCLUDING the missing
# comma between 'below' and 'between' (adjacent literals concatenate
# to 'belowbetween', so neither real word is filtered).
TOKENIZER1_STOPWORDS = [
    "a", "about", "above", "after", "again", "against", "all", "am", "an", "and",
    "any", "are", "aren't", "as", "at", "be", "because", "been", "before",
    "belowbetween", "both", "but", "by", "can't", "cannot", "couldn't", "did",
    "didn't", "do", "does", "doesn't", "doing", "down", "during", "each", "few",
    "for", "from", "further", "had", "hadn't", "has", "hasn't", "have",
    "haven't", "having", "he", "he'd", "he'll", "he's", "her", "here", "here's",
    "hers", "herself", "him", "himself", "his", "how", "how's", "i", "i'd",
    "i'll", "i'm", "i've", "if", "in", "into", "is", "isn't", "it", "it",
    "it's", "its", "itself", "let's", "me", "more", "most", "mustn't", "my",
    "myself", "no", "nor", "not", "of", "off", "on", "once", "only", "or",
    "other", "ought", "our", "ours", "ourselves", "out", "over", "own", "same",
    "shan't", "she", "she'd", "she'll", "she's", "should", "shouldn't", "so",
    "some", "such", "than", "that", "that's", "the", "their", "theirs", "them",
    "themselves", "then", "there", "there's", "these", "they", "they'd",
    "they're", "they've", "this", "those", "through", "to", "too", "under",
    "until", "up", "very", "was", "wasn't", "we", "we'd", "we'll", "we're",
    "we've", "were", "weren't", "what", "what's", "when", "when's", "where",
    "where's", "which", "while", "who", "who's", "whom", "why", "why's",
    "with", "won't", "would", "wouldn't", "you", "you'd", "you'll", "you've",
    "your", "yours", "yourself", "yourselves",
]
_T1_STOP = frozenset(TOKENIZER1_STOPWORDS)


def py_tokenize_charscan(text: str) -> list[str]:
    """P10: tokenizer1.py:25-44 — lowered alnum runs minus its list.

    The char-scan accumulates ``str.isalnum()`` characters (unicode
    semantics, like the reference's per-char ``c.isalnum()``), emits
    on any non-alnum char, and drops tokens in TOKENIZER1_STOPWORDS.
    """
    out: list[str] = []
    token = ""
    for c in text:
        c = c.lower()
        if c.isalnum():
            token += c
        else:
            if token.isalnum() and token not in _T1_STOP:
                out.append(token)
            token = ""
    if token.isalnum() and token not in _T1_STOP:
        out.append(token)
    return out


def py_tokenize_indexer(text: str) -> Iterator[tuple[str, int]]:
    """P11: indexerV1.py:214 — yields (token, char_position)."""
    for m in _INDEXER_RE.finditer(text.lower()):
        yield m.group(), m.start()


# ---------------------------------------------------- Spark Column twins


def col_tokenize_alnum(text: Column) -> Column:
    """JVM twin of P7 — exact (pattern is pure ASCII)."""
    return F.regexp_extract_all(text, F.lit("[a-zA-Z0-9]+"), 0)


def col_tokenize_words(text: Column) -> Column:
    """JVM twin of P8 — ASCII approximation of Python's unicode \\w."""
    return F.regexp_extract_all(F.lower(text), F.lit(r"\b\w+\b"), 0)


def col_wordcount_alnum(text: Column) -> Column:
    """len(re.findall('[a-zA-Z0-9]+', text)) as a JVM expression —
    the longest-page word count (scraper.py:176-177)."""
    return F.size(col_tokenize_alnum(text))


# ------------------------------------------------------ pandas-UDF twins


@pandas_udf(ArrayType(StringType()))
def pdf_tokenize_alnum(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: py_tokenize_alnum(t) if t is not None else None)


@pandas_udf(ArrayType(StringType()))
def pdf_tokenize_words(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: py_tokenize_words(t) if t is not None else None)


@pandas_udf(ArrayType(StringType()))
def pdf_tokenize_report(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: py_tokenize_report(t) if t is not None else None)


@pandas_udf(ArrayType(StringType()))
def pdf_tokenize_charscan(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: py_tokenize_charscan(t) if t is not None else None)


@pandas_udf(
    ArrayType(
        StructType(
            [
                StructField("token", StringType()),
                StructField("position", IntegerType()),
            ]
        )
    )
)
def pdf_tokenize_indexer(texts: pd.Series) -> pd.Series:
    return texts.map(
        lambda t: list(py_tokenize_indexer(t)) if t is not None else None
    )

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


# ------------------------------------------------- tokenizer2 verbatim


def py_tokenizer2_word_freq(tokens: list[str]) -> dict[str, int]:
    """Pure-Python oracle of tokenizer2.py:15-24 VERBATIM (SURVEY §7
    load-bearing bug): counts keyed by ORIGINAL case, membership
    tested on the LOWERED form.  Consequences faithfully kept:

    - a cased form repeated before its lowercase twin appears keeps
      count 1 (each occurrence re-assigns ``dict[word] = 1``);
    - once the exact-lowercase form has been inserted as a key, any
      cased occurrence increments instead;
    - a cased form whose FIRST occurrence comes after its lowercase
      twin raises KeyError in the reference — reproduced here.
    """
    freq: dict[str, int] = {}
    for word in tokens:
        lowered = word.lower()
        if lowered not in freq:
            freq[word] = 1
        else:
            freq[word] += 1  # KeyError parity when word not a key yet
    return freq


def tokenizer2_word_freq(df, text_col: str = "text", id_col: str = "doc_id"):
    """Distributed closed form of py_tokenizer2_word_freq over a
    corpus, token stream ordered by (id_col, in-doc position).

    Derivation (the dict loop is sequential; this is its algebraic
    closed form, provable by case analysis on one surface form w with
    lowered l and f_l = first position of the exact token l):
    - w == l                  → n = #occurrences (normal counting)
    - w ≠ l, l never occurs   → n = 1 (every occurrence re-assigns 1)
    - w ≠ l, first(w) < f_l   → n = 1 + #occurrences after f_l
    - w ≠ l, first(w) > f_l   → reference raises KeyError → ValueError

    Everything is JVM expressions (regexp_extract_all + posexplode +
    one join + one agg); the only driver action is the crash-parity
    check.  Returns (word, n).
    """
    from pyspark.sql import DataFrame, functions as F

    # gpos = id·2^32 + pos must stay under 2^63 (ANSI mode raises on
    # long overflow, CLAUDE.md): ids must fit in 31 bits.  Snowflake/
    # hash-derived ids need a dense re-key first — fail loudly, not
    # mid-query.  (The DuckDB oracle twin shares the same bound.)
    mx = df.agg(F.max(F.col(id_col)).alias("m")).first()["m"]
    if mx is not None and int(mx) >= (1 << 31):
        raise ValueError(
            f"tokenizer2_word_freq: max {id_col}={mx} >= 2^31 would "
            "overflow the gpos encoding; re-key ids densely first"
        )

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit("[a-zA-Z0-9]+"), 0)
        ).alias("pos", "word"),
    ).withColumn(
        # global stream position: in-doc pos is < 2^32 by construction
        "gpos", F.col("_id") * F.lit(4294967296) + F.col("pos")
    ).withColumn("lw", F.lower("word"))

    lower_first = (
        toks.where(F.col("word") == F.col("lw"))
        .groupBy(F.col("word").alias("_lkey"))
        .agg(F.min("gpos").alias("f_l"))
    )
    j = toks.join(lower_first, toks["lw"] == lower_first["_lkey"], "left")
    per_word = j.groupBy("word").agg(
        F.min("gpos").alias("first_p"),
        F.count("*").alias("n_occ"),
        F.sum(
            F.when(F.col("gpos") > F.col("f_l"), 1).otherwise(0)
        ).alias("n_after"),
        F.first("f_l").alias("f_l"),
        F.first("lw").alias("lw"),
    )
    out = per_word.select(
        "word",
        F.when(F.col("word") == F.col("lw"), F.col("n_occ"))
        .when(F.col("f_l").isNull(), F.lit(1))
        .when(F.col("first_p") < F.col("f_l"), F.lit(1) + F.col("n_after"))
        .otherwise(F.lit(None))  # crash condition marker
        .cast("long")
        .alias("n"),
    )
    n_crash = out.where(F.col("n").isNull()).count()
    if n_crash:
        raise ValueError(
            f"tokenizer2 KeyError parity: {n_crash} cased form(s) first "
            "seen after their lowercase twin (the reference crashes here)"
        )
    return out

"""Tokenizers P7-P11, Porter stemmer, simhash: oracle + Spark parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.functions import tokenizers as T
from spacetime_crawler4py_spark.functions.porter import porter_stem
from spacetime_crawler4py_spark.functions import simhash as S

SAMPLES = [
    "Hello World, this is UCI ICS 121!",
    "camelCaseWord splitTest ALLCAPS A 42 x9 under_score",
    "Research Research research RESEARCH",
    "",
    "   spaces\tand\nnewlines  ",
    "punc-tu-a.tion; semi;colons",
    "The quick brown fox jumps over the lazy dog 12345",
]


def test_p7_alnum():
    assert T.py_tokenize_alnum("a-b.c 12x") == ["a", "b", "c", "12x"]


def test_p8_words_lowered():
    assert T.py_tokenize_words("Under_score Hi!") == ["under_score", "hi"]


def test_p9_report_tokenizer_quirks():
    # numerics + multi-char ALLCAPS pass whole (scraper.py:200)
    assert T.py_tokenize_report("42 UCI") == ["42", "UCI"]
    # single letters dropped
    assert T.py_tokenize_report("A x") == []
    # camelCase split on capitals; lowercase-led words need a capital run
    assert T.py_tokenize_report("camelCaseWord") == ["Case", "Word"]
    # 'Research' survives capitalized — why the golden top-50 is Capitalized
    assert T.py_tokenize_report("Research research") == ["Research"]
    # mixed alnum fragments of len>1 pass
    assert T.py_tokenize_report("X9y") == ["X9y"]


def test_p10_charscan_stopword_bug():
    # 'below' and 'between' are NOT stopwords due to the missing-comma
    # bug (tokenizer1.py:10-11: 'below' 'between' concatenate)
    toks = T.py_tokenize_charscan("below between the and")
    assert toks == ["below", "between"]


def test_p11_indexer_positions():
    out = list(T.py_tokenize_indexer("Ab 12 xyz"))
    # lowered text: "ab 12 xyz" → 'ab'@0, '12'@3, 'xyz'@6
    assert out == [("ab", 0), ("12", 3), ("xyz", 6)]


def test_column_parity_alnum(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["text"])
    rows = df.select(
        "text", T.col_tokenize_alnum(F.col("text")).alias("toks")
    ).collect()
    for r in rows:
        assert r["toks"] == T.py_tokenize_alnum(r["text"]), r["text"]


def test_column_wordcount(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["text"])
    rows = df.select(
        "text", T.col_wordcount_alnum(F.col("text")).alias("wc")
    ).collect()
    for r in rows:
        assert r["wc"] == len(T.py_tokenize_alnum(r["text"]))


def test_pandas_udf_report_parity(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["text"])
    rows = df.select(
        "text", T.pdf_tokenize_report(F.col("text")).alias("toks")
    ).collect()
    for r in rows:
        assert r["toks"] == T.py_tokenize_report(r["text"])


def test_porter_classic_vectors():
    # published examples from Porter (1980) — single source shared
    # with the p12_porter_stems driver oracle
    from spacetime_crawler4py_spark.functions.porter import (
        PORTER_CLASSIC_VECTORS,
    )

    vectors = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
        "conformabli": "conform", "radicalli": "radic",
        "differentli": "differ", "vileli": "vile", "analogousli": "analog",
        "vietnamization": "vietnam", "predication": "predic",
        "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "homologou": "homolog", "communism": "commun",
        "activate": "activ", "angulariti": "angular", "homologous": "homolog",
        "effective": "effect", "bowdlerize": "bowdler",
        "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll",
    }
    assert vectors == PORTER_CLASSIC_VECTORS
    for word, expected in vectors.items():
        assert porter_stem(word) == expected, word


def test_simhash_properties(spark):
    a = S.py_simhash64("the quick brown fox jumps over the lazy dog " * 20)
    b = S.py_simhash64("the quick brown fox jumps over the lazy dogs " * 20)
    c = S.py_simhash64("completely different content about spark engines " * 20)
    assert S.py_hamming64(a, a) == 0
    assert S.py_hamming64(a, b) < S.py_hamming64(a, c)

    # Spark-side hamming + band extraction agree with python
    df = spark.createDataFrame([(a, b)], ["x", "y"])
    row = df.select(
        S.col_hamming64(F.col("x"), F.col("y")).alias("h"),
        *[S.col_band(F.col("x"), i).alias(f"b{i}") for i in range(4)],
    ).collect()[0]
    assert row["h"] == S.py_hamming64(a, b)
    for i in range(4):
        assert row[f"b{i}"] == (a & ((1 << 64) - 1)) >> (16 * i) & 0xFFFF

    # pandas UDF parity
    df2 = spark.createDataFrame([("hello world text sample",)], ["t"])
    got = df2.select(S.pdf_simhash64(F.col("t")).alias("s")).collect()[0]["s"]
    assert got == S.py_simhash64("hello world text sample")


# ------------------------------------------- tokenizer2 verbatim mode


def test_tokenizer2_py_oracle_quirks():
    """Pin computeWordFrequencies (tokenizer2.py:15-24) verbatim:
    cased-key / lowered-membership, including the KeyError crash."""
    f = T.py_tokenizer2_word_freq
    # normal lowercase counting
    assert f(["a", "b", "a"]) == {"a": 2, "b": 1}
    # cased form before its lowercase twin: re-assigned 1 until twin
    # appears, then increments
    assert f(["Beta", "Beta", "beta", "Beta"]) == {"Beta": 2, "beta": 1}
    # cased form whose lowercase twin never appears: stuck at 1
    assert f(["Gamma", "Gamma", "Gamma"]) == {"Gamma": 1}
    # digits are case-stable → normal counting
    assert f(["42", "42"]) == {"42": 2}
    # crash parity: cased form FIRST seen after its lowercase twin
    with pytest.raises(KeyError):
        f(["theta", "Theta"])


def test_tokenizer2_distributed_matches_py_oracle(spark):
    import re

    docs = [
        # NOTE: the stream is GLOBAL (doc_id, pos) order — a cased
        # form anywhere after its lowercase twin (even cross-doc)
        # crashes, exactly like feeding the reference one token list.
        (0, "ALPHA alpha Beta beta Beta gamma alpha ALPHA"),
        (1, "Delta Delta delta Delta 42 42 x9"),
        (2, "Epsilon Epsilon zz zz zz Beta"),
    ]
    stream = []
    for _, text in docs:
        stream += re.findall("[a-zA-Z0-9]+", text)
    expected = T.py_tokenizer2_word_freq(stream)

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["word"]: r["n"]
        for r in T.tokenizer2_word_freq(df).collect()
    }
    assert got == expected


def test_tokenizer2_distributed_crash_parity(spark):
    df = spark.createDataFrame([(0, "theta Theta")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="KeyError parity"):
        T.tokenizer2_word_freq(df)

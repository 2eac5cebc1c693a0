"""Inverted index build: postings, TF-IDF, simhash near-dup dedup.

Reference: indexerV1.py (the working indexer; indexer.py's twin has
broken copies — SURVEY.md §2.5 A7-A8).  Pipeline being reproduced
(indexDocuments, indexerV1.py:173-247):

  docs → dedup by defragged url (F10) → simhash near-dup drop (F11)
       → tag-blacklisted text sections (P14) → tokenize P11 + Porter
         stem P12, drop 1-char (P13) → postings(token, doc_id,
         position, tag) (§1.4) → group by token (A9)

The reference's SPIMI spill-every-1000-tokens + partial-file
concatenation (indexerV1.py:236-241, 289-318) is subsumed by
Spark's external hash aggregation and shuffle — no custom spill
code exists here by design (SURVEY.md §4).

TF-IDF (A6-A8): tf = 1 + log10(count per (token, doc))
(indexerV1.py:381), idf = ln(N / df) (indexerV1.py:393 — N was
hard-coded 40140 there; here it is the actual corpus count unless
``doc_count`` pins it).  NOTE the reference's df is actually the
word's TOTAL posting count (its ``relevantDocs`` accumulates every
posting, indexerV1.py:395-400); we implement the textbook intent
(distinct docs) and expose ``df_mode='postings'`` for verbatim
parity.

Simhash near-dup (J6/F11): the reference's incremental
SimhashIndex keeps the FIRST doc of each near-dup cluster
(arrival order).  Set-parallel equivalent: band-bucket self-join
(Hamming ≤ 3 ⇒ some 16-bit band equal), edges doc_i < doc_j, drop
any doc with an edge to a LOWER doc id — picks the same
min-doc-order representatives for clusters of diameter ≤ k (the
golden corpus pair); chained clusters can differ from incremental
semantics by design (documented divergence, SURVEY §7 "hard").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spacetime_crawler4py_spark.functions.porter import pdf_stem
from spacetime_crawler4py_spark.functions.simhash import (
    N_BANDS,
    col_band,
    col_hamming64,
    pdf_simhash64,
)
from spacetime_crawler4py_spark.functions.tokenizers import pdf_tokenize_indexer
from spacetime_crawler4py_spark.functions.urlnorm import col_defragment

# indexerV1.py:158-168
TAG_BLACKLIST = [
    "[document]", "noscript", "html", "meta", "head",
    "input", "script", "style", "font", "option",
]


def dedup_by_url(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """F10: first doc per defragged URL (indexerV1.py:194-199)."""
    w = Window.partitionBy("_durl").orderBy("doc_id")
    return (
        docs.withColumn("_durl", col_defragment(F.col(url_col)))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_durl")
    )


def simhash_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """F11/J6: drop docs within Hamming ≤ k of an earlier doc.

    Banded LSH self-join: 4 × 16-bit bands (pigeonhole: ≤3 diff bits
    ⇒ ≥1 equal band), equi-join on (band_idx, band_val) — bounded
    key space, no O(n²) — then exact popcount filter.
    """
    from spacetime_crawler4py_spark.operators.ids import ensure_min_partitions

    sims = ensure_min_partitions(docs).withColumn(
        "_sim", pdf_simhash64(F.col(text_col))
    )
    bands = sims.select(
        F.col(id_col).alias("_id"),
        "_sim",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band_idx"), col_band(F.col("_sim"), i).alias("band_val")
                )
                for i in range(N_BANDS)
            ])
        ).alias("b"),
    ).select("_id", "_sim", "b.band_idx", "b.band_val")

    left = bands.select(
        F.col("_id").alias("id_l"), F.col("_sim").alias("sim_l"), "band_idx", "band_val"
    )
    right = bands.select(
        F.col("_id").alias("id_r"), F.col("_sim").alias("sim_r"), "band_idx", "band_val"
    )
    dup_ids = (
        left.join(right, ["band_idx", "band_val"])
        .where(F.col("id_l") > F.col("id_r"))  # edge to an earlier doc
        .where(col_hamming64(F.col("sim_l"), F.col("sim_r")) <= k)
        .select(F.col("id_l").alias(id_col))
        .distinct()
    )
    return sims.join(dup_ids, id_col, "left_anti").drop("_sim")


def build_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """postings(token, doc_id, position, tag) via P11 + P12 + P13.

    ``tag`` (the reference's misnamed ``importantScore``,
    indexer.py:212 — the parent HTML tag) is null for plain-text
    docs; the pages-table path supplies it via parse sections.
    """
    from spacetime_crawler4py_spark.operators.ids import ensure_min_partitions

    toks = ensure_min_partitions(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(pdf_tokenize_indexer(F.col(text_col))).alias("t"),
    ).select("doc_id", F.col("t.token").alias("raw_token"), F.col("t.position").alias("position"))
    return (
        toks.withColumn("token", pdf_stem(F.col("raw_token")))
        .where(F.length("token") > 1)  # P13 (indexerV1.py:218-219)
        .select("token", "doc_id", "position", F.lit(None).cast("string").alias("tag"))
    )


def build_postings_from_sections(pages_with_sections: DataFrame) -> DataFrame:
    """Pages path: explode parse sections, apply the tag blacklist
    (P14, indexerV1.py:210-211), tokenize per text node so positions
    are per-section char offsets (indexerV1.py:214,223)."""
    secs = (
        pages_with_sections.select(
            "doc_id", F.posexplode("sections").alias("sec_idx", "sec")
        )
        .where(~F.col("sec.tag").isin(TAG_BLACKLIST))
        .select("doc_id", "sec_idx", F.col("sec.tag").alias("tag"), F.col("sec.text").alias("sec_text"))
    )
    toks = secs.select(
        "doc_id",
        "tag",
        F.explode(pdf_tokenize_indexer(F.col("sec_text"))).alias("t"),
    ).select("doc_id", "tag", F.col("t.token").alias("raw_token"), F.col("t.position").alias("position"))
    return (
        toks.withColumn("token", pdf_stem(F.col("raw_token")))
        .where(F.length("token") > 1)
        .select("token", "doc_id", "position", "tag")
    )


def grouped_index(postings: DataFrame) -> DataFrame:
    """A9: token → sorted posting list (the on-disk grouped format,
    indexerV1.py:264-278); Parquet column stats + sorting replace
    the index-of-index byte-offset side file (SURVEY §4)."""
    return postings.groupBy("token").agg(
        F.sort_array(
            F.collect_list(F.struct("doc_id", "position", "tag"))
        ).alias("postings")
    )


def term_frequency(postings: DataFrame) -> DataFrame:
    """A6: tf = 1 + log10(n occurrences in doc) (indexerV1.py:381)."""
    return (
        postings.groupBy("token", "doc_id")
        .agg(F.count("*").alias("n"))
        .withColumn("tf", F.lit(1.0) + F.log10(F.col("n")))
    )


def doc_frequency(
    postings: DataFrame, doc_count: int, df_mode: str = "docs"
) -> DataFrame:
    """A7: idf = ln(doc_count / df) (indexerV1.py:390-408).

    df_mode='docs' (intent): distinct docs containing the token.
    df_mode='postings' (verbatim quirk): total posting count.
    """
    if df_mode == "docs":
        df = postings.groupBy("token").agg(
            F.countDistinct("doc_id").alias("df")
        )
    else:
        df = postings.groupBy("token").agg(F.count("*").alias("df"))
    return df.withColumn("idf", F.log(F.lit(float(doc_count)) / F.col("df")))


def tfidf(postings: DataFrame, doc_count: int, df_mode: str = "docs") -> DataFrame:
    """A8: score = tf * idf per (token, doc) (indexerV1.py:410-423)."""
    tf = term_frequency(postings)
    idf = doc_frequency(postings, doc_count, df_mode)
    return tf.join(idf, "token").select(
        "token", "doc_id", (F.col("tf") * F.col("idf")).alias("tfidf")
    )


def bm25(
    postings: DataFrame,
    doc_count: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 (Robertson-Spärck Jones; engine extension beyond
    the reference's tf-idf): per (token, doc)

        idf = ln((N - df + 0.5) / (df + 0.5) + 1)
        score = idf * n*(k1+1) / (n + k1*(1 - b + b*len_d/avgdl))

    Same shuffle shape as tfidf (two aggs + one equi-join on token)
    plus one doc-length agg joined broadcast-style; plugs into
    search() anywhere tfidf does (rename score col to 'tfidf')."""
    n_td = postings.groupBy("token", "doc_id").agg(F.count("*").alias("n"))
    dlen = postings.groupBy("doc_id").agg(F.count("*").alias("len_d"))
    avgdl = float(
        dlen.agg(F.avg("len_d").alias("a")).collect()[0]["a"] or 1.0
    )
    df = postings.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    idf = df.withColumn(
        "idf",
        F.log(
            (F.lit(float(doc_count)) - F.col("df") + 0.5)
            / (F.col("df") + 0.5)
            + 1.0
        ),
    )
    return (
        n_td.join(dlen, "doc_id")
        .join(idf, "token")
        .select(
            "token",
            "doc_id",
            (
                F.col("idf")
                * (F.col("n") * (k1 + 1.0))
                / (
                    F.col("n")
                    + F.lit(k1)
                    * (1.0 - b + F.lit(b) * F.col("len_d") / F.lit(avgdl))
                )
            ).alias("bm25"),
        )
    )

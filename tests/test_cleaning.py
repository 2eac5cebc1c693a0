"""operators/cleaning.py: C4 line dedup, PII redaction, unigram-LM
scoring, duplicate-span coverage (engine extensions; semantics pinned
against hand-computed expectations and pure-Python twins)."""

import math

from pyspark.sql import functions as F

from spacetime_crawler4py_spark.operators.cleaning import (
    dup_span_coverage,
    line_dedup,
    redact_pii,
    unigram_lm,
    unigram_logprob,
)


def test_line_dedup_first_occurrence_and_reassembly(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta\nshared line\ngamma"),
            (2, "shared line\ndelta"),  # loses 'shared line' to doc 1
            (3, "shared line"),  # all lines duplicated -> empty text
            (4, ""),  # no lines at all
            (5, None),  # null text == empty
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in line_dedup(df).collect()
    }
    assert out[1]["text"] == "alpha beta\nshared line\ngamma"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 3)
    assert out[2]["text"] == "delta"
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (2, 1)
    assert out[3]["text"] == ""
    assert (out[3]["n_lines"], out[3]["n_kept"]) == (1, 0)
    assert out[4]["text"] == ""
    assert (out[4]["n_lines"], out[4]["n_kept"]) == (0, 0)
    assert (out[5]["n_lines"], out[5]["n_kept"]) == (0, 0)
    # keep_empty_docs=False drops the fully-deduplicated doc AND the
    # empty input doc
    kept_ids = {
        r["doc_id"]
        for r in line_dedup(df, keep_empty_docs=False).collect()
    }
    assert kept_ids == {1, 2}


def test_line_dedup_within_doc_duplicates(spark):
    # a line repeated INSIDE one doc keeps only its first position
    df = spark.createDataFrame(
        [(7, "x y\nmid\nx y\nend")], "doc_id int, text string"
    )
    r = line_dedup(df).collect()[0]
    assert r["text"] == "x y\nmid\nend"
    assert (r["n_lines"], r["n_kept"]) == (4, 3)


def test_redact_pii_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@sub.example.org now"),
            (2, "server at 192.168.001.5 port"),
            (3, "call (555) 123-4567 or 555 123-4567"),
            (4, "clean text, no pii here"),
            (5, "a@b.io and 10.0.0.1"),
            (6, None),  # null text -> empty, 0 redactions
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["text"] == "mail <EMAIL> now"
    assert out[1]["n_redactions"] == 1
    assert out[2]["text"] == "server at <IP> port"
    assert out[3]["text"] == "call <PHONE> or <PHONE>"
    assert out[3]["n_redactions"] == 2
    assert out[4]["text"] == "clean text, no pii here"
    assert out[4]["n_redactions"] == 0
    assert out[5]["text"] == "<EMAIL> and <IP>"
    assert out[5]["n_redactions"] == 2
    assert out[6]["text"] == "" and out[6]["n_redactions"] == 0


def test_unigram_logprob_matches_python(spark):
    rows = [(1, "a a b"), (2, "b c"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    # corpus counts: a=2, b=2, c=1, total=5
    cnt = {"a": 2, "b": 2, "c": 1}
    total = 5.0

    def xent(words):
        return -sum(math.log(cnt[w] / total) for w in words) / len(words)

    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert set(out) == {1, 2}  # empty doc has no score
    assert abs(out[1]["xent"] - xent(["a", "a", "b"])) < 1e-12
    assert out[1]["n_tokens"] == 3
    assert abs(out[2]["xent"] - xent(["b", "c"])) < 1e-12
    # precomputed-LM path reuses one LM across scoring runs
    lm = unigram_lm(df).cache()
    out2 = {r["doc_id"]: r for r in unigram_logprob(df, lm=lm).collect()}
    assert out2[1]["xent"] == out[1]["xent"]
    lm.unpersist()


def test_dup_span_coverage(spark):
    shared = "one two three four five"  # the only cross-doc 5-gram
    df = spark.createDataFrame(
        [
            (1, f"intro {shared} tail words here"),
            (2, f"{shared} something else entirely okay"),
            (3, "totally unrelated text with no overlap at all"),
            (4, "tiny"),
            (5, None),  # null text -> 0 tokens, 0 coverage
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in dup_span_coverage(df, n=5).collect()}
    assert (out[5]["n_tokens"], out[5]["n_dup_tokens"]) == (0, 0)
    # doc 1: 9 tokens, positions 1..5 covered -> 5/9
    assert (out[1]["n_tokens"], out[1]["n_dup_tokens"]) == (9, 5)
    assert abs(out[1]["dup_span_frac"] - 5 / 9) < 1e-12
    # doc 2: 9 tokens, positions 0..4 covered
    assert (out[2]["n_tokens"], out[2]["n_dup_tokens"]) == (9, 5)
    assert out[3]["n_dup_tokens"] == 0
    assert out[4]["n_dup_tokens"] == 0 and out[4]["dup_span_frac"] == 0.0


def test_dup_span_overlapping_spans_count_once(spark):
    # two docs share SIX consecutive words -> two overlapping 5-grams
    # covering 6 distinct positions, not 10
    shared = "p q r s t u"
    df = spark.createDataFrame(
        [(1, f"{shared} filler1 filler2"), (2, f"pre {shared}")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in dup_span_coverage(df, n=5).collect()}
    assert out[1]["n_dup_tokens"] == 6
    assert out[2]["n_dup_tokens"] == 6


def test_c4_line_clean_rules(spark):
    """Each C4 line rule bites independently (terminal punct, ≥3
    words, no 'javascript'); page gates flag lorem-ipsum and curly
    braces; null/empty degrade to 0 kept lines with page_ok."""
    from spacetime_crawler4py_spark.operators.cleaning import c4_line_clean

    docs = [
        (0, 'Good full sentence here.\nshort.\nNo terminal punct line\n'
            'Another fine sentence!\nEnable JavaScript to view.\n'
            'Quoted line is kept too."'),
        (1, "lorem ipsum dolor sit amet.\nA perfectly good line."),
        (2, "var x = { a: 1 };\nGood line stays here."),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_line_clean(df).collect()}
    assert got[0]["n_lines"] == 6 and got[0]["n_kept"] == 3
    assert got[0]["text"] == (
        'Good full sentence here.\nAnother fine sentence!\n'
        'Quoted line is kept too."'
    )
    assert got[0]["page_ok"]
    assert not got[1]["page_ok"] and got[1]["n_kept"] == 2
    assert not got[2]["page_ok"] and got[2]["n_kept"] == 1
    for i in (3, 4):
        assert got[i]["n_kept"] == 0 and got[i]["page_ok"]
        assert got[i]["text"] == ""


def test_dup_span_remove_keep_first(spark):
    """dup_span_remove == a pure-Python keep-first oracle: every
    occurrence of a cross-doc 5-gram except its global-first
    (min (doc, pos)) loses its offsets; docs reassemble from the
    surviving tokens; overlapping spans merge; null/empty/full-dup
    docs degrade cleanly."""
    from spacetime_crawler4py_spark.operators.cleaning import dup_span_remove

    docs = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "X alpha beta gamma delta epsilon Y Z W V"),
        (2, "unique words only here nothing shared at all okay"),
        (3, None),
        (4, ""),
        (5, "alpha beta gamma delta epsilon zeta eta theta"),  # full dup of 0
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed_tokens"], r["text"])
        for r in dup_span_remove(df, n=5).collect()
    }

    def toks(t):
        return [w for w in (t or "").lower().split() if w]

    import collections

    bykey = collections.defaultdict(list)
    for i, t in docs:
        ws = toks(t)
        for p in range(len(ws) - 4):
            bykey[" ".join(ws[p : p + 5])].append((i, p))
    drop = collections.defaultdict(set)
    for lst in bykey.values():
        if len({i for i, _ in lst}) >= 2:
            first = min(lst)
            for ip in lst:
                if ip != first:
                    drop[ip[0]].update(range(ip[1], ip[1] + 5))
    for i, t in docs:
        ws = toks(t)
        kept = [w for j, w in enumerate(ws) if j not in drop[i]]
        assert got[i] == (len(ws), len(drop[i]), " ".join(kept)), i
    # doc 0 holds every first occurrence: untouched
    assert got[0][1] == 0 and got[0][2] == docs[0][1]
    # doc 5 is a byte-identical dup of 0: fully removed
    assert got[5] == (8, 8, "")


def test_pack_sequences_tiles_each_shard(spark):
    """Within every shard the docs tile the token stream
    contiguously from 0, and the sequence spans are the floor-div
    of the tiled offsets; empty docs are dropped."""
    from spacetime_crawler4py_spark.operators.packing import (
        pack_sequences,
        packing_stats,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    L = 128
    rows = pack_sequences(d, seq_len=L, n_shards=8).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 8
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r["tok_start"])
        pos = 0
        for r in docs:
            assert r["tok_start"] == pos
            assert r["first_seq"] == pos // L
            assert r["last_seq"] == (pos + r["n_tokens"] - 1) // L
            pos += r["n_tokens"]
    st = {r["shard"]: r for r in packing_stats(d, seq_len=L, n_shards=8).collect()}
    for shard, docs in by_shard.items():
        tot = sum(r["n_tokens"] for r in docs)
        assert st[shard]["n_tokens"] == tot
        assert st[shard]["n_seqs"] == -(-tot // L)

    tiny = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "   "), (4, None)],
        ["doc_id", "text"],
    )
    got = pack_sequences(tiny, seq_len=4, n_shards=2).collect()
    assert [r["doc_id"] for r in got] == [1]
    assert got[0]["tok_start"] == 0 and got[0]["n_tokens"] == 3


def test_perplexity_buckets_balanced_and_ordered(spark):
    """Within every (lang, shard) partition the three CCNet buckets
    differ in size by at most 1 and are ordered by xent."""
    from spacetime_crawler4py_spark.operators.cleaning import (
        perplexity_buckets,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = perplexity_buckets(d, n_buckets=3, n_shards=4).collect()
    assert {r["label"] for r in rows} == {"head", "middle", "tail"}
    parts = {}
    for r in rows:
        parts.setdefault((r["lang"], r["shard"]), []).append(r)
    for key, rs in parts.items():
        sizes = [sum(1 for r in rs if r["bucket"] == b) for b in (1, 2, 3)]
        assert max(sizes) - min(sizes) <= 1, (key, sizes)
        assert sizes[0] >= sizes[1] >= sizes[2], (key, sizes)  # ntile order
        for lo, hi in ((1, 2), (2, 3)):
            a = [r["xent"] for r in rs if r["bucket"] == lo]
            b = [r["xent"] for r in rs if r["bucket"] == hi]
            if a and b:
                assert max(a) <= min(b), key

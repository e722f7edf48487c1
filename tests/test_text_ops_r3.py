"""Round-3 text operators: unigram surprisal + cross-document span dedup."""

import hashlib
import math

from crawlspark.datapipe.text import span_dedup, unigram_surprisal


def test_unigram_surprisal_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a a"), (2, "a b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in unigram_surprisal(df).collect()}
    # counts: a=4, b=1, c=1, N=6
    s_a = -math.log(4 / 6)
    s_rare = -math.log(1 / 6)
    assert out[1].n_tokens == 3
    assert abs(out[1].avg_surprisal - round(s_a, 6)) < 1e-6
    assert abs(out[2].avg_surprisal - round((s_a + 2 * s_rare) / 3, 6)) < 1e-6
    # the quality-filter property: the common-token doc scores lower
    assert out[1].avg_surprisal < out[2].avg_surprisal


def test_span_dedup_removes_cross_doc_boilerplate(spark):
    # three docs share an identical 3-token "cookie banner"; tails unique
    banner = "accept all cookies"
    rows = [(i, f"{banner} unique tail {i}") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in span_dedup(df, window=3, max_df=1).collect()}
    for i in range(3):
        assert out[i].n_spans == 2
        assert out[i].n_removed == 1  # the shared banner chunk
        want = hashlib.md5(f"unique tail {i}".encode()).hexdigest()
        assert out[i].clean_md5 == want


def test_span_dedup_keeps_within_doc_repeats(spark):
    # a chunk repeated WITHIN one doc is not boilerplate (df counts distinct
    # docs); a doc fully made of removed spans hashes to the empty string
    df = spark.createDataFrame(
        [(1, "x y z x y z"), (2, "shared spam block"), (3, "shared spam block")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in span_dedup(df, window=3, max_df=1).collect()}
    assert out[1].n_removed == 0  # internal repeat survives
    assert out[2].n_removed == 1 and out[3].n_removed == 1
    assert out[2].clean_md5 == hashlib.md5(b"").hexdigest()

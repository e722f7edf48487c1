"""Oracle pins for contract queries RETIRED from __spark_entry__.queries()
in round 4 (the driver verifies only the first 50 registry entries, so
redundant/subsumed queries moved here — same Spark plan, same DuckDB twin,
same strict rows+columns+values compare as tests/test_entry_contract.py).

Retired set and why each is redundant in the driver window:
  * minhash_signatures   — subsumed by minhash_lsh_candidates (same sigs)
  * simhash_16bit        — subsumed by simhash_band_pairs (same agg, n=48)
  * cosine_topk_bruteforce — subsumed by ivf_topk_probe's exact re-rank
  * token_count / bpe_token_count / punct_quality / lang_id_heuristic —
    consolidated into the text_features contract query
  * charshingle_sketch   — absorbed into the doc_fingerprint contract query
  * semi_anti_join_orders — generic join-coverage demo, plan pinned in
    test_plan_shapes.py
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as E
from __spark_entry__ import (
    STOP_DE,
    STOP_EN,
    STOP_FR,
    _hash60,
    _hash60_sql,
    _stop_hits,
    _stop_hits_sql,
    _t,
    _tokens,
    _TOKENS_SQL,
)
from tests.test_entry_contract import TABLES, _duck_rows, _spark_rows

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


# ---------------------------------------------------------------------------
# retired Spark queries (verbatim plans from the pre-round-4 registry)
# ---------------------------------------------------------------------------


def q_minhash_signatures(spark, sf):
    from crawlspark.datapipe.dedup import minhash_signatures as mh
    from crawlspark.datapipe.dedup import shingles

    d = _t(spark, sf, "documents")
    return mh(shingles(d, "text", "doc_id", 3), k=8).select("doc_id", "perm", "minh")


def q_simhash_16bit(spark, sf):
    from crawlspark.datapipe.dedup import simhash_agg

    return simhash_agg(_t(spark, sf, "documents"), n_bits=16).select("doc_id", "simhash")


def q_cosine_topk_bruteforce(spark, sf):
    from crawlspark.datapipe.similarity import cosine_topk

    e = _t(spark, sf, "embeddings").withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )
    return cosine_topk(e, e.filter(F.col("vec_id") < 8), k=5)


def q_token_count(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"))


def q_bpe_token_count(spark, sf):
    d = _t(spark, sf, "documents")
    pieces = F.filter(F.split(F.col("text"), r"[^A-Za-z0-9]+"), lambda t: t != "")
    subwords = F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long"),
    )
    return d.select("doc_id", subwords.alias("n_subwords"))


def q_punct_quality(spark, sf):
    d = _t(spark, sf, "documents")
    t = F.col("text")
    n = F.length(t)
    stripped = F.length(F.regexp_replace(t, r"[.,!?;:'\"()\-]", ""))
    pr = F.when(n > 0, (n - stripped).cast("double") / n).otherwise(F.lit(0.0))
    n_tok = F.size(_tokens(t))
    stop_r = _stop_hits(t, STOP_EN).cast("double") / F.greatest(n_tok, F.lit(1))
    score = (
        F.when((n_tok >= 5), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.least(stop_r * 4.0, F.lit(0.4))
        + F.greatest(F.lit(0.0), F.lit(0.2) - pr)
    )
    return d.select(
        "doc_id",
        F.round(pr, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality"),
    )


def q_lang_id_heuristic(spark, sf):
    d = _t(spark, sf, "documents")
    t = F.col("text")
    en, de, fr = (_stop_hits(t, s) for s in (STOP_EN, STOP_DE, STOP_FR))
    pred = (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    return d.select("doc_id", "lang", pred.alias("lang_pred"))


def q_charshingle_sketch(spark, sf):
    from crawlspark.datapipe.text import charshingle_sketch as sk

    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.array_join(
            F.transform(sk(F.col("text")), lambda x: x.cast("string")), ","
        ).alias("sketch"),
    )


def q_semi_anti_join_orders(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 100000)
    with_o = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", F.lit("has_big_order").alias("cls")
    )
    without = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", F.lit("no_big_order").alias("cls")
    )
    return with_o.unionByName(without)


# ---------------------------------------------------------------------------
# retired DuckDB twins (verbatim from the pre-round-4 oracle_sql())
# ---------------------------------------------------------------------------

_SHINGLES_SQL = f"""
    WITH toks AS (SELECT doc_id, {_TOKENS_SQL} AS l FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(range(0, greatest(len(l) - 2, 1)),
                      i -> array_to_string(l[i+1:i+3], ' '))) AS shingle
        FROM toks)
      WHERE length(shingle) > 0)
"""

RETIRED = {
    "minhash_signatures": (
        q_minhash_signatures,
        f"""
        {_SHINGLES_SQL}
        SELECT doc_id, CAST(perm AS INT) AS perm,
               min({_hash60_sql("perm || '|' || shingle")}) AS minh
        FROM sh, (SELECT unnest(range(0, 8)) AS perm)
        GROUP BY doc_id, perm
        """,
    ),
    "simhash_16bit": (
        q_simhash_16bit,
        f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents),
        h AS (SELECT doc_id, {_hash60_sql("tok")} AS hv FROM toks),
        bits AS (
          SELECT doc_id, bit,
                 sum(CASE WHEN (hv >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
          FROM h, (SELECT unnest(range(0, 16)) AS bit)
          GROUP BY doc_id, bit)
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id
        """,
    ),
    "cosine_topk_bruteforce": (
        q_cosine_topk_bruteforce,
        """
        WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                   FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
                 list_dot_product(q.e, c.e)
                   / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS cos
          FROM v q, v c
          WHERE q.vec_id < 8 AND q.vec_id != c.vec_id
            AND list_dot_product(c.e, c.e) > 0
            AND list_dot_product(q.e, q.e) > 0)
        SELECT query_id, nbr_id, round(cos, 6) AS cosine, CAST(rk AS INT) AS rk FROM (
          SELECT query_id, nbr_id, cos,
                 ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id ASC) AS rk
          FROM scored)
        WHERE rk <= 5
        """,
    ),
    "token_count": (
        q_token_count,
        f"""
        SELECT doc_id, CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens FROM documents
        """,
    ),
    "bpe_token_count": (
        q_bpe_token_count,
        """
        WITH p AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '[^A-Za-z0-9]+'), t -> t != '') AS pieces
          FROM documents)
        SELECT doc_id,
               CAST(list_sum(list_transform(pieces, w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT)
                 AS n_subwords
        FROM p
        """,
    ),
    "punct_quality": (
        q_punct_quality,
        f"""
        WITH b AS (
          SELECT doc_id,
                 length(text) AS n,
                 length(text) - length(regexp_replace(text, '[.,!?;:''"()\\-]', '', 'g')) AS np,
                 len({_TOKENS_SQL}) AS n_tok,
                 {_stop_hits_sql(STOP_EN)} AS hits
          FROM documents)
        SELECT doc_id,
               round(CASE WHEN n > 0 THEN CAST(np AS DOUBLE) / n ELSE 0.0 END, 6) AS punct_ratio,
               round(
                 (CASE WHEN n_tok >= 5 THEN 0.4 ELSE 0.0 END)
                 + least(CAST(hits AS DOUBLE) / greatest(n_tok, 1) * 4.0, 0.4)
                 + greatest(0.0, 0.2 - (CASE WHEN n > 0 THEN CAST(np AS DOUBLE) / n ELSE 0.0 END)), 6) AS quality
        FROM b
        """,
    ),
    "lang_id_heuristic": (
        q_lang_id_heuristic,
        f"""
        WITH h AS (
          SELECT doc_id, lang,
                 {_stop_hits_sql(STOP_EN)} AS en,
                 {_stop_hits_sql(STOP_DE)} AS de,
                 {_stop_hits_sql(STOP_FR)} AS fr
          FROM documents)
        SELECT doc_id, lang,
               CASE WHEN en >= de AND en >= fr AND en > 0 THEN 'en'
                    WHEN de >= fr AND de > 0 THEN 'de'
                    WHEN fr > 0 THEN 'fr' ELSE 'und' END AS lang_pred
        FROM h
        """,
    ),
    "charshingle_sketch": (
        q_charshingle_sketch,
        f"""
        WITH n AS (
          SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm
          FROM documents)
        SELECT doc_id,
               array_to_string(
                 list_sort(list_distinct(
                   list_transform(range(1, greatest(length(norm) - 7, 0) + 1),
                                  i -> {_hash60_sql("substr(norm, CAST(i AS INT), 8)")})
                 ))[1:8], ',') AS sketch
        FROM n
        """,
    ),
    "semi_anti_join_orders": (
        q_semi_anti_join_orders,
        """
        SELECT c_custkey, 'has_big_order' AS cls FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        UNION ALL
        SELECT c_custkey, 'no_big_order' AS cls FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        """,
    ),
}


@pytest.mark.parametrize("name", sorted(RETIRED))
def test_retired_query_matches_oracle(spark, ddb, name):
    fn, sql = RETIRED[name]
    got, gcols = _spark_rows(fn(spark, SF))
    want, wcols = _duck_rows(ddb, sql)
    assert gcols == wcols, f"{name}: column names differ"
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    if got != want:
        diff_g = [r for r in got if r not in want][:5]
        diff_w = [r for r in want if r not in got][:5]
        raise AssertionError(f"{name}: values differ\n spark-only={diff_g}\n duck-only={diff_w}")


def test_retired_names_left_the_registry():
    live = set(E.queries())
    assert not (set(RETIRED) & live), "retired queries must not re-enter queries()"


def test_semi_anti_joins_stay_semi_anti(spark):
    # plan pin for the retired join-coverage demo (moved from test_plan_shapes)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        q_semi_anti_join_orders(spark, SF).explain("formatted")
    p = buf.getvalue()
    assert "LeftSemi" in p
    assert "LeftAnti" in p

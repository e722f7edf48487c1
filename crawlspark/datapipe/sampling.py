"""Deterministic sampling / domain-mixing operators for corpus curation.

Pretraining pipelines need REPRODUCIBLE sampling: `df.sample()` depends on
partitioning and seed plumbing, so these operators derive keep/drop from a
content hash instead — the same row is kept on any cluster, any partition
layout, any run. All pure Catalyst; one narrow shuffle only where a
per-group rank is genuinely required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawlspark.datapipe.text import hash60


def stratified_sample(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    rates: dict[str, int] | None = None,
    default_pct: int = 10,
    salt: str = "s1",
) -> DataFrame:
    """Keep each row iff hash60(salt|id) % 100 < pct(stratum) — per-stratum
    percentage sampling with zero shuffle (the decision is a row-local
    expression; rates ship as a CASE chain, i.e. broadcast-free broadcast).
    Deterministic across runs/partitionings; change `salt` to resample."""
    pct = F.lit(default_pct)
    for stratum, p in (rates or {}).items():
        pct = F.when(F.col(strata_col) == stratum, F.lit(p)).otherwise(pct)
    bucket = F.pmod(hash60(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))), F.lit(100))
    return df.withColumn("_bucket", bucket).filter(F.col("_bucket") < pct).drop("_bucket")


def domain_mix_cap(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 100,
    salt: str = "m1",
) -> DataFrame:
    """At most `cap` rows per stratum, chosen by deterministic hash order
    (a reproducible uniform draw, not head-of-file order). One shuffle on
    the stratum key; per-stratum partitions are bounded by the cap after
    the rank filter, and a skewed stratum only costs its own sort — for
    hot-domain skew at 10^10 rows, pre-filter with stratified_sample to an
    overdraw (e.g. 4× cap/total) first, then rank the survivors."""
    h = hash60(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )

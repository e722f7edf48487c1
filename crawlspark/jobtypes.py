"""Per-job-type Process dispatch (P-2) — THE user-facing API of the reference.

A scrapemate user subclasses `Job` per page kind and implements
`Process(ctx, resp) (data, nextJobs, err)` (job.go:46-47); e.g. the
books-to-scrape example's BookCollectJob extracts product links and emits
BookDetailJob children with Priority=1 plus a next-page BookCollectJob,
returning nil data, while BookDetailJob parses the product and returns it
with no children (examples/books-to-scrape-simple/bookstoscrape/
collect_job.go:19-72, detail_job.go:15-30).

The Spark-native translation is declarative: a `JobTypeSpec` per type states
(a) whether a completed job of this type emits a result (Process data ≠ nil)
and (b) which links become which child types with which overrides. The
engine compiles the registered specs into pure Catalyst CASE chains — the
dispatch costs zero joins and zero Python in the hot path; an unmatched link
is simply never turned into a job (exactly like user Process code that
ignores it).

DEFAULT_JOB_TYPE behaves like round 1: one type, every link becomes a child
of the same type inheriting the parent's config, results gated only by
use_in_results — so worlds without specs are bit-for-bit unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import functions as F

DEFAULT_JOB_TYPE = "page"


@dataclass(frozen=True)
class ChildRule:
    """First matching rule (by list order) claims a link; None fields inherit
    the parent's value — mirroring child-job construction in user Process
    code (collect_job.go:33-48: Priority=1, MaxRetries=3, Timeout=10s)."""

    path_prefix: str            # matched against the canonical URL's path ("" = any)
    child_type: str
    priority: int | None = None
    max_retries: int | None = None
    timeout_us: int | None = None
    use_in_results: bool | None = None


@dataclass(frozen=True)
class JobTypeSpec:
    name: str
    # Process returned data ≠ nil? (collect jobs return nil → no result row)
    emit_result: bool = True
    child_rules: tuple[ChildRule, ...] = field(default_factory=tuple)
    # P-3 via CSS selectors (round 4): when set AND the engine runs with
    # extract_links_from_body, this type's child links are the concatenation
    # of these selectors' matches over the response body (document order per
    # selector, selector order across them) instead of the generic
    # every-anchor regexp — the declarative twin of goquery harvesting in
    # user Process code (collect_job.go:28-32 `article.product_pod
    # >div.image_container>a` + :52 `li.next>a`). Selector syntax:
    # crawlspark.selectors (tag/.class paths, ' '/'>' combinators,
    # ::attr(name)/::text extraction).
    link_selectors: tuple[str, ...] = field(default_factory=tuple)


def default_specs() -> dict[str, JobTypeSpec]:
    return {
        DEFAULT_JOB_TYPE: JobTypeSpec(
            name=DEFAULT_JOB_TYPE,
            emit_result=True,
            child_rules=(ChildRule("", DEFAULT_JOB_TYPE),),
        )
    }


def emit_result_expr(specs: dict[str, JobTypeSpec], job_type_col):
    """Boolean: does this job's type emit results? Unknown types default true
    (the reference's default Process returns its data)."""
    expr = None
    for name, spec in specs.items():
        cond = job_type_col == name
        expr = (
            F.when(cond, F.lit(spec.emit_result))
            if expr is None
            else expr.when(cond, F.lit(spec.emit_result))
        )
    return F.lit(True) if expr is None else expr.otherwise(F.lit(True))


def _rule_chain(rules, path_col, pick):
    """CASE over a type's rules in declaration order; None when no rule matches."""
    expr = None
    for r in rules:
        cond = F.startswith(path_col, F.lit(r.path_prefix)) if r.path_prefix else F.lit(True)
        val = pick(r)
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return F.lit(None) if expr is None else expr.otherwise(F.lit(None))


def child_column_exprs(specs: dict[str, JobTypeSpec], job_type_col, path_col):
    """(child_type, child_priority, child_max_retries, child_timeout_us,
    child_use_in_results) expressions for an exploded link row.

    child_type is NULL when the parent's type claims no rule for this link —
    the engine drops those candidates before dedup/admission (a link user
    Process code ignores never becomes a job, is never 'seen')."""

    def per_type(pick):
        expr = None
        for name, spec in specs.items():
            chain = _rule_chain(spec.child_rules, path_col, pick)
            cond = job_type_col == name
            expr = F.when(cond, chain) if expr is None else expr.when(cond, chain)
        # unknown parent type: behave like the default spec (inherit, any link)
        dflt = _rule_chain(default_specs()[DEFAULT_JOB_TYPE].child_rules, path_col, pick)
        return dflt if expr is None else expr.otherwise(dflt)

    return {
        "child_type": per_type(lambda r: F.lit(r.child_type)),
        "child_priority": per_type(
            lambda r: F.lit(r.priority).cast("int") if r.priority is not None else F.lit(None).cast("int")
        ),
        "child_max_retries": per_type(
            lambda r: F.lit(r.max_retries).cast("int") if r.max_retries is not None else F.lit(None).cast("int")
        ),
        "child_timeout_us": per_type(
            lambda r: F.lit(r.timeout_us).cast("long") if r.timeout_us is not None else F.lit(None).cast("long")
        ),
        "child_use_in_results": per_type(
            lambda r: F.lit(r.use_in_results) if r.use_in_results is not None else F.lit(None).cast("boolean")
        ),
    }

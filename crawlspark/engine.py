"""The BSP wave loop — the engine's driver program (SURVEY.md §3.4).

One wave (superstep) replaces the reference's per-job pipeline
(DoJob, scrapemate.go:311-396). Stages are DataFrame transformations;
boundaries are shuffles; the only driver-side state is small counters.

    1. ELIGIBLE  pending ∧ not_before ≤ wave_ts            (scan + filter)
    2. POLITE    per-host top-k (salted two-phase window)   (politeness.py)
    3. WAVE      global top-budget by (priority, seq)       (frontier.py)
    4. FETCH     equi-join vs resolved pages + attempt calc (fetch.py)
    5. OUTCOME   retry/backoff/policy dispatch              (fetch.py)
    6. RESULTS   image join + validation UDF → results      (image.py)
    7. CHILDREN  posexplode links → canon → dedup → admit   (urlnorm/seen.py)
    8. COMMIT    atomically advance the manifest            (checkpoint.py)

Termination: pending empty (the batch analog of the reference's inactivity
exit, scrapemate.go:247-276), a StopScraping failure (cancelFn analog), or
the max-wave guard.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawlspark import constants as C
from crawlspark import frontier, jobtypes, politeness, urlnorm
from crawlspark import fetch as FT
from crawlspark import seen as SEEN
from crawlspark.checkpoint import TableIO
from crawlspark.image import validate_image_udf

PENDING_COLS = [
    "job_id", "parent_id", "url_canon", "url_hash", "cache_key", "host",
    "host_bucket", "method", "body", "headers",  # POST round-trip (job.go:63-104)
    "priority", "seq", "max_retries", "retry_policy",
    "max_retry_delay_us", "timeout_us",  # F-17 per-job timeout (job.go:259-262)
    "retry_count", "not_before_us", "wave",
    "accept_lo", "accept_hi",  # per-job DoCheckResponse range (F-13)
    "use_in_results",  # O-1 result-emit gate (job.go:112-114)
    "is_init",  # F-5 init-job BFS phase marker (scrapemate.go:489-523)
    "job_type",  # P-2 per-type Process dispatch (job.go:46-47)
]

RESPONSES_SCHEMA = (
    "cache_key string, status int, body_image_id string, "
    "out_links array<string>, latency_us long"
)

TERMINAL_SCHEMA = (
    "job_id string, url_canon string, attempts int, final_state string, wave int"
)
ORDER_SCHEMA = "wave int, rank long, job_id string, url_canon string, is_init boolean"
SEEN_TBL_SCHEMA = "url_hash long, cache_key string, first_seen_wave int"


@dataclass
class CrawlConfig:
    wave_budget: int = C.DEFAULT_WAVE_BUDGET
    default_host_budget: int = C.DEFAULT_HOST_BUDGET
    wave_period_us: int = 500_000
    max_waves: int = C.DEFAULT_MAX_WAVES
    host_buckets: int = C.DEFAULT_HOST_BUCKETS
    salt_buckets: int = 16
    validate_images: bool = True
    use_bloom: bool = True
    bloom_partitions: int = 16
    bloom_bits: int = 1 << 20
    # bloom prefilter pays an Arrow round-trip per candidate to cut the exact
    # anti-join's shuffle; that trade only wins once the seen set is large.
    # Below this row count the engine joins directly (the tier is still
    # built + checkpointed either way — membership answers don't change).
    bloom_prefilter_min_seen: int = 2_000_000
    # operating envelope of the broadcast probe (round 6, r5 verdict #4):
    # prefilter_candidates ships ALL P bitsets to every executor, so the
    # tier is only probe-able while n_partitions × m_bits/8 stays
    # executor-broadcastable. Above this cap the engine auto-disables the
    # prefilter (the exact anti-join is always the authority — results are
    # unchanged, only the shuffle-cutting optimization switches off). At the
    # north-rule 10^10 keys × 10 bits/key (~12 GB) the right fix is
    # partition-routing the probe by pmod(url_hash, P); the cap makes the
    # current broadcast probe fail SOFT instead of OOMing an executor.
    bloom_broadcast_max_mb: int = 256
    # P-2 job-type registry (name → jobtypes.JobTypeSpec); None → the single
    # default type, which reproduces untyped crawls bit-for-bit
    job_types: dict | None = None
    # P-3: extract child links from the response body (regexp over body_html)
    # instead of reading the pre-extracted out_links column
    extract_links_from_body: bool = False
    # F-24 fetcher flavor: "http" (plain) or "js" (browser rendering — also
    # observes pages.js_links, the content injected client-side;
    # jshttp.go:191-235)
    fetcher: str = "http"
    # F-23 stealth header profile name (crawlspark.stealth) — merged UNDER
    # each job's own headers before the fetch; None → plain fetch
    fetch_profile: str | None = None
    # F-29 request/response hooks side-output column on results
    enable_hooks: bool = False
    # F-11 transparent gzip body decode: pages.body_gz → results.body_text
    decode_gzip_body: bool = False
    # O-5: attach payload bytes to results as `screenshot` (table mode only)
    screenshots: bool = False
    # payload validation plan: "table" joins the images dimension and
    # validates its bytes (correctness fixtures); "synthetic" fuses payload
    # synthesis + validation per unique URL inside one UDF — the 10^10-scale
    # shape where every page has its own image and bytes never cross a
    # stage boundary
    payload_mode: str = "table"
    payload_px: int = 128  # synthetic-mode image edge length
    workdir: str | None = None  # set → durable checkpoints + resume
    # Execution-mode crossover (round 6, guide §1.2 "per-task work"): every
    # wave's plans embed wave-varying literals (wave_ts, seq watermarks, the
    # wave number), and Spark inlines primitive literals into the generated
    # Java source, so whole-stage codegen janino-RECOMPILES the wave pipeline
    # every wave — compile cost scales with PLANS (≈1s/wave measured at
    # medium scale), execution cost with ROWS. Below this wave_budget the
    # engine plans its frames in interpreted mode (wholeStage off,
    # factoryMode NO_CODEGEN: identical semantics, zero compile): interleaved
    # A/B at the 50k-budget bench scale reads 25.7/27.7 s wave-sum
    # interpreted vs 31.2/29.1 codegen. Above it (e.g. the 1M-row xsat
    # waves), per-row interpreted overhead (~µs/row × ~30 exprs) outgrows
    # the ~1s/wave compile and codegen stays on — the same measure-first
    # crossover reasoning as bloom_prefilter_min_seen.
    interpreted_below_wave_budget: int = 200_000


@dataclass
class CrawlRun:
    order: DataFrame
    results: DataFrame
    terminal: DataFrame
    seen: DataFrame
    responses: DataFrame | None = None  # successful fetches (the cache table)
    metrics: list[dict] = field(default_factory=list)
    waves: int = 0
    stopped: bool = False
    resumed_from_wave: int = 0


class CrawlEngine:
    def __init__(
        self,
        spark,
        pages: DataFrame,
        robots: DataFrame,
        budgets: DataFrame,
        images: DataFrame | None = None,
        config: CrawlConfig | None = None,
        response_cache: DataFrame | None = None,
        table_io: TableIO | None = None,
    ):
        self.spark = spark
        self._n_shuffle_init = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # C-2: cache-first fetch — hits skip the fetch join but still flow
        # through parse/process/expansion (scrapemate.go:345-375).
        # Stored pre-partitioned AND pre-sorted on its join key: the cached
        # plan's layout survives persist (InMemoryTableScan reports it), so
        # the per-wave cache join does ZERO work on this side — no exchange,
        # no sort — forever after the one-time build. The wave side still
        # shuffles, but it is ≤ wave_budget rows vs the whole corpus. Same
        # treatment for the pages table below: this is the in-memory twin of
        # bucketing the Iceberg table by its join key at cluster scale.
        self.response_cache = (
            response_cache.repartition(self._n_shuffle_init, "cache_key")
            .sortWithinPartitions("cache_key")
            .persist()
            if response_cache is not None
            else None
        )
        self.cfg = config or CrawlConfig()
        self.specs = self.cfg.job_types or jobtypes.default_specs()
        # one-time batch cost, amortized over every wave
        self.pages = (
            FT.resolve_redirects(pages)
            .repartition(self._n_shuffle_init, "url_hash")
            .sortWithinPartitions("url_hash")
            .persist()
        )
        self.robots = robots.persist()
        self.budgets = budgets.persist()
        self.images = images
        # the catalog seam: any object with the TableIO surface drops in
        # (a real Iceberg catalog on a cluster; a fake in the contract test)
        self.io = table_io if table_io is not None else (
            TableIO(spark, self.cfg.workdir) if self.cfg.workdir else None
        )
        self._n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
        self._seen_chain = 0
        self._n_seed_allowed = 0
        self._profile = os.environ.get("CRAWLSPARK_PROFILE") == "1"
        # A/B escape hatch: "1" compiles the per-wave checkpoint plans with
        # AQE disabled (the rejected round-4 experiment) — kept only so
        # bench/run_ab_ckpt.py can re-measure it; the default (AQE-compiled)
        # won the interleaved A/B 4/4 pairs (BENCH/ab_r4_ckpt.json, B/A=0.80)
        self._ckpt_static = os.environ.get("CRAWLSPARK_CKPT_STATIC") == "1"
        self._t_last = 0.0
        self._seen_rows = 0  # driver-side running count (no extra actions)
        self.bloom = (
            SEEN.PartitionedBloom(self.cfg.bloom_partitions, self.cfg.bloom_bits)
            if self.cfg.use_bloom
            else None
        )

    def _bloom_broadcastable(self) -> bool:
        """True while the tier's total packed size fits the broadcast-probe
        envelope (bloom_broadcast_max_mb). The exact anti-join never depends
        on this — past the cap the prefilter just switches off."""
        if self.bloom is None:
            return False
        tier_bytes = self.bloom.n_partitions * (self.bloom.m_bits // 8)
        return tier_bytes <= self.cfg.bloom_broadcast_max_mb * 1024 * 1024

    def _bloom_maintain(self, seen_full, seen_delta) -> None:
        """Build the bloom tier only once the seen set is big enough for the
        prefilter to pay for itself: construction is deferred, then a
        one-time full build catches up. After that sync, per-wave deltas
        ride the fused action's `bloom` branch (zero extra driver jobs) —
        this method's delta path is only a fallback for callers that bypass
        the BSP loop (`seen_delta` kept in the signature for them)."""
        if self.bloom is None:
            return
        if self._seen_rows < self.cfg.bloom_prefilter_min_seen // 2:
            self._bloom_synced = False
            return
        if not getattr(self, "_bloom_synced", False):
            self.bloom.add_from_df(seen_full)
            self._bloom_synced = True

    def exec_mode(self):
        """Context manager applying the engine's execution-mode choice
        (CrawlConfig.interpreted_below_wave_budget): small-wave runs plan in
        interpreted mode so the per-wave janino recompile of literal-bearing
        plans disappears; big-wave runs keep codegen. run() wraps the BSP
        loop in this; callers that materialize a CrawlRun's lazy outputs
        AFTER run() returns (the end-of-run results union compiles there)
        can wrap that consumption too."""
        from contextlib import contextmanager

        @contextmanager
        def _cm():
            conf = self.spark.conf
            if self.cfg.wave_budget > self.cfg.interpreted_below_wave_budget:
                yield
                return
            prev_ws = conf.get("spark.sql.codegen.wholeStage", "true")
            prev_fm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
            try:
                conf.set("spark.sql.codegen.wholeStage", "false")
                conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
                yield
            finally:
                conf.set("spark.sql.codegen.wholeStage", prev_ws)
                conf.set("spark.sql.codegen.factoryMode", prev_fm)

        return _cm()

    def _retry_action(self, fn, attempts: int = 3, delay_s: float = 1.0):
        """F-4 provider-error restart analog (scrapemate.go:532-543: log,
        sleep 1s, re-call Jobs()): driver-side actions retry transient scan/
        collect failures; Spark's own task retries cover executor failures."""
        for a in range(attempts):
            try:
                return fn()
            except Exception:
                if a == attempts - 1:
                    raise
                time.sleep(delay_s)

    def _tick(self, label: str, wave: int) -> None:
        if self._profile:
            now = time.monotonic()
            st = self.spark.sparkContext.statusTracker()
            jobs = st.getJobIdsForGroup(f"wave-{wave}")
            n_stages = 0
            for j in jobs:
                ji = st.getJobInfo(j)
                if ji is not None:
                    n_stages += len(ji.stageIds)
            print(
                f"[profile] wave={wave} {label}: {now - self._t_last:.2f}s "
                f"(cum jobs={len(jobs)} stages={n_stages})",
                flush=True,
            )
            self._t_last = now

    # ------------------------------------------------------------------ #
    def _admit_seeds(self, seeds: DataFrame):
        """Wave-0 seed injection (scrapemateapp.go:73-81 analog): canonize,
        dedup within the seed list (first push wins), robots-gate, assign seq."""
        cols = ["job_id", "url", "url_params", "method", "body", "priority",
                "max_retries", "retry_policy", "max_retry_delay_us", "seed_order"]
        defaults = (
            ("accept_lo", F.lit(200), "int"),
            ("accept_hi", F.lit(299), "int"),
            ("timeout_us", F.lit(None), "long"),
            ("headers", F.lit(None), "map<string,string>"),
            # UseInResults defaults true (job.go:112-114); init defaults false
            ("use_in_results", F.lit(True), "boolean"),
            ("is_init", F.lit(False), "boolean"),
            ("job_type", F.lit(jobtypes.DEFAULT_JOB_TYPE), "string"),
        )
        for c, default, typ in defaults:
            seeds = (
                seeds.withColumn(c, F.coalesce(F.col(c), default).cast(typ))
                if c in seeds.columns
                else seeds.withColumn(c, default.cast(typ))
            )
        extra = [c for c, _, _ in defaults]
        s = urlnorm.with_url_columns(
            seeds.select(*cols, *extra),
            self.cfg.host_buckets,
        ).withColumn("priority", frontier.normalize_priority(F.col("priority")))

        w = Window.partitionBy("cache_key").orderBy("seed_order")
        s = s.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

        allowed, blocked = politeness.robots_gate(s, self.robots)
        # Round 6 (second pass): the seed rank is LAZY (with_inspark_rank) —
        # the old with_global_rank paid a dedicated persist + driver collect
        # inside the timed wall just to number ≤ n_seeds rows. For the unique
        # seed_order key both forms compute the identical global rank
        # (rank-within-partition + preceding-partition offsets is partition-
        # boundary-independent), and the seed/seen counts the driver needs
        # ride ONE fused aggregate in run() instead of three sequential
        # actions (same union-by-_kind trick as the per-wave fused action).
        allowed = frontier.with_inspark_rank(allowed, ("seed_order",), "_srank")
        pending = (
            allowed.withColumn("seq", (F.col("_srank") - 1).cast("long"))
            .withColumn("parent_id", F.lit(None).cast("string"))
            .withColumn("retry_count", F.lit(0).cast("int"))
            .withColumn("not_before_us", F.lit(0).cast("long"))
            .withColumn("wave", F.lit(0).cast("int"))
            .withColumn(
                "max_retry_delay_us",
                F.when(F.col("max_retry_delay_us") <= 0, F.lit(C.DEFAULT_MAX_RETRY_DELAY_US))
                .otherwise(F.col("max_retry_delay_us")),
            )
            .select(*PENDING_COLS)
        )
        seen_delta = s.select(
            "url_hash", "cache_key", F.lit(0).alias("first_seen_wave")
        )
        blocked_terminal = blocked.select(
            "job_id", "url_canon", F.lit(0).cast("int").alias("attempts"),
            F.lit(C.ST_DISCARDED).alias("final_state"), F.lit(0).cast("int").alias("wave"),
        )
        return pending, seen_delta, blocked_terminal

    # ------------------------------------------------------------------ #
    def _expand_plan(self, done: DataFrame, seen: DataFrame):
        """Stage 7: crawl expansion (finishJob→pushJobs, scrapemate.go:578-603).

        Children inherit the parent's priority/retry config; job identity is
        md5(parent|pos|canon)[:16]; dedup = in-batch first-occurrence window
        + bloom prefilter + exact seen probe (seen.py).

        ZERO driver actions here (round 4; the round-1 version spent 4, the
        round-2/3 version 1): every per-row decision is a flag (`_first`
        in-batch winner, `_seen` probe, `_blocked` robots), and the returned
        per-range-partition aggregate — candidate/fresh/admit counts AND the
        rank offsets for deterministic seq assignment — is UNIONED with the
        outcome aggregate into the wave's single fused action, so the two
        legs' stages overlap inside one job instead of paying two sequential
        job latencies. Driver round-trips are the serial floor that caps
        N→4N scaling efficiency; the whole loop is now one action per wave."""
        parents = done.filter(
            F.col("out_links").isNotNull() & (F.size("out_links") > 0)
        ).select(
            F.col("job_id").alias("parent_id"),
            F.col("rank").alias("parent_rank"),
            "priority", "max_retries", "retry_policy", "max_retry_delay_us",
            "timeout_us",  # children inherit the parent's fetch config
            "accept_lo", "accept_hi",  # children inherit the parent's check
            "is_init",  # init descendants stay in the init BFS (scrapemate.go:489-523)
            F.col("job_type").alias("_parent_type"),
            F.posexplode("out_links").alias("link_pos", "url"),
        )
        cand = urlnorm.with_url_columns(
            parents.withColumns(
                {
                    "url_params": F.lit(None).cast("map<string,string>"),
                    "method": F.lit("GET"),
                    "body": F.lit(None).cast("binary"),
                    "headers": F.lit(None).cast("map<string,string>"),
                }
            ),
            self.cfg.host_buckets,
        ).withColumn(
            "job_id",
            F.substring(
                F.md5(F.concat_ws("|", "parent_id", "link_pos", "url_canon")), 1, 16
            ),
        )

        # P-2 dispatch: the parent type's child rules decide which links
        # become jobs, their type, and config overrides (collect_job.go:28-69
        # shape). A link claimed by no rule never becomes a job — dropped
        # before dedup, exactly like user Process code that ignores it.
        path = F.coalesce(F.parse_url(F.col("url_canon"), F.lit("PATH")), F.lit("/"))
        ce = jobtypes.child_column_exprs(self.specs, F.col("_parent_type"), path)
        # one projection (withColumns): the overrides all read PARENT columns
        # and ce[...] (never each other), so batching them is the identical
        # projection with one analysis pass instead of five; the unclaimed-
        # link filter needs only job_type and commutes with the overrides.
        # children are fresh jobs: UseInResults defaults true (job.go:112-114)
        cand = cand.withColumns(
            {
                "job_type": ce["child_type"],
                "priority": frontier.normalize_priority(
                    F.coalesce(ce["child_priority"], F.col("priority"))
                ),
                "max_retries": F.coalesce(ce["child_max_retries"], F.col("max_retries")),
                "timeout_us": F.coalesce(ce["child_timeout_us"], F.col("timeout_us")),
                "use_in_results": F.coalesce(ce["child_use_in_results"], F.lit(True)),
            }
        ).filter(F.col("job_type").isNotNull())

        # in-batch dedup flag: first occurrence by (parent_rank, link_pos)
        # wins — the order parents push children in (scrapemate_test.go:445-534)
        w_first = Window.partitionBy("cache_key").orderBy("parent_rank", "link_pos")
        cand = cand.withColumn("_first", F.row_number().over(w_first) == 1)

        prefilter_bloom = (
            self.bloom
            if self._seen_rows >= self.cfg.bloom_prefilter_min_seen
            and self._bloom_broadcastable()
            else None
        )
        cand = SEEN.mark_seen(cand, seen, prefilter_bloom)
        cand = politeness.with_robots_flag(cand, self.robots)

        fresh = F.col("_first") & ~F.col("_seen")
        admit = fresh & ~F.col("_blocked")
        order = (F.col("parent_rank"), F.col("link_pos"))
        # Order-preserving bucket computed FROM THE DATA instead of
        # repartitionByRange: parent_rank is the wave-selection rank, dense in
        # [1, n_sched] with n_sched <= wave_budget, so equal slices of the
        # rank space are balanced whenever the wave is budget-bound (the
        # design point) and trivially small otherwise. Buckets are monotone
        # in (parent_rank, link_pos) — every key in bucket b sorts before
        # every key in b+1 — so per-bucket running counts + driver-side
        # cumulative offsets in bucket order give the identical global seq
        # assignment. vs the range version this removes, per wave: the
        # hidden range-bounds SAMPLING JOB over cand, and the SECOND full
        # exchange (Window required hashpartitioning(_pid) on top of
        # rangepartitioning) — the window and the stats aggregate now both
        # ride the one explicit hash exchange. Also strictly deterministic
        # under stage retry (range bounds re-sampled on retry could shift
        # partition ids; the bucket is a pure row function).
        nb = self._n_shuffle
        rank_cap = max(1, int(self.cfg.wave_budget))
        bucket = F.least(
            ((F.col("parent_rank") - F.lit(1)) * F.lit(nb) / F.lit(rank_cap)).cast("int"),
            F.lit(nb - 1),
        )
        parted = (
            cand.withColumn("_pid", bucket)
            .repartition(nb, "_pid")
            .withColumns(
                {
                    "_fresh": fresh,
                    "_admit": admit,
                    # running count of admitted rows = 1-based rank for admit
                    # rows ((parent_rank, link_pos) is unique → exact frame).
                    # `admit` is inlined (not F.col("_admit")) so all three
                    # land in ONE projection/analysis pass.
                    "_arn": F.sum(F.when(admit, 1).otherwise(0)).over(
                        Window.partitionBy("_pid")
                        .orderBy(*order)
                        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
                    ),
                }
            )
        )
        # RDD leaf (not .persist): shared by the fused action's ex_agg branch
        # — which the union's attribute dedup would otherwise disconnect from
        # the cache, recomputing the whole expansion — and by _expand_finish's
        # admitted/seen-delta/blocked frames after the action (see _cut_lazy)
        parted = self._cut_lazy(parted)
        ex_agg = parted.groupBy("_pid").agg(
            F.count("*").alias("n_cand"),
            F.sum(F.when(F.col("_fresh"), 1).otherwise(0)).alias("n_fresh"),
            F.sum(F.when(F.col("_admit"), 1).otherwise(0)).alias("n_admit"),
            F.sum(F.when(F.col("_admit") & F.col("is_init"), 1).otherwise(0)).alias("n_admit_init"),
        )
        return parted, ex_agg

    def _expand_finish(self, parted: DataFrame, stats, wave: int, wave_ts: int, seq_base: int):
        """Consume the collected per-partition stats (the expansion leg of
        the wave's single fused action) and build the admitted / seen-delta /
        blocked frames over the already-persisted `parted`."""
        n_candidates = sum(r["n_cand"] for r in stats)
        n_new = sum(r["n_fresh"] or 0 for r in stats)
        n_allowed_init = sum(r["n_admit_init"] or 0 for r in stats)
        offsets, acc = {}, 0
        for r in sorted(stats, key=lambda r: r["_pid"]):
            offsets[r["_pid"]] = acc
            acc += r["n_admit"] or 0
        n_allowed = acc
        offset_df = self.spark.createDataFrame(
            [(p, o) for p, o in offsets.items()] or [(0, 0)], "_pid int, _off long"
        )

        admitted = (
            parted.filter(F.col("_admit"))
            .join(F.broadcast(offset_df), "_pid")
            .withColumn("seq", (F.lit(seq_base) + F.col("_off") + F.col("_arn") - 1).cast("long"))
            .withColumn("retry_count", F.lit(0).cast("int"))
            .withColumn("not_before_us", F.lit(wave_ts).cast("long"))
            .withColumn("wave", F.lit(wave).cast("int"))
            .select(*PENDING_COLS)
        )
        seen_delta = parted.filter(F.col("_fresh")).select(
            "url_hash", "cache_key", F.lit(wave).alias("first_seen_wave")
        )
        blocked_terminal = parted.filter(F.col("_fresh") & F.col("_blocked")).select(
            "job_id", "url_canon", F.lit(0).cast("int").alias("attempts"),
            F.lit(C.ST_DISCARDED).alias("final_state"), F.lit(wave).cast("int").alias("wave"),
        )
        return (
            admitted, n_allowed, seen_delta, blocked_terminal,
            n_candidates, n_new, n_allowed_init,
        )

    # ------------------------------------------------------------------ #
    def _build_results(self, done: DataFrame, wave: int) -> DataFrame:
        # optional side-outputs when the config enables them: decoded body
        # text (F-11) and hook events (F-29)
        opt = [c for c in ("body_text", "hook_events") if c in done.columns]
        base = done.select(
            "job_id", "parent_id", "url_canon",
            F.lit(wave).cast("int").alias("wave"),
            F.col("rank").cast("int").alias("rank"),
            "status", "attempts",
            "from_cache",
            F.col("body_image_id").alias("image_id"),
            "latency_us",
            *opt,
        )
        if self.cfg.validate_images and self.cfg.payload_mode == "synthetic":
            from crawlspark.image import fetch_validate_udf

            v = fetch_validate_udf(F.col("image_id"), F.lit(self.cfg.payload_px))
            return (
                base.withColumn("_v", F.when(F.col("image_id").isNotNull(), v))
                .withColumn("caption", F.lit(None).cast("string"))
                .withColumn("phash", F.col("_v.phash"))
                .withColumn("psnr_db", F.col("_v.psnr_db"))
                .withColumn("pixels_ok", F.col("_v.pixels_ok"))
                .drop("_v")
            )
        if self.images is None or not self.cfg.validate_images:
            return (
                base.withColumn("caption", F.lit(None).cast("string"))
                .withColumn("phash", F.lit(None).cast("long"))
                .withColumn("psnr_db", F.lit(None).cast("double"))
                .withColumn("pixels_ok", F.lit(None).cast("boolean"))
            )
        # images is a dimension table → broadcast, so result rows never
        # shuffle with payload bytes attached (at 10^10 scale the bytes live
        # in object storage and the validate UDF fetches per batch instead;
        # the plan shape — no payload in shuffles — is the same, SURVEY §4.4)
        img = F.broadcast(self.images.select("image_id", "bytes", "fmt", "caption", "phash"))
        joined = base.join(img, "image_id", "left")
        v = validate_image_udf(F.col("image_id"), F.col("bytes"), F.col("fmt"))
        out = (
            joined.withColumn("_v", v)
            .withColumn(
                "psnr_db",
                F.when(F.col("image_id").isNull(), F.lit(None)).otherwise(F.col("_v.psnr_db")),
            )
            .withColumn(
                "pixels_ok",
                F.when(F.col("image_id").isNull(), F.lit(None)).otherwise(F.col("_v.pixels_ok")),
            )
        )
        if self.cfg.screenshots:
            # O-5: binary payload attached to the result row (job.go:142-167
            # DoScreenshot; screenshot sink main.go:169-186) — the payload
            # bytes stand in for the rendered-page screenshot
            out = out.withColumn("screenshot", F.col("bytes"))
        return out.drop("_v", "bytes", "fmt")

    # ------------------------------------------------------------------ #
    def _materialize(
        self, df: DataFrame, table: str, wave: int, keep_layout: bool = False
    ) -> DataFrame:
        """Cut lineage per wave: durable parquet when checkpointing, else
        localCheckpoint (plan would otherwise grow superlinearly with waves).

        Memory mode checkpoints LAZILY: the work happens inside the next
        wave's first real action instead of a dedicated driver round-trip —
        same computation, one fewer serial barrier per call site.

        The checkpoint plan is compiled UNDER AQE (the session default).
        Round 4 trialled compiling it statically: under AQE,
        Dataset.localCheckpoint materializes non-final query stages at
        compile time even with eager=False (a 3M-row micro-repro shows
        12.9 s vs 0.4 s per cut), so a static compile looked like a free
        win. The full-loop interleaved A/B rejected it: the AQE-compiled
        arm won all 4 pairs at comparable steal% (median B/A = 0.80,
        BENCH/ab_r4_ckpt.json). The compile-time materialization is real
        but NOT wasted — AQE uses the finished stages' runtime statistics
        to re-plan the wave's downstream joins/aggregations, and losing
        that (plus the checkpoint work no longer overlapping the wave
        boundary) costs more than the per-cut barrier saves. Verdict:
        keep AQE; CRAWLSPARK_CKPT_STATIC=1 preserves the losing arm for
        re-measurement only.

        `keep_layout` (round 5): compile THIS cut statically so the
        checkpointed frame keeps its physical layout metadata. Under AQE the
        compiled plan is an AdaptiveSparkPlanExec whose outputPartitioning /
        outputOrdering are still Unknown at compile time, so the LogicalRDD
        the checkpoint wraps reports UnknownPartitioning — and every
        downstream window re-exchanges a frame that is ALREADY partitioned
        the right way. With a static compile the frame reports its
        hashpartitioning(host_bucket), which both politeness windows ride
        exchange-free (per_host_topk leads its partition keys with
        host_bucket for exactly this). Used ONLY for the frontier snapshot:
        its subplan is unions + an explicitly-hinted broadcast anti-join +
        an explicit repartition — nothing AQE's runtime re-planning helps
        with — so the r4 A/B's verdict (AQE-on for the OTHER cuts, where
        runtime stats feed downstream join planning) stands."""
        if self.io:
            self.io.write_wave(df, table, wave)
            return self.io.read_wave(table, wave)
        if self._ckpt_static or keep_layout:
            conf = self.spark.conf
            prev = conf.get("spark.sql.adaptive.enabled", "true")
            try:
                conf.set("spark.sql.adaptive.enabled", "false")
                return df.localCheckpoint(eager=False)
            finally:
                conf.set("spark.sql.adaptive.enabled", prev)
        return df.localCheckpoint(eager=False)

    # ------------------------------------------------------------------ #
    def _cut_lazy(self, df: DataFrame) -> DataFrame:
        """Intra-wave sharing cut: static-compiled, NON-EAGER localCheckpoint.

        Why not .persist(): the wave's fused action is a UNION of two
        aggregates over the same frames (outcomes + expansion), and the rank
        is a SELF-join (frame ⋈ its own count aggregate). In both shapes the
        analyzer rewrites one side's attribute ids to resolve the conflict —
        and after that rewrite the cache-manager's plan matching no longer
        substitutes the persisted frame on that side (verified on the live
        plan: wave 2's fused plan carried ZERO InMemoryTableScans in the
        expansion branch and recomputed politeness + selection + fetch from
        the raw frontier snapshot — the politeness chain executed ~4× per
        wave, the fetch pipeline 2×). An RDD leaf is immune: the dedup
        renames the LogicalRDD's output attributes but they still bind to
        the SAME checkpointed RDD, whose partitions compute exactly once
        under the block manager's per-partition lock — even when both
        branches of one job race to them.

        Compiled statically (AQE off) for the same reason as keep_layout in
        _materialize: under AQE, plan→RDD conversion materializes non-final
        query stages at COMPILE time (serial driver floor), and the frames
        cut here feed only aggregates and explicitly-hinted joins — nothing
        AQE's runtime stats would re-plan. Unlike _materialize this cut is
        never durable: it shares work within one wave, it is not resume
        state. Block cleanup rides the context cleaner when the wave's
        Python references drop (memory mode holds them until the end-of-run
        output union, exactly as the persisted frames were held before)."""
        conf = self.spark.conf
        prev = conf.get("spark.sql.adaptive.enabled", "true")
        try:
            conf.set("spark.sql.adaptive.enabled", "false")
            return df.localCheckpoint(eager=False)
        finally:
            conf.set("spark.sql.adaptive.enabled", prev)

    # ------------------------------------------------------------------ #
    def run(self, seeds: DataFrame, resume: bool = False) -> CrawlRun:
        with self.exec_mode():
            return self._run(seeds, resume)

    def _run(self, seeds: DataFrame, resume: bool = False) -> CrawlRun:
        spark = self.spark
        cfg = self.cfg
        t0 = time.monotonic()

        order_parts: list[DataFrame] = []
        results_parts: list[DataFrame] = []
        terminal_parts: list[DataFrame] = []
        responses_parts: list[DataFrame] = []
        metrics: list[dict] = []
        resumed_from = 0

        manifest = self.io.read_manifest() if (resume and self.io) else None
        if manifest:
            wave = manifest["wave"]
            seq_base = manifest["seq_base"]
            stopped = manifest["stopped"]
            resumed_from = wave
            metrics = list(manifest.get("metrics", []))
            pending = self.io.read_waves("pending", [wave], schema=None)
            seen = self.io.read_waves(
                "seen", list(range(0, wave + 1)), schema=SEEN_TBL_SCHEMA
            )
            for w0 in range(0, wave + 1):
                for tbl, parts in (
                    ("order", order_parts),
                    ("results", results_parts),
                    ("terminal", terminal_parts),
                ):
                    if self.io.wave_exists(tbl, w0):
                        parts.append(self.io.read_wave(tbl, w0))
            self._seen_rows = seen.count()
            n_pending = manifest.get("n_pending")
            if n_pending is None:  # pre-round-2 manifest — one-time fallback
                n_pending = pending.count()
            n_init_pending = manifest.get("n_init_pending")
            if n_init_pending is None:
                n_init_pending = pending.filter("is_init").count() if "is_init" in pending.columns else 0
            self._bloom_maintain(seen, seen)  # rebuild tier from committed seen set
        else:
            wave = 0
            stopped = False
            pending, seen_delta, blocked_term = self._admit_seeds(seeds)
            # wave-0 snapshot gets the same stored layout as every later
            # wave's (host-bucketed, sorted) so wave 1's politeness windows
            # ride it exchange-free too
            pending = self._materialize(
                pending.repartition(self._n_shuffle, "host_bucket")
                .sortWithinPartitions("priority", "seq"),
                "pending", 0, keep_layout=True,
            )
            seen = self._materialize(seen_delta, "seen", 0)
            blocked_term = self._materialize(blocked_term, "terminal", 0)
            terminal_parts.append(blocked_term)
            # ONE setup action (round 6 second pass; was three sequential
            # driver round-trips: the seed-rank collect inside _admit_seeds,
            # an is_init count, and seen.count()): the pending stats and the
            # seen count ride a single fused collect — the same union-by-
            # _kind shape as the per-wave fused action, so both lazy
            # checkpoint cuts materialize inside one job's stages too.
            fused0 = pending.agg(
                F.count("*").alias("n"),
                F.sum(F.col("is_init").cast("long")).alias("n_init"),
            ).select(F.lit("p").alias("_kind"), "n", "n_init").unionByName(
                seen.agg(F.count("*").alias("n")).select(
                    F.lit("s").alias("_kind"), "n"
                ),
                allowMissingColumns=True,
            )
            srows = {r["_kind"]: r for r in self._retry_action(fused0.collect)}
            self._n_seed_allowed = int(srows["p"]["n"])
            seq_base = self._n_seed_allowed
            n_pending = self._n_seed_allowed
            # how many seeds open an init BFS phase (F-5, scrapemate.go:489-523)
            n_init_pending = int(srows["p"]["n_init"] or 0)
            self._seen_rows = int(srows["s"]["n"])
            self._bloom_maintain(seen, seen)
            if self.io:
                self.io.commit_manifest(
                    {"wave": 0, "seq_base": seq_base, "stopped": False,
                     "metrics": [], "n_pending": n_pending,
                     "n_init_pending": n_init_pending}
                )

        # ---------------- BSP loop -------------------------------------- #
        while wave < cfg.max_waves and not stopped:
            wave += 1
            wave_ts = wave * cfg.wave_period_us
            wt0 = time.monotonic()
            self._t_last = wt0
            # tag the wave's jobs (UI debuggability; also lets the profile
            # mode count scheduler round-trips per wave via statusTracker)
            spark.sparkContext.setJobGroup(f"wave-{wave}", f"crawl wave {wave}")

            # F-5 init phase: while any init job is pending, ONLY init jobs
            # are eligible — the BFS-to-exhaustion-before-workers semantics
            # of processInitJob (scrapemate.go:219-221, 489-523)
            init_phase = n_init_pending > 0
            elig_cond = F.col("not_before_us") <= wave_ts
            if init_phase:
                elig_cond = elig_cond & F.col("is_init")
            eligible = pending.filter(elig_cond)
            future = pending.filter(~elig_cond)

            polite = politeness.per_host_topk(
                eligible, self.budgets, cfg.default_host_budget, cfg.salt_buckets
            )
            # Selection-rank bucket from driver-tracked seq watermarks
            # (frontier.with_inspark_rank_bucketed): seqs are assigned
            # densely in [0, seq_base) and completion drains mostly from the
            # front, so pending seqs concentrate in roughly the top
            # n_pending of the space. An equal-slice map of
            # [seq_base − n_pending, seq_base) is near-uniform there;
            # stragglers below the watermark (out-of-order completions,
            # retries) clamp into bucket 0 — a balance wobble, never an
            # ordering error (the bucket stays monotone in seq).
            nb_sel = self._n_shuffle
            seq_lo = max(0, seq_base - max(1, n_pending))
            seq_span = max(1, seq_base - seq_lo)
            seq_bucket = F.greatest(
                F.least(
                    ((F.col("seq") - F.lit(seq_lo)) * F.lit(nb_sel) / F.lit(seq_span)).cast("int"),
                    F.lit(nb_sel - 1),
                ),
                F.lit(0),
            )
            wave_sel = frontier.select_wave(
                polite, cfg.wave_budget, seq_bucket=seq_bucket,
                materialize=self._cut_lazy,
            )
            if cfg.fetch_profile:
                # F-23: profile headers merged under the job's own
                from crawlspark import stealth

                wave_sel = stealth.with_profile_headers(
                    wave_sel, spark, cfg.fetch_profile
                )
            wave_sel = wave_sel.persist()
            fetched = FT.fetch_simulate(
                wave_sel, self.pages, self.response_cache,
                carry_body_html=cfg.extract_links_from_body,
                carry_body_gz=cfg.decode_gzip_body,
                carry_js_links=(cfg.fetcher == "js"),
            )
            if cfg.extract_links_from_body and "body_html" in fetched.columns:
                # P-3 link extraction from the response body. Default: the
                # every-anchor Catalyst regexp (no UDF). Job types that
                # declare link_selectors (round 4) instead get their links
                # from the CSS-selector engine (crawlspark/selectors.py —
                # the goquery Find().Attr() analog, Arrow-batched); types
                # without selectors fall back via coalesce, so the
                # zero-config path stays pure Catalyst. Cache hits keep
                # their stored out_links (extracted when the response was
                # first fetched); body is dropped immediately so HTML never
                # enters the persisted wave state.
                anchor_links = F.regexp_extract_all(
                    F.col("body_html"), F.lit(r'<a href="([^"]+)"'), 1
                )
                sel_types = {
                    t: s.link_selectors
                    for t, s in self.specs.items()
                    if getattr(s, "link_selectors", ())
                }
                if sel_types:
                    from crawlspark import selectors as SEL

                    extracted = F.coalesce(
                        SEL.links_by_type_udf(sel_types)(
                            F.col("job_type"), F.col("body_html")
                        ),
                        anchor_links,
                    )
                else:
                    extracted = anchor_links
                fetched = fetched.withColumn(
                    "out_links",
                    F.when(
                        ~F.col("from_cache") & F.col("body_html").isNotNull(),
                        extracted,
                    ).otherwise(F.col("out_links")),
                ).drop("body_html")
            if cfg.fetcher == "js" and "js_links" in fetched.columns:
                # F-24: the js fetcher also observes render-injected links,
                # appended after the static ones (document order, then render
                # order). Cache hits keep their stored (already-effective) links.
                fetched = fetched.withColumn(
                    "out_links",
                    F.when(
                        F.col("from_cache"), F.col("out_links")
                    ).otherwise(
                        F.concat(
                            F.coalesce(F.col("out_links"), F.array().cast("array<string>")),
                            F.coalesce(F.col("js_links"), F.array().cast("array<string>")),
                        )
                    ),
                ).drop("js_links")
            if cfg.decode_gzip_body and "body_gz" in fetched.columns:
                # F-11 transparent gzip decode (nethttp.go:76-86); the raw
                # gz bytes are dropped so only the text enters the wave cache
                fetched = fetched.withColumn(
                    "body_text",
                    F.when(~F.col("from_cache"), FT.gunzip_udf()(F.col("body_gz"))),
                ).drop("body_gz")
            if cfg.enable_hooks:
                # F-29 hooks side-output (request_hooks.go:31-48)
                fetched = fetched.withColumn("hook_events", FT.hook_events_expr())
            # RDD leaf, not .persist(): the fused union's expansion branch
            # is attribute-deduped by the analyzer, after which the cached
            # plan no longer matches and the branch recomputed selection +
            # fetch + outcomes from scratch (see _cut_lazy). As a leaf, both
            # branches — and the end-of-run output union — read the same
            # once-computed blocks.
            out = self._cut_lazy(FT.apply_outcomes(fetched, wave_ts))

            # THE wave's single driver action (round 4; was 2 in r2/r3): the
            # outcome aggregate and the expansion per-partition aggregate are
            # unioned into one collect, so one job materializes selection +
            # fetch + outcomes AND the candidate expansion — the two legs'
            # stages overlap instead of paying two sequential job latencies.
            done = out.filter(F.col("outcome") == "done")
            parted, ex_agg = self._expand_plan(done, seen)
            oc_agg = out.groupBy("outcome", "is_init").agg(F.count("*").alias("n"))
            fused = oc_agg.select(
                F.lit("oc").alias("_kind"), "outcome", "is_init", "n"
            ).unionByName(
                ex_agg.withColumn("_kind", F.lit("ex")),
                allowMissingColumns=True,
            )
            # Bloom-tier delta maintenance as a THIRD branch of the fused
            # action (round 5): once the tier is synced, each wave's fresh-key
            # bitsets are aggregated over the expansion leaf and collected
            # with the outcome/expansion stats — tier upkeep was a dedicated
            # 1-3 s driver round-trip per wave (pure serial floor, and the
            # main per-wave cost growth once the tier engages), now it
            # overlaps the stages the wave already runs.
            bloom_live = self.bloom is not None and getattr(self, "_bloom_synced", False)
            if bloom_live:
                bloom_agg = self.bloom.delta_agg_df(
                    parted.filter(F.col("_fresh")).select("url_hash")
                )
                fused = fused.unionByName(
                    bloom_agg.withColumn("_kind", F.lit("bloom")),
                    allowMissingColumns=True,
                )
            if self._profile and wave == int(
                os.environ.get("CRAWLSPARK_EXPLAIN_WAVE", "0")
            ):
                # plan-shape debugging: dump the wave's single fused action
                print(f"=== fused plan, wave {wave} ===", flush=True)
                fused.explain("formatted")
            rows = self._retry_action(fused.collect)
            oc_rows = [r for r in rows if r["_kind"] == "oc"]
            ex_stats = [r for r in rows if r["_kind"] == "ex"]
            if bloom_live:
                self.bloom.merge_rows([r for r in rows if r["_kind"] == "bloom"])
            by_outcome: dict[str, int] = {}
            n_sched_init = n_retried_init = 0
            for r in oc_rows:
                by_outcome[r["outcome"]] = by_outcome.get(r["outcome"], 0) + r["n"]
                if r["is_init"]:
                    n_sched_init += r["n"]
                    if r["outcome"] == "retry":
                        n_retried_init += r["n"]
            n_sched = sum(by_outcome.values())
            self._tick("select+fetch+outcomes", wave)
            if n_sched == 0:
                wave_sel.unpersist()  # out/parted are RDD leaves — GC-cleaned
                src = pending.filter("is_init") if init_phase else pending
                nxt = src.agg(F.min("not_before_us").alias("m")).collect()[0]["m"]
                if nxt is None:
                    break  # frontier empty — fixpoint (inactivity-exit analog)
                # fast-forward the virtual clock to the first eligible backoff
                # (identical wave numbering: the oracle's intervening waves
                # select nothing and emit nothing)
                wave = max(wave, -(-int(nxt) // cfg.wave_period_us) - 1)
                continue

            # broadcast hint, not AQE-discovered: wave_sel is ≤ wave_budget
            # rows (driver-bounded), while `eligible` is the frontier — a
            # sort-merge anti-join would shuffle the whole frontier on
            # job_id every wave. The hint also keeps the join broadcast
            # inside the frontier snapshot's statically-compiled cut
            # (keep_layout below), where AQE isn't around to discover it.
            leftover = eligible.join(
                F.broadcast(wave_sel.select("job_id")), "job_id", "left_anti"
            )

            n_done = by_outcome.get("done", 0)
            n_failed = by_outcome.get("failed", 0) + by_outcome.get("stop", 0)
            n_retried = by_outcome.get("retry", 0)
            stopped = by_outcome.get("stop", 0) > 0

            order_df = out.select(
                F.lit(wave).cast("int").alias("wave"),
                F.col("rank").cast("long").alias("rank"),
                "job_id", "url_canon", "is_init",
            )
            responses_df = done.select(
                "cache_key", "status", "body_image_id", "out_links", "latency_us"
            )
            if self.io:
                responses_df = self._materialize(responses_df, "responses", wave)
            responses_parts.append(responses_df)
            # O-1 result-emit gate (scrapemate.go:585-591) + F-5 init results
            # discarded (scrapemate.go:489-523) + P-2 per-type emit (a collect
            # job's Process returns nil data): caching/expansion above are NOT
            # gated — only the results stream is
            results_df = self._build_results(
                done.filter(
                    F.col("use_in_results")
                    & ~F.col("is_init")
                    & jobtypes.emit_result_expr(self.specs, F.col("job_type"))
                ),
                wave,
            )
            terminal_df = out.filter(F.col("outcome").isin("done", "failed", "stop")).select(
                "job_id", "url_canon", "attempts",
                F.when(F.col("outcome") == "done", C.ST_DONE)
                .otherwise(C.ST_FAILED)
                .alias("final_state"),
                F.lit(wave).cast("int").alias("wave"),
            )

            (admitted, n_allowed, seen_delta, blocked_term,
             n_candidates, n_new, n_allowed_init) = (
                self._expand_finish(parted, ex_stats, wave, wave_ts, seq_base)
            )
            self._tick("expand", wave)
            # Both cuts compile statically (keep_layout): under AQE,
            # localCheckpoint(eager=False) materializes the cut's non-final
            # query stages at COMPILE time — ~2 s of serial driver floor per
            # wave on frames whose downstream is unions and explicitly-
            # hinted joins only, i.e. nothing AQE's runtime stats would
            # re-plan (profile: the mat-pending leg, 10 jobs/wave).
            admitted = self._materialize(admitted, "admitted", wave, keep_layout=True)
            # narrow each seen delta before it enters the probe-side union
            # chain: a delta holds ≤ one wave's fresh keys (≪ the full seen
            # set the shuffle width is sized for), yet at full width the
            # chain grows the seen-probe stage by n_shuffle tasks per wave
            # between compactions (event-log profile: +64 tasks/wave). A
            # coalesce is width-only — no exchange; the upstream reads the
            # already-persisted expansion frame — and cuts the leak 8×.
            seen_delta = self._materialize(
                seen_delta.coalesce(max(1, self._n_shuffle // 8)),
                "seen", wave, keep_layout=True,
            )
            self._seen_rows += n_new
            seq_base += n_allowed
            n_init_pending = n_init_pending - n_sched_init + n_retried_init + n_allowed_init

            retried = out.filter(F.col("outcome") == "retry").select(*PENDING_COLS)
            # width-only narrowing of the union branches (round 6 second
            # pass): each branch is a filter over a 64-partition leaf, so the
            # snapshot repartition's MAP side otherwise runs 4×n_shuffle
            # tiny tasks per wave (~40 rows each — event-log: a 256-task
            # 0.9 s stage that is mostly scheduling). coalesce is exchange-
            # free and value-preserving; ≤ a wave's rows keep ample
            # parallelism at n_shuffle/4 per branch.
            nbq = max(1, self._n_shuffle // 4)
            new_pending = (
                future.coalesce(nbq)
                .unionByName(leftover.coalesce(nbq))
                .unionByName(retried.coalesce(nbq))
                .unionByName(admitted.coalesce(nbq))
            )
            # re-bucket + sort the frontier snapshot: without this the union
            # chain inflates partition counts O(waves²); with it the next
            # wave's host window reads host-clustered, (priority, seq)-sorted
            # runs (SURVEY.md §4.4 sorted-partition layout)
            new_pending = new_pending.repartition(
                self._n_shuffle, "host_bucket"
            ).sortWithinPartitions("priority", "seq")
            pending = self._materialize(new_pending, "pending", wave, keep_layout=True)
            self._tick("mat-pending", wave)
            seen = seen.unionByName(seen_delta)  # both sides already materialized
            self._bloom_maintain(seen, seen_delta)
            self._seen_chain += 1
            if self._seen_chain >= 8:
                # periodic compaction (the Nutch CrawlDb-merge analog): bound
                # the delta chain so anti-join scan width stays O(P), not O(waves)
                seen = self._materialize(
                    seen.repartition(self._n_shuffle, "url_hash"), "seen_full", wave
                )
                self._seen_chain = 0
            self._tick("bloom", wave)

            # wave outputs stay LAZY over the persisted `out`/`cand` frames in
            # memory mode (one final union at end-of-run); durable mode writes
            # them now so a resume can replay committed waves.
            terminal_df = terminal_df.unionByName(blocked_term)
            if self.io:
                order_df = self._materialize(order_df, "order", wave)
                results_df = self._materialize(results_df, "results", wave)
                terminal_df = self._materialize(terminal_df, "terminal", wave)
            else:
                # narrow the per-wave results frame before it enters the
                # end-of-run union (round 6): each wave's results plan holds
                # ≤ one wave's rows yet inherits the full n_shuffle width
                # from the `out` leaf, so the union's consuming action ran
                # waves × n_shuffle pandas-UDF tasks of ~10² rows each —
                # per-task Arrow/worker overhead dominated the validate
                # kernel ~10× (event-log profile: 512 tasks, 190 core-s for
                # ~20 core-s of kernel). A coalesce is width-only (no
                # exchange, rows and values unchanged); durable mode already
                # writes compacted parquet instead.
                results_df = results_df.coalesce(max(1, self._n_shuffle // 8))
            order_parts.append(order_df)
            results_parts.append(results_df)
            terminal_parts.append(terminal_df)

            # arithmetic identity — no action: the new frontier is exactly
            # (previous pending − selected) ∪ retried ∪ admitted
            n_pending_after = n_pending - n_sched + n_retried + n_allowed
            n_pending = n_pending_after
            metrics.append(
                {
                    "wave": wave,
                    "scheduled": n_sched,
                    "completed": n_done,
                    "failed": n_failed,
                    "retried": n_retried,
                    "new_urls": n_new,
                    "deduped": n_candidates - n_new,
                    "pending_after": n_pending_after,
                    "wall_sec": round(time.monotonic() - wt0, 3),
                }
            )
            if self.io:
                self.io.commit_manifest(
                    {
                        "wave": wave,
                        "seq_base": seq_base,
                        "stopped": stopped,
                        "metrics": metrics,
                        "n_pending": n_pending,
                        "n_init_pending": n_init_pending,
                    }
                )
                wave_sel.unpersist()  # out/parted are RDD leaves — GC-cleaned
            # memory mode: `out`/`cand` stay cached — the end-of-run union of
            # wave outputs reads them instead of recomputing the whole wave
            if n_pending_after == 0:
                break

        def _union(parts, schema):
            if not parts:
                return spark.createDataFrame([], schema)
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
            return df

        return CrawlRun(
            responses=_union(responses_parts, RESPONSES_SCHEMA),
            order=_union(order_parts, ORDER_SCHEMA),
            results=_union(
                results_parts,
                "job_id string, parent_id string, url_canon string, wave int, rank int, "
                "status int, attempts int, from_cache boolean, image_id string, "
                "latency_us long, caption string, phash long, psnr_db double, pixels_ok boolean",
            ),
            terminal=_union(terminal_parts, TERMINAL_SCHEMA),
            seen=seen,
            metrics=metrics,
            waves=wave,
            stopped=stopped,
            resumed_from_wave=resumed_from,
        )

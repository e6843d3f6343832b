"""Runner/orchestrator: the Spark-native restatement of Manager +
TAP harness + eHive fan-out/funnel (SURVEY.md §2.5, §3).

Execution model:

* one SparkSession; each check = one (or few) DataFrame actions — the
  analogue of one eHive worker per (db, check) (DataCheckFan.pm:32-66)
  without process fan-out cost;
* **row-fused checks**: checks declaring row-level predicates are executed
  together in a single scan (operators/fused.py) — per-(bucket, assertion)
  counts in one aggregation + one violating-row projection — instead of
  one scan per check as the reference does;
* funnel: verdicts united into a RunSummary, violations appended to the
  violations table, checkpoint rows appended once per run
  (DataCheckFunnel.pm:35-91 semantics: single merged write);
* resume: partitions whose latest checkpoint is ok under the current input
  lineage are filtered out *before* the scan (cheap bucket-id predicate,
  no extra shuffle); `force` bypasses (DbCheck.pm:101-105);
* error-in-check → failed verdict with diagnostic, run continues
  (BaseCheck.pm:131-139).
"""

from __future__ import annotations

import threading
import time
import traceback
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ensembl_datacheck_spark.operators.fused import (
    RowPredicate,
    fused_violation_counts,
    fused_violation_rows,
)
from ensembl_datacheck_spark.plans.checkpoint import (
    CheckpointRow,
    CheckpointStore,
    bucket_col,
    new_run_id,
)
from ensembl_datacheck_spark.registry import CheckSpec
from ensembl_datacheck_spark.verdict import (
    AssertionResult,
    CheckResult,
    RunSummary,
    Status,
)

VIOLATIONS_SCHEMA = "check_name string, assertion string, partition_id int, key string, detail string"


class SkipCheck(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


class SharedComputations:
    """Per-run memoization for Spark jobs whose result several checks can
    consume (the fact-table profile in checks/core.py is the flagship:
    one grouping-sets scan replaces five independent full scans).  Keyed
    compute-once with a lock PER KEY: under ``parallelism`` > 1 the first
    pooled check to ask runs the job while its co-consumers block on that
    key only — unrelated shared values never serialize behind it."""

    def __init__(self) -> None:
        self._vals: dict[str, object] = {}
        self._locks: dict[str, threading.Lock] = {}
        self._meta = threading.Lock()

    def get(self, key: str, fn: Callable[[], object]) -> object:
        with self._meta:
            lock = self._locks.setdefault(key, threading.Lock())
        with lock:
            if key not in self._vals:
                self._vals[key] = fn()
            return self._vals[key]

    def peek(self, key: str) -> object | None:
        """The memoized value if ALREADY computed, else None — never
        triggers a build.  Lets a consumer with a cheaper single-purpose
        plan (e.g. NTokQuantileDrift's combined sketch scan) use the
        shared value opportunistically without paying for it.  A build
        in flight on another thread reads as None (no blocking): the
        peeker then runs its own one-scan plan, which is the bounded
        worst case."""
        with self._meta:
            return self._vals.get(key)

    def release(self) -> None:
        """Unpersist cached DataFrame values and reset the memo.  Called
        by whoever OWNS the memo once every consumer is done (Runner.run
        for a private memo, run_fleet for a fleet-shared one): persisted
        values (the fact-profile cube) otherwise hold CacheManager
        entries for the SparkSession's lifetime — one InMemoryRelation
        per distinct table, accumulating without bound in a long-lived
        session.  Downstream plans built FROM a released value stay
        correct: persist() keeps recomputable lineage, so a late
        consumer recomputes rather than fails."""
        with self._meta:
            vals = list(self._vals.values())
            self._vals.clear()
            self._locks.clear()
        for v in vals:
            unpersist = getattr(v, "unpersist", None)
            if callable(unpersist):
                try:
                    unpersist(False)
                except Exception:
                    pass  # session already stopped: nothing to free


class CheckContext:
    """What a check body sees: tables, config, assertion recorder.  The
    analogue of the reference's dba + Test::More import surface."""

    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame],
        config: dict | None = None,
        check_name: str = "",
        bucket_key: str = "doc_id",
        n_buckets: int = 64,
        fact_table: str = "sequences",
        shared: SharedComputations | None = None,
    ):
        self.spark = spark
        self.tables = tables
        self.config = config or {}
        self.result = CheckResult(check_name=check_name)
        self.violations: list[DataFrame] = []
        self.bucket_key = bucket_key
        self.n_buckets = n_buckets
        #: name of the table a fused row scan iterates (spec-pack row
        #: rules verify their target against this before fusing)
        self.fact_table = fact_table
        #: run-scoped memo for cross-check shared jobs; standalone
        #: run_check callers get a private instance (each check then
        #: computes its own profile — today's per-check cost, no sharing)
        self.shared = shared if shared is not None else SharedComputations()

    def table(self, name: str) -> DataFrame:
        if name in self.tables:
            return self.tables[name]
        if "." in name:
            # cross-database lookup (S25): a qualified name resolves
            # through the session catalog (io.register_database) — the
            # analogue of the reference's get_dna_dba sibling-database
            # fetch (DbCheck.pm:331-401)
            try:
                return self.spark.table(name)
            except Exception as exc:  # AnalysisException: missing ns/table
                raise SkipCheck(
                    f"required table '{name}' not available ({exc.__class__.__name__})"
                ) from exc
        raise SkipCheck(f"required table '{name}' not available")

    def skip(self, reason: str) -> None:
        raise SkipCheck(reason)

    def record(
        self,
        assertion_and_violations: tuple[AssertionResult, DataFrame | None],
        key_col: str | None = None,
    ) -> bool:
        """Record an assertion; standardize + stash its violation rows for
        the funnel write.  Returns ok-ness so bodies can early-out."""
        ar, viol = assertion_and_violations
        self.result.assertions.append(ar)
        # only zero-expected counts ARE violation counts: a failing
        # comparison assertion (row_totals, cmp_rows) carries the
        # OBSERVED total in `got` — adding a 10^9 row count would claim a
        # billion violations for one failed count comparison.  bool is
        # excluded (isinstance(True, int) is True in Python).
        if (
            ar.status == Status.FAIL
            and isinstance(ar.got, int)
            and not isinstance(ar.got, bool)
            and ar.expected == 0
        ):
            self.result.n_violations += ar.got
        if viol is not None:
            key_col = key_col or viol.columns[0]
            part = (
                bucket_col(self.bucket_key, self.n_buckets)
                if self.bucket_key in viol.columns
                else F.lit(-1)
            )
            detail_cols = [c for c in viol.columns if c != key_col][:6]
            detail = (
                F.to_json(F.struct(*detail_cols))
                if detail_cols
                else F.lit(None).cast("string")
            )
            self.violations.append(
                viol.select(
                    F.lit(self.result.check_name).alias("check_name"),
                    F.lit(ar.name).alias("assertion"),
                    part.alias("partition_id"),
                    F.col(key_col).cast("string").alias("key"),
                    detail.alias("detail"),
                )
            )
        return ar.ok


def run_check(
    spec: CheckSpec,
    spark: SparkSession,
    tables: dict[str, DataFrame],
    config: dict | None = None,
    bucket_key: str = "doc_id",
    n_buckets: int = 64,
    shared: SharedComputations | None = None,
) -> tuple[CheckResult, list[DataFrame]]:
    """Programmatic single-check entry point (reference §3.3:
    `My::Check->new(...)->run()`)."""
    ctx = CheckContext(
        spark, tables, config, check_name=spec.name,
        bucket_key=bucket_key, n_buckets=n_buckets, shared=shared,
    )
    ctx.result.severity = spec.severity.value
    try:
        spec.body(ctx)
    except SkipCheck as s:
        ctx.result.skip_reason = s.reason
    except Exception:
        ctx.result.error = traceback.format_exc(limit=8)
    if shared is None:
        # private memo nobody else can consume: free its persisted
        # values now (repeated standalone run_check calls otherwise each
        # leave a cube in the CacheManager until session end); returned
        # violation frames stay valid — persist lineage is recomputable
        ctx.shared.release()
    return ctx.result.finish(), ctx.violations


class Runner:
    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame],
        fact_table: str = "sequences",
        bucket_key: str = "doc_id",
        n_buckets: int = 64,
        checkpoint_store: CheckpointStore | None = None,
        lineage: str = "",
        config: dict | None = None,
        shared: SharedComputations | None = None,
    ):
        self.spark = spark
        self.tables = dict(tables)
        self.fact_table = fact_table
        self.bucket_key = bucket_key
        self.n_buckets = n_buckets
        self.store = checkpoint_store
        # bucket count AND bucket key participate in the checkpoint
        # namespace: resuming under a different n_buckets (or a different
        # hash key) would reinterpret old partition ids as a different
        # row subset and skip rows that were never checked.
        # Unconditional — an EMPTY input lineage still resumes against
        # the store, so it needs the namespace just as much
        self.lineage = f"{lineage}#nb{n_buckets}#bk{bucket_key}"
        self.config = config or {}
        # per-run view of config (run() adds _shared_consumers); default
        # for any exec path reached outside run()
        self._run_config = dict(self.config)
        self.run_id = new_run_id()
        # Injectable so a fleet (plans/fleet.py) can hand every Runner ONE
        # memo: shared values are keyed by table fingerprint
        # (checks/core._profile_memo_key), so targets that validate the
        # SAME table share one cube build while distinct tables can never
        # collide.  Default: private per-run memo, today's behavior.
        self.shared = shared if shared is not None else SharedComputations()
        self._owns_shared = shared is None
        self._rows_per_bucket: dict[int, int] | None = None
        self._rpb_lock = threading.Lock()
        self._cc_lock = threading.Lock()
        self._completed_cache: dict[str, set[int]] | None = None

    # --- helpers ---

    def _bucket(self) -> F.Column:
        return bucket_col(self.bucket_key, self.n_buckets)

    def rows_per_bucket(self) -> dict[int, int]:
        """One groupBy-count per run, shared by all checkpoint rows.
        Runs without the fact table (e.g. a meta-only spec-pack suite)
        report no per-bucket row counts rather than failing.  Lock-guarded
        compute-once: with ``parallelism`` > 1 the fused scan and the
        pooled checks race to be first caller, and exactly one count job
        must run (the fused counts set it for free when they cover the
        whole table — see _run_fused)."""
        with self._rpb_lock:
            if self._rows_per_bucket is None:
                if self.fact_table not in self.tables:
                    self._rows_per_bucket = {}
                    return self._rows_per_bucket
                rows = (
                    self.tables[self.fact_table]
                    .groupBy(self._bucket().alias("b"))
                    .count()
                    .collect()
                )
                self._rows_per_bucket = {r["b"]: r["count"] for r in rows}
            return self._rows_per_bucket

    def _pending_buckets(self, spec: CheckSpec) -> list[int] | None:
        """None = all pending.  Empty list = nothing to do (skip)."""
        if self.store is None or spec.force:
            return None
        # lock-guarded compute-once (same discipline as rows_per_bucket):
        # with fused_in_pool plus pooled checks several threads race to be
        # first caller, and exactly one checkpoint-table load must run
        with self._cc_lock:
            if self._completed_cache is None:
                # one checkpoint-table load + aggregation serves every
                # check in this run (invalidated by run() after appending)
                self._completed_cache = self.store.completed_map(self.lineage)
            done = self._completed_cache.get(spec.name, set())
        if not done:
            return None
        all_b = set(range(self.n_buckets)) if spec.per_partition else {-1}
        pending = sorted(all_b - done)
        return pending

    def _filtered_tables(self, pending: list[int] | None) -> dict[str, DataFrame]:
        if pending is None:
            return self.tables
        t = dict(self.tables)
        t[self.fact_table] = t[self.fact_table].filter(
            self._bucket().isin(pending)
        )
        return t

    def _checkpoint_rows(
        self,
        spec: CheckSpec,
        result: CheckResult,
        viol_counts: dict[int, int],
        pending: list[int] | None,
        started: float,
    ) -> list[CheckpointRow]:
        finished = time.time()
        if result.skip_reason is not None:
            # a skipped check never ran: recording 'ok' buckets would make
            # resume silently skip it forever (the reference's history
            # only records finished runs, DbCheck.pm:767-804)
            return []
        rpb = self.rows_per_bucket()
        if spec.per_partition:
            buckets = pending if pending is not None else list(range(self.n_buckets))
        else:
            buckets = [-1]
        # a failure that carries no per-bucket attribution (error, an
        # assertion counted only globally, or counts keyed -1 because the
        # violation frame had no bucket column) must poison every pending
        # bucket, not mark them 'ok' — {-1: n} on a per-partition check
        # previously checkpointed every bucket 'ok' and the failure was
        # skipped forever on resume
        unattributed_fail = result.status is not Status.OK and (
            not viol_counts or -1 in viol_counts
        )
        rows = []
        for b in buckets:
            nv = viol_counts.get(b, 0)
            if b == -1:
                nr = sum(rpb.values())
                status = result.status.value
            else:
                nr = rpb.get(b, 0)
                status = (
                    "fail"
                    if nv > 0 or result.error or unattributed_fail
                    else "ok"
                )
            rows.append(
                CheckpointRow(
                    run_id=self.run_id,
                    check_name=spec.name,
                    partition_id=b,
                    status=status,
                    started=started,
                    finished=finished,
                    n_rows=nr,
                    n_violations=nv,
                    lineage=self.lineage,
                )
            )
        return rows

    # --- execution ---

    def run(
        self,
        specs: list[CheckSpec],
        fuse_row_checks: bool = True,
        write_checkpoints: bool = True,
        violations_sink: Callable[[DataFrame], None] | None = None,
        parallelism: int = 1,
    ) -> RunSummary:
        """See _run_impl.  This wrapper releases the run's OWN shared
        memo (cached cube blocks, CacheManager entries) once the run —
        including its violation funnel write — completes or fails: a
        persist() without a paired unpersist() accumulates one
        InMemoryRelation per distinct fact table for the SparkSession's
        lifetime, a storage-memory leak under a long-lived session
        running many targets.  A memo INJECTED by a fleet is left alone
        (siblings on the same table still need it); run_fleet releases
        it after the whole fan-out."""
        try:
            return self._run_impl(
                specs,
                fuse_row_checks=fuse_row_checks,
                write_checkpoints=write_checkpoints,
                violations_sink=violations_sink,
                parallelism=parallelism,
            )
        finally:
            if self._owns_shared:
                self.shared.release()

    def _run_impl(
        self,
        specs: list[CheckSpec],
        fuse_row_checks: bool = True,
        write_checkpoints: bool = True,
        violations_sink: Callable[[DataFrame], None] | None = None,
        parallelism: int = 1,
    ) -> RunSummary:
        """``parallelism`` > 1 runs the non-fused checks concurrently from
        a thread pool (one Spark job per check in flight, FAIR-pool
        scheduled) — the in-session analogue of the reference's per-check
        worker fan-out (DataCheckFan.pm:32-66, analysis_capacity throttle
        DbDataChecks_conf.pm:270)."""
        summary = RunSummary()
        all_violations: list[DataFrame] = []
        checkpoint_rows: list[CheckpointRow] = []

        # Count declared shared-computation consumers among the checks in
        # THIS run (CheckSpec.shared_uses) and expose the counts to every
        # body: a check that can serve itself with a cheaper one-scan plan
        # (NTokQuantileDrift's combined sketch probe) joins the shared
        # build instead iff co-consumers make that build a sunk cost —
        # without this signal a peek() racing the in-flight cube build
        # launches a duplicate full fact scan.
        # Only checks that will actually RUN against the full table count
        # as consumers: a checkpoint-complete sibling skips before
        # touching ctx.shared, and a partially-pending one runs against a
        # resume-filtered scan with shared=None (see exec_one) — counting
        # either would make a lone pending check "join" a cube build
        # nobody else pays for, re-introducing the duplicate-scan cost on
        # resume that the sunk-cost rule exists to avoid.
        # _pending_buckets is one cached checkpoint-table load per run.
        consumer_counts: dict[str, int] = {}
        for s in specs:
            if not s.shared_uses:
                continue
            if self._pending_buckets(s) is not None:
                continue
            for kind in s.shared_uses:
                consumer_counts[kind] = consumer_counts.get(kind, 0) + 1
        run_config = dict(self.config)
        run_config["_shared_consumers"] = consumer_counts
        self._run_config = run_config

        fused = [s for s in specs if fuse_row_checks and s.row_predicates is not None]
        rest = [s for s in specs if s not in fused]

        # with a thread pool, the fused fact scan runs AS a pool task so
        # the many contract-small checks (dimension/meta/baseline rules,
        # one-row aggregates) overlap it instead of queueing behind it —
        # measured at 20M rows/8 cores this serialization was the single
        # largest scaling drag (the small checks' walls are fixed cost at
        # any core count, so paying them serially caps suite speedup; see
        # BENCH/BASELINE.md round-3 attribution).  FAIR-pool scheduling
        # interleaves their tiny jobs with the scan's stages.
        fused_in_pool = bool(fused) and parallelism > 1 and len(rest) > 1
        if fused and not fused_in_pool:
            self._run_fused(fused, summary, all_violations, checkpoint_rows)

        def exec_one(spec: CheckSpec):
            started = time.time()
            pending = self._pending_buckets(spec)
            if pending is not None and not pending:
                res = CheckResult(check_name=spec.name)
                res.skip_reason = "All tests passed in a previous run"  # DbCheck.pm:775 analogue
                return res.finish(), [], [], None
            tables = self._filtered_tables(pending)
            result, violations = run_check(
                spec, self.spark, tables, self._run_config,
                bucket_key=self.bucket_key, n_buckets=self.n_buckets,
                # shared values are computed from the FULL fact table; a
                # resume-filtered scan must not consume (or poison) them
                shared=self.shared if pending is None else None,
            )
            if self.store is None or not write_checkpoints:
                # no checkpoint rows will be written — skip the extra
                # Spark jobs that exist only to build them (re-executing
                # violation plans for per-bucket counts + the full-table
                # rows_per_bucket scan inside _checkpoint_rows)
                return result, violations, [], None
            viol_counts: dict[int, int] = {}
            if result.partition_violations:
                viol_counts = dict(result.partition_violations)
            elif spec.per_partition and violations:
                union = violations[0]
                for v in violations[1:]:
                    union = union.unionByName(v)
                viol_counts = {
                    r["partition_id"]: r["n"]
                    for r in union.groupBy("partition_id")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
            elif result.n_violations:
                viol_counts = {-1: result.n_violations}
            cps = self._checkpoint_rows(spec, result, viol_counts, pending, started)
            return result, violations, cps, None

        if parallelism > 1 and len(rest) > 1:
            from concurrent.futures import ThreadPoolExecutor

            def pooled(spec):
                self.spark.sparkContext.setLocalProperty(
                    "spark.scheduler.pool", f"dcheck_{spec.name}"
                )
                try:
                    return exec_one(spec)
                finally:
                    self.spark.sparkContext.setLocalProperty(
                        "spark.scheduler.pool", None
                    )

            def fused_pooled():
                self.spark.sparkContext.setLocalProperty(
                    "spark.scheduler.pool", "dcheck_fused_scan"
                )
                try:
                    # appends into summary/all_violations/checkpoint_rows
                    # directly; safe because pooled() tasks only RETURN
                    # their results — the shared lists are written by this
                    # thread during the pool phase and by the main thread
                    # strictly after pool shutdown
                    self._run_fused(
                        fused, summary, all_violations, checkpoint_rows
                    )
                finally:
                    self.spark.sparkContext.setLocalProperty(
                        "spark.scheduler.pool", None
                    )

            # the fused scan gets a dedicated slot so check fan-out never
            # starves it (parallelism counts small checks, as before)
            workers = parallelism + (1 if fused_in_pool else 0)
            with ThreadPoolExecutor(max_workers=workers) as pool:
                fused_fut = (
                    pool.submit(fused_pooled) if fused_in_pool else None
                )
                outs = list(pool.map(pooled, rest))
                if fused_fut is not None:
                    fused_fut.result()
        else:
            outs = [exec_one(spec) for spec in rest]

        for result, violations, cps, _ in outs:
            summary.results.append(result)
            all_violations.extend(violations)
            checkpoint_rows.extend(cps)

        # --- funnel (DataCheckFunnel.pm: single merged write) ---
        if all_violations and violations_sink is not None:
            union = all_violations[0]
            for v in all_violations[1:]:
                union = union.unionByName(v)
            violations_sink(union)
        if write_checkpoints and self.store is not None:
            self.store.append(checkpoint_rows)
            self._completed_cache = None  # appended rows invalidate it
        return summary

    def _run_fused(
        self,
        specs: list[CheckSpec],
        summary: RunSummary,
        all_violations: list[DataFrame],
        checkpoint_rows: list[CheckpointRow],
    ) -> None:
        """Execute all row-predicate checks in one scan.  Pending buckets
        are computed per check; the scan covers the union of pending
        buckets and per-check verdicts only consider that check's pending
        set."""
        started = time.time()
        fact = self.tables.get(self.fact_table)
        if fact is None:
            # no fact table in this run (e.g. a meta-only spec-pack
            # suite): every fused check skips with a reason — the same
            # per-check containment ctx.table gives body checks, not a
            # KeyError that would abort the whole run
            for s in specs:
                res = CheckResult(check_name=s.name)
                res.skip_reason = (
                    f"required table '{self.fact_table}' not available"
                )
                summary.results.append(res.finish())
            return
        pending_by_check: dict[str, list[int] | None] = {
            s.name: self._pending_buckets(s) for s in specs
        }
        todo = [s for s in specs if pending_by_check[s.name] != []]
        for s in specs:
            if pending_by_check[s.name] == []:
                res = CheckResult(check_name=s.name)
                res.skip_reason = "All tests passed in a previous run"
                summary.results.append(res.finish())
        if not todo:
            return
        union_pending: set[int] | None = set()
        for s in todo:
            p = pending_by_check[s.name]
            if p is None:
                union_pending = None
                break
            union_pending |= set(p)
        scan = fact
        if union_pending is not None:
            scan = scan.filter(self._bucket().isin(sorted(union_pending)))

        # same context protocol as exec_one/run_check: the per-run config
        # view (carries _shared_consumers) and the run-shared memo —
        # handed over only on a full-table scan; a resume-filtered scan
        # must not consume (or poison) shared values computed from the
        # full fact table.  A private memo created here is released at
        # the end of _run_fused (run_check's discipline), not leaked.
        ctx = CheckContext(
            self.spark, {**self.tables, self.fact_table: scan},
            self._run_config,
            bucket_key=self.bucket_key, n_buckets=self.n_buckets,
            fact_table=self.fact_table,
            shared=self.shared if union_pending is None else None,
        )
        ctx_shared_private = union_pending is not None
        preds: list[RowPredicate] = []
        pred_owner: dict[str, CheckSpec] = {}
        scan2 = scan
        healthy: list[CheckSpec] = []
        for s in todo:
            # a predicate factory that cannot run (missing table, bad
            # config) must skip/fail THIS check only — same error
            # containment as run_check (BaseCheck.pm:131-139), not a
            # crash of every sibling in the fused scan
            try:
                ps, scan2 = s.row_predicates(ctx, scan2)
            except SkipCheck as e:
                res = CheckResult(check_name=s.name)
                res.severity = s.severity.value
                res.skip_reason = e.reason
                summary.results.append(res.finish())
                continue
            except Exception:
                res = CheckResult(check_name=s.name)
                res.severity = s.severity.value
                res.error = traceback.format_exc(limit=8)
                summary.results.append(res.finish())
                continue
            if not ps:
                # e.g. a generated sweep over a table with no applicable
                # columns: nothing to assert, and an empty predicate list
                # would crash the fused aggregation downstream
                res = CheckResult(check_name=s.name)
                res.severity = s.severity.value
                res.skip_reason = "no applicable columns/predicates"
                summary.results.append(res.finish())
                continue
            for p in ps:
                if p.assertion in pred_owner:
                    raise ValueError(
                        f"duplicate fused assertion name {p.assertion!r} "
                        f"({pred_owner[p.assertion].name} vs {s.name}): "
                        "assertion names key the fused counts aggregation "
                        "and must be unique across fused checks"
                    )
                preds.append(p)
                pred_owner[p.assertion] = s
            healthy.append(s)
        todo = healthy
        if not todo:
            if ctx_shared_private:
                ctx.shared.release()
            return

        bucket = self._bucket()
        counts = fused_violation_counts(scan2, preds, bucket).collect()
        viol_rows = fused_violation_rows(scan2, preds, bucket, self.bucket_key)
        if union_pending is None:
            # the fused counts already carry rows-per-bucket for the whole
            # table — no separate counting scan needed (unless a pooled
            # sibling already computed one while this scan ran)
            with self._rpb_lock:
                if self._rows_per_bucket is None:
                    self._rows_per_bucket = {
                        r["partition_id"]: r["n_rows"] for r in counts
                    }

        # per-check verdicts from the fused counts
        for s in todo:
            own = [p for p in preds if pred_owner[p.assertion] is s]
            res = CheckResult(check_name=s.name)
            res.severity = s.severity.value
            res.started = started
            my_pending = pending_by_check[s.name]
            viol_counts: dict[int, int] = {}
            for p in own:
                total = 0
                for r in counts:
                    b = r["partition_id"]
                    if my_pending is not None and b not in my_pending:
                        continue
                    c = r[p.assertion] or 0
                    total += c
                    if c:
                        viol_counts[b] = viol_counts.get(b, 0) + c
                status = Status.OK if total == 0 else Status.FAIL
                diag = (
                    []
                    if total == 0
                    else [f"{total} violating rows; persisted to violations table"]
                )
                res.assertions.append(
                    AssertionResult(p.assertion, status, expected=0, got=total, diag=diag)
                )
                res.n_violations += total
            res.n_rows_checked = sum(
                n for b, n in self.rows_per_bucket().items()
                if my_pending is None or b in my_pending
            )
            summary.results.append(res.finish())
            checkpoint_rows.extend(
                self._checkpoint_rows(s, res, viol_counts, my_pending, started)
            )
        own_assertions = [p.assertion for p in preds]
        tagged = viol_rows.withColumn(
            "check_name",
            F.element_at(
                F.map_from_arrays(
                    F.array(*[F.lit(a) for a in own_assertions]),
                    F.array(*[F.lit(pred_owner[a].name) for a in own_assertions]),
                ),
                F.col("assertion"),
            ),
        ).select("check_name", "assertion", "partition_id", "key", "detail")
        # the union scan covers EVERY fused check's pending buckets; a
        # check must persist violations only for ITS OWN pending set —
        # otherwise a row in a sibling's bucket is written under this
        # check's name while its counts/verdict/checkpoints exclude that
        # bucket (violations table contradicting the verdict on resume)
        out_of_scope = None
        for s in todo:
            p = pending_by_check[s.name]
            if p is None:
                continue
            cond = (F.col("check_name") == s.name) & ~F.col(
                "partition_id"
            ).isin(sorted(p))
            out_of_scope = cond if out_of_scope is None else (out_of_scope | cond)
        if out_of_scope is not None:
            tagged = tagged.filter(~out_of_scope)
        all_violations.append(tagged)
        if ctx_shared_private:
            ctx.shared.release()

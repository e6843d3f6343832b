#!/usr/bin/env python
"""Per-check wall profile of the default suite on the synthetic sequences
table — the optimization feedback loop for the headline seqs/sec metric.

Replicates bench.py's bench_sequences_suite protocol (untimed warm-up,
then a timed run) but prints every check's elapsed wall, sorted
descending, plus the fused-scan share, so optimization effort goes where
the time actually is.

Usage: python scripts/suite_profile.py [n_rows] [parallelism]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    parallelism = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import ensembl_datacheck_spark.checks  # noqa: F401
    from ensembl_datacheck_spark import registry
    from ensembl_datacheck_spark.plans.runner import Runner
    from ensembl_datacheck_spark.session import get_spark
    from ensembl_datacheck_spark.sources import synth

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("suite-profile", cores=cpus,
                      shuffle_partitions=max(cpus, 16), driver_memory="48g")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    tmp = tempfile.mkdtemp(prefix="dcheck_prof_")
    try:
        seq = synth.gen_sequences(
            spark, n_rows, n_partitions=n_part, median_tok=64, max_tok=1024
        )
        seq.write.mode("overwrite").parquet(f"{tmp}/sequences")
        clean = synth.gen_baseline_stats(
            spark,
            synth.gen_sequences(spark, n_rows, n_partitions=n_part,
                                median_tok=64, max_tok=1024,
                                inject_violations=False),
        )
        clean.write.mode("overwrite").parquet(f"{tmp}/baseline")
        tables = {
            "sequences": spark.read.parquet(f"{tmp}/sequences"),
            "sources": synth.gen_sources(spark),
            "baseline_stats": spark.read.parquet(f"{tmp}/baseline"),
        }
        suite = registry.default_suite()
        fused_names = {s.name for s in suite if s.row_predicates is not None}

        # untimed warm-up, then timed
        Runner(spark, tables, n_buckets=64).run(
            suite, write_checkpoints=False, parallelism=parallelism
        )
        runner = Runner(spark, tables, n_buckets=64)
        t0 = time.perf_counter()
        summary = runner.run(suite, write_checkpoints=False,
                             parallelism=parallelism)
        wall = time.perf_counter() - t0

        rows = sorted(
            ((r.finished or r.started) - r.started, r.check_name, str(r.status))
            for r in summary.results
        )[::-1]
        print(f"\n=== suite wall {wall:.3f}s  ({n_rows} rows, "
              f"parallelism={parallelism}, {len(summary.results)} checks) ===")
        print(f"{'sec':>8}  {'fused':>5}  {'status':>6}  name")
        for dur, name, status in rows:
            f = "yes" if name in fused_names else ""
            print(f"{dur:8.3f}  {f:>5}  {status:>6}  {name}")
        total_cpuish = sum(r[0] for r in rows)
        print(f"\nsum of per-check walls: {total_cpuish:.2f}s "
              f"(overlap factor {total_cpuish / wall:.2f}x)")
        print(f"throughput: {n_rows / wall:,.0f} seqs/sec")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Bandwidth attribution for the fused row scan's sub-linear core scaling.

The round-2 measurement showed the fused scan speeding up 3.09x from 2->8
cores while pure aggregations hit 3.6-4.0x, and attributed the gap to
token-array decode being memory-bandwidth-bound in local mode (all
threads share ONE node's memory bus; on a real cluster each executor
brings its own).  This script tests that attribution directly on the same
on-disk table by timing, at two parallelism levels in fresh JVMs:

  suite_full    the default check suite (fused scan decodes `tokens`)
  suite_no_tok  the suite with the two token-decoding checks
                (SequencesCompleteness, TokenInvariants) toggled off --
                column pruning then drops `tokens` from the parquet read
                (the worker asserts this against the physical plan)
  decode_only   the minimal job that must decode every token array:
                sum(size)/sum(array_min)/sum(array_max) in one aggregate
  narrow_only   the same aggregate shape over narrow columns only
                (doc_id, n_tok, source)

If the attribution is right, decode_only's 2->8x speedup lands near the
fused scan's (~3.1x) while narrow_only lands near linear, and the
suite_full - suite_no_tok wall delta accounts for most of the fused
scan's cost.  Decoded bandwidth is derived from sum(n_tok) * 4 bytes.

Usage: python scripts/decode_attrib.py --data /tmp/dcheck_scaling_r2 \
           [--levels 2 8] [--json-out /tmp/attrib.json]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys, time
sys.path.insert(0, "{repo}")
from pyspark.sql import functions as F
from ensembl_datacheck_spark.session import get_spark
from ensembl_datacheck_spark.plans.runner import Runner
from ensembl_datacheck_spark.registry import registry
from ensembl_datacheck_spark.sources import synth
import ensembl_datacheck_spark.checks  # register

cores = {cores}
job = "{job}"
spark = get_spark("decode-attrib", cores=cores,
                  shuffle_partitions=max(cores, 16), driver_memory="48g")
seq = spark.read.parquet("{data}/sequences")
tables = {{
    "sequences": seq,
    "sources": synth.gen_sources(spark),
    "baseline_stats": spark.read.parquet("{data}/baseline"),
}}

TOKEN_CHECKS = {{"SequencesCompleteness", "TokenInvariants"}}

def run_once():
    if job == "suite_full":
        specs = registry.default_suite()
        Runner(spark, tables, n_buckets=64).run(
            specs, write_checkpoints=False, parallelism=4)
    elif job == "suite_no_tok":
        specs = [s for s in registry.default_suite()
                 if s.name not in TOKEN_CHECKS]
        Runner(spark, tables, n_buckets=64).run(
            specs, write_checkpoints=False, parallelism=4)
    elif job == "decode_only":
        seq.agg(F.sum(F.size("tokens")).alias("total_tok"),
                F.sum(F.array_min("tokens")).alias("s_min"),
                F.sum(F.array_max("tokens")).alias("s_max")).collect()
    elif job == "narrow_only":
        seq.agg(F.count(F.lit(1)).alias("n"),
                F.sum("n_tok").alias("total_tok"),
                F.min("doc_id").alias("d0"),
                F.max("source").alias("s1")).collect()
    else:
        raise SystemExit(f"unknown job {{job}}")

# warm-up run (JIT + page cache), then best-of-2 steady-state walls
run_once()
walls = []
for _ in range(2):
    t0 = time.perf_counter()
    run_once()
    walls.append(time.perf_counter() - t0)

total_tok = seq.agg(F.sum("n_tok")).collect()[0][0]
out = {{"job": job, "cores": cores, "wall": min(walls), "walls": walls,
        "rows": seq.count(), "total_tok": int(total_tok)}}
if job == "suite_no_tok":
    # prove column pruning: rebuild the exact fused-counts plan from the
    # no-token predicate set and assert `tokens` is absent from the
    # parquet ReadSchema
    import io, contextlib
    from ensembl_datacheck_spark.plans.runner import Runner as _R
    from ensembl_datacheck_spark.plans.runner import CheckContext
    from ensembl_datacheck_spark.operators.fused import fused_violation_counts
    runner = _R(spark, tables, n_buckets=64)
    ctx = CheckContext(spark, tables, runner.config,
                       bucket_key=runner.bucket_key, n_buckets=64,
                       fact_table=runner.fact_table)
    preds, scan2 = [], seq
    for s in registry.default_suite():
        if s.row_predicates is not None and s.name not in TOKEN_CHECKS:
            ps, scan2 = s.row_predicates(ctx, scan2)
            preds.extend(ps)
    plans = io.StringIO()
    with contextlib.redirect_stdout(plans):
        fused_violation_counts(scan2, preds, runner._bucket()).explain("formatted")
    txt = plans.getvalue()
    out["tokens_pruned"] = "tokens" not in txt
    out["n_fused_preds_no_tok"] = len(preds)
print("RESULT " + json.dumps(out))
"""


def wait_for_quiet(max_load: float = 5.0, timeout_s: int = 240) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        load1 = float(open("/proc/loadavg").read().split()[0])
        if load1 < max_load:
            return
        time.sleep(10)


def run_job(data: str, cores: int, job: str) -> dict:
    code = WORKER.format(repo=REPO, cores=cores, data=data, job=job)
    out = subprocess.run([sys.executable, "-c", code], check=True,
                         capture_output=True, text=True)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise SystemExit(f"no RESULT line for {job}@{cores}:\n{out.stdout[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/dcheck_scaling_r2")
    ap.add_argument("--levels", type=int, nargs=2, default=[2, 8])
    ap.add_argument("--jobs", nargs="*", default=[
        "suite_full", "suite_no_tok", "decode_only", "narrow_only"])
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    results: dict[str, dict[int, dict]] = {}
    for job in args.jobs:
        results[job] = {}
        for cores in args.levels:
            wait_for_quiet()
            r = run_job(args.data, cores, job)
            results[job][cores] = r
            print(f"{job}@{cores}: wall={r['wall']:.2f}s walls={[f'{w:.2f}' for w in r['walls']]}",
                  file=sys.stderr)

    lo, hi = args.levels
    rows = None
    table = []
    for job in args.jobs:
        a, b = results[job][lo], results[job][hi]
        rows = a["rows"]
        speedup = a["wall"] / b["wall"]
        gbs_hi = a["total_tok"] * 4 / b["wall"] / 1e9
        table.append({"job": job, f"wall_{lo}c": a["wall"],
                      f"wall_{hi}c": b["wall"], "speedup": speedup,
                      "decoded_gb_per_s_at_hi": gbs_hi})
    summary = {"rows": rows, "levels": args.levels, "table": table,
               "tokens_pruned_no_tok": results.get("suite_no_tok", {})
                   .get(hi, {}).get("tokens_pruned")}
    print(json.dumps(summary, indent=2))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(
            {"results": {j: {str(c): v for c, v in cs.items()}
                         for j, cs in results.items()},
             "summary": summary}, indent=2))


if __name__ == "__main__":
    main()

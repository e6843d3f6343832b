"""Unigram-profile tier bench: portable explode-agg vs Arrow bincount
at 1M sequences (median 512 tokens, ~0.6B tokens) — the standing datum
for choosing `unigram_arrow` (TokenUnigramDrift config).

Input is materialized to parquet first so both tiers time the OPERATOR,
not the synth generation; runs are interleaved best-of-N.  Results →
BENCH/UNIGRAM_1M.md (hand-pasted with the host context).

Usage: python scripts/unigram_bench.py [n_rows] [runs]
"""

from __future__ import annotations

import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ensembl_datacheck_spark.operators.drift import unigram_profile  # noqa: E402
from ensembl_datacheck_spark.session import get_spark  # noqa: E402
from ensembl_datacheck_spark.sources import synth  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("unigram-bench", cores=32, shuffle_partitions=32,
                      driver_memory="48g")
    path = tempfile.mkdtemp(prefix="unigram_bench_") + "/seq"
    synth.gen_sequences(
        spark, n_rows, n_partitions=64, inject_violations=False
    ).write.parquet(path)
    seq = spark.read.parquet(path)
    n_tokens = seq.selectExpr("sum(size(tokens)) s").collect()[0]["s"]
    print(f"rows={n_rows} tokens={n_tokens}")

    walls: dict[str, list[float]] = {"portable": [], "arrow": []}
    for _ in range(runs):
        for tier, arrow in (("portable", False), ("arrow", True)):
            t0 = time.monotonic()
            # count() forces the full aggregation; result is vocab-sized
            n_bins = unigram_profile(seq, arrow=arrow).count()
            walls[tier].append(time.monotonic() - t0)
            print(f"{tier}: {walls[tier][-1]:.2f}s ({n_bins} bins)")
    for tier, ws in walls.items():
        best = min(ws)
        print(
            f"BEST {tier}: {best:.2f}s  "
            f"({n_tokens / best / 1e6:.0f}M tokens/s)"
        )


if __name__ == "__main__":
    main()

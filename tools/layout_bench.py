"""Layout A/B bench: single-row-group fixtures vs multi-file layout.

BASELINE.md documents a fixture-layout ceiling: every sf0.1 table is ONE
parquet file with ONE row group, so scans are structurally serial (parquet
splits at row-group granularity) no matter what
``spark.sql.files.maxPartitionBytes`` says. This tool turns that claim into
measured evidence: it rewrites the sf tables as multi-file parquet (the
shape a 100 TB corpus actually arrives in), runs the same headline mix on
both layouts in one session (bench.py's warm methodology), and prints the
per-query deltas.

Usage: python tools/layout_bench.py [sf_dir] [out_dir] [n_files]
Writes the twin under spark-warehouse/ by default; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402 — same mix, same labels


def rewrite_multifile(spark, sf_dir: str, out_dir: str, n_files: int) -> None:
    from dataflow_pubsub_message_encryption_spark.sources import TABLES

    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        dst = f"{out_dir}/{t}.parquet"
        if os.path.isdir(dst):
            continue  # twin already materialized
        df = spark.read.parquet(src)
        # events.ts reads as raw nanos (BIGINT) under nanosAsLong; written
        # back as BIGINT the engine's loader applies the same ns->us
        # conversion, so both layouts see identical values.
        df.repartition(n_files).write.mode("overwrite").parquet(dst)


def run_mix(spark, queries, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}
    for warm in (True, True, False, False):  # 2 warm + min-of-2 timed
        for label, key in HEADLINE:
            t0 = time.time()
            queries[key](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            if not warm:
                dt = round(time.time() - t0, 3)
                times[label] = min(times.get(label, dt), dt)
    return times


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "spark-warehouse",
            os.path.basename(sf_dir.rstrip("/")) + "-multifile",
        )
    )
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from dataflow_pubsub_message_encryption_spark.operators import registry
    from dataflow_pubsub_message_encryption_spark.session import get_session

    queries, _ = registry()
    spark = get_session("layout-bench")
    rewrite_multifile(spark, sf_dir, out_dir, n_files)

    single = run_mix(spark, queries, sf_dir)
    multi = run_mix(spark, queries, out_dir)
    print(
        json.dumps(
            {
                "metric": "headline mix, single-row-group vs multi-file layout",
                "unit": "sec",
                "n_files_per_table": n_files,
                "single_file_total": round(sum(single.values()), 3),
                "multi_file_total": round(sum(multi.values()), 3),
                "single": single,
                "multi": multi,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

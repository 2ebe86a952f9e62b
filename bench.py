#!/usr/bin/env python
"""Benchmark harness: headline = the full rollup pipeline (4 tiers +
gap-fill window + Gorilla chunks + manifest commit) over a deterministic
synthetic transcripts table, plus per-query timings of the driver-contract
queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "full_pipeline_wall", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "turns_total": N,
   "turns_per_sec": tps, "cores": C, ...}

Env:
  SPARK_GRAFT_SF_DIR   parquet dir for contract queries (default sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default: all cores)
  SPARK_GRAFT_BENCH_TURNS  approx synthetic turns for the pipeline
                           (default 2_000_000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from addax_spark import api, synth  # noqa: E402
from addax_spark.job import RollupJobSpec, run as run_job  # noqa: E402
from addax_spark.session import DEFAULT_SF_DIR, cpu_count, get_spark  # noqa: E402


def consume(df) -> int:
    """Force full execution without driver collection (noop sink)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    cores = cpu_count()
    target_turns = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", 2_000_000))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark("bench", cores=cores, shuffle_partitions=2 * cores,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})

    # ---- setup (untimed): materialize synthetic transcripts
    work = tempfile.mkdtemp(prefix="addax_bench_")
    raw_path = f"{work}/transcripts.parquet"
    # cold avg ~avg_turns, hot 1% x43 -> total ~ n_convs*avg*(0.99+0.43)
    avg = 100
    n_convs = max(200, int(target_turns / (avg * 1.42)))
    synth.transcripts(spark, n_convs=n_convs, avg_turns=avg).write.mode(
        "overwrite"
    ).parquet(raw_path)
    turns_total = spark.read.parquet(raw_path).count()

    # warm-up: tiny pipeline run to JIT/codegen the operators and spawn the
    # Python workers (cold local-mode JVMs cost ~2-3x on the first run;
    # steady-state is what BASELINE.md measures)
    warm = f"{work}/warm.parquet"
    synth.transcripts(spark, n_convs=50, avg_turns=20).write.mode("overwrite").parquet(warm)
    run_job(spark, RollupJobSpec(warm, f"{work}/warm_out", job_id="warm"))

    # ---- headline: full pipeline wall time
    t0 = time.time()
    summary = run_job(
        spark,
        RollupJobSpec(raw_path, f"{work}/out", job_id="bench"),
    )
    pipeline_wall = time.time() - t0

    # ---- per-query timings on the driver-provided tables
    # untimed: build the serving scratch output once, so serving_range /
    # serving_points time the PRUNED READ path (the build is the same
    # pipeline the headline metric already measures)
    api._serving_output(spark, sf_dir)

    queries: dict[str, float] = {}
    import __spark_entry__ as entrymod

    for name, q in entrymod.queries().items():
        t0 = time.time()
        consume(q(spark, sf_dir))
        queries[name] = round(time.time() - t0, 3)

    out = {
        "metric": "full_pipeline_wall",
        "value": round(pipeline_wall, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "turns_total": turns_total,
        "turns_per_sec": round(turns_total / pipeline_wall, 1),
        "cores": cores,
        "chunks_encoded": summary.get("chunks_encoded"),
        "bytes_raw": summary.get("bytes_raw"),
        "bytes_compressed": summary.get("bytes_compressed"),
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

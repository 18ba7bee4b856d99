"""Worker for scale_bench: run the extraction job once at a given core
count on a pre-materialized input and print one JSON line."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from surya_spark import pipeline  # noqa: E402
from surya_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores, n_docs, inp = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    # measure executor scaling, not AQE's serial driver re-planning
    os.environ.setdefault("SPARK_GRAFT_AQE", "0")
    # shuffle partition count is held CONSTANT across parallelism levels —
    # it is a property of the job, not of the resource allocation; varying
    # it would conflate plan changes with scaling
    spark = get_spark(app=f"scale_bench_{cores}", cores=cores,
                      shuffle_partitions=32)
    docs = spark.read.parquet(f"{inp}/documents_spans.parquet")
    blobs = spark.read.parquet(f"{inp}/page_blobs.parquet")
    # warmup: identical plan shape on a small separate input so the timed
    # run measures steady-state execution, not Janino codegen compilation
    wdocs = spark.read.parquet(f"{inp}_warm/documents_spans.parquet")
    wblobs = spark.read.parquet(f"{inp}_warm/page_blobs.parquet")
    pipeline.extract(wdocs, wblobs, with_tables=True) \
        .write.mode("overwrite").format("noop").save()
    # timed repetitions, report the min: single-JVM wall times on this
    # shared box vary ±15% run-to-run; min-of-n damps interference without
    # hiding real scaling behavior (both levels get the same treatment).
    # clearCache between reps — identical logical plans would otherwise
    # resolve to the previous rep's InMemoryRelation and measure cache
    # reads instead of the job.
    n_reps = int(os.environ.get("SPARK_GRAFT_REPS", "2"))
    reps = []
    for _ in range(n_reps):
        spark.catalog.clearCache()
        t0 = time.time()
        pipeline.extract(docs, blobs, with_tables=True) \
            .write.mode("overwrite").format("noop").save()
        reps.append(time.time() - t0)
    dt = min(reps)
    print(json.dumps({"cores": cores, "sec": round(dt, 3),
                      "reps": [round(r, 3) for r in reps],
                      "docs_per_sec": round(n_docs / dt, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()

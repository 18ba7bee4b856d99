"""spark-submit entry point: full extraction run.

Parity with the reference CLIs (surya_ocr / surya_detect / surya_layout /
surya_table, /root/reference/pyproject.toml:43-47) re-expressed for a
cluster: input is the interleaved documents table + page-blob table, not
a local folder; output is the out_spans table plus an optional JSON
export view; --resume makes the run pick up a killed job's checkpoints.

Usage:
  spark-submit --py-files surya_spark.zip scripts/extract.py \
      --documents /data/docs.parquet --blobs /data/blobs.parquet \
      --out /data/out_spans --checkpoint /data/ckpt \
      [--json-export /data/results_json] [--no-tables] [--synthetic N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from surya_spark import datagen, pipeline  # noqa: E402
from surya_spark.session import get_spark  # noqa: E402
from surya_spark.sources import json_sink  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents")
    ap.add_argument("--blobs")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic docs instead of reading")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="enable resumable checkpointed run at this base dir")
    ap.add_argument("--json-export", default=None)
    ap.add_argument("--no-tables", action="store_true")
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    spark = get_spark(app="surya_spark_extract", cores=args.cores)
    if args.synthetic:
        docs = datagen.gen_documents(spark, args.synthetic)
        blobs = datagen.gen_page_blobs(spark, args.synthetic)
    else:
        if not (args.documents and args.blobs):
            ap.error("--documents/--blobs or --synthetic required")
        docs = spark.read.parquet(args.documents)
        blobs = spark.read.parquet(args.blobs)

    t0 = time.time()
    if args.checkpoint:
        out = pipeline.checkpointed_extract(
            spark, docs, blobs, args.checkpoint)
    else:
        out = pipeline.extract(docs, blobs,
                               with_tables=not args.no_tables)
    out.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    dt = time.time() - t0
    print(f"extracted {n} docs in {dt:.1f}s ({n / dt:.1f} docs/s) -> {args.out}")

    if args.json_export:
        json_sink.write_results_json(spark.read.parquet(args.out),
                                     args.json_export)
        print(f"json export -> {args.json_export}")
    spark.stop()


if __name__ == "__main__":
    main()

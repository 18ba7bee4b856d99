"""Flagship decade evidence: run the identical fused extract pipeline at
N and 10N documents on the SAME core count and report docs/s at both —
linear wall-time of the fused passes means the two throughputs agree
within host variance (~15%). Complements the candidate-growth decades
(dedup/ANN, tools/sf1_evidence.py): those pin sub-quadratic candidate
generation; this pins the end-to-end per-page pipeline itself.

Each level runs in a fresh JVM (tools/scale_worker.py) so codegen
caches and shuffle state don't leak. Inputs are materialized parquet
(the deployment shape), generated once per size.

Usage: python tools/decade_bench.py [n_docs] [cores]   (default 4000 32)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    results = []
    for n in (n_docs, 10 * n_docs):
        inp = f"/tmp/decade_bench_input_{n}"
        if not os.path.exists(f"{inp}/documents_spans.parquet"):
            gen = (
                "import sys; sys.path.insert(0, %r)\n"
                "from surya_spark import datagen\n"
                "from surya_spark.session import get_spark\n"
                "spark = get_spark(app='gen', cores=%d)\n"
                "datagen.write_dataset(spark, %r, %d)\n"
                "spark.stop()" % (repo, cores, inp, n)
            )
            subprocess.run([sys.executable, "-c", gen], check=True,
                           cwd=repo)
        if not os.path.exists(f"{inp}_warm/documents_spans.parquet"):
            gen = (
                "import sys; sys.path.insert(0, %r)\n"
                "from surya_spark import datagen\n"
                "from surya_spark.session import get_spark\n"
                "spark = get_spark(app='gen', cores=8)\n"
                "datagen.write_dataset(spark, %r, 60)\n"
                "spark.stop()" % (repo, inp + "_warm")
            )
            subprocess.run([sys.executable, "-c", gen], check=True,
                           cwd=repo)
        out = subprocess.run(
            [sys.executable,
             os.path.join(repo, "tools", "scale_worker.py"),
             str(cores), str(n), inp],
            check=True, cwd=repo, capture_output=True, text=True,
        )
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")][-1]
        results.append({"n_docs": n, **json.loads(line)})

    r1, r10 = results
    print(json.dumps({
        "cores": cores,
        "level_N": r1,
        "level_10N": r10,
        "throughput_ratio_10N_over_N": round(
            r10["docs_per_sec"] / r1["docs_per_sec"], 3),
    }, indent=2))


if __name__ == "__main__":
    main()

"""Scaling-efficiency evidence for the north rule: run the identical
extraction job on the identical input at two parallelism levels
(local[N] vs local[4N]) and report throughput at both plus
efficiency = (T_N / T_4N) / 4  (equivalently docs/sec ratio / 4).

No real cluster exists in this sandbox (BASELINE.md); cores stand in for
executors. Each level runs in a fresh JVM (subprocess) so executor-thread
pools, codegen caches, and shuffle state don't leak between levels.

Usage: python tools/scale_bench.py [n_docs] [N]
Writes results to stdout as JSON; the caller records them in BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys




def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    inp = "/tmp/scale_bench_input"

    # materialize identical input once
    gen = (
        "import sys; sys.path.insert(0, %r);\n"
        "from surya_spark import datagen\n"
        "from surya_spark.session import get_spark\n"
        "spark = get_spark(app='gen', cores=16)\n"
        "datagen.write_dataset(spark, %r, %d)\n"
        "datagen.write_dataset(spark, %r, 60)\n"
        "spark.stop()" % (repo, inp, n_docs, inp + "_warm")
    )
    subprocess.run([sys.executable, "-c", gen], check=True, cwd=repo)

    results = []
    for cores in (n, 4 * n):
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "scale_worker.py"),
             str(cores), str(n_docs), inp],
            check=True, cwd=repo, capture_output=True, text=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))

    r_n, r_4n = results
    eff = (r_4n["docs_per_sec"] / r_n["docs_per_sec"]) / 4.0
    print(json.dumps({
        "n_docs": n_docs,
        "level_N": r_n,
        "level_4N": r_4n,
        "scaling_efficiency": round(eff, 3),
    }, indent=2))


if __name__ == "__main__":
    main()

"""Deduplication operators over a document corpus.

All built on DataFrame ops; the only Python is an Arrow-vectorized pandas
UDF for SimHash bit-packing. Scale notes per operator inline — every join
is equi-keyed (fingerprint, band bucket, or blocking key) so the shuffles
hash-partition evenly; nothing is O(n²) globally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as TX


def shingle_id_rows(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 3,
                    extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Flat (doc_id, [extra...], s) rows of DISTINCT hashed word k-shingles.

    Physical shape chosen by measurement: posexplode tokens → lead(k−1)
    window → xxhash64(tok, lead1, …) → dropDuplicates. Every step is
    whole-stage-codegen; the array-valued transform() formulation of the
    same thing evaluates interpreted and ran ~10× slower at sf0.1.
    Short docs (< k tokens) contribute one whole-text shingle, matching
    TX.shingles/shingle_ids semantics exactly."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in extra_cols],
        TX.tokenize_ws(TX.normalize_text(F.col(text_col))).alias("toks"),
    )
    ex = base.select(
        "doc_id", *extra_cols,
        F.size("toks").alias("nt"),
        F.array_join("toks", " ").alias("joined"),
        F.posexplode("toks").alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", j).over(w) for j in range(1, k)]
    sid = F.when(
        F.col("nt") >= k, F.xxhash64(F.col("tok"), *leads)
    ).otherwise(F.xxhash64(F.col("joined")))
    keep = ((F.col("nt") >= k) & (F.col("pos") <= F.col("nt") - k)) | (
        (F.col("nt") < k) & (F.col("pos") == 0)
    )
    return (
        ex.withColumn("s", sid)
        .filter(keep)
        .select("doc_id", *extra_cols, "s")
        .dropDuplicates(["doc_id", "s"])
    )


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact near-dup via content fingerprint (md5 of normalized text):
    rank within fingerprint group; keep = rank 1. One hash-partitioned
    shuffle on the fingerprint — at 100 TB this is the cheapest possible
    dedup (no pairwise work at all)."""
    w = Window.partitionBy("fp").orderBy(id_col)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            TX.fingerprint(F.col(text_col)).alias("fp"),
        )
        .withColumn("dup_rank", F.row_number().over(w).cast("long"))
        .withColumn("keep", F.col("dup_rank") == 1)
    )


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", block_col: str = "source",
                        k: int = 3, threshold: float = 0.5) -> DataFrame:
    """n-gram (word k-shingle) Jaccard via an inverted index: explode
    (doc, shingle), self-join on (block, shingle), count co-occurrences →
    |A∩B|; |A∪B| = |A|+|B|−|A∩B|.

    Only pairs that SHARE a shingle are ever materialized — the
    all-pairs-within-block array-intersection variant degrades
    quadratically with block size, while this shape scales with shingle
    co-occurrence. Shingles travel as hashed 64-bit ids (shingle_ids) and
    each side's set size rides along the exploded rows, so the whole
    operator is one self-join + one groupBy — no extra size joins, no
    string shuffles. The shuffle key is (block, shingle id); a
    stop-shingle cap would bound hot shingles at corpus scale."""
    rows = shingle_id_rows(docs, text_col, id_col, k,
                           extra_cols=(block_col,))
    ex = rows.withColumn(
        "n",
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).cast("double"),
    ).withColumnRenamed(block_col, "block")
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_inter"),
            F.first(F.col("a.n")).alias("n_a"),
            F.first(F.col("b.n")).alias("n_b"),
        )
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    jac = F.when(union > 0, F.col("n_inter") / union).otherwise(F.lit(0.0))
    return inter.select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3,
                       n_hashes: int = 64) -> DataFrame:
    """MinHash signature per doc: sig[i] = min over shingles of
    xxhash64(shingle_id, i).

    Physical form: explode hashed shingle ids → one groupBy with n_hashes
    min() aggregates → array. All JVM/codegen; the naive alternative
    (nested higher-order transforms over the shingle array) falls out of
    whole-stage codegen and runs ~50× slower — measured, not guessed."""
    ex = shingle_id_rows(docs, text_col, id_col, k)
    aggs = [
        F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return (
        ex.groupBy("doc_id")
        .agg(*aggs)
        .select(
            "doc_id",
            F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig"),
        )
    )


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 3,
                      n_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.5) -> DataFrame:
    """MinHash + LSH banding: band bucket = hash of a signature slice;
    candidates = equi-join on (band, bucket); candidates verified with
    exact shingle Jaccard. The shuffle key is the band bucket — uniform by
    construction — and verification only touches candidate pairs, which is
    what makes near-dup feasible at 10^12 docs."""
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(docs, text_col, id_col, k, n_hashes)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sh = shingle_id_rows(docs, text_col, id_col, k).groupBy("doc_id").agg(
        F.collect_list("s").alias("sh")
    )
    verified = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a")
                  .withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return verified.select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


_SIMHASH_OUT = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("simhash", T.LongType(), False),
])


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash per document via an Arrow-vectorized pandas iterator —
    the per-token ±1 bit voting is genuinely numpy territory. Near-dup pairs
    = small Hamming distance; pair generation uses 4-segment blocking
    (pigeonhole: dist ≤ 3 → at least one identical 16-bit segment)."""

    import hashlib

    def _tok_hash(t: str) -> int:
        # process-independent 64-bit token hash (python hash() varies by
        # PYTHONHASHSEED — never use it in a distributed job)
        return int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")

    def run(batches):
        for pdf in batches:
            ids, hashes = [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                toks = str(txt).lower().split()
                if toks:
                    hs = np.array([_tok_hash(t) for t in toks], dtype=np.uint64)
                    bitmat = ((hs[:, None] >> np.arange(bits, dtype=np.uint64))
                              & np.uint64(1)).astype(np.int64)
                    acc = (2 * bitmat - 1).sum(axis=0)
                else:
                    acc = np.zeros(bits, dtype=np.int64)
                val = int(((acc > 0).astype(np.uint64)
                           << np.arange(bits, dtype=np.uint64)).sum())
                ids.append(int(did))
                hashes.append(val - (1 << 64) if val >= (1 << 63) else val)
            yield pd.DataFrame({"doc_id": ids, "simhash": hashes})

    return docs.select(id_col, text_col).mapInPandas(run, schema=_SIMHASH_OUT)


def simhash_pairs(sim: DataFrame, max_dist: int = 3) -> DataFrame:
    """Hamming-near pairs via segment blocking: explode each hash into 4
    16-bit segments, equi-join on (segment_idx, segment_value), verify with
    bit_count(xor) ≤ max_dist. No cross join anywhere."""
    seg = sim.select(
        "doc_id", "simhash",
        F.posexplode(
            F.array(*[
                F.shiftright("simhash", s * 16).bitwiseAND(F.lit(0xFFFF))
                for s in range(4)
            ])
        ).alias("seg_idx", "seg_val"),
    )
    a, b = seg.alias("a"), seg.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.seg_idx") == F.col("b.seg_idx"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_dist)

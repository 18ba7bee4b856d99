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
from ..plans import caching

# 31-bit Mersenne prime for the minhash linear-permutation family
# sig_i(x) = (a_i * (h(x) mod P) + b_i) mod P — products stay < 2^62 so the
# arithmetic is exact in BIGINT on both Spark and DuckDB (oracle parity)
# with no overflow even under ANSI mode.
LIN_P = 2_147_483_647


def lin_coeffs(n: int, seed: int = 20240816) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the linear minhash permutations.
    Shared by the Spark implementation and the DuckDB oracle generator."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, LIN_P), rng.randrange(0, LIN_P))
            for _ in range(n)]


def md5_id60(col) -> "F.Column":
    """Positive 60-bit id from the first 15 hex chars of md5 — chosen
    because DuckDB computes the identical value as
    ('0x' || substr(md5(x), 1, 15))::BIGINT, giving hash-level oracle
    parity (xxhash64 has no DuckDB equivalent)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingle_id_rows(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 3,
                    extra_cols: tuple[str, ...] = (),
                    hashed: str = "xxhash64") -> DataFrame:
    """Flat (doc_id, [extra...], s) rows of DISTINCT hashed word k-shingles.

    Physical shape chosen by measurement: posexplode tokens → lead(k−1)
    window → xxhash64(tok, lead1, …) → dropDuplicates. Every step is
    whole-stage-codegen; the array-valued transform() formulation of the
    same thing evaluates interpreted and ran ~10× slower at sf0.1.
    Short docs (< k tokens) contribute one whole-text shingle, matching
    TX.shingles/shingle_ids semantics exactly.

    hashed='xxhash64' (fast JVM path) or 'md5' (md5_id60 of the
    space-joined shingle string — bit-replicable by the DuckDB oracle).

    r7 physical cleanups, same rows out:
    * the input is spread across the cluster BEFORE the regex
      normalization (single-row-group corpus files scan as ONE task, and
      the normalize chain was measured running serially — 5.2 s of the
      family's ~15 s at sf1.0); the repartition is on doc_id so the
      shingle window reuses the same exchange;
    * short docs (< k tokens) explode their whole joined text as the one
      "token" instead of carrying the joined text ON EVERY exploded row
      (xxhash64/concat_ws skip NULL lead args, so the single-row branch
      hashes to exactly the old md5_id60(joined)/xxhash64(joined)) —
      that column was ~8× the shuffle bytes of the window exchange."""
    from ..plans import partitioning

    base = partitioning.spread_small_input(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in extra_cols],
        TX.tokenize_ws(TX.normalize_text(F.col(text_col))).alias("toks"),
    )
    nt = F.size("toks")
    explodable = (
        F.when(nt >= k, F.col("toks"))
        .when(nt >= 1, F.array(F.array_join("toks", " ")))
        .otherwise(F.col("toks"))  # empty array → no rows, as before
    )
    ex = base.select(
        "doc_id", *extra_cols,
        nt.alias("nt"),
        F.posexplode(explodable).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", j).over(w) for j in range(1, k)]
    if hashed == "md5":
        # NULL leads (short-doc single row) vanish from concat_ws →
        # md5_id60 of the joined text, exactly the old short-doc branch
        sid = md5_id60(F.concat_ws(" ", F.col("tok"), *leads))
    else:
        sid = F.xxhash64(F.col("tok"), *leads)
    keep = (F.col("nt") < k) | (F.col("pos") <= F.col("nt") - k)
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
                        k: int = 3, threshold: float = 0.5,
                        df_cap: int | None = None) -> DataFrame:
    """n-gram (word k-shingle) Jaccard via an inverted index: explode
    (doc, shingle), self-join on (block, shingle), count co-occurrences →
    |A∩B|; |A∪B| = |A|+|B|−|A∩B|.

    Only pairs that SHARE a shingle are ever materialized — the
    all-pairs-within-block array-intersection variant degrades
    quadratically with block size, while this shape scales with shingle
    co-occurrence. Shingles travel as hashed 64-bit ids (shingle_ids);
    per-doc set sizes attach at PAIR grain after the co-occurrence
    aggregate (r7 — keeping them on the exploded rows forced an extra
    doc_id window shuffle of the whole index between the df-cap window
    and the self-join). The shuffle key is (block, shingle id), and the
    self-join reuses the df-cap window's exchange.

    df_cap bounds hot-shingle skew: a shingle present in more than df_cap
    docs within a block (a stop-shingle like "the the of") would make the
    self-join quadratic on that one key at corpus scale. With df_cap set,
    such shingles are removed from the universe BEFORE the join — both
    from the index and from the per-doc set sizes, so the result is the
    exact Jaccard over the capped shingle universe (a well-defined,
    oracle-replicable semantic, not an approximation of the uncapped one).
    Worst-case join fan-out per (block, shingle) key is then df_cap²."""
    with caching.scope() as (handles, is_owner):
        return caching.owned(
            _ngram_jaccard_body(docs, text_col, id_col, block_col, k,
                                threshold, df_cap),
            handles, is_owner)


def _ngram_jaccard_body(docs, text_col, id_col, block_col, k, threshold,
                        df_cap):
    rows = shingle_id_rows(docs, text_col, id_col, k,
                           extra_cols=(block_col,))
    if df_cap is not None:
        wdf = Window.partitionBy(block_col, "s")
        rows = (
            rows.withColumn("_df", F.count(F.lit(1)).over(wdf))
            .filter(F.col("_df") <= df_cap)
            .drop("_df")
        )
    # r7 plan shape: the df window leaves the index hash-partitioned on
    # (block, s) — exactly the self-join key — so the join consumes that
    # one exchange (ReusedExchange on both sides). The pre-r7 per-doc
    # set-size WINDOW between them re-shuffled the whole index to doc_id
    # and back; set sizes now attach at PAIR grain (two small joins on an
    # aggregate ~50k-row table), the _jaccard_over_candidates shape. The
    # capped index feeds three consumers → persist (CLAUDE.md rule 2).
    ex = caching.managed(rows.withColumnRenamed(block_col, "block"))
    n = ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"))
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
        .agg(F.count(F.lit(1)).cast("double").alias("n_inter"))
    )
    withn = (
        inter
        .join(n.select(F.col("doc_id").alias("doc_a"),
                       F.col("n").alias("n_a")).hint("shuffle_hash"),
              "doc_a")
        .join(n.select(F.col("doc_id").alias("doc_b"),
                       F.col("n").alias("n_b")).hint("shuffle_hash"),
              "doc_b")
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    jac = F.when(union > 0, F.col("n_inter") / union).otherwise(F.lit(0.0))
    return withn.select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def _minhash_wide(rows: DataFrame, n_hashes: int,
                  hash_mode: str) -> DataFrame:
    """(doc_id, h0..h{n-1}) from flat shingle-id rows: one groupBy with
    n_hashes min() aggregates. All JVM/codegen; the naive alternative
    (nested higher-order transforms over the shingle array) falls out of
    whole-stage codegen and runs ~50× slower — measured, not guessed.

    hash_mode='xxhash64': sig_i = min xxhash64(s, i) (fast JVM path).
    hash_mode='md5lin':   sig_i = min (a_i·(s mod P) + b_i) mod P over the
    md5-based 60-bit shingle ids — one md5 per shingle plus 64 exact
    integer multiply-adds, replicable bit-for-bit by the DuckDB oracle."""
    if hash_mode == "md5lin":
        coeffs = lin_coeffs(n_hashes)
        sm = F.pmod(F.col("s"), F.lit(LIN_P))
        aggs = [
            F.min(F.pmod(F.lit(a) * sm + F.lit(b), F.lit(LIN_P))).alias(f"h{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    else:
        aggs = [
            F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    return rows.groupBy("doc_id").agg(*aggs)


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3,
                       n_hashes: int = 64,
                       hash_mode: str = "xxhash64") -> DataFrame:
    """MinHash signature array per doc (see _minhash_wide)."""
    sh_hash = "md5" if hash_mode == "md5lin" else "xxhash64"
    ex = shingle_id_rows(docs, text_col, id_col, k, hashed=sh_hash)
    return _minhash_wide(ex, n_hashes, hash_mode).select(
        "doc_id",
        F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig"),
    )


def _jaccard_over_candidates(cand: DataFrame, rows: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs WITHOUT shipping shingle arrays:
    semi-join the flat (doc_id, s) index on candidate docs, then count
    co-occurrences per pair with two equi-joins. No collect_list — a
    10⁵-shingle document contributes 10⁵ small rows to a hash shuffle
    instead of a 10⁵-element array on every candidate pair row."""
    # cand feeds THREE consumers (both docs_c branches + the inter join)
    # and r feeds FOUR (ra, rb, and n joined twice) — without persist
    # Spark re-executes the banding join per branch: measured 38 s vs ~1 s
    # on a 50-doc warmup (lineage re-execution, CLAUDE.md rule #2).
    # caching.managed registers for release on the result's first action.
    cand = caching.managed(cand)
    docs_c = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    r = caching.managed(rows.select("doc_id", "s").join(
        docs_c, "doc_id", "left_semi"))
    # set sizes only for candidate docs — counting over the full corpus
    # would shuffle every document's shingles for nothing
    n = r.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"))
    inter = (
        cand
        .join(r.select(F.col("doc_id").alias("doc_a"), "s"), "doc_a")
        .join(r.select(F.col("doc_id").alias("doc_b"), "s"), ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("double").alias("n_inter"))
    )
    out = (
        inter
        .join(n.select(F.col("doc_id").alias("doc_a"),
                       F.col("n").alias("n_a")), "doc_a")
        .join(n.select(F.col("doc_id").alias("doc_b"),
                       F.col("n").alias("n_b")), "doc_b")
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    jac = F.when(union > 0, F.col("n_inter") / union).otherwise(F.lit(0.0))
    return out.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 3,
                      n_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.5,
                      hash_mode: str = "xxhash64") -> DataFrame:
    """MinHash + LSH banding: band bucket = the signature slice itself
    (comma-joined); candidates = equi-join on (band, bucket); candidates
    verified with exact shingle Jaccard via candidate-restricted
    co-occurrence counting (_jaccard_over_candidates — no shingle arrays
    ever shuffle). The shuffle key is the band bucket — uniform by
    construction — which is what makes near-dup feasible at 10^12 docs.

    Output = pairs that are LSH candidates AND whose exact Jaccard ≥
    threshold (banding recall at low thresholds is probabilistic — callers
    wanting exhaustive low-similarity pairs should use ngram_jaccard_pairs).
    hash_mode='md5lin' makes every hash DuckDB-replicable (oracle parity);
    'xxhash64' is the fastest JVM path."""
    rows_per_band = n_hashes // bands
    sh_hash = "md5" if hash_mode == "md5lin" else "xxhash64"
    with caching.scope() as (handles, is_owner):
        # the flat shingle index feeds BOTH the signature agg and the
        # verify joins — persist or Spark re-executes the lineage per
        # branch; released by the first action on the returned pairs
        rows = caching.managed(
            shingle_id_rows(docs, text_col, id_col, k, hashed=sh_hash))
        wide = _minhash_wide(rows, n_hashes, hash_mode)
        band_cols = [
            F.concat_ws(",", *[
                F.col(f"h{b * rows_per_band + j}").cast("string")
                for j in range(rows_per_band)
            ])
            for b in range(bands)
        ]
        banded = wide.select(
            "doc_id",
            F.posexplode(F.array(*band_cols)).alias("band", "bucket")
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
        out = _jaccard_over_candidates(cand, rows).filter(
            F.col("jaccard") >= threshold
        )
        return caching.owned(out, handles, is_owner)


_SIMHASH_OUT = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("simhash", T.LongType(), False),
])


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", bits: int = 64,
            hash_mode: str = "xxhash64") -> DataFrame:
    """64-bit SimHash per document. Near-dup pairs = small Hamming
    distance; pair generation uses segment blocking (pigeonhole: dist ≤ 3
    → at least one identical 16-bit segment), see simhash_pairs.

    hash_mode='xxhash64' (default): the ENTIRE signature is JVM-side —
    posexplode normalized tokens → xxhash64 per token → 64 CASE-vote sum
    aggregates → sign pack, all whole-stage codegen, zero Python in the
    path (round-6: this was the last per-item Python loop in the dedup
    family; the token-hash kernel dominates signature cost at corpus
    scale). One shuffle (the vote groupBy on doc_id).
    hash_mode='md5': per-token md5 in an Arrow-batched numpy kernel,
    replicable bit-for-bit by the DuckDB oracle (md5 → low 8 bytes
    little-endian) — the correctness-gate mode. Same ±1 vote and
    strict sign rule in both modes; empty/token-less docs sign to 0.

    Tokens come from the SAME normalize_text universe as
    shingle_id_rows/minhash (HTML/math stripped, bullets standardized,
    whitespace collapsed, lowercased) — one documented normalization for
    every dedup operator; normalization always runs as JVM column
    expressions.

    COMPATIBILITY: the round-6 default flip to 'xxhash64' changed the
    signature VALUES for default callers — signatures persisted by
    earlier md5-mode runs are incompatible with newly computed xxhash64
    ones. Pipelines that store signatures and re-join them across
    versions must pin hash_mode explicitly (advisor finding)."""
    if hash_mode == "xxhash64":
        if bits != 64:
            raise ValueError("xxhash64 mode emits 64-bit signatures")
        from ..plans import partitioning

        # spread BEFORE the regex normalization: single-row-group corpus
        # files scan as one task (r7; see shingle_id_rows) — keyed on the
        # doc id so the vote groupBy reuses the exchange.
        # The cast mirrors the md5 kernel's int(did): a NON-numeric id
        # must fail loudly (advisor finding — a silently-NULL cast would
        # collapse all such docs into one NULL signature group).
        # try_cast + raise_error gives the same loud failure whether or
        # not ANSI mode is on (ANSI's own CAST_INVALID_INPUT would fire
        # first under the default config, with a less specific message).
        did = F.col(id_col).try_cast("long")
        norm = partitioning.spread_small_input(docs, id_col).select(
            F.when(
                F.col(id_col).isNotNull() & did.isNull(),
                F.raise_error(F.concat(
                    F.lit("simhash: non-numeric doc id "),
                    F.col(id_col).cast("string"))).cast("long"),
            ).otherwise(did).alias("doc_id"),
            TX.normalize_text(F.col(text_col)).alias("_t"))
        # empty tokens (blank doc → split yields ['']) hash to NULL and
        # vote 0 on every bit, so token-less docs still reach the groupBy
        # and sign to 0 exactly like the md5 kernel — no second scan or
        # re-join of the input needed
        th = norm.select(
            "doc_id",
            F.explode(F.split(F.col("_t"), " ")).alias("tok"),
        ).select(
            "doc_id",
            F.when(F.col("tok") != "", F.xxhash64("tok")).alias("th"),
        )
        # each vote/pack expression is ONE SQL string (late-round-1 rule:
        # composing hundreds of Column objects through py4j is driver
        # time; F.expr parses to the same plan with the same semantics).
        # r7: vote v_k = (+1 per set bit, −1 per clear bit over non-null
        # tokens) = 2·ones_k − n, so the per-row agg update is a bare
        # shift-and-mask sum plus ONE shared count instead of 64
        # three-branch CASEs; sum() skips NULL th (empty-token rows)
        # exactly like the old CASE's 0 arm. Sign rule v_k > 0 becomes
        # 2·ones_k > n — identical packs.
        votes = th.groupBy("doc_id").agg(
            F.expr("count(th)").alias("n_tok"),
            *[F.expr(f"sum(shiftright(th, {k}) & 1)").alias(f"o{k}")
              for k in range(bits)])
        pack = " + ".join(
            f"(CASE WHEN 2 * o{k} > n_tok THEN "
            f"shiftleft(CAST(1 AS BIGINT), {k}) "
            f"ELSE CAST(0 AS BIGINT) END)"
            for k in range(bits)
        )
        return votes.select(
            "doc_id", F.expr(pack).alias("simhash"))
    if hash_mode != "md5":
        raise ValueError(f"unknown hash_mode {hash_mode!r}")

    import hashlib

    from ..plans import partitioning

    # r7: spread before the Python kernel — the md5 signature ran on the
    # corpus file's TWO scan partitions (9 s of the bench query at sf1.0
    # was this kernel on 2 of 32 workers)
    docs = partitioning.spread_small_input(docs, id_col).select(
        F.col(id_col), TX.normalize_text(F.col(text_col)).alias(text_col))

    def run(batches):
        # token-hash memo (r7): md5 is deterministic, and corpus
        # vocabulary is tiny relative to token instances — one md5 per
        # DISTINCT token per task instead of one per occurrence
        memo: dict[str, int] = {}

        def _tok_hash(t: str) -> int:
            # process-independent 64-bit token hash (python hash() varies
            # by PYTHONHASHSEED — never use it in a distributed job)
            h = memo.get(t)
            if h is None:
                h = int.from_bytes(
                    hashlib.md5(t.encode()).digest()[:8], "little")
                memo[t] = h
            return h

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
    """Hamming-near pairs via segment blocking: explode each hash into
    max_dist+1 disjoint bit segments, equi-join on (segment_idx,
    segment_value), verify with bit_count(xor) ≤ max_dist. No cross join
    anywhere, and recall is EXACT by pigeonhole: two hashes within Hamming
    distance d differ in at most d of the d+1 segments, so at least one
    segment is identical and the pair is always a candidate.

    Blocking selectivity degrades as segments shrink (max_dist=3 → four
    16-bit segments; max_dist=16 → seventeen ~4-bit segments whose buckets
    collide massively) — large max_dist on a large corpus approaches
    all-pairs and callers should lower it or pre-block."""
    if not 1 <= max_dist <= 62:
        raise ValueError("max_dist must be in [1, 62]")
    n_seg = max_dist + 1
    bounds = [64 * i // n_seg for i in range(n_seg + 1)]
    seg_exprs = []
    for i in range(n_seg):
        start, width = bounds[i], bounds[i + 1] - bounds[i]
        mask = (1 << width) - 1
        # arithmetic shiftright fills sign bits; the width mask cuts them
        seg_exprs.append(
            F.shiftright(F.col("simhash"), start).bitwiseAND(F.lit(mask)))
    seg = sim.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*seg_exprs)).alias("seg_idx", "seg_val"),
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
            ).cast("int").alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_dist)


def _banded(wide: DataFrame, n_hashes: int, bands: int) -> DataFrame:
    """(doc_id, h0..h{n-1}) → exploded (doc_id, band, bucket) rows; the
    bucket is the comma-joined signature slice (the LSH band key)."""
    rows_per_band = n_hashes // bands
    band_cols = [
        F.concat_ws(",", *[
            F.col(f"h{b * rows_per_band + j}").cast("string")
            for j in range(rows_per_band)
        ])
        for b in range(bands)
    ]
    return wide.select(
        "doc_id", F.posexplode(F.array(*band_cols)).alias("band", "bucket"))


def minhash_index(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 3,
                  n_hashes: int = 64,
                  hash_mode: str = "md5lin") -> DataFrame:
    """The compact corpus signature index (doc_id, h0..h{n-1}) — the
    ~300 B/doc table a rolling crawl materializes ONCE and appends to;
    feed it to minhash_novelty(corpus_index=) so new batches never
    re-read or re-shingle corpus text. Streaming analog:
    streaming/ingest.stream_incremental_dedup."""
    sh_hash = "md5" if hash_mode == "md5lin" else "xxhash64"
    return _minhash_wide(
        shingle_id_rows(docs, text_col, id_col, k, hashed=sh_hash),
        n_hashes, hash_mode)


def minhash_novelty(new_docs: DataFrame,
                    corpus_docs: DataFrame | None = None,
                    text_col: str = "text", id_col: str = "doc_id",
                    threshold: float = 0.5, k: int = 3,
                    n_hashes: int = 64, bands: int = 16,
                    hash_mode: str = "md5lin",
                    corpus_index: DataFrame | None = None) -> DataFrame:
    """INCREMENTAL dedup: flag each NEW document as novel or near-dup of
    the EXISTING corpus — the operation a rolling crawl actually runs (a
    new batch never re-pairs the whole corpus with itself).

    Shape: minhash band buckets on both sides (same hash family), new →
    corpus candidate generation as an equi-join on (band, bucket), then
    similarity estimated from SIGNATURE AGREEMENT (fraction of equal
    minhash components — the standard unbiased Jaccard estimator). The
    corpus side needs only its 64-int signature + band index, NOT its
    shingles, so at 10^12 docs the index is a compact bucketed table
    (~300 B/doc) and a new batch's cost is candidates × a 64-component
    comparison — no corpus text is ever re-read or re-shuffled.

    Returns one row per new doc: (doc_id, max_est double, is_novel).
    est values are exact multiples of 1/64 — oracle-replicable without
    tolerance. Output with threshold t: is_novel ⇔ no candidate with
    est ≥ t."""
    if (corpus_docs is None) == (corpus_index is None):
        raise ValueError("pass exactly one of corpus_docs / corpus_index")
    with caching.scope() as (handles, is_owner):
        new_wide = caching.managed(minhash_index(
            new_docs, text_col, id_col, k, n_hashes, hash_mode))
        corp_wide = caching.managed(
            corpus_index if corpus_index is not None
            else minhash_index(corpus_docs, text_col, id_col, k,
                               n_hashes, hash_mode))
        cand = (
            _banded(new_wide, n_hashes, bands).alias("n")
            .join(_banded(corp_wide, n_hashes, bands).alias("c")
                  .hint("shuffle_hash"),
                  (F.col("n.band") == F.col("c.band"))
                  & (F.col("n.bucket") == F.col("c.bucket")))
            .select(F.col("n.doc_id").alias("new_id"),
                    F.col("c.doc_id").alias("corp_id"))
            .distinct()
        )
        agree = sum(
            (F.col(f"a.h{i}") == F.col(f"b.h{i}")).cast("int")
            for i in range(n_hashes)
        )
        est = (
            cand
            .join(new_wide.alias("a"),
                  F.col("new_id") == F.col("a.doc_id"))
            .join(corp_wide.alias("b").hint("shuffle_hash"),
                  F.col("corp_id") == F.col("b.doc_id"))
            .select("new_id",
                    (agree.cast("double") / F.lit(float(n_hashes)))
                    .alias("est"))
            .groupBy("new_id")
            .agg(F.max("est").alias("max_est"))
        )
        out = (
            new_docs.select(F.col(id_col).alias("doc_id"))
            .join(est.withColumnRenamed("new_id", "doc_id")
                  .hint("shuffle_hash"), "doc_id", "left")
            .select(
                "doc_id",
                F.round(F.coalesce(F.col("max_est"), F.lit(0.0)), 6)
                .alias("max_est"),
                (F.coalesce(F.col("max_est"), F.lit(0.0))
                 < F.lit(threshold)).alias("is_novel"),
            )
        )
        return caching.owned(out, handles, is_owner)

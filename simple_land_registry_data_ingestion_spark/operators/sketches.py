"""Streaming-sketch operators: bounded-memory heavy hitters.

The pattern that matters at 100 TB is CANDIDATES-THEN-VERIFY: a
bounded-memory sketch pass proposes a small candidate set, and an exact
second pass counts only the candidates.  The sketch's one-sided error
(a superset, never a miss) makes the final answer EXACT while phase 1
holds k counters per partition regardless of key cardinality — the plain
``groupBy(key).count()`` alternative shuffles every distinct key, which
for a high-cardinality key at 100 TB is the whole table.

Reference scope: the reference pipeline (/root/reference/main.py) has no
aggregation beyond one MAX; sketches are part of the training-pipeline
surface this repo adds (SURVEY.md section 2 X-rows).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark.tables import fan_out, load

#: Counters per partition for the Misra-Gries pass.  Guarantee (batched
#: eviction): each eviction keeps at most k counters and subtracts the same
#: `drop` from every survivor while discarding keys whose count <= drop, so
#: the cumulative decrement applied to any single key over the partition is
#: < N_p/k (each eviction round removes > k*drop total mass from counters,
#: and total mass is N_p).  Hence any key with partition frequency > N_p/k
#: survives, and any key with GLOBAL frequency >= N/d (d <= k) holds
#: >= N_p/d >= N_p/k in at least one partition (pigeonhole) and survives
#: there.  This is slightly weaker than the classic per-decrement bound
#: N_p/(k+1), but still a strict superset for every denom <= k, which is
#: what the `denom <= k` check below enforces.
MG_COUNTERS = 512

#: Heavy-hitter support threshold denominator: report keys with
#: count >= N/DENOM.  Must be <= MG_COUNTERS for the superset guarantee.
HH_DENOM = 256


def _misra_gries_partition(
    batches: Iterator[pd.DataFrame], k: int
) -> Iterator[pd.DataFrame]:
    """Weighted Misra-Gries over one partition's batches: k counters, each
    batch pre-aggregated with value_counts (so the per-batch cost is
    O(distinct-in-batch + k), not O(rows))."""
    counters: dict[int, int] = {}
    for batch in batches:
        for key, cnt in batch["key"].value_counts().items():
            key = int(key)
            counters[key] = counters.get(key, 0) + int(cnt)
        if len(counters) > k:
            # decrement all by the smallest excess counter value; keys
            # hitting zero drop out (the classic MG eviction, batched)
            drop = sorted(counters.values())[len(counters) - k - 1]
            counters = {
                key: cnt - drop for key, cnt in counters.items() if cnt > drop
            }
    yield pd.DataFrame({"key": pd.Series(list(counters), dtype="int64")})


def heavy_hitters_exact(
    df: DataFrame, key: str, denom: int = HH_DENOM, k: int = MG_COUNTERS
) -> DataFrame:
    """Keys occurring at least count(*)/denom times, with EXACT counts.

    Phase 1 (bounded memory, no shuffle): per-partition Misra-Gries with k
    counters proposes candidates — a guaranteed superset of every key with
    global frequency >= N/denom for denom <= k.
    Phase 2 (exact): the candidate set (at most k * n_partitions keys,
    thousands at any scale) broadcast-semi-joins the table and only those
    keys are counted exactly; the N/denom threshold is applied to the
    exact counts, so the output is identical to the full GROUP BY's.
    """
    if denom > k:
        raise ValueError(f"denom={denom} must be <= k={k} for the superset guarantee")
    keyed = df.select(F.col(key).cast("long").alias("key"))
    candidates = (
        keyed.mapInPandas(
            lambda it: _misra_gries_partition(it, k), "key long"
        )
        .distinct()
    )
    total = keyed.agg(F.count(F.lit(1)).alias("n_total"))
    exact = (
        keyed.join(F.broadcast(candidates), "key")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("n_events") >= F.col("n_total") / F.lit(float(denom)))
        .select(F.col("key").alias(key), "n_events")
    )


def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users generating >= 1/256 of all events — the hot-key detector a
    skew-aware pipeline runs before choosing salting factors."""
    events = load(spark, sf_dir, "events")
    return heavy_hitters_exact(events, "user_id")


def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch certification for HLL distinct counting (Apache
    DataSketches via hll_sketch_agg): the whole-corpus estimate must (a)
    EQUAL the estimate from unioning independently-built per-day sketches
    — the mergeability that makes sketches work on a cluster, where every
    partition builds its own and the combiner unions — and (b) sit within
    the configured relative error of the exact count.

    Output carries the exact count plus two booleans; the estimates
    themselves stay out of the result on purpose (they are
    implementation-defined — only their PROPERTIES are cross-engine
    facts, so only the properties are hashed).  Same self-certification
    pattern as agg_approx_quantile_error / similarity_recall_at_k.

    Plan: two aggregations over one scan lineage (direct sketch; per-day
    sketches then a union-agg over the day-count-sized frame) plus the
    exact distinct — the one shuffle a sketch deployment exists to avoid,
    paid here only because this IS the certification query."""
    events = load(spark, sf_dir, "events")
    direct = events.groupBy().agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_direct")
    )
    merged = (
        events.groupBy(F.to_date("ts").alias("d"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy()
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged"))
    )
    exact = events.groupBy().agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    # lgConfigK=12 default -> relative standard error ~1.6%; 5% is > 3 RSE
    bound = 0.05
    # merge_consistent: DataSketches register semantics make direct == merged
    # EXACTLY today (Spark 4.1 bundles DataSketches with lossless HLL_4
    # union at same lgK), but that is an implementation detail — certify to
    # a 1e-9 relative tolerance so a library upgrade that reorders float
    # folds cannot flip the row red without a real mergeability bug
    # (r04 advice; the oracle hardcodes TRUE either way).
    merge_tol = 1e-9
    return (
        direct.crossJoin(merged)
        .crossJoin(exact)
        .select(
            "exact_distinct",
            (
                F.abs(F.col("est_direct") - F.col("est_merged"))
                <= F.lit(merge_tol) * F.col("est_direct")
            ).alias("merge_consistent"),
            (
                F.abs(F.col("est_direct") - F.col("exact_distinct"))
                <= F.lit(bound) * F.col("exact_distinct")
            ).alias("within_rel_bound"),
        )
    )


def agg_count_min_sketch(
    spark: SparkSession, sf_dir: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Count-Min sketch built ENTIRELY from relational ops, certified
    against exact counts (Cormode & Muthukrishnan 2005): ``depth``
    independent hash rows of ``width`` counters each; a key's estimate is
    the MIN over rows of its cell total.  The classic guarantees — never
    underestimates, overestimate bounded by colliding mass — fall out of
    the construction and the driver's hash gate certifies them row by row
    (the DuckDB twin builds the identical sketch: md5-derived row hashes
    are engine-portable, so both engines produce byte-identical cells).

    Plan at 100 TB: the sketch IS the aggregation pattern — one exact
    groupBy on the key would shuffle every distinct key, while the CMS
    cells are depth*width counters TOTAL, built with a map-side-combined
    groupBy on (row, bucket): constant-size shuffle regardless of key
    cardinality.  Here the exact counts are also computed (that is the
    certification), so the expensive path runs once to prove the cheap
    path right; production keeps only the cells.  Estimate lookup is a
    broadcast join of the key list against depth tiny cell frames.

    Output: one row per distinct user_id with exact count, CMS estimate,
    and the overestimate (>= 0 by construction)."""
    events = load(spark, sf_dir, "events")
    exact = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )

    def bucket(row: int):
        # first 8 md5 hex chars -> 32-bit int -> % width; portable to the
        # oracle's ('0x' || substring(md5(...), 1, 8))::BIGINT % width
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{row}:"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % width
        )

    # keyed is distinct-key-sized (tiny next to the corpus) and feeds five
    # consumers (the key frame + one cell aggregate per depth row); lazily
    # materialize it so the corpus is scanned and exact-aggregated ONCE —
    # without this each cell frame replays the full scan+groupBy (plan
    # audit showed 5 parquet scans).
    keyed = exact.select(
        "user_id", "n_exact", *[bucket(r).alias(f"b{r}") for r in range(depth)]
    ).localCheckpoint(eager=False)
    est = keyed
    for r in range(depth):
        cells = keyed.groupBy(f"b{r}").agg(F.sum("n_exact").alias(f"cell{r}"))
        est = est.join(F.broadcast(cells), f"b{r}")
    return est.select(
        "user_id",
        "n_exact",
        F.least(*[F.col(f"cell{r}") for r in range(depth)]).alias("n_cms"),
        (
            F.least(*[F.col(f"cell{r}") for r in range(depth)]) - F.col("n_exact")
        ).alias("overestimate"),
    )


def agg_bloom_filter_fpr(
    spark: SparkSession, sf_dir: str, m: int = 4096, k: int = 3
) -> DataFrame:
    """Bloom-filter certification built ENTIRELY from relational ops
    (Bloom 1970): insert every BUYER (distinct o_custkey) into an m-bit
    filter via k md5-derived bit positions, probe every NON-buyer
    customer, and report the measured false-positive rate next to the
    classic bound — the same self-certification pattern as
    agg_count_min_sketch (both engines build byte-identical filters, so
    the driver hashes the whole certification row).

    Why it matters at 100 TB: a Bloom filter is the standard shuffle
    killer for selective joins (Spark's own runtime bloom-filter join
    pruning, pinned on in session defaults, is exactly this structure);
    this query certifies the mechanics end-to-end — the bit positions
    ARE the relational plan: keys explode to k (bit) rows, the filter is
    the DISTINCT position set (m-bounded, broadcastable by
    construction), a probe is a left join counting matched positions,
    and positive == all k matched.

    fpr_theory = (1 - (1 - 1/m)^(k*n))^k; within_bound compares measured
    <= 3x theory as a BOOLEAN so libm pow ulps cannot flip the hash.
    Output: one row (n_keys, n_bits_set, n_probes, n_false_positives,
    fpr_measured, within_bound)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    # keys = 1995 buyers; probes = the rest (on this synthetic corpus every
    # customer eventually buys, so the full-history key set would leave
    # zero true negatives to measure FPR on)
    buyers = (
        orders.where(F.col("o_orderdate") < F.lit("1996-01-01"))
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    non_buyers = (
        customer.select(F.col("c_custkey").alias("key"))
        .join(buyers, "key", "left_anti")
    )

    def positions(frame):
        pos = F.explode(
            F.array(
                *[
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(f"{i}:"), F.col("key").cast("string")
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % m
                    for i in range(k)
                ]
            )
        )
        return frame.select("key", pos.alias("bit"))

    bits = positions(buyers).select("bit").distinct()
    probe_hits = (
        positions(non_buyers)
        .join(bits, "bit", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .where(F.col("n_hit") == k)
    )
    n_keys = buyers.agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    n_bits = bits.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set"))
    n_probes = non_buyers.agg(F.count(F.lit(1)).cast("long").alias("n_probes"))
    n_fp = probe_hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_false_positives")
    )
    theory = F.pow(
        F.lit(1.0)
        - F.pow(F.lit(1.0 - 1.0 / m), F.lit(float(k)) * F.col("n_keys")),
        F.lit(float(k)),
    )
    return (
        n_keys.crossJoin(n_bits)
        .crossJoin(n_probes)
        .crossJoin(n_fp)
        .select(
            "n_keys",
            "n_bits_set",
            "n_probes",
            "n_false_positives",
            F.round(F.col("n_false_positives") / F.col("n_probes"), 6).alias(
                "fpr_measured"
            ),
            (
                F.col("n_false_positives") / F.col("n_probes")
                <= F.lit(3.0) * theory + F.lit(1e-3)
            ).alias("within_bound"),
        )
    )


def events_audience_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix via HLL inclusion-exclusion: for every
    unordered pair of event types, the number of users active in BOTH —
    estimated as est(A) + est(B) - est(A union B) from per-type sketches
    and certified against the exact distinct-join answer.

    This is the sketch-side answer to "how much do these audiences /
    corpora / crawls overlap?" at 100 TB: per-type sketches are built in
    one corpus pass (constant state per type), every pairwise union is
    sketch-merge on the TYPE-COUNT-sized frame, and no user-level join
    ever happens.  The exact path (a self-join on distinct user-type
    pairs) runs here only as certification, same pattern as
    agg_hll_mergeable: only the exact count and the bound BOOLEAN are
    hashed — estimates are implementation-defined.

    Inclusion-exclusion error compounds (three estimates, RSE ~1.6% at
    the default lgK=12, relative to the UNION size), so the certified
    bound is 5% of the union cardinality.  Output: (type_a, type_b,
    exact_overlap, within_bound)."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").cast("long").alias("n_exact"),
    )
    a = per_type.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("n_exact").alias("n_a"),
    )
    b = per_type.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("n_exact").alias("n_b"),
    )
    pairs = a.crossJoin(b).where(F.col("type_a") < F.col("type_b"))
    users = ev.select("event_type", "user_id").distinct()
    ua = users.select(F.col("event_type").alias("type_a"), "user_id")
    ub = users.select(F.col("event_type").alias("type_b"), "user_id")
    exact = (
        ua.join(ub, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_overlap"))
    )
    est_union = F.hll_sketch_estimate(
        F.hll_union(F.col("sk_a"), F.col("sk_b"))
    )
    est_a = F.hll_sketch_estimate("sk_a")
    est_b = F.hll_sketch_estimate("sk_b")
    est_overlap = est_a + est_b - est_union
    return (
        pairs.join(exact, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.coalesce("exact_overlap", F.lit(0)).cast("long").alias("exact_overlap"),
            (
                F.abs(est_overlap - F.coalesce("exact_overlap", F.lit(0)))
                <= F.lit(0.05) * est_union + F.lit(1.0)
            ).alias("within_bound"),
        )
    )


def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 BITMAP aggregate family certified against exact distinct
    counting: per event type, user ids land in 32k-bit bucket bitmaps
    (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg),
    bucket counts sum to the per-type distinct count, and the row
    certifies bitmap == exact — the roaring-bitmap-style EXACT distinct
    path that, unlike HLL, supports set algebra without error, at the
    cost of memory proportional to the id range (the right trade for
    dense integer keys like user ids).

    Plan: one (type, bucket) aggregation with constant-size bitmap
    state, then a type-level rollup — the distinct-count shuffle never
    carries raw user ids, only bucket bitmaps.

    Output: (event_type, n_distinct_bitmap, n_distinct_exact,
    bitmap_matches_exact)."""
    ev = load(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
    ).agg(
        F.expr(
            "bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))"
        ).alias("n_in_bucket")
    )
    bm = per_bucket.groupBy("event_type").agg(
        F.sum("n_in_bucket").cast("long").alias("n_distinct_bitmap")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_distinct_exact")
    )
    return bm.join(exact, "event_type").select(
        "event_type",
        "n_distinct_bitmap",
        "n_distinct_exact",
        (F.col("n_distinct_bitmap") == F.col("n_distinct_exact")).alias(
            "bitmap_matches_exact"
        ),
    )


def agg_join_size_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from COUNT-MIN sketches, certified
    against the exact answer — the optimizer-statistics primitive: the
    size of ``orders ⋈ events ON custkey = user_id`` is the
    frequency-vector inner product Σ_k fO(k)·fE(k), and the CM inner
    product Σ_b cO[i,b]·cE[i,b], minimized over d independent hash rows,
    estimates it with one-sided error <= ε·N₁·N₂ (Cormode-Muthukrishnan
    §4.2) while each side's sketch is a FIXED d x w counter grid.

    Both the estimate and the exact join size are computed and emitted
    together: the gap (overestimate_ppm, always >= 0 — one-sided) is the
    certification, the same self-certifying pattern as the HLL and Bloom
    queries.

    Plan at scale: each sketch is a map-side-combinable
    groupBy((row, bucket)) over scan-stage hash arithmetic, the d hash
    rows riding ONE exploded literal array per scan (never d scans of
    the input) — state d·w = 4096 cells per side regardless of key
    cardinality (w sized ~ distinct-key order to keep collision inflation
    small; the certification row MEASURES the inflation either way); the exact side
    is one frequency groupBy per input + an equi-join of the two
    frequency tables (keys, not rows).  At 100 TB you'd keep only the
    sketch; the exact pass exists here to certify it.

    Output: 1 row (exact_size, est_size = min over rows, est_row0..3,
    overestimate_ppm)."""
    d, w = 4, 1024
    # pairwise-independent-ish integer hash rows (a_i, b_i), mod prime
    params = [(2654435761, 13), (97911, 101), (40503, 7), (31337, 29)]
    p = 2147483647

    def sketch(df: DataFrame, key: str) -> DataFrame:
        # ONE scan: the d hash rows ride an exploded literal array (a
        # union of per-row selects would scan the input d times)
        hashed = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("row_i"),
                            ((((F.col(key) % 1000003) * a + b) % p) % w)
                            .cast("long")
                            .alias("bucket"),
                        )
                        for i, (a, b) in enumerate(params)
                    ]
                )
            ).alias("cell")
        )
        return hashed.select("cell.row_i", "cell.bucket").groupBy(
            "row_i", "bucket"
        ).agg(F.count(F.lit(1)).cast("long").alias("c"))

    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    e = load(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    so = sketch(o, "k")
    se = sketch(e, "k").withColumnRenamed("c", "c2")
    est_rows = (
        so.join(se, ["row_i", "bucket"])
        .groupBy("row_i")
        .agg(F.sum(F.col("c") * F.col("c2")).cast("long").alias("est"))
    )
    est = est_rows.agg(
        F.min("est").cast("long").alias("est_size"),
        F.max("est").cast("long").alias("est_max"),
    )
    fo = o.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("f1"))
    fe = e.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("f2"))
    exact = fo.join(fe, "k").agg(
        F.sum(F.col("f1") * F.col("f2")).cast("long").alias("exact_size")
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_size",
        "est_size",
        "est_max",
        F.expr("((est_size - exact_size) * 1000000) div exact_size")
        .alias("overestimate_ppm"),
    )


def agg_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) F2 sketch — the second frequency moment
    of the user_id stream per event type, i.e. the SELF-join size, from
    16 independent +/-1 sign estimators: Z_j = sum_i s_j(i) * f_i, each
    Z_j^2 an unbiased F2 estimate, reported as the MEAN of the 16 (the
    classic variance reduction).  F2/self-join size is the optimizer
    statistic behind skew detection: F2 >> N means a few heavy keys.

    Determinism: signs come from md5(user_id : j) parity, so every Z_j
    is an exact BIGINT (sum of +/-1 times integer frequencies —
    computable STREAMING as sum over rows of s_j, no per-key state);
    the certification row carries the EXACT F2 (one distinct-key
    groupBy, the thing the sketch avoids at scale) and the relative
    error — the driver hash certifies estimator and truth together.

    Scale: the 16 sign sums are ONE map-side-combined aggregate over the
    scan (16 numbers per partition); only the certification side pays
    the key shuffle, and a production deployment drops it.

    r16: ``fan_out`` before the sign computation — 16 md5+conv per row
    over a byte-small events file ran on ONE input split (1.6M md5 on
    one core; also why this row was storm-sensitive).  ABBA interleaved
    A/B at sf0.1: 1.73/2.02 -> 1.31/1.51 s (min/med of 6); conditional,
    so a real-scale scan skips the repartition."""
    ev = fan_out(load(spark, sf_dir, "events").select("event_type", "user_id"))
    signs = [
        (
            F.when(
                F.conv(F.substring(F.md5(F.concat(F.col("user_id").cast("string"),
                                                  F.lit(f":{j}"))), 1, 4), 16, 10)
                .cast("long") % 2 == 0,
                1,
            ).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(16)
    ]
    signed = ev.select("event_type", *signs)
    zs = signed.groupBy("event_type").agg(
        *[F.sum(F.col(f"s{j}")).cast("long").alias(f"z{j}") for j in range(16)],
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    est = sum(
        (F.col(f"z{j}").cast("decimal(38,0)") * F.col(f"z{j}").cast("decimal(38,0)"))
        for j in range(16)
    )
    exact = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("f").cast("decimal(38,0)") * F.col("f").cast("decimal(38,0)")
            ).cast("decimal(38,0)").alias("f2_exact")
        )
    )
    j = zs.join(exact, "event_type").withColumn(
        "f2_estimate", (est / 16).cast("decimal(38,0)")
    )
    return j.select(
        "event_type",
        "n_rows",
        # BIGINT at the output boundary: integer-valued DECIMAL(38,0)
        # proved driver-fragile r08/r09 (Decimal '30951' vs float
        # '30951.0' hash asymmetry); both values are integral so the
        # casts are exact on both engines
        F.col("f2_estimate").cast("long").alias("f2_estimate"),
        F.col("f2_exact").cast("long").alias("f2_exact"),
        F.round(
            F.abs(
                F.col("f2_estimate").cast("double")
                - F.col("f2_exact").cast("double")
            )
            / F.col("f2_exact").cast("double"),
            6,
        ).alias("rel_error"),
    )


def agg_kmv_distinct(spark: SparkSession, sf_dir: str, k: int = 256) -> DataFrame:
    """KMV (k-minimum values) distinct-count sketch per event type — the
    order-statistics alternative to HLL: hash every key into [0,1), keep
    the k smallest, estimate D ~ (k-1)/h_(k) (Bar-Yossef et al.).  KMV's
    edge over HLL is MERGEABILITY WITH SET OPERATIONS (intersections via
    the combined k-sample), and its state is k exact hashes — this op
    certifies the estimator against the exact distinct count in the same
    row, the agg_hll_mergeable discipline.

    Determinism: the hash is the first 12 hex digits of md5 scaled into
    [0,1) — a fixed-point rational both engines compute identically; the
    k-th order statistic is a PICK over exact values (per-type top-k via
    the same per-task-heap shape as sort_topk).

    Scale: one (type, user) distinct then a bounded top-k window —
    at production scale the distinct collapses into per-partition
    k-min-heaps (aggregate state k hashes), which is the point."""
    ev = load(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    h = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
        ).cast("long")
        / F.lit(float(16 ** 12))
    ).alias("h")
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("h")
    ranked = ev.select("event_type", h).withColumn(
        "rn", F.row_number().over(w)
    )
    kth = ranked.where(F.col("rn") == k).select(
        "event_type", F.col("h").alias("h_k")
    )
    exact = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("d_exact")
    )
    return (
        exact.join(kth, "event_type", "left")
        .select(
            "event_type",
            "d_exact",
            F.when(
                F.col("h_k").isNotNull(),
                F.round((k - 1) / F.col("h_k"), 0),
            )
            .otherwise(F.col("d_exact").cast("double"))
            .cast("long")
            .alias("d_estimate"),
            F.round(
                F.abs(
                    F.when(
                        F.col("h_k").isNotNull(), F.round((k - 1) / F.col("h_k"), 0)
                    ).otherwise(F.col("d_exact").cast("double"))
                    - F.col("d_exact").cast("double")
                )
                / F.col("d_exact").cast("double"),
                6,
            ).alias("rel_error"),
        )
    )


def agg_kmv_setops(spark: SparkSession, sf_dir: str, k: int = 64) -> DataFrame:
    """KMV sketch SET OPERATIONS — the capability that justifies KMV over
    HLL (agg_kmv_distinct's docstring claim, now certified): union and
    intersection cardinalities of the purchase-user and click-user sets
    estimated from ONE combined k-minimum sample, next to their exact
    counts.

        U_est = (k-1) / h_(k)            (union KMV, Bar-Yossef)
        I_est = (|sample in both| / k) * U_est   (Jaccard thinning)

    Determinism: the hash is the agg_kmv_distinct fixed-point md5
    rational; the k-sample is a global top-k (TakeOrderedAndProject —
    per-partition heaps, never a global sort); membership flags are
    exact aggregates.  When the union has <= k members the sample IS the
    set, so both estimates fall back to the exact values (the sketch
    degenerates to exact, as it should).

    Scale: one (user, flags) aggregate + one bounded top-k; exact sides
    are keyed distincts that exist only to certify the estimator."""
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    member = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("long")).alias("in_p"),
        F.max((F.col("event_type") == "click").cast("long")).alias("in_c"),
    )
    h = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
        ).cast("long")
        / F.lit(float(16 ** 12))
    ).alias("h")
    hashed = member.select("user_id", "in_p", "in_c", h)
    sample = hashed.orderBy("h").limit(k)
    samp_agg = sample.agg(
        F.max("h").alias("h_k"),
        F.count(F.lit(1)).cast("long").alias("n_samp"),
        F.sum(F.col("in_p") * F.col("in_c")).cast("long").alias("both_samp"),
    )
    exact = hashed.agg(
        F.sum("in_p").cast("long").alias("d_purchase"),
        F.sum("in_c").cast("long").alias("d_click"),
        F.count(F.lit(1)).cast("long").alias("d_union"),
        F.sum(F.col("in_p") * F.col("in_c")).cast("long").alias("d_inter"),
    )
    u_est = F.when(
        F.col("d_union") <= k, F.col("d_union").cast("double")
    ).otherwise(F.round((k - 1) / F.col("h_k"), 0))
    i_est = F.when(
        F.col("d_union") <= k, F.col("d_inter").cast("double")
    ).otherwise(
        F.round(
            (F.col("both_samp").cast("double") / F.lit(float(k)))
            * ((k - 1) / F.col("h_k")),
            0,
        )
    )
    return exact.crossJoin(F.broadcast(samp_agg)).select(
        "d_purchase",
        "d_click",
        "d_union",
        "d_inter",
        u_est.alias("union_est"),
        i_est.alias("inter_est"),
    )

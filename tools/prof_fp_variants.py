#!/usr/bin/env python3
"""A/B of dedup_simhash fingerprint variants + pair-emission rewrite.

fp variants (all must be bit-identical):
  v1: current interpreted HOF single-fold (operators/dedup.py)
  v2: explode + codegen packed-sum aggregate (32 packed vote sums)
  v3: mapInPandas numpy votes (tokens split/distinct'd in Spark, so
      tokenization semantics are untouched; Python only does md5+votes)

pairs variants (set-identical to dedup_simhash_pairs):
  p1: current (string band keys, 2.4M candidate structs, post-verify,
      distinct)
  p2: long band keys, verify + first-colliding-band filter INSIDE the
      emission lambda (SQL expr — shiftright in Python lambdas trips
      py4j), no distinct
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("PASSES", "5"))
CHECK = os.environ.get("CHECK", "1") not in ("", "0")

from pyspark.sql import functions as F


def _base(spark, sf_dir):
    from simple_land_registry_data_ingestion_spark.tables import fan_out, load

    docs = load(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+"))
    return fan_out(docs).select("doc_id", toks.alias("hs"))


def fp_v1(spark, sf_dir):
    from simple_land_registry_data_ingestion_spark.operators import dedup

    return dedup.dedup_simhash(spark, sf_dir)


def fp_v2(spark, sf_dir):
    base = _base(spark, sf_dir)
    tok = base.select("doc_id", F.explode_outer("hs").alias("t"))
    hi = F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(F.md5("t"), 9, 8), 16, 10).cast("long")
    two32 = 1 << 32
    cols = []
    for p in range(1, 17):
        if p <= 8:
            nib = F.shiftright(hi, 4 * (8 - p)).bitwiseAND(F.lit(15))
        else:
            nib = F.shiftright(lo, 4 * (16 - p)).bitwiseAND(F.lit(15))
        b0 = nib.bitwiseAND(F.lit(1))
        b1 = F.shiftright(nib, 1).bitwiseAND(F.lit(1))
        b2 = F.shiftright(nib, 2).bitwiseAND(F.lit(1))
        b3 = F.shiftright(nib, 3).bitwiseAND(F.lit(1))
        cols.append(F.sum(b0 + b1 * F.lit(two32)).alias(f"a{p}"))
        cols.append(F.sum(b2 + b3 * F.lit(two32)).alias(f"b{p}"))
    votes = tok.groupBy("doc_id").agg(
        F.count("t").cast("long").alias("n_tok"), *cols
    )
    hex_chars = "0123456789abcdef"
    two32c = F.lit(two32).cast("long")

    def _hex(acc, pk):
        c0 = pk["a"] % two32c
        c1 = (pk["a"] / F.lit(4294967296.0)).cast("long")
        c2 = pk["b"] % two32c
        c3 = (pk["b"] / F.lit(4294967296.0)).cast("long")
        nib = (
            F.when(2 * c0 > F.col("n_tok"), 1).otherwise(0)
            + F.when(2 * c1 > F.col("n_tok"), 2).otherwise(0)
            + F.when(2 * c2 > F.col("n_tok"), 4).otherwise(0)
            + F.when(2 * c3 > F.col("n_tok"), 8).otherwise(0)
        )
        return F.concat(acc, F.substring(F.lit(hex_chars), nib + 1, 1))

    pks = F.array(
        *[
            F.struct(
                F.coalesce(F.col(f"a{p}"), F.lit(0)).cast("long").alias("a"),
                F.coalesce(F.col(f"b{p}"), F.lit(0)).cast("long").alias("b"),
            )
            for p in range(1, 17)
        ]
    )
    assembled = votes.select(
        "doc_id",
        "n_tok",
        F.aggregate(pks, F.lit("").cast("string"), _hex).alias("sh"),
    )
    sz = base.select("doc_id", F.size("hs").alias("sz"))
    return sz.join(assembled, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("sz") == -1, F.lit(None).cast("string"))
        .otherwise(F.col("sh"))
        .alias("simhash"),
    )


def _simhash_pandas(iterator):
    import hashlib

    import numpy as np
    import pandas as pd

    hexd = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
    for pdf in iterator:
        out = []
        for toks in pdf["hs"]:
            if toks is None:
                out.append(None)
                continue
            n = len(toks)
            if n == 0:
                out.append("0" * 16)
                continue
            dig = b"".join(
                hashlib.md5(t.encode("utf-8")).digest()[:8] for t in toks
            )
            bits = np.unpackbits(
                np.frombuffer(dig, dtype=np.uint8).reshape(n, 8), axis=1
            )
            votes = bits.sum(axis=0, dtype=np.int64)
            fp_bits = (2 * votes > n).astype(np.uint8)
            nib = fp_bits.reshape(16, 4) @ np.array([8, 4, 2, 1], dtype=np.uint8)
            out.append(hexd[nib].tobytes().decode("ascii"))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})


def fp_v3(spark, sf_dir):
    base = _base(spark, sf_dir)
    return base.mapInPandas(_simhash_pandas, "doc_id long, simhash string")


def pairs_p1(spark, sf_dir):
    from simple_land_registry_data_ingestion_spark.operators import dedup

    return dedup.dedup_simhash_pairs(spark, sf_dir)


def pairs_p2(spark, sf_dir, fp_fn=fp_v1, max_nibble_distance: int = 3):
    fp = fp_fn(spark, sf_dir).localCheckpoint(eager=True)
    n_bands = max_nibble_distance + 1
    sizes = [16 // n_bands + (1 if i < 16 % n_bands else 0) for i in range(n_bands)]
    starts = [sum(sizes[:i]) for i in range(n_bands)]
    # long band values: conv of <= 15 hex chars fits a signed long
    assert all(s <= 15 for s in sizes)
    band_vals = F.array(
        *[
            F.conv(F.substring("simhash", starts[b] + 1, sizes[b]), 16, 10).cast(
                "long"
            )
            for b in range(n_bands)
        ]
    )
    bands = fp.select(
        F.struct(
            "doc_id",
            F.conv(F.substring("simhash", 1, 8), 16, 10).cast("long").alias("hi"),
            F.conv(F.substring("simhash", 9, 8), 16, 10).cast("long").alias("lo"),
        ).alias("m"),
        F.posexplode(band_vals).alias("b", "v"),
    )
    grouped = bands.groupBy("b", "v").agg(
        F.array_sort(F.collect_list("m")).alias("ids")
    )
    # per-band masks over (hi, lo): nibble p (0-indexed) sits at shift
    # 4*(7-p) in hi for p < 8, else 4*(15-p) in lo
    mh, ml = [], []
    for b in range(n_bands):
        h = l = 0
        for p in range(starts[b], starts[b] + sizes[b]):
            if p < 8:
                h |= 0xF << (4 * (7 - p))
            else:
                l |= 0xF << (4 * (15 - p))
        mh.append(h)
        ml.append(l)
    d = max_nibble_distance

    def dist_sql(x, y):
        def nc(expr):
            return (
                f"bit_count((({expr}) | shiftright(({expr}), 1) | "
                f"shiftright(({expr}), 2) | shiftright(({expr}), 3)) & 286331153)"
            )

        return (
            nc(f"{x}.hi ^ {y}.hi") + " + " + nc(f"{x}.lo ^ {y}.lo")
        )

    def earlier_equal(x, y):
        terms = [
            f"(b > {j} AND (({x}.hi ^ {y}.hi) & {mh[j]}) = 0 "
            f"AND (({x}.lo ^ {y}.lo) & {ml[j]}) = 0)"
            for j in range(n_bands - 1)
        ]
        return "(" + " OR ".join(terms) + ")"

    keep = (
        f"({dist_sql('x', 'y')}) <= {d} AND NOT {earlier_equal('x', 'y')}"
    )
    pair_expr = (
        "flatten(transform(ids, (x, i) -> "
        f"transform(filter(slice(ids, i + 2, size(ids)), y -> {keep}), "
        "y -> struct(x AS a, y AS b))))"
    )
    threshold = 256
    small = grouped.where(F.size("ids") <= threshold).select(
        F.explode(F.expr(pair_expr)).alias("p")
    )
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    big = (
        grouped.where(F.size("ids") > threshold)
        .select(
            "b",
            F.posexplode("ids").alias("_i", "x"),
            F.col("ids").alias("_ids"),
        )
        .select("b", "x", F.expr("slice(_ids, _i + 2, size(_ids))").alias("_tail"))
        .repartition(shuffle_n)
        .select(
            F.explode(
                F.expr(
                    f"transform(filter(_tail, y -> {keep}), "
                    "y -> struct(x AS a, y AS b))"
                )
            ).alias("p")
        )
    )
    pairs = small.unionByName(big)

    def _nc_col(x):
        folded = (
            x.bitwiseOR(F.shiftright(x, 1))
            .bitwiseOR(F.shiftright(x, 2))
            .bitwiseOR(F.shiftright(x, 3))
        )
        return F.bit_count(folded.bitwiseAND(F.lit(0x11111111)))

    distance = (
        _nc_col(F.col("p.a.hi").bitwiseXOR(F.col("p.b.hi")))
        + _nc_col(F.col("p.a.lo").bitwiseXOR(F.col("p.b.lo")))
    ).cast("long")
    return pairs.select(
        F.col("p.a.doc_id").alias("doc_a"),
        F.col("p.b.doc_id").alias("doc_b"),
        distance.alias("nibble_distance"),
    )


def main() -> None:
    from simple_land_registry_data_ingestion_spark.session import get_spark

    spark = get_spark(
        app_name="prof-fp", extra_conf={"spark.driver.memory": "16g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def clear():
        for _id, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            rdd.unpersist()
        spark.catalog.clearCache()

    if CHECK:
        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", SF_DIR):
            r1 = sorted(map(tuple, fp_v1(spark, sf).collect()))
            r2 = sorted(map(tuple, fp_v2(spark, sf).collect()))
            r3 = sorted(map(tuple, fp_v3(spark, sf).collect()))
            assert r1 == r2, f"fp_v2 mismatch at {sf}"
            assert r1 == r3, f"fp_v3 mismatch at {sf}"
            p1 = sorted(map(tuple, pairs_p1(spark, sf).collect()))
            p2 = sorted(map(tuple, pairs_p2(spark, sf).collect()))
            assert p1 == p2, (
                f"pairs_p2 mismatch at {sf}: {len(p1)} vs {len(p2)}"
            )
            print(f"CHECK OK {sf}: {len(r1)} fps, {len(p1)} pairs", flush=True)

    variants = {
        "fp_v1": lambda: noop(fp_v1(spark, SF_DIR)),
        "fp_v2": lambda: noop(fp_v2(spark, SF_DIR)),
        "fp_v3": lambda: noop(fp_v3(spark, SF_DIR)),
        "p1": lambda: noop(pairs_p1(spark, SF_DIR)),
        "p2_v1": lambda: noop(pairs_p2(spark, SF_DIR, fp_v1)),
        "p2_v3": lambda: noop(pairs_p2(spark, SF_DIR, fp_v3)),
    }
    for fn in variants.values():  # warm
        fn()
    results = {n: [] for n in variants}
    for p in range(PASSES):
        for n, fn in variants.items():
            clear()
            t0 = time.monotonic()
            fn()
            results[n].append(round(time.monotonic() - t0, 3))
        print(
            f"pass {p}: " + " ".join(f"{n}={results[n][-1]}" for n in variants),
            flush=True,
        )
    import statistics

    print("MIN: " + " ".join(f"{n}={min(v)}" for n, v in results.items()))
    print(
        "MED: "
        + " ".join(f"{n}={statistics.median(v)}" for n, v in results.items())
    )
    spark.stop()


if __name__ == "__main__":
    main()

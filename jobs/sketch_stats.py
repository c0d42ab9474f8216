"""spark-submit entry point for the generalized sketch family:
HLL / KMV cardinality, KLL / t-digest quantiles (both grouped with
--group-col), Misra-Gries top-k, AMS F2 frequency moment, Bloom build.

    spark-submit --py-files dist/ehs.zip jobs/sketch_stats.py \
        --input seqs.parquet --sketch hll --column tokens [--group-col source]
    ... --sketch kll --column n_tok --quantiles 0.5,0.9,0.99 [--group-col source]
    ... --sketch tdigest --column n_tok --quantiles 0.5,0.99
    ... --sketch kmv --column doc_id [--group-col source] --kmv-k 256
    ... --sketch topk --column token [--group-col source] --topk 10
    ... --sketch bloom --column doc_id --bloom-out /path/bloom.bin
    ... --sketch ams --column tokens [--group-col source] --ams-d 8
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--sketch", choices=["hll", "kll", "tdigest", "bloom", "kmv", "topk", "ams"], required=True)
    ap.add_argument("--column", required=True)
    ap.add_argument("--group-col", default=None)
    ap.add_argument("--quantiles", default="0.5,0.9,0.99")
    ap.add_argument("--p", type=int, default=14, help="HLL precision")
    ap.add_argument("--k", type=int, default=200, help="KLL k")
    ap.add_argument("--compression", type=float, default=200.0, help="t-digest delta")
    ap.add_argument("--n-expected", type=int, default=1_000_000)
    ap.add_argument("--fpp", type=float, default=0.01)
    ap.add_argument("--kmv-k", type=int, default=256, help="KMV bottom-k size")
    ap.add_argument("--topk", type=int, default=10, help="top-k to emit")
    ap.add_argument("--ams-d", type=int, default=8, help="AMS sign-hash rows")
    ap.add_argument("--n-counters", type=int, default=64, help="Misra-Gries counters")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--bloom-out", default=None)
    args = ap.parse_args()

    from epichypersketch_jl_spark.session import apply_malloc_tuning
    apply_malloc_tuning()  # numpy-temp mmap churn: session.MALLOC_TUNING
    spark = SparkSession.builder.appName(f"ehs-{args.sketch}").getOrCreate()
    df = spark.read.parquet(args.input)

    if args.sketch == "hll":
        from epichypersketch_jl_spark.operators.cardinality import hll_distinct

        out = hll_distinct(df, args.column, group_col=args.group_col, p=args.p, seed=args.seed)
        for r in out.collect():
            print(json.dumps(r.asDict()))
    elif args.sketch == "kmv":
        from epichypersketch_jl_spark.operators.cardinality import kmv_distinct

        out = kmv_distinct(df, args.column, group_col=args.group_col, k=args.kmv_k)
        for r in out.collect():
            print(json.dumps(r.asDict()))
    elif args.sketch == "topk":
        from epichypersketch_jl_spark.operators.topk import approx_topk

        out = approx_topk(
            df, args.column, k=args.topk, n_counters=args.n_counters,
            group_col=args.group_col,
        )
        for r in out.collect():
            print(json.dumps(r.asDict()))
    elif args.sketch == "ams":
        from epichypersketch_jl_spark.operators.moments import ams_f2

        out = ams_f2(df, args.column, group_col=args.group_col, d=args.ams_d)
        for r in out.collect():
            print(json.dumps(r.asDict()))
    elif args.sketch in ("kll", "tdigest"):
        qs = [float(x) for x in args.quantiles.split(",")]
        if args.group_col is not None:
            if args.sketch == "kll":
                from epichypersketch_jl_spark.operators.quantiles import (
                    kll_quantiles_grouped as grouped_fn,
                )

                out = grouped_fn(
                    df, args.column, args.group_col, qs, k=args.k, seed=args.seed
                )
            else:
                from epichypersketch_jl_spark.operators.quantiles import (
                    tdigest_quantiles_grouped as grouped_fn,
                )

                out = grouped_fn(
                    df, args.column, args.group_col, qs,
                    compression=args.compression,
                )
            for r in out.collect():
                print(json.dumps(r.asDict()))
            spark.stop()
            return
        if args.sketch == "kll":
            from epichypersketch_jl_spark.operators.quantiles import kll_quantiles

            res = kll_quantiles(df, args.column, qs, k=args.k, seed=args.seed)
        else:
            from epichypersketch_jl_spark.operators.quantiles import tdigest_quantiles

            res = tdigest_quantiles(df, args.column, qs, compression=args.compression)
        print(json.dumps({str(q): v for q, v in res.items()}))
    else:
        from epichypersketch_jl_spark.operators.cardinality import build_bloom

        bloom = build_bloom(
            df, args.column, n_expected=args.n_expected, fpp=args.fpp, seed=args.seed
        )
        if args.bloom_out:
            with open(args.bloom_out, "wb") as f:
                f.write(bloom.to_bytes())
        print(json.dumps({"n_bits": bloom.n_bits, "fill_ratio": bloom.fill_ratio()}))
    spark.stop()


if __name__ == "__main__":
    main()

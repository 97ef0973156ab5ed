#!/usr/bin/env python
"""Volume-run harness: generate an N-doc synthetic pages corpus and push it
through the shipping CLI extraction path, printing one RESULT line.

This is the committed recipe behind the BENCH/BASELINE.md volume numbers
(50k/150k/300k/1M in rounds 1-3 were ad-hoc; this file makes the 10M run —
and any rerun — reproducible).  Phases are separate so a kill+restart probe
can SIGKILL the extract phase and re-invoke it:

  python scripts/volume_run.py gen      --n-docs 10000000 --size-scale 0.5 \
      --workdir /root/vol10m
  python scripts/volume_run.py extract  --workdir /root/vol10m \
      --buckets 2048 --partitions 1024 --atomic-sink
  python scripts/volume_run.py verify   --workdir /root/vol10m --n-docs 10000000

``size_scale`` shrinks the per-page paragraph count so the 10M input +
shuffle + output fits this sandbox's 80 GB free disk (documented in
BENCH/BASELINE.md); linearity comparisons use a same-size_scale control run.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def phase_gen(args):
    from go_readability_spark.plans import build_session
    from go_readability_spark.sources import synth_pages_distributed

    spark = build_session(master=args.master)
    t0 = time.time()
    pages = synth_pages_distributed(
        spark, args.n_docs, seed=args.seed, skew=True,
        num_partitions=args.gen_partitions, size_scale=args.size_scale)
    pages.write.mode("overwrite").parquet(f"{args.workdir}/pages")
    dt = time.time() - t0
    n = spark.read.parquet(f"{args.workdir}/pages").count()
    size = 0
    for root, _dirs, files in os.walk(f"{args.workdir}/pages"):
        size += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    print(json.dumps({"phase": "gen", "rows": n, "sec": round(dt, 1),
                      "parquet_mb": size // (1 << 20),
                      "size_scale": args.size_scale}))
    spark.stop()


def phase_extract(args):
    from go_readability_spark.cli import main

    argv = ["extract",
            "--input", f"{args.workdir}/pages",
            "--output", f"{args.workdir}/articles",
            "--checkpoint", f"{args.workdir}/ckpt",
            "--buckets", str(args.buckets),
            "--partitions", str(args.partitions)]
    if args.master:
        argv += ["--master", args.master]
    if args.atomic_sink:
        argv.append("--atomic-sink")
    if args.partition_by:
        argv += ["--partition-by", args.partition_by]
    t0 = time.time()
    rc = main(argv)
    dt = time.time() - t0
    print(json.dumps({"phase": "extract", "rc": rc, "sec": round(dt, 1)}))
    return rc


def phase_verify(args):
    from pyspark.sql import functions as F

    from go_readability_spark.plans import build_session

    spark = build_session(master=args.master)
    out = spark.read.parquet(f"{args.workdir}/articles")
    err = (F.when(F.col("error").isNotNull(), 1).otherwise(0)
           if "error" in out.columns else F.lit(0))
    agg = out.agg(F.count("*").alias("rows"),
                  F.countDistinct("url").alias("urls"),
                  F.sum(err).alias("errors")).collect()[0]
    ok = (agg.rows == args.n_docs and agg.urls == args.n_docs
          and (agg.errors or 0) == 0)
    print(json.dumps({"phase": "verify", "rows": agg.rows, "urls": agg.urls,
                      "errors": int(agg.errors or 0),
                      "expected": args.n_docs, "ok": ok}))
    spark.stop()
    return 0 if ok else 1


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("phase", choices=["gen", "extract", "verify"])
    p.add_argument("--workdir", required=True)
    p.add_argument("--n-docs", type=int, default=10_000_000)
    p.add_argument("--size-scale", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--gen-partitions", type=int, default=1024)
    p.add_argument("--buckets", type=int, default=2048)
    p.add_argument("--partitions", type=int, default=1024)
    p.add_argument("--atomic-sink", action="store_true")
    p.add_argument("--partition-by", default="")
    p.add_argument("--master", default=None)
    return p


if __name__ == "__main__":
    a = build_parser().parse_args()
    if a.phase == "gen":
        phase_gen(a)
    elif a.phase == "extract":
        raise SystemExit(phase_extract(a))
    else:
        raise SystemExit(phase_verify(a))

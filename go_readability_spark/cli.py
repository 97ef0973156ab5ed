"""Command-line surface.

Mirrors the reference CLI capabilities (cmd/go-readability/main.go:38-177:
parse a file, -m metadata-only, -t text-only, -l check-readerable) plus the
cluster job entrypoint used with spark-submit:

  # single document (no Spark)
  python -m go_readability_spark parse page.html [--url U] [-m|-t|-l]

  # cluster batch job (spark-submit --py-files go_readability_spark.zip)
  python -m go_readability_spark extract \
      --input /path/pages_parquet --output /path/articles \
      --checkpoint /path/ckpt --buckets 256 [--partitions P] [--no-resume]
"""

from __future__ import annotations

import argparse
import json
import sys


def cmd_parse(args) -> int:
    from .dom import parse_html
    from .readability import Parser, check_document

    try:
        data = sys.stdin.buffer.read() if args.file == "-" else open(args.file, "rb").read()
    except OSError as exc:
        print(f"error: cannot read {args.file}: {exc.strerror}", file=sys.stderr)
        return 2
    doc = parse_html(data)
    if args.check_only:
        readerable = check_document(doc)
        print("true" if readerable else "false")
        return 0 if readerable else 1
    art = Parser().parse_document(doc, args.url)
    if args.metadata_only:
        print(json.dumps({
            "title": art.title, "byline": art.byline, "excerpt": art.excerpt,
            "siteName": art.site_name, "image": art.image, "favicon": art.favicon,
            "language": art.language, "length": art.length,
            "publishedTime": art.published_time.isoformat() if art.published_time else None,
            "modifiedTime": art.modified_time.isoformat() if art.modified_time else None,
        }, ensure_ascii=False, indent=2))
    elif args.text_only:
        print(art.text_content)
    else:
        print(art.content)
    return 0


def cmd_extract(args) -> int:
    from .plans import build_session, run_extraction_job, ship_package
    from .plans.schema import PAGES_SCHEMA

    spark = build_session(master=args.master)
    try:
        ship_package(spark)
        pages = spark.read.schema(PAGES_SCHEMA).parquet(args.input)
        run_extraction_job(
            pages,
            output_dir=args.output,
            checkpoint_dir=args.checkpoint,
            n_buckets=args.buckets,
            num_partitions=args.partitions,
            resume=not args.no_resume,
            verify_output=not args.no_verify_output,
        )
    finally:
        spark.stop()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="go_readability_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("parse", help="extract one document (no Spark)")
    p.add_argument("file", help="HTML file path, or - for stdin")
    p.add_argument("--url", default=None, help="page URL for link resolution")
    p.add_argument("-m", "--metadata-only", action="store_true")
    p.add_argument("-t", "--text-only", action="store_true")
    p.add_argument("-l", "--check-only", action="store_true",
                   help="print readerable check result only")
    p.set_defaults(fn=cmd_parse)

    e = sub.add_parser("extract", help="Spark batch extraction job")
    e.add_argument("--input", required=True, help="pages parquet/Iceberg path")
    e.add_argument("--output", required=True, help="articles output path")
    e.add_argument("--checkpoint", default=None, help="checkpoint table dir")
    e.add_argument("--buckets", type=int, default=256, help="salt buckets")
    e.add_argument("--partitions", type=int, default=None)
    e.add_argument("--master", default=None, help="override spark master")
    e.add_argument("--no-resume", action="store_true")
    e.add_argument("--no-verify-output", action="store_true",
                   help="trust checkpoint rows without verifying the output "
                        "(unsafe if a prior run died mid-commit)")
    e.set_defaults(fn=cmd_extract)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())

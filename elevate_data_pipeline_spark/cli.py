"""Command-line runner — the engine's equivalent of the reference's
``mentoringExecution2.main``.

The reference takes ``<table_name> <script_type>`` CLI args, reads the
spec row from a Postgres config table, runs the pipeline, and appends to
a fixed sink table (task/mentoringExecution2.scala:70-89). Here the spec
is file-backed (a JSON document holding the same three columns), data is
a parquet directory, and the sink is a parquet dataset:

    python -m elevate_data_pipeline_spark run \
        --spec spec.json --data /root/testdata/sf0.001 --out /tmp/out

Spec file shape (the three config_table columns, verbatim semantics)::

    {
      "input_data_schema":  [ {"fetchId": {...}, "tasks": [...]} , ...],
      "data_mapping":       { "col": {"aggregation": {...}}, ... },
      "output_data_schema": { "col": {"Input_data_type": "...", "rename": "..."} }
    }

``--compat-loop`` runs the reference's per-ID driver loop instead of the
decorrelated plan (A/B semantics checking; O(|ids|) jobs — never use at
scale). ``--explain`` prints the formatted physical plan instead of
writing.
"""

from __future__ import annotations

import argparse
import json
import sys

from .plans import compile_pipeline
from .session import get_spark
from .sources.catalog import Catalog
from .sources.sink import write_parquet
from .spec import parse_spec


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="elevate_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="compile a spec and run it")
    run.add_argument("--spec", required=True, help="JSON spec file")
    run.add_argument("--data", required=True, help="parquet data directory")
    run.add_argument("--out", help="output parquet path (omit with --show/--explain)")
    run.add_argument("--mode", default="append", choices=["append", "overwrite"])
    run.add_argument("--partition-by", nargs="*", default=None)
    run.add_argument("--lenient", action="store_true",
                     help="log-and-continue on output type mismatches "
                          "(reference behavior) instead of raising")
    run.add_argument("--compat-loop", action="store_true",
                     help="run the reference's per-ID driver loop")
    run.add_argument("--legacy-join-order", action="store_true",
                     help="F0/GS fold order (new frame on the left) instead of F2")
    run.add_argument("--explain", action="store_true", help="print plans, don't write")
    run.add_argument("--show", type=int, metavar="N", help="show N rows, don't write")

    m = sub.add_parser(
        "materialize",
        help="incrementally materialize registry queries to parquet "
             "(skips queries whose inputs AND plan are unchanged)",
    )
    m.add_argument("names", nargs="+", help="registry query names")
    m.add_argument("--data", default="/root/testdata/sf0.001",
                   help="parquet data directory")
    m.add_argument("--out", required=True, help="output root directory")
    m.add_argument("--force", action="store_true",
                   help="rematerialize even when fingerprints match")

    q = sub.add_parser("query", help="run a registry query by name")
    q.add_argument("name", help="registry query name (or 'list' to enumerate)")
    q.add_argument("--data", default="/root/testdata/sf0.001",
                   help="parquet data directory")
    q.add_argument("--out", help="output parquet path (omit with --show/--explain)")
    q.add_argument("--mode", default="overwrite", choices=["append", "overwrite"])
    q.add_argument("--explain", action="store_true", help="print plan, don't write")
    q.add_argument("--show", type=int, metavar="N", help="show N rows, don't write")
    return p


def _run_query(args) -> int:
    from .queries import QUERIES

    if args.name == "list":
        for name in sorted(QUERIES):
            print(name)
        return 0
    if args.name not in QUERIES:
        print(f"error: unknown query {args.name!r} (try 'list')", file=sys.stderr)
        return 2
    spark = get_spark("edp-cli")
    df = QUERIES[args.name](spark, args.data)
    if args.explain:
        df.explain("formatted")
    elif args.show is not None:
        df.show(args.show, truncate=False)
    elif args.out:
        write_parquet(df, args.out, mode=args.mode)
        print(f"{args.name}: wrote {args.out}")
    else:
        print("error: --out required unless --show/--explain", file=sys.stderr)
        return 2
    return 0


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    if args.cmd == "query":
        return _run_query(args)

    if args.cmd == "materialize":
        from .materialize import materialize

        spark = get_spark("edp-cli")
        for rec in materialize(
            spark, args.data, args.out, args.names, force=args.force
        ):
            print(json.dumps(rec))
        return 0

    with open(args.spec) as f:
        doc = json.load(f)
    if isinstance(doc, list):
        # bare spec-tree form: the file IS the input_data_schema list
        spec = parse_spec(doc, None, None)
    else:
        spec = parse_spec(
            doc.get("input_data_schema", []),
            doc.get("data_mapping"),
            doc.get("output_data_schema"),
        )

    spark = get_spark("edp-cli")
    catalog = Catalog(spark, args.data)

    if args.compat_loop:
        from .plans.compat import run_per_id

        frames = run_per_id(catalog, spec, strict=not args.lenient)
    else:
        frames = compile_pipeline(
            catalog, spec, strict=not args.lenient,
            legacy_join_order=args.legacy_join_order,
        )

    for i, df in enumerate(frames):
        if args.explain:
            print(f"== script {i} ==")
            df.explain("formatted")
        elif args.show is not None:
            df.show(args.show, truncate=False)
        else:
            if not args.out:
                print("error: --out required unless --show/--explain", file=sys.stderr)
                return 2
            write_parquet(df, args.out, mode=args.mode, partition_by=args.partition_by)
            print(f"script {i}: wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

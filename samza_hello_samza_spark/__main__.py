"""CLI entry point: run any registered query from the command line.

The "switch to this repo" surface — every operator in the registry is
runnable without writing a driver script:

    python -m samza_hello_samza_spark list [PATTERN]
    python -m samza_hello_samza_spark run KEY [--sf-dir DIR]
        [--out PATH] [--limit N] [--explain] [--cpus N]

``run`` executes the query's plan and either shows the first rows
(default), writes parquet (``--out``), or prints the formatted
physical plan (``--explain`` — no execution). Runs on the repo's
local[N] session factory; on a cluster, point ``--sf-dir`` at the
warehouse and swap ``get_spark`` for your builder (see
``session.cluster_conf``).
"""

from __future__ import annotations

import argparse
import fnmatch
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="samza_hello_samza_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    ls = sub.add_parser("list", help="list registered query keys")
    ls.add_argument("pattern", nargs="?", default="*", help="glob filter")
    run = sub.add_parser("run", help="run one registered query")
    run.add_argument("key")
    run.add_argument("--sf-dir", default=None, help="warehouse dir (default $SPARK_GRAFT_SF_DIR)")
    run.add_argument("--out", default=None, help="write result parquet here instead of showing")
    run.add_argument("--limit", type=int, default=20, help="rows to show (default 20)")
    run.add_argument("--explain", action="store_true", help="print the formatted plan, don't execute")
    run.add_argument("--cpus", type=int, default=None, help="local[N] cores")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from .registry import all_queries

    queries = all_queries()
    if args.cmd == "list":
        for k in sorted(queries):
            if fnmatch.fnmatch(k, args.pattern):
                print(k)
        return 0

    if args.key not in queries:
        near = [k for k in sorted(queries) if args.key in k][:8]
        hint = f" (did you mean: {', '.join(near)}?)" if near else ""
        print(f"unknown query key: {args.key}{hint}", file=sys.stderr)
        return 2

    from .session import DEFAULT_SF_DIR, get_spark

    sf_dir = args.sf_dir or DEFAULT_SF_DIR
    spark = get_spark(f"cli-{args.key}", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    df = queries[args.key](spark, sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
        return 0
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

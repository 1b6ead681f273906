"""Command-line entry point: ``python -m komodo_data_spark <cmd>``.

The operational surface a user of the reference pipeline drives from a
shell (its analogue is the reference's process.py daemon loop + manual
SQL): list the registered queries, run one (or ad-hoc SQL) against a
testdata scale directory, or print its physical plan.

Commands:
  list                                   all driver-contract query names
  run <query> [--sf-dir D] [--limit N]   execute, print as a table
  sql "<statement>" [--sf-dir D]         ad-hoc SQL over the registered views
  explain <query> [--sf-dir D]           formatted physical plan
  bench <query> [--sf-dir D]             one timed run (post-warm-up)
"""

from __future__ import annotations

import argparse
import sys
import time


def _engine(sf_dir: str, cores: int):
    from komodo_data_spark.engine import KomodoEngine

    eng = KomodoEngine.local(cores=cores, sf_dir=sf_dir)
    eng.spark.sparkContext.setLogLevel("ERROR")
    return eng


def _queries():
    import os

    # the driver contract file lives at the repo root, next to the package
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    import __spark_entry__ as entry

    return entry.queries()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="komodo_data_spark")
    p.add_argument("command", choices=["list", "run", "sql", "explain", "bench"])
    p.add_argument("target", nargs="?", help="query name or SQL text")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--limit", type=int, default=20)
    args = p.parse_args(argv)

    if args.command == "list":
        for name in sorted(_queries()):
            print(name)
        return 0

    if not args.target:
        p.error(f"'{args.command}' needs a query name or SQL text")

    eng = _engine(args.sf_dir, args.cores)
    if args.command == "sql":
        eng.sql(args.target).show(args.limit, truncate=False)
        return 0

    qs = _queries()
    if args.target not in qs:
        print(f"unknown query {args.target!r}; see `list`", file=sys.stderr)
        return 2
    df = qs[args.target](eng.spark, args.sf_dir)
    if args.command == "run":
        df.show(args.limit, truncate=False)
    elif args.command == "explain":
        df.explain("formatted")
    else:  # bench
        df.count()  # warm-up: footers, codegen, Python workers
        t0 = time.perf_counter()
        n = df.count()
        print(f"{args.target}: {n} rows in {time.perf_counter() - t0:.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())

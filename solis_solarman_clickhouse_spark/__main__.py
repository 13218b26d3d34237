"""Query CLI: ``python -m solis_solarman_clickhouse_spark`` — the
clickhouse-client analogue for this engine: ad-hoc SQL (or any registered
query) over the fixture tables, results to stdout.

The reference delegates every query to ClickHouse's client/HTTP interface;
a user switching to this repo gets the same one-liner ergonomics against
the same logical tables:

  python -m solis_solarman_clickhouse_spark --sql \\
      "SELECT r_name, COUNT(*) FROM region GROUP BY r_name"
  python -m solis_solarman_clickhouse_spark --query agg_tpch_q1 --format json
  python -m solis_solarman_clickhouse_spark --list

Tables region/nation/customer/supplier/part/orders/lineitem/events/
documents/embeddings are registered as views over $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1; override with --sf-dir).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="solis_solarman_clickhouse_spark")
    ap.add_argument("--sql", help="ad-hoc SQL over the fixture views")
    ap.add_argument("--query", help="run a registered query by name")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    ap.add_argument("--sf-dir", default=None, help="fixture directory")
    ap.add_argument(
        "--format", choices=("table", "csv", "json"), default="table"
    )
    ap.add_argument("--limit", type=int, default=100, help="max rows printed")
    args = ap.parse_args(argv)

    from .queries import REGISTRY

    if args.list:
        for name, spec in sorted(REGISTRY.items()):
            kind = spec.check if spec.oracle or spec.check == "SMOKE" else "EXACT"
            print(f"{name}\t{spec.category}\t{kind}")
        return 0
    if not (args.sql or args.query):
        ap.error("one of --sql / --query / --list is required")

    from .session import get_spark
    from .tables import DEFAULT_SF_DIR, register_views

    sf_dir = args.sf_dir or DEFAULT_SF_DIR
    spark = get_spark("solis-solarman-cli")
    if args.sql:
        register_views(spark, sf_dir)
        df = spark.sql(args.sql)
    else:
        if args.query not in REGISTRY:
            print(f"unknown query {args.query!r}; --list shows names", file=sys.stderr)
            return 2
        df = REGISTRY[args.query].fn(spark, sf_dir)

    df = df.limit(args.limit)
    if args.format == "table":
        df.show(args.limit, truncate=False)
    elif args.format == "csv":
        cols = df.columns
        print(",".join(cols))
        for row in df.collect():
            print(",".join("" if row[c] is None else str(row[c]) for c in cols))
    else:
        for line in df.toJSON().collect():
            print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())

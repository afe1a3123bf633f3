"""ES|QL CLI: run an ES|QL pipeline against one or more tables.

The ES|QL sibling of ``jobs/query.py`` — the consumer loop for ES's
piped query language (``POST /_query``) without an ES cluster.  Each
``--index name=path`` maps an index name the ``FROM`` command can
reference onto a parquet/orc/json path (repeatable — multi-index
``FROM a, b`` and ``LOOKUP JOIN``/``ENRICH`` sources resolve from the
same catalog); ``--query`` is the pipeline text (or ``@path`` to a
file):

    python -m hive2es_offline_spark.jobs.esql \
        --index orders=/data/orders.parquet \
        --query 'FROM orders
                 | WHERE o_totalprice > 100000
                 | STATS n = COUNT(*), total = SUM(o_totalprice)
                   BY o_orderpriority
                 | SORT o_orderpriority ASC'

    # deterministic rerank models for RERANK (plans/esql.py):
    #   --rerank-models '{"my-model": {"weights": {"merge": 0.8},
    #                     "default_weight": 0.5, "bias": -1.0}}'
    # --output writes parquet instead of printing JSON lines.
"""

from __future__ import annotations

import argparse
import json
import sys


def run_esql(spark, args: argparse.Namespace):
    """Build the catalog, compile and return the pipeline frame."""
    from ..plans.esql import esql

    catalog = {}
    for spec in args.index or []:
        name, sep, path = spec.partition("=")
        if not sep or not name or not path:
            raise ValueError(
                f"--index needs name=path, got {spec!r}")
        catalog[name] = spark.read.format(args.input_format).load(path)
    if not catalog:
        raise ValueError("at least one --index name=path is required")
    query = args.query
    if query.startswith("@"):
        with open(query[1:]) as f:
            query = f.read()
    models = json.loads(args.rerank_models) if args.rerank_models else None
    return esql(catalog, query, rerank_models=models)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--index", action="append", required=True,
                   metavar="NAME=PATH",
                   help="map an index name onto a data path (repeatable)")
    p.add_argument("--input-format", default="parquet")
    p.add_argument("--query", required=True,
                   help="ES|QL pipeline text (or @path to a file)")
    p.add_argument("--rerank-models", default=None,
                   help="JSON registry of deterministic linear models "
                        "for the RERANK command")
    p.add_argument("--output", default=None,
                   help="write the result as parquet here instead of "
                        "printing")
    p.add_argument("--max-print", type=int, default=100,
                   help="cap on printed rows (ignored with --output)")
    a = p.parse_args(argv)

    from ..session import get_spark

    spark = get_spark("esql-job")
    out = run_esql(spark, a)
    if a.output:
        out.write.mode("overwrite").parquet(a.output)
        print(json.dumps({"output": a.output,
                          "rows": spark.read.parquet(a.output).count()}))
    else:
        for row in out.limit(a.max_print).toJSON().collect():
            sys.stdout.write(row + "\n")


if __name__ == "__main__":
    main()

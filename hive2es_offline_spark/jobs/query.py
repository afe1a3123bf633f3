"""Query CLI: run an Elasticsearch search body against a table.

Closes the reference's consumer loop from the command line: the index
that `jobs/hive2es.py` loads is queried by downstream users through the
ES query DSL — this entry point runs the SAME body straight against the
source table (or any parquet/orc/json path) through the query-DSL
compiler, so "every query they run today" works without an ES cluster:

    python -m hive2es_offline_spark.jobs.query \
        --input /data/orders.parquet \
        --body '{"query": {"range": {"o_totalprice": {"gte": 100000}}},
                 "sort": [{"o_orderkey": "asc"}], "size": 20}' \
        --id-field o_orderkey

    # aggregation bodies (size: 0 + aggs) print the bucket/metric frame;
    # --body @file.json reads the body from a file;
    # --output writes parquet instead of printing JSON lines.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_msearch(src: str) -> list[dict]:
    """A JSON array of bodies, or the ES NDJSON wire form where header
    lines ({} / {"index": ...}) STRICTLY alternate with body lines —
    headers are ignored (one table == one index here).  Alternation is
    positional, not content-sniffed: an intentionally empty body ``{}``
    (match_all with defaults) in body position is kept, never mistaken
    for a header (code-review r9).  Input without a leading header line
    is treated as one body per line."""
    src = src.strip()
    if src.startswith("["):
        return json.loads(src)
    lines = [json.loads(x) for x in src.splitlines() if x.strip()]
    if not lines:
        return []

    def is_header(obj: dict) -> bool:
        return not obj or set(obj) <= {"index", "search_type",
                                       "preference", "routing"}

    if is_header(lines[0]):
        if len(lines) % 2 != 0:
            raise ValueError(
                "_msearch NDJSON must alternate header/body lines "
                f"(got {len(lines)} lines)"
            )
        return lines[1::2]
    return lines


def run_query(spark, args: argparse.Namespace):
    """Compile and run the body; returns the result DataFrame."""
    from ..plans.query_dsl import es_count, es_mget, es_search

    body_src = args.body
    if body_src.startswith("@"):
        with open(body_src[1:]) as f:
            body_src = f.read()
    if args.msearch:
        from ..plans.query_dsl import es_msearch

        bodies = _parse_msearch(body_src)
        if args.params:
            from ..plans.templates import render_search_template

            params = json.loads(args.params)
            bodies = [render_search_template(b, params) for b in bodies]
        reader = spark.read.format(args.input_format)
        df = (reader.load(args.input_path) if args.input_path
              else spark.table(args.table))
        return es_msearch(df, bodies, id_field=args.id_field,
                          scored=args.scored)
    body = json.loads(body_src)
    if args.params:
        from ..plans.templates import render_search_template

        body = render_search_template(body, json.loads(args.params))

    reader = spark.read.format(args.input_format)
    df = reader.load(args.input_path) if args.input_path else spark.table(args.table)
    if args.count:
        return es_count(df, body, id_field=args.id_field)
    if args.mget:
        return es_mget(
            df, body, id_field=args.id_field, routing_field=args.routing_field
        )
    if args.scored:
        from ..plans.scoring import es_scored_search

        return es_scored_search(df, body, id_field=args.id_field)
    if "suggest" in body and "query" not in body and "aggs" not in body:
        from ..plans.suggest import es_suggest

        return es_suggest(df, body, id_col=args.id_field)
    return es_search(df, body, id_field=args.id_field)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", dest="input_path", help="parquet/orc/json path")
    src.add_argument("--table", help="catalog table name")
    p.add_argument("--input-format", default="parquet")
    p.add_argument("--body", required=True,
                   help="ES search body JSON (or @path to a file)")
    p.add_argument("--id-field", default="_id")
    p.add_argument("--count", action="store_true",
                   help="run the _count API instead of _search")
    p.add_argument("--mget", action="store_true",
                   help="run the _mget API (body: {ids: [...]} or {docs: [...]})")
    p.add_argument("--msearch", action="store_true",
                   help="run the _msearch batch API: --body is a JSON list "
                        "of search bodies or ES NDJSON (header lines "
                        "ignored); rows carry request_index")
    p.add_argument("--routing-field", default=None,
                   help="column holding the routing value (_mget routing checks)")
    p.add_argument("--scored", action="store_true",
                   help="rank hits by BM25 _score (score context) instead of "
                        "filter-context search")
    p.add_argument("--params", default=None,
                   help="JSON params: treat --body as a mustache search "
                        "template ({{var}}, {{#toJson}}, defaults) and "
                        "render it first")
    p.add_argument("--output", default=None,
                   help="write the result as parquet here instead of printing")
    p.add_argument("--max-print", type=int, default=100,
                   help="cap on printed rows (ignored with --output)")
    a = p.parse_args(argv)

    from ..session import get_spark

    spark = get_spark("es-query-job", enable_hive=a.table is not None)
    out = run_query(spark, a)
    if a.output:
        out.write.mode("overwrite").parquet(a.output)
        print(json.dumps({"output": a.output, "rows": spark.read.parquet(a.output).count()}))
    else:
        for row in out.limit(a.max_print).toJSON().collect():
            sys.stdout.write(row + "\n")


if __name__ == "__main__":
    main()

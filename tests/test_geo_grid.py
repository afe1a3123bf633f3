"""geohash_grid / geotile_grid bucket aggregations: golden cell vectors,
NULL handling, size/order semantics, and metric sub-aggs."""

import pytest
from pyspark.sql import functions as F

from hive2es_offline_spark.plans.query_dsl import (
    compile_aggs, geohash_cell, geotile_cell,
)


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(
        [
            (1, 57.64911, 10.40744, 5.0),     # wikipedia geohash vector
            (2, 52.374081, 4.912350, 7.0),    # amsterdam
            (3, 52.369219, 4.901618, 9.0),    # amsterdam (same cells)
            (4, -25.382708, -49.265506, 1.0),  # curitiba
            (5, 90.0, 180.0, 1.0),            # NE corner clamp
            (6, -90.0, -180.0, 1.0),          # SW corner clamp
            (7, None, 10.0, 1.0),             # missing lat
        ],
        "id long, lat double, lon double, v double",
    )


def test_geohash_golden_vectors(pts):
    rows = {r["id"]: r["gh"] for r in pts.select(
        "id", geohash_cell(F.col("lat"), F.col("lon"), 11).alias("gh")
    ).collect()}
    assert rows[1] == "u4pruydqqvj"
    assert rows[4] == "6gkzwgjzn82"
    assert rows[5] == "zzzzzzzzzzz"
    assert rows[6] == "00000000000"
    assert rows[7] is None  # greatest() must not swallow the NULL


def test_geotile_golden_vectors(pts):
    rows = {r["id"]: r["gt"] for r in pts.select(
        "id", geotile_cell(F.col("lat"), F.col("lon"), 8).alias("gt")
    ).collect()}
    assert rows[2] == "8/131/84"
    # poleward latitudes clamp into Web-Mercator bounds (±85.05112878,
    # ES GeoTileUtils) BEFORE the projection: the south pole lands in the
    # SOUTH edge tile (y = 2^z - 1), not y=0 — at lat=-90 exactly,
    # tan+sec underflows to 0.0 and log(0)=NULL would otherwise be
    # silently swallowed by the clamp (ADVICE r10)
    assert rows[5] == "8/255/0"
    assert rows[6] == "8/0/255"
    assert rows[7] is None


def test_geohash_grid_agg_buckets_and_metrics(pts):
    loc = pts.select(
        "id", "v", F.struct("lat", "lon").alias("loc")).withColumnRenamed(
        "id", "_id")
    out = compile_aggs(loc, {"g": {
        "geohash_grid": {"field": "loc", "precision": 4},
        "aggs": {"s": {"sum": {"field": "v"}}},
    }}).collect()
    by_key = {r["key"]: r for r in out}
    # docs 2 and 3 share the 4-char amsterdam cell; the NULL-lat doc is
    # dropped (no cell), so 5 buckets remain
    assert len(out) == 5
    assert by_key["u173"]["doc_count"] == 2
    assert by_key["u173"]["s"] == 16.0
    assert by_key["u4pr"]["doc_count"] == 1


def test_geotile_grid_size_caps_by_count_desc(pts):
    loc = pts.select("id", F.struct("lat", "lon").alias("loc"))
    out = compile_aggs(loc, {"g": {
        "geotile_grid": {"field": "loc", "precision": 8, "size": 1},
    }}).collect()
    # the only 2-doc tile wins the size=1 cut
    assert len(out) == 1
    assert out[0]["key"] == "8/131/84"
    assert out[0]["doc_count"] == 2


def test_grid_rejects_unknown_options(pts):
    loc = pts.select("id", F.struct("lat", "lon").alias("loc"))
    with pytest.raises(ValueError, match="geohash_grid option"):
        compile_aggs(loc, {"g": {"geohash_grid": {
            "field": "loc", "bounds": {}}}})
    with pytest.raises(ValueError, match="precision"):
        compile_aggs(loc, {"g": {"geohash_grid": {
            "field": "loc", "precision": 13}}}).collect()

"""Mapping synthesis + field/type/index-policy goldens, mirroring the
reference's generator semantics (``PAHive2ES.scala:53-64,82-98,126-159``)."""

from pyspark.sql import types as T

from hive2es_offline_spark.operators.document import (
    es_type_for,
    map_field_name,
    normalize_field_name,
)
from hive2es_offline_spark.plans.mapping import (
    index_settings_final,
    index_settings_for_load,
    mapping_from_schema,
    synthesize_mapping,
)


def test_field_name_normalization():
    assert normalize_field_name("Foo&Bar$Baz") == "foo-bar-baz"
    assert normalize_field_name("  UPPER  ") == "upper"


def test_map_field_name_il_prefixing():
    # *_il map columns prefix their keys (PAHive2ES.scala:91-98)
    assert map_field_name("tags_il", "City") == "tags_il-city"
    assert map_field_name("metrics", "Hits&Total") == "hits-total"


def test_type_rules():
    assert es_type_for(T.LongType()) == "long"
    assert es_type_for(T.IntegerType()) == "integer"
    assert es_type_for(T.DecimalType(18, 4)) == "double"
    assert es_type_for(T.TimestampType()) == "date"
    assert es_type_for(T.StringType()) == "string"
    assert es_type_for(T.StringType(), override="long") == "long"


def test_synthesize_mapping_golden():
    fields = [
        ("name", "string", True),
        ("age", "long", True),
        ("born", "date", True),
        ("blob_il", "string", False),
    ]
    m = synthesize_mapping(fields, doc_type="doc")
    assert m == {
        "doc": {
            "_all": {"enabled": False},
            "properties": {
                "name": {"type": "string", "index": "not_analyzed"},
                "age": {"type": "long"},
                "born": {"type": "date", "format": "yyyyMMdd"},
                "blob_il": {"type": "string", "index": "no"},
            },
        }
    }


def test_mapping_from_schema_policy():
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("score_ex", T.DoubleType()),  # _ex -> unindexed
            T.StructField("hits_il", T.LongType()),  # _il -> unindexed
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    m = mapping_from_schema(schema, index_hive_fields={"hits_il"})
    props = m["doc"]["properties"]
    assert props["score_ex"] == {"type": "double", "index": "no"}
    assert props["hits_il"] == {"type": "long"}  # whitelisted
    assert props["tags"] == {"type": "string", "index": "not_analyzed"}


def test_index_settings_lifecycle():
    load = index_settings_for_load(5)
    assert load["number_of_replicas"] == 0
    assert load["refresh_interval"] == "-1"
    assert load["number_of_shards"] == 5
    final = index_settings_final()
    assert final["number_of_replicas"] == 2

"""ES mapping synthesis + index lifecycle settings — driver-side pure
functions (no cluster work).

Mirrors the reference's mapping generator (``PAHive2ES.scala:126-159``):
string fields indexed ``not_analyzed``, non-indexed fields ``index: no``,
date fields carry ``format: yyyyMMdd``, ``_all`` disabled
(``ESContainer.scala:220-224``).  Settings mirror the load-mode /
finalization knobs (``ESContainer.scala:160-188``, ``NodeService.java:36,152``)
— the reference's core write-amplification trick: index with replicas=0 /
refresh=-1 / async translog, then flip to serving settings after publish.
"""

from __future__ import annotations

from pyspark.sql import types as T

from ..operators.document import es_type_for, infer_field_set, normalize_field_name


def synthesize_mapping(
    fields: list[tuple[str, str, bool]],
    doc_type: str = "doc",
    date_format: str = "yyyyMMdd",
    disable_all: bool = True,
) -> dict:
    """(es_key, es_type, need_index) triples -> ES mapping dict.

    Rules (``PAHive2ES.scala:131-150``):
    * need_index=False        -> ``index: no``
    * string + need_index     -> ``index: not_analyzed`` (keyword semantics)
    * date                    -> ``format: yyyyMMdd``
    * everything else         -> plain typed field
    """
    props: dict[str, dict] = {}
    for es_key, es_type, need_index in sorted(fields):
        entry: dict = {"type": es_type}
        if not need_index:
            entry["index"] = "no"
        elif es_type == "string":
            entry["index"] = "not_analyzed"
        if es_type == "date":
            entry["format"] = date_format
        props[es_key] = entry
    mapping: dict = {doc_type: {"properties": props}}
    if disable_all:
        mapping[doc_type]["_all"] = {"enabled": False}
    return mapping


def mapping_from_schema(
    schema: T.StructType,
    overrides: dict[str, str] | None = None,
    index_hive_fields: set[str] = frozenset(),
    index_es_fields: set[str] = frozenset(),
    doc_type: str = "doc",
) -> dict:
    """Static-schema variant: StructType -> mapping without any cluster pass.

    Map columns need key discovery from data; use
    ``operators.document.infer_field_set(df)`` + ``synthesize_mapping`` for
    those (the reference always paid a full extra scan for this,
    ``PAHive2ES.scala:100-121``).
    """
    overrides = overrides or {}
    fields: list[tuple[str, str, bool]] = []
    from ..operators.document import _need_index  # shared policy predicate

    for f in schema.fields:
        es_key = normalize_field_name(f.name)
        dt = f.dataType.elementType if isinstance(f.dataType, T.ArrayType) else f.dataType
        fields.append(
            (
                es_key,
                es_type_for(dt, overrides.get(f.name)),
                _need_index(f.name, es_key, index_hive_fields, index_es_fields),
            )
        )
    return synthesize_mapping(fields, doc_type=doc_type)


def index_settings_for_load(num_shards: int, translog_flush: str = "10gb") -> dict:
    """Build-mode settings (``ESContainer.scala:160-188``): no replicas, no
    refresh, async translog, merge throttling off."""
    return {
        "number_of_shards": num_shards,
        "number_of_replicas": 0,
        "refresh_interval": "-1",
        "translog.durability": "async",
        "translog.flush_threshold_size": translog_flush,
        "translog.sync_interval": "10m",
        "merge.scheduler.auto_throttle": False,
    }


def index_settings_final(replicas: int = 2, refresh_interval: str = "1s") -> dict:
    """Serving settings applied at publish (``NodeService.java:36,152``,
    ``ESClient.java:251-266``)."""
    return {
        "number_of_replicas": replicas,
        "refresh_interval": refresh_interval,
    }

from .bundle import write_bundle, publish_bundle, read_manifest
from .es_bulk import es_write_conf, bulk_write_stats
from . import export, layout, snapshot

__all__ = [
    "write_bundle",
    "publish_bundle",
    "read_manifest",
    "es_write_conf",
    "bulk_write_stats",
    "export",
    "layout",
    "snapshot",
]

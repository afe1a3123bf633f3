from .es_hash import es_hash, es_shard, murmur3_x86_32, es_routing_hash

__all__ = ["es_hash", "es_shard", "murmur3_x86_32", "es_routing_hash"]

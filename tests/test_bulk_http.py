"""Exercised HTTP bulk transport: real sockets against an in-process stub
``/_bulk`` endpoint — retry/backoff on 503/429, per-item error accounting,
create-conflict idempotency (the semantics of the reference's BulkProcessor,
``ESContainer.scala:118-151``, which previous rounds only unit-asserted on a
no-op counter)."""

import json

import pytest

from hive2es_offline_spark.operators import routing
from hive2es_offline_spark.sinks import es_bulk
from hive2es_offline_spark.sinks.stub_es import StubES


@pytest.fixture()
def docs(spark):
    rows = [(str(i), str(i), json.dumps({"id": i, "v": i * 2})) for i in range(250)]
    df = spark.createDataFrame(rows, "_id string, _routing string, doc string")
    return routing.with_shard(df, "_routing", 3)


def _run(docs, server, **kw):
    return (
        es_bulk.bulk_write_http(docs, "idx", server.url, backoff_s=0.01, **kw)
        .toPandas()
        .sum(numeric_only=True)
    )


def test_all_docs_land(docs):
    with StubES() as server:
        totals = _run(docs, server)
        assert totals["doc_count"] == 250
        assert totals["failed_actions"] == 0
        assert len(server.docs) == 250
        routing_of_7 = server.docs["7"][0]
        assert routing_of_7 == "7"  # routing forwarded into the bulk meta


def test_batches_respect_action_threshold(docs):
    with StubES() as server:
        totals = _run(docs.coalesce(1), server, bulk_actions=100)
        assert totals["batch_count"] == 3  # 100 + 100 + 50 on one partition
        assert len(server.docs) == 250


def test_retry_on_503_then_succeed(docs):
    with StubES(fail_first_requests=2) as server:
        totals = _run(docs, server)
        assert totals["http_retries"] >= 2
        assert totals["failed_actions"] == 0
        assert len(server.docs) == 250


def test_retry_on_429(docs):
    # every distinct payload is 429'd on first attempt: each batch must be
    # retried exactly once, so retries == batches and nothing fails
    with StubES(rate_limit_first_attempt=True) as server:
        totals = _run(docs, server)
        assert totals["failed_actions"] == 0
        assert totals["http_retries"] == totals["batch_count"]
        assert len(server.docs) == 250


def test_per_item_400_not_retried_but_counted(docs):
    # ids starting with "1" (1, 1x, 1xx) are rejected per-item: 1 + 10 + 100
    with StubES(reject_id_prefix="1") as server:
        totals = _run(docs, server)
        assert totals["failed_actions"] == 111
        assert len(server.docs) == 250 - 111
        assert server.request_count <= 250  # no request-level retry storm


def test_replay_conflicts_are_idempotent_not_failures(docs):
    with StubES(duplicate_conflicts=True) as server:
        first = _run(docs, server)
        again = _run(docs, server)  # full replay: every create -> 409
        assert first["failed_actions"] == 0
        assert again["failed_actions"] == 0  # 409 = idempotency, not error
        assert len(server.docs) == 250


def test_exponential_backoff_shape_and_exhaustion():
    """Transport-level contract without Spark: delays double per attempt;
    after the last retry every action in the payload counts failed."""
    delays = []
    t = es_bulk.http_bulk_transport(
        "http://127.0.0.1:9/_bulk",  # port 9 (discard): connection refused
        retries=3,
        backoff_s=0.2,
        timeout_s=0.2,
        sleep=delays.append,
    )
    payload = "\n".join(['{"create":{"_id":"a"}}', "{}",
                        '{"create":{"_id":"b"}}', "{}"]) + "\n"
    failed, attempts = t(payload)
    assert failed == 2  # both actions of the dead batch surfaced
    assert attempts == 3
    assert delays == [0.2, 0.4, 0.8]


def test_non_retryable_http_400_gives_up_immediately():
    calls = []
    with StubES() as server:
        t = es_bulk.http_bulk_transport(
            server.url.replace("/_bulk", "/nope"), retries=3, sleep=calls.append
        )
        failed, attempts = t('{"create":{"_id":"a"}}\n{}\n')
        assert failed == 1
        assert attempts == 0
        assert calls == []  # 404 is not retryable: no backoff sleeps


def test_garbled_200_body_is_retried_not_crashed(docs):
    """A 200 response whose body is not JSON (truncated read, proxy
    interstitial) must follow the log-and-continue contract: retry the
    batch, never raise inside the task (ADVICE r7)."""
    with StubES(garble_first_requests=2) as server:
        totals = _run(docs, server)
        assert totals["failed_actions"] == 0
        assert totals["http_retries"] >= 2
        assert len(server.docs) == 250


def test_garbled_200_exhaustion_counts_actions_failed():
    delays = []
    with StubES(garble_first_requests=10_000) as server:
        t = es_bulk.http_bulk_transport(
            server.url, retries=2, backoff_s=0.05, sleep=delays.append
        )
        payload = "\n".join(['{"create":{"_id":"a"}}', "{}",
                            '{"create":{"_id":"b"}}', "{}"]) + "\n"
        failed, attempts = t(payload)
        assert failed == 2
        assert attempts == 2
        assert delays == [0.05, 0.1]

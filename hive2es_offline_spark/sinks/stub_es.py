"""In-process stub Elasticsearch ``/_bulk`` endpoint.

Lets the HTTP bulk path (``es_bulk.bulk_write_http``) be EXERCISED — real
sockets, real NDJSON parse, real per-item response statuses — without a
live cluster.  The reference's write path is an embedded per-executor node
(``ESContainer.scala:104-151``); the stub plays the server side of the
equivalent online ``/_bulk`` protocol so retry/backoff/error-partition
semantics actually run instead of being unit-asserted on a no-op counter.

Failure injection:

* ``fail_first_requests=N`` — the first N POSTs get a 503 (retryable:
  exercises the whole-request exponential-backoff loop).
* ``rate_limit_first_attempt=True`` — the FIRST attempt of every distinct
  payload gets a 429 (the other retryable class); the retry succeeds.
  Deterministic under concurrent partitions, unlike a modulo counter.
* ``reject_id_prefix=p`` — actions whose ``_id`` starts with ``p`` get a
  per-item 400 mapper_parsing error in an otherwise-200 response
  (non-retryable: must surface in ``failed_actions``, not be retried).
* ``duplicate_conflicts=True`` — re-created ids get a 409 per-item status
  (idempotent replay: must NOT count as failed).

Thread-safe; documents land in ``server.docs`` (id -> (routing, source))
for assertions.  Local-process servers serve ``local[N]`` executors and
mapInPandas Python workers alike — everything shares localhost.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class StubES:
    def __init__(
        self,
        fail_first_requests: int = 0,
        rate_limit_first_attempt: bool = False,
        reject_id_prefix: str | None = None,
        duplicate_conflicts: bool = True,
        garble_first_requests: int = 0,
    ):
        self.docs: dict[str, tuple[str | None, str]] = {}
        self.request_count = 0
        self._lock = threading.Lock()
        self._fail_first = fail_first_requests
        self._garble_first = garble_first_requests
        self._rate_first = rate_limit_first_attempt
        self._seen_payloads: set[int] = set()
        self._reject_prefix = reject_id_prefix
        self._conflicts = duplicate_conflicts

        stub = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                if not self.path.endswith("/_bulk"):
                    self.send_error(404)
                    return
                body = self.rfile.read(int(self.headers["Content-Length"]))
                with stub._lock:
                    stub.request_count += 1
                    n = stub.request_count
                    if n <= stub._fail_first:
                        self.send_error(503, "exhausted bulk queue")
                        return
                    if n <= stub._fail_first + stub._garble_first:
                        # 200 whose body is NOT JSON (proxy interstitial /
                        # truncated read) — the transport must treat it as
                        # a failed request, never crash the task
                        junk = b"<html>gateway interstitial</html>"
                        self.send_response(200)
                        self.send_header("Content-Type", "text/html")
                        self.send_header("Content-Length", str(len(junk)))
                        self.end_headers()
                        self.wfile.write(junk)
                        return
                    if stub._rate_first:
                        key = hash(body)
                        if key not in stub._seen_payloads:
                            stub._seen_payloads.add(key)
                            self.send_error(429, "too many requests")
                            return
                    items = stub._apply(body.decode("utf-8"))
                resp = json.dumps(
                    {"took": 1, "errors": any(
                        next(iter(i.values()))["status"] >= 300 for i in items
                    ), "items": items}
                ).encode("utf-8")
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(resp)))
                self.end_headers()
                self.wfile.write(resp)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def _apply(self, payload: str) -> list[dict]:
        """Apply one NDJSON bulk body under the lock; returns ES items."""
        items: list[dict] = []
        lines = [ln for ln in payload.split("\n") if ln]
        for meta_line, doc_line in zip(lines[0::2], lines[1::2]):
            meta = json.loads(meta_line)
            (op, spec), = meta.items()
            _id = str(spec.get("_id"))
            if self._reject_prefix and _id.startswith(self._reject_prefix):
                items.append({op: {"_id": _id, "status": 400, "error": {
                    "type": "mapper_parsing_exception"}}})
                continue
            if op == "create" and _id in self.docs and self._conflicts:
                items.append({op: {"_id": _id, "status": 409, "error": {
                    "type": "version_conflict_engine_exception"}}})
                continue
            self.docs[_id] = (spec.get("routing"), doc_line)
            items.append({op: {"_id": _id, "status": 201}})
        return items

    @property
    def url(self) -> str:
        host, port = self._server.server_address
        return f"http://{host}:{port}/_bulk"

    def __enter__(self) -> "StubES":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()

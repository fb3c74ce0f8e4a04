"""Keyed document-tree sink — the engine's replacement for the
reference's Firebase RTDB fan-out (trends.go:656-745).

Reference behaviors reproduced:

- S4 idempotency: the output subtree ``highlights/{list}/{date}/{type}``
  is deleted before writing (trends.go:656-662) — delete-then-write per
  partition key.
- S5 bounded parallel fan-out: ≤100 concurrent in-flight writes
  (sizedwaitgroup, trends.go:664-679); ``parallel=False`` reproduces
  the serial path (trends.go:681-683).
- skip-on-invalid-JSON: records whose ``json`` field fails validation
  are skipped with a counter, not failed (trends.go:690-694).

Spark-first shape: the DataFrame stays distributed — each executor
partition opens its own client (clients are per-partition, never
serialized from the driver) and runs its own bounded pool, so total
in-flight = partitions × max_in_flight, tunable for the sink's rate
limit.  At 100 TB scale you'd coalesce to the sink's capacity, not the
data's.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterator
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, Row

# The 12-field leaf record (trends.go:716-729).
RECORD_FIELDS = (
    "id", "twitterId", "username", "text", "url", "json",
    "publishedAt", "checkedAt", "isRetweet", "twitter_id",
    "totalRetweets", "totalFavorites",
)


class DocumentStore:
    """Minimal client protocol: a keyed document tree."""

    def delete_subtree(self, path: str) -> None:
        raise NotImplementedError

    def update(self, path: str, record: dict) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class LocalFSDocumentStore(DocumentStore):
    """Filesystem-backed store: one JSON file per leaf, directories for
    tree levels.  Serves tests and local runs; the Firebase REST client
    below is the production analogue."""

    def __init__(self, root: str):
        self.root = root

    def _p(self, path: str) -> str:
        return os.path.join(self.root, *path.strip("/").split("/"))

    def delete_subtree(self, path: str) -> None:
        import shutil

        target = self._p(path)
        if os.path.isdir(target):
            shutil.rmtree(target)

    def update(self, path: str, record: dict) -> None:
        target = self._p(path) + ".json"
        os.makedirs(os.path.dirname(target), exist_ok=True)
        with open(target, "w") as f:
            json.dump(record, f, ensure_ascii=False, sort_keys=True)


class FirebaseRESTStore(DocumentStore):
    """Firebase RTDB REST client (PUT/DELETE on ``{base}/{path}.json``)
    — the production sink (reference uses the firego client,
    trends.go:686-745).  Network I/O is urllib-only so no extra deps.

    Auth, in precedence order:

    - ``token_provider`` — a zero-arg callable returning a fresh OAuth2
      access token (e.g. ``ServiceAccountTokenProvider.token`` from
      ``sources.gauth``, the reference's service-account flow,
      trends.go:225-239); sent as ``?access_token=`` per the Firebase
      REST docs, re-evaluated per request so refresh just works.
    - ``auth_token`` — a static legacy database secret (``?auth=``).
    """

    def __init__(self, base_url: str, auth_token: str | None = None,
                 timeout: float = 10.0,
                 token_provider: "Callable[[], str] | None" = None):
        self.base_url = base_url.rstrip("/")
        self.auth_token = auth_token
        self.token_provider = token_provider
        self.timeout = timeout

    def _url(self, path: str) -> str:
        from urllib.parse import quote

        url = f"{self.base_url}/{path.strip('/')}.json"
        # tokens may carry '+', '/', '=' — unencoded they decode to
        # different bytes server-side and auth fails intermittently
        if self.token_provider is not None:
            url += f"?access_token={quote(self.token_provider(), safe='')}"
        elif self.auth_token:
            url += f"?auth={quote(self.auth_token, safe='')}"
        return url

    def _request(self, method: str, path: str, body: bytes | None = None):
        import urllib.request

        req = urllib.request.Request(
            self._url(path), data=body, method=method,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return resp.read()

    def delete_subtree(self, path: str) -> None:
        self._request("DELETE", path)

    def update(self, path: str, record: dict) -> None:
        self._request("PATCH", path, json.dumps(record).encode())


@dataclass
class SinkStats:
    written: int = 0
    skipped_invalid_json: int = 0


def _with_retries(fn, attempts: int = 3, base_delay: float = 0.1):
    """Call fn() with bounded exponential backoff — transient sink
    errors (HTTP 5xx, connection resets) shouldn't fail the Spark task;
    persistent ones still raise after the last attempt."""
    import time

    last = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — sink clients raise varied types
            last = exc
            if i < attempts - 1:
                time.sleep(base_delay * (2**i))
    raise last


def _record_of(row: Row) -> dict:
    rec = row.asDict()
    # quirk parity (trends.go:722,726): both twitterId and twitter_id
    # carry the status id string
    rec.setdefault("twitter_id", rec.get("twitterId"))
    return {k: rec.get(k) for k in RECORD_FIELDS}


def _valid_json(value) -> bool:
    if value is None:
        return False
    try:
        json.loads(value)
        return True
    except (ValueError, TypeError):
        return False


def write_highlights(
    df: DataFrame,
    store_factory: Callable[[], DocumentStore],
    list_id: str,
    since_date: str,
    max_in_flight: int = 100,
    parallel: bool = True,
    truncate_first: bool = True,
    retry_attempts: int = 3,
) -> None:
    """Write a (possibly multi-variant) highlights DataFrame to the
    document store under ``highlights/{list}/{date}/{type}/{id}``.

    ``df`` must carry the 12-field record plus ``statusType``.
    """
    type_col = "statusType"
    if truncate_first:
        # S4: enumerate present partitions (tiny — ≤4 variants), then
        # delete each subtree once, driver-side, before any write.
        types = [r[0] for r in df.select(type_col).distinct().collect()]
        store = store_factory()
        try:
            for t in types:
                store.delete_subtree(f"highlights/{list_id}/{since_date}/{t}")
        finally:
            store.close()

    if not parallel:
        df = df.coalesce(1)
    pool_size = max_in_flight if parallel else 1

    def write_partition(rows: Iterator[Row]) -> None:
        store = store_factory()
        stats = SinkStats()
        try:
            with ThreadPoolExecutor(max_workers=pool_size) as pool:
                futures = []
                for row in rows:
                    rec = _record_of(row)
                    if not _valid_json(rec.get("json")):
                        # trends.go:690-694 — skip, don't fail
                        stats.skipped_invalid_json += 1
                        continue
                    path = (
                        f"highlights/{list_id}/{since_date}/"
                        f"{row[type_col]}/{rec['twitterId']}"
                    )
                    futures.append(
                        pool.submit(
                            _with_retries,
                            lambda p=path, r=rec: store.update(p, r),
                            retry_attempts,
                        )
                    )
                for fut in futures:
                    fut.result()
                    stats.written += 1
        finally:
            store.close()

    df.foreachPartition(write_partition)

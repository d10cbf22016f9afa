"""S15: object-store publish (the reference's gold-layer upload step,
``airflow_dags/corc_nah_etl_dag.py:206-228``: ``aws s3 sync`` of the
final parquet layout + dataset-hub upload).

Two halves:

- The Spark writers (``sources/writers.py``) are path-scheme-agnostic:
  pointed at ``s3a://bucket/...`` they write straight to an object store
  through Hadoop's S3A filesystem — nothing in this repo to change. That
  path needs the ``hadoop-aws`` jars on the Spark classpath (a
  deployment concern; the test container ships PySpark without them, so
  it cannot be exercised here and is covered by the integration test
  below instead).

- ``publish_directory``: the sync step itself — upload an already-written
  local output directory (e.g. a ``write_splits`` gold layout) to an
  S3-compatible object store over its REST API, preserving relative
  paths under a key prefix and skipping objects whose content already
  matches (md5 = S3 ETag for single-part uploads — the same change
  detection ``aws s3 sync`` uses when sizes match). Pure stdlib client:
  the publish step runs on the DRIVER over a handful of output files
  (the data plane stays distributed — Spark wrote the files; this only
  ships them), so no SDK dependency is warranted.

The integration test (tests/test_publish.py) runs a minimal in-process
S3 REST server (PUT/GET/HEAD/ListObjectsV2 — the public S3 API surface)
and round-trips a real partitioned parquet dataset through it, asserting
layout, idempotent re-sync, and that downloaded bytes are readable
parquet. That is the environmental closest-to-production check available
without the hadoop-aws classpath.
"""

from __future__ import annotations

import hashlib
import os
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass
from xml.etree import ElementTree


@dataclass(frozen=True)
class PublishedObject:
    key: str
    size: int
    etag: str
    uploaded: bool  # False = skipped, already in sync


class S3RestClient:
    """Minimal S3-compatible REST client (stdlib only): put/get/head
    object + ListObjectsV2. Targets path-style addressing
    (``endpoint/bucket/key``), the layout dev object stores (MinIO,
    localstack, the test fixture) serve without DNS tricks. Unsigned
    requests — for authenticated production stores, the publish step
    belongs behind the store's own signing proxy or the vendored CLI,
    exactly as the reference shells out to ``aws s3 sync``."""

    def __init__(self, endpoint: str, bucket: str, timeout: float = 30.0):
        self.endpoint = endpoint.rstrip("/")
        self.bucket = bucket
        self.timeout = timeout

    def _url(self, key: str = "", query: str = "") -> str:
        path = f"{self.endpoint}/{self.bucket}"
        if key:
            path += "/" + urllib.parse.quote(key)
        if query:
            path += "?" + query
        return path

    def put_object(self, key: str, data: bytes) -> str:
        req = urllib.request.Request(
            self._url(key), data=data, method="PUT"
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return resp.headers.get("ETag", "").strip('"')

    def get_object(self, key: str) -> bytes:
        with urllib.request.urlopen(
            self._url(key), timeout=self.timeout
        ) as resp:
            return resp.read()

    def head_object(self, key: str) -> dict | None:
        """Size + ETag, or None if absent (the sync change-check)."""
        req = urllib.request.Request(self._url(key), method="HEAD")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return {
                    "size": int(resp.headers.get("Content-Length", 0)),
                    "etag": resp.headers.get("ETag", "").strip('"'),
                }
        except urllib.error.HTTPError as exc:
            if exc.code == 404:
                return None
            raise

    def list_objects(self, prefix: str = "") -> list[dict]:
        """ListObjectsV2 (single page is plenty for a gold layout; a
        paginating loop over ContinuationToken is the obvious extension)."""
        query = "list-type=2"
        if prefix:
            query += "&prefix=" + urllib.parse.quote(prefix)
        with urllib.request.urlopen(
            self._url(query=query), timeout=self.timeout
        ) as resp:
            tree = ElementTree.fromstring(resp.read())
        # S3 responses carry a default namespace; match tag suffixes so
        # both namespaced (AWS/MinIO) and plain (fixtures) XML parse.
        out = []
        for el in tree.iter():
            if el.tag.endswith("Contents"):
                rec = {}
                for child in el:
                    if child.tag.endswith("Key"):
                        rec["key"] = child.text
                    elif child.tag.endswith("Size"):
                        rec["size"] = int(child.text)
                    elif child.tag.endswith("ETag"):
                        rec["etag"] = (child.text or "").strip('"')
                out.append(rec)
        return out


def publish_directory(
    local_dir: str,
    client: S3RestClient,
    prefix: str,
    skip_hidden: bool = True,
) -> list[PublishedObject]:
    """Sync a local output directory to ``bucket/prefix/...`` — the
    ``aws s3 sync`` semantics of the reference's publish task: every
    file keyed by its path relative to ``local_dir``; files whose
    remote (size, md5-ETag) already match are skipped, everything else
    uploaded. Hidden bookkeeping files (``_SUCCESS``, ``.crc``) are
    excluded by default, matching the reference's sync excludes.

    Driver-side by design: the inputs are the FILES Spark already wrote
    (a gold layout is O(shards), not O(rows)); distributed upload at
    100 TB is the writers' s3a:// path, not this function.

    Returns one :class:`PublishedObject` per considered file, uploads
    and skips both listed — the manifest a CI publish gate logs.
    """
    results: list[PublishedObject] = []
    prefix = prefix.strip("/")
    for root, _dirs, files in os.walk(local_dir):
        for name in sorted(files):
            if skip_hidden and (
                name.startswith(".") or name == "_SUCCESS"
            ):
                continue
            full = os.path.join(root, name)
            rel = os.path.relpath(full, local_dir)
            key = f"{prefix}/{rel.replace(os.sep, '/')}"
            with open(full, "rb") as f:
                data = f.read()
            md5 = hashlib.md5(data).hexdigest()
            remote = client.head_object(key)
            if (
                remote is not None
                and remote["size"] == len(data)
                and remote["etag"] == md5
            ):
                results.append(
                    PublishedObject(key, len(data), md5, uploaded=False)
                )
                continue
            etag = client.put_object(key, data) or md5
            results.append(
                PublishedObject(key, len(data), etag, uploaded=True)
            )
    return results

"""S15 object-store publish round-trip (sources/publish.py) against an
in-process S3-compatible REST server.

The fixture server implements the public S3 API subset the publish step
uses — PUT/GET/HEAD object and ListObjectsV2 with the AWS response
namespace — so the test exercises real HTTP object-store semantics
(keys, ETags, listing) end-to-end in-sandbox. The hadoop s3a:// write
path needs the hadoop-aws jars (absent from this container's PySpark)
and stays a documented deployment concern.
"""

from __future__ import annotations

import hashlib
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

import pytest

from nahuatl_data_pipeline_spark.sources.publish import (
    S3RestClient,
    publish_directory,
)

_S3_NS = "http://s3.amazonaws.com/doc/2006-03-01/"


class _S3Handler(BaseHTTPRequestHandler):
    """Path-style S3: /{bucket}/{key}; bucket store lives on the server."""

    def log_message(self, *args):  # noqa: D102 - silence test output
        pass

    def _parse(self):
        parsed = urlparse(self.path)
        parts = unquote(parsed.path).lstrip("/").split("/", 1)
        bucket = parts[0]
        key = parts[1] if len(parts) > 1 else ""
        return bucket, key, parse_qs(parsed.query)

    def do_PUT(self):
        _bucket, key, _q = self._parse()
        data = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        etag = hashlib.md5(data).hexdigest()
        self.server.objects[key] = (data, etag)
        self.send_response(200)
        self.send_header("ETag", f'"{etag}"')
        self.send_header("Content-Length", "0")
        self.end_headers()

    def _object_or_404(self, key):
        obj = self.server.objects.get(key)
        if obj is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
        return obj

    def do_HEAD(self):
        _bucket, key, _q = self._parse()
        obj = self._object_or_404(key)
        if obj is None:
            return
        data, etag = obj
        self.send_response(200)
        self.send_header("ETag", f'"{etag}"')
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()

    def do_GET(self):
        _bucket, key, q = self._parse()
        if "list-type" in q:  # ListObjectsV2
            prefix = q.get("prefix", [""])[0]
            rows = "".join(
                f"<Contents><Key>{k}</Key><Size>{len(d)}</Size>"
                f'<ETag>"{e}"</ETag></Contents>'
                for k, (d, e) in sorted(self.server.objects.items())
                if k.startswith(prefix)
            )
            body = (
                f'<?xml version="1.0"?><ListBucketResult xmlns="{_S3_NS}">'
                f"{rows}</ListBucketResult>"
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/xml")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        obj = self._object_or_404(key)
        if obj is None:
            return
        data, etag = obj
        self.send_response(200)
        self.send_header("ETag", f'"{etag}"')
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


@pytest.fixture()
def s3_store():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _S3Handler)
    server.objects = {}
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield server, f"http://127.0.0.1:{server.server_address[1]}"
    finally:
        server.shutdown()


def _gold_layout(spark, tmp_path):
    """A real write_splits gold layout: hive-partitioned parquet."""
    from nahuatl_data_pipeline_spark.sources.writers import write_splits

    df = spark.createDataFrame(
        [(i, f"text {i}", "train" if i % 3 else "test") for i in range(30)],
        "doc_id long, text string, split string",
    )
    out = str(tmp_path / "gold")
    write_splits(df.repartition(2), out, split_col="split")
    return out


def test_publish_round_trip_layout_and_readability(spark, tmp_path, s3_store):
    server, endpoint = s3_store
    client = S3RestClient(endpoint, "corpus")
    out = _gold_layout(spark, tmp_path)

    manifest = publish_directory(out, client, prefix="gold/v1")
    assert manifest and all(o.uploaded for o in manifest)

    listed = client.list_objects(prefix="gold/v1/")
    keys = {o["key"] for o in listed}
    assert keys == {o.key for o in manifest}
    # hive partition layout survives the sync
    assert any("split=train/" in k for k in keys)
    assert any("split=test/" in k for k in keys)
    assert all(k.endswith(".parquet") for k in keys)
    # no bookkeeping files uploaded
    assert not any("_SUCCESS" in k or "/." in k for k in keys)
    # listing sizes/etags match the manifest exactly
    by_key = {o["key"]: o for o in listed}
    for o in manifest:
        assert by_key[o.key]["size"] == o.size
        assert by_key[o.key]["etag"] == o.etag

    # downloaded bytes are a READABLE parquet file with the right rows
    import io

    import pyarrow.parquet as pq

    some_key = next(k for k in keys if "split=train/" in k)
    table = pq.read_table(io.BytesIO(client.get_object(some_key)))
    assert set(table.column_names) == {"doc_id", "text"}


def test_publish_resync_is_idempotent(spark, tmp_path, s3_store):
    server, endpoint = s3_store
    client = S3RestClient(endpoint, "corpus")
    out = _gold_layout(spark, tmp_path)

    first = publish_directory(out, client, prefix="gold/v2")
    assert all(o.uploaded for o in first)
    second = publish_directory(out, client, prefix="gold/v2")
    assert [o.key for o in second] == [o.key for o in first]
    assert not any(o.uploaded for o in second)  # nothing re-shipped

    # corrupt one remote object → only that key re-uploads
    victim = first[0].key
    server.objects[victim] = (b"corrupted", hashlib.md5(b"corrupted").hexdigest())
    third = publish_directory(out, client, prefix="gold/v2")
    assert {o.key for o in third if o.uploaded} == {victim}
    # and the re-upload restored the true bytes
    assert client.head_object(victim)["etag"] == first[0].etag

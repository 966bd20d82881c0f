"""S12 — content-addressed object store with md5-verified put/get.

Reproduces the observable semantics of the reference's storage helper
(idb/helpers/storage.py: IDigBioStorage.upload verifies the remote etag
against the caller's md5; get_contents_to_filename downloads to a temp
file, verifies, then renames into place; transient failures retry with
exponential backoff). This is the landing path for media blobs and
export artifacts.

Backends:
* ``LocalFSBackend`` — a directory tree ``root/bucket/key``; writes are
  tmp-then-atomic-rename. Used by tests and single-node dev.
* ``S3Backend`` — boto3-backed, import-gated (boto3 is not installed in
  this environment; constructing it without boto3 raises with a clear
  message). At cluster scale the BULK data path stays `s3a://` URIs read
  and written by Spark executors directly — this helper is for
  driver-side artifact placement (derivatives, exports, DwC-A zips),
  never for shipping table data through the driver.

Media objects are content-addressed: ``media_key(etag, mtype)`` mirrors
the reference's (bucket=type, key=etag) layout (MediaObject semantics,
idb/postgres_backend/db.py).
"""

from __future__ import annotations

import hashlib
import os
import time
import uuid
from dataclasses import dataclass

#: buckets whose objects never get a public ACL (storage.py:47).
PRIVATE_BUCKETS = {"debugfile"}


def md5_hex(data: bytes) -> str:
    return hashlib.md5(data).hexdigest()


def media_key(etag: str, mtype: str = "images") -> tuple[str, str]:
    """(bucket, key) for a content-addressed media object."""
    return mtype, etag


@dataclass
class ObjectRef:
    bucket: str
    key: str
    etag: str
    size: int


class StorageError(Exception):
    pass


def retry_loop(func, retries: int = 3, base_delay: float = 0.1,
               retriable: tuple = (OSError,)):
    """Retry ``func`` on transient errors with exponential backoff
    (storage.py retry_loop semantics; delay injectable for tests)."""
    attempt = 1
    while True:
        try:
            return func()
        except retriable:
            attempt += 1
            if attempt > retries:
                raise
            time.sleep(base_delay * (2 ** attempt))


class LocalFSBackend:
    """Filesystem-rooted backend: ``root/bucket/key`` with atomic writes."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, bucket: str, key: str) -> str:
        # keys may contain '/' subpaths; normalize and confine to root
        p = os.path.normpath(os.path.join(self.root, bucket, key))
        if not p.startswith(os.path.normpath(self.root) + os.sep):
            raise StorageError(f"key escapes store root: {bucket}/{key}")
        return p

    def write(self, bucket: str, key: str, data: bytes) -> None:
        path = self._path(bucket, key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # unique temp name per writer: keys are content-addressed, so two
        # tasks (duplicate content, or a speculative retry) legitimately
        # put the same key concurrently — a shared '<path>.tmp' would let
        # one writer publish the other's half-written file via os.replace
        tmp = f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
        try:
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, path)  # atomic within a filesystem
        finally:
            if os.path.exists(tmp):
                try:
                    os.unlink(tmp)
                except OSError:
                    pass

    def read(self, bucket: str, key: str) -> bytes:
        try:
            with open(self._path(bucket, key), "rb") as fh:
                return fh.read()
        except FileNotFoundError as e:
            raise StorageError(f"no such object: {bucket}/{key}") from e

    def exists(self, bucket: str, key: str) -> bool:
        return os.path.exists(self._path(bucket, key))

    def delete(self, bucket: str, key: str) -> None:
        try:
            os.unlink(self._path(bucket, key))
        except FileNotFoundError:
            pass

    def link(self, bucket: str, key: str) -> str:
        return "file://" + self._path(bucket, key)


class S3Backend:
    """boto3 S3 backend (import-gated; public surface == LocalFSBackend).

    Single-put for small artifacts; boto3's transfer manager handles
    multipart splitting for large ones (the reference hand-rolls parts
    at 1 GiB, storage.py:146-186).
    """

    def __init__(self, endpoint_url: str | None = None, **session_kwargs):
        try:
            import boto3  # noqa: F401
        except ImportError as e:  # pragma: no cover - boto3 absent in CI
            raise StorageError(
                "S3Backend requires boto3; install it or use LocalFSBackend"
            ) from e
        import boto3

        self._client = boto3.client("s3", endpoint_url=endpoint_url,
                                    **session_kwargs)
        self._endpoint = endpoint_url or "s3"

    def write(self, bucket: str, key: str, data: bytes) -> None:  # pragma: no cover
        import io

        extra = {}
        if bucket not in PRIVATE_BUCKETS:
            extra["ACL"] = "public-read"
        self._client.upload_fileobj(io.BytesIO(data), bucket, key,
                                    ExtraArgs=extra)

    def read(self, bucket: str, key: str) -> bytes:  # pragma: no cover
        import io

        buff = io.BytesIO()
        self._client.download_fileobj(bucket, key, buff)
        return buff.getvalue()

    def exists(self, bucket: str, key: str) -> bool:  # pragma: no cover
        try:
            self._client.head_object(Bucket=bucket, Key=key)
            return True
        except Exception:
            return False

    def delete(self, bucket: str, key: str) -> None:  # pragma: no cover
        self._client.delete_object(Bucket=bucket, Key=key)

    def link(self, bucket: str, key: str) -> str:  # pragma: no cover
        return f"{self._endpoint}/{bucket}/{key}"


class ObjectStore:
    """md5-verified put/get over a pluggable backend."""

    def __init__(self, backend, retries: int = 3, base_delay: float = 0.1):
        self.backend = backend
        self.retries = retries
        self.base_delay = base_delay

    def _retry(self, fn):
        # OSError only: a backend StorageError (missing object, key
        # escape, digest mismatch) is DETERMINISTIC — retrying it three
        # times with backoff just adds ~seconds of latency to every
        # cache-miss probe before the same error surfaces
        return retry_loop(fn, self.retries, self.base_delay,
                          retriable=(OSError,))

    def put(
        self,
        bucket: str,
        key: str,
        data: bytes | str,
        md5: str | None = None,
        verify_readback: bool = False,
    ) -> ObjectRef:
        """Store bytes (or a file by path). If ``md5`` is given, the
        payload must match BEFORE the write (upload() contract: a digest
        mismatch raises and nothing replaces the object); with
        ``verify_readback`` the stored object is re-read and re-hashed —
        the strongest check, used for irreplaceable artifacts."""
        if isinstance(data, str):
            with open(data, "rb") as fh:
                data = fh.read()
        digest = md5_hex(data)
        if md5 is not None and digest != md5:
            raise StorageError(
                f"md5 mismatch before write: {digest} (payload) vs {md5}"
            )
        self._retry(lambda: self.backend.write(bucket, key, data))
        if verify_readback:
            back = md5_hex(self._retry(lambda: self.backend.read(bucket, key)))
            if back != digest:
                raise StorageError(
                    f"md5 mismatch after write: {back} (stored) vs {digest}"
                )
        return ObjectRef(bucket, key, digest, len(data))

    def get_bytes(self, bucket: str, key: str, md5: str | None = None) -> bytes:
        data = self._retry(lambda: self.backend.read(bucket, key))
        if md5 is not None:
            digest = md5_hex(data)
            if digest != md5:
                raise StorageError(
                    f"md5 mismatch: {digest} (download) vs {md5} (expected)"
                )
        return data

    def get_to_filename(
        self, bucket: str, key: str, filename: str, md5: str | None = None
    ) -> str:
        """Download atomically: tmp file, verify, rename into place; a
        failed verify leaves no partial file behind
        (get_contents_to_filename contract, storage.py:203-233).

        The tmp name is UNIQUE per call (pid + uuid, the same hardening
        LocalFSBackend.write carries): a fixed shared '.tmp' let two
        concurrent downloads to one target truncate each other mid-
        replace and publish a partial file despite the md5 check."""
        tmp = f"{filename}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
        try:
            data = self.get_bytes(bucket, key, md5)
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, filename)
        finally:
            if os.path.exists(tmp):
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
        return filename

    def put_media(self, data: bytes, mtype: str = "images") -> ObjectRef:
        """Content-addressed media landing: key = md5 etag, bucket = type
        (MediaObject layout)."""
        bucket, key = media_key(md5_hex(data), mtype)
        return self.put(bucket, key, data)

    def exists(self, bucket: str, key: str) -> bool:
        return self.backend.exists(bucket, key)

    def delete(self, bucket: str, key: str) -> None:
        self.backend.delete(bucket, key)

    def link(self, bucket: str, key: str) -> str:
        return self.backend.link(bucket, key)


def copy_artifact_tree(store: ObjectStore, local_dir: str, bucket: str,
                       prefix: str = "") -> list[ObjectRef]:
    """Land a Spark output directory (part files + _SUCCESS) as verified
    objects — the export job's final hop. Returns one ObjectRef per file."""
    refs = []
    for dirpath, _dirs, files in os.walk(local_dir):
        for name in sorted(files):
            full = os.path.join(dirpath, name)
            rel = os.path.relpath(full, local_dir)
            key = f"{prefix}{rel}" if prefix else rel
            with open(full, "rb") as fh:
                refs.append(store.put(bucket, key, fh.read(),
                                      verify_readback=True))
    return refs


__all__ = [
    "LocalFSBackend",
    "ObjectRef",
    "ObjectStore",
    "S3Backend",
    "StorageError",
    "copy_artifact_tree",
    "md5_hex",
    "media_key",
    "retry_loop",
]

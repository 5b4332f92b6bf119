"""Object store for original documents.

Mirrors the reference's ObjectStore contract (objectstore/base.py:7-100:
put/get/obj_size/stream_range/delete + factory by settings) with a local
filesystem backend; an S3 backend slot exists but raises unless boto3 is
present (this image has none — the reference delegates to RustFS/MinIO,
which is infra, not code).
"""

from __future__ import annotations

import os
import shutil
from typing import BinaryIO, Iterator, Optional


class ObjectStore:
    def put(self, path: str, data: bytes | BinaryIO) -> None:
        raise NotImplementedError

    def get(self, path: str) -> bytes:
        raise NotImplementedError

    def obj_size(self, path: str) -> int:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def stream_range(self, path: str, start: int = 0,
                     end: Optional[int] = None,
                     chunk_size: int = 1 << 20) -> Iterator[bytes]:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def delete_prefix(self, prefix: str) -> None:
        raise NotImplementedError


class LocalObjectStore(ObjectStore):
    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    def _fs(self, path: str) -> str:
        full = os.path.abspath(os.path.join(self.root, path.lstrip("/")))
        if not full.startswith(self.root + os.sep) and full != self.root:
            raise ValueError(f"path escapes object store root: {path}")
        return full

    def put(self, path: str, data: bytes | BinaryIO) -> None:
        full = self._fs(path)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        tmp = full + ".tmp"
        with open(tmp, "wb") as f:
            if isinstance(data, bytes):
                f.write(data)
            else:
                shutil.copyfileobj(data, f)
        os.replace(tmp, full)

    def get(self, path: str) -> bytes:
        with open(self._fs(path), "rb") as f:
            return f.read()

    def obj_size(self, path: str) -> int:
        return os.path.getsize(self._fs(path))

    def exists(self, path: str) -> bool:
        return os.path.isfile(self._fs(path))

    def stream_range(self, path: str, start: int = 0,
                     end: Optional[int] = None,
                     chunk_size: int = 1 << 20) -> Iterator[bytes]:
        size = self.obj_size(path)
        stop = size if end is None else min(end, size)
        with open(self._fs(path), "rb") as f:
            f.seek(start)
            remaining = stop - start
            while remaining > 0:
                block = f.read(min(chunk_size, remaining))
                if not block:
                    break
                remaining -= len(block)
                yield block

    def delete(self, path: str) -> None:
        full = self._fs(path)
        if os.path.isfile(full):
            os.remove(full)

    def delete_prefix(self, prefix: str) -> None:
        full = self._fs(prefix)
        if os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)


class S3ObjectStore(ObjectStore):  # pragma: no cover - requires boto3 infra
    def __init__(self, bucket: str, endpoint_url: Optional[str] = None,
                 access_key: Optional[str] = None,
                 secret_key: Optional[str] = None):
        try:
            import boto3  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "S3 object store requires boto3, which is not installed; "
                "use object_store_type=local"
            ) from e
        import boto3

        self.bucket = bucket
        self.client = boto3.client(
            "s3", endpoint_url=endpoint_url,
            aws_access_key_id=access_key, aws_secret_access_key=secret_key,
        )

    def put(self, path, data):
        body = data if isinstance(data, bytes) else data.read()
        self.client.put_object(Bucket=self.bucket, Key=path.lstrip("/"), Body=body)

    def get(self, path):
        r = self.client.get_object(Bucket=self.bucket, Key=path.lstrip("/"))
        return r["Body"].read()

    def obj_size(self, path):
        r = self.client.head_object(Bucket=self.bucket, Key=path.lstrip("/"))
        return r["ContentLength"]

    def exists(self, path):
        try:
            self.client.head_object(Bucket=self.bucket, Key=path.lstrip("/"))
            return True
        except Exception:
            return False

    def stream_range(self, path, start=0, end=None, chunk_size=1 << 20):
        rng = f"bytes={start}-" + ("" if end is None else str(end - 1))
        r = self.client.get_object(
            Bucket=self.bucket, Key=path.lstrip("/"), Range=rng
        )
        while True:
            block = r["Body"].read(chunk_size)
            if not block:
                break
            yield block

    def delete(self, path):
        self.client.delete_object(Bucket=self.bucket, Key=path.lstrip("/"))

    def delete_prefix(self, prefix):
        resp = self.client.list_objects_v2(
            Bucket=self.bucket, Prefix=prefix.lstrip("/")
        )
        for obj in resp.get("Contents", []):
            self.client.delete_object(Bucket=self.bucket, Key=obj["Key"])


def get_object_store(store_type: str = "local", **kwargs) -> ObjectStore:
    if store_type == "local":
        return LocalObjectStore(kwargs.get("root", "./data/objects"))
    if store_type == "s3":
        return S3ObjectStore(**kwargs)
    raise ValueError(f"unknown object store type: {store_type}")

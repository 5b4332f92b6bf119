"""Index snapshot / restore: HBM -> host npz + JSON sidecar.

The reference has no index persistence beyond the database (SURVEY.md
section 5.4 — SeekDB owns durability); a device-resident index must not
rebuild 10M chunks on restart, so snapshots serialize the device arrays
(truncated to the live prefix) plus host state (row metadata, df table).
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np

from super_rag_tpu.engine.index import DeviceIndex


def save_index(index: DeviceIndex, path: str) -> None:
    """Write ``path.npz`` (arrays) and ``path.json`` (host state)."""
    arrays, host = index.snapshot_state()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # atomic-ish: write temp then rename
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".")
    os.close(fd)
    np.savez_compressed(tmp + ".npz", **arrays)
    os.replace(tmp + ".npz", path + ".npz")
    with open(tmp, "w") as f:
        json.dump(host, f)
    os.replace(tmp, path + ".json")


def load_index(path: str) -> DeviceIndex:
    with np.load(path + ".npz") as z:
        arrays = {k: z[k] for k in z.files}
    with open(path + ".json") as f:
        host = json.load(f)
    return DeviceIndex.from_snapshot(arrays, host)


def snapshot_exists(path: str) -> bool:
    return os.path.exists(path + ".npz") and os.path.exists(path + ".json")


# -- object-store-backed snapshots (index durability off this machine) -------
#
# The reference leans on SeekDB + RustFS for durability; here the same
# npz+json pair can be mirrored into any ObjectStore (store/objectstore.py
# — e.g. the SigV4 S3 backend) so a fresh machine can restore HBM state.


def save_index_to_store(index: DeviceIndex, store, key_prefix: str) -> None:
    import io

    arrays, host = index.snapshot_state()
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    store.put(key_prefix + ".npz", buf.getvalue())
    store.put(key_prefix + ".json", json.dumps(host).encode())


def load_index_from_store(store, key_prefix: str) -> DeviceIndex:
    import io

    with np.load(io.BytesIO(store.get(key_prefix + ".npz"))) as z:
        arrays = {k: z[k] for k in z.files}
    host = json.loads(store.get(key_prefix + ".json").decode())
    return DeviceIndex.from_snapshot(arrays, host)


def store_snapshot_exists(store, key_prefix: str) -> bool:
    return store.exists(key_prefix + ".npz") and store.exists(
        key_prefix + ".json"
    )

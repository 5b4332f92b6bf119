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

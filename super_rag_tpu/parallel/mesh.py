"""Mesh helpers.

The corpus dimension (rows of the chunk-embedding matrix, rows of the BM25
doc-term table) shards over one mesh axis named ``corpus`` — the TPU-native
replacement for SeekDB's internal data distribution (SURVEY.md section 2.10).
Queries replicate; each chip scores its shard and the partial top-k merges
over ICI with one small ``all_gather``.

Scale-out past one slice adds a leading ``slice`` axis (DCN): rows shard
over (slice x corpus), partial top-k merges corpus-axis-first so only k
candidates per slice ever cross the slow inter-slice links
(SURVEY.md section 5.8 — DCN collectives as a first-class component).

Model axes (``tp`` for the encoder's hidden dim) are orthogonal; the train
step in train/contrastive.py uses a 2-D ``(dp, tp)`` mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CORPUS_AXIS = "corpus"
SLICE_AXIS = "slice"


def corpus_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices for corpus sharding."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), (CORPUS_AXIS,))


def multislice_mesh(
    n_slices: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """2-D ``(slice, corpus)`` mesh for cross-DCN scale-out.

    On real multi-slice hardware, devices are grouped by their slice so
    the ``corpus`` axis rides ICI and the ``slice`` axis rides DCN (the
    hybrid-mesh recipe).  On a single slice / host-simulated platform the
    grouping is positional — the axis semantics (merge order, collective
    sizes) are identical, which is what the CPU-mesh tests validate.
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    assert n % n_slices == 0, f"{n} devices not divisible by {n_slices} slices"
    per = n // n_slices
    slice_ids = {getattr(d, "slice_index", 0) for d in devs}
    if len(slice_ids) == n_slices:
        devs = sorted(devs, key=lambda d: (d.slice_index, d.id))
    arr = np.asarray(devs).reshape(n_slices, per)
    return Mesh(arr, (SLICE_AXIS, CORPUS_AXIS))


def row_axes(mesh: Mesh) -> tuple[str, ...]:
    """Mesh axes the corpus row dimension shards over."""
    if SLICE_AXIS in mesh.axis_names:
        return (SLICE_AXIS, CORPUS_AXIS)
    return (CORPUS_AXIS,)


def row_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard dim 0 over the corpus (and slice, if present) axes."""
    spec = P(row_axes(mesh), *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_rows_to_multiple(x: jax.Array, multiple: int, fill=0) -> jax.Array:
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
    import jax.numpy as jnp

    return jnp.pad(x, pad, constant_values=fill)


def shard_corpus(mesh: Mesh, *arrays: Optional[jax.Array]):
    """Place row-aligned arrays sharded over the corpus axis.

    Rows are padded to a multiple of the mesh size (callers must carry a
    validity mask so padding rows never score).  Returns arrays in the
    same order; ``None`` passes through.
    """
    n_dev = mesh.devices.size
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        a = pad_rows_to_multiple(a, n_dev)
        out.append(jax.device_put(a, row_sharding(mesh, a.ndim)))
    return tuple(out) if len(out) != 1 else out[0]

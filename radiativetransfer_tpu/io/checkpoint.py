"""Sharded distributed checkpoints (orbax).

The reference checkpoints a single HDF4 file per iteration and restarts from
it (writeIonization/readLatestIonization, /root/reference/equiSources.f90:
4797-4912, 4738-4795); the grid STRUCTURE is never checkpointed — it is
deterministically rebuilt from the input and only the fields are restored
(SURVEY.md §5.4).  This module keeps that contract for the distributed
runtime: the full FieldState pytree is saved with orbax (each host writes
its own shards; restore re-applies the mesh sharding), plus a small JSON
metadata sidecar (iteration counter, box size) mirroring the information
the reference encodes in the snapshot filename and header.

io.snapshot remains the portable single-file cellArray-compatible format;
this is the multi-host production path (SURVEY.md §2, "Checkpoint of
distributed state").
"""

from __future__ import annotations


import json
import os
import re

import jax
import numpy as np

try:  # orbax is in the baked image; keep the import soft for minimal envs
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None

_META = "ftte_meta.json"


def _require_orbax():
    if ocp is None:  # pragma: no cover
        raise RuntimeError("orbax-checkpoint is not installed; use "
                           "io.snapshot for single-file checkpoints")


def checkpoint_name(itime: int, directory: str = ".") -> str:
    """Step-numbered checkpoint directory, the sharded analog of
    cellArrayNNNN (equiSources.f90:4838-4843)."""
    return os.path.join(os.path.abspath(directory), f"ckpt{itime:04d}")


def save_sharded(path: str, state, itime: int, physical_box_size: float,
                 extra_meta: dict | None = None) -> None:
    """Save a (possibly sharded) FieldState pytree.

    Works transparently for single-device and mesh-sharded arrays; under
    jax.distributed each process writes only its local shards.
    """
    _require_orbax()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        # the field state is a registered dataclass pytree: orbax stores the
        # leaves; the restore target supplies the structure, so this works
        # for any state container (uniform FieldState, two-level AMRState)
        ckptr.save(path, jax.tree_util.tree_leaves(state))
    meta = {"itime": int(itime),
            "physical_box_size": float(physical_box_size),
            "shape": list(np.shape(jax.tree_util.tree_leaves(state)[0]))}
    if extra_meta:
        meta.update(extra_meta)
    with open(os.path.join(path, _META), "w") as fh:
        json.dump(meta, fh)


def restore_sharded(path: str, like_state, mesh=None):
    """Restore a FieldState checkpoint, re-applying shardings.

    like_state provides the pytree structure/shapes/dtypes (e.g. a freshly
    built state from the input grid, matching the reference's
    rebuild-then-restore restart).  If mesh is given, restored arrays come
    back sharded per parallel.mesh.shard_state's layout; otherwise they
    inherit like_state's shardings.

    Returns (state, meta dict).
    """
    _require_orbax()
    path = os.path.abspath(path)

    if mesh is not None:
        from ..parallel.mesh import band_field_sharding, field_sharding
        f3, f4 = field_sharding(mesh), band_field_sharding(mesh)

        def spec(x):
            sh = f3 if np.ndim(x) == 3 else f4 if np.ndim(x) == 4 else None
            if sh is None:
                return ocp.utils.to_shape_dtype_struct(x)
            return jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=sh)
    else:
        def spec(x):
            return ocp.utils.to_shape_dtype_struct(x)

    leaves, treedef = jax.tree_util.tree_flatten(like_state)
    abstract = [spec(x) for x in leaves]
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, abstract)
    with open(os.path.join(path, _META)) as fh:
        meta = json.load(fh)
    state = jax.tree_util.tree_unflatten(treedef, restored)
    return state, meta


def latest_checkpoint(directory: str = ".") -> str | None:
    """Newest ckptNNNN directory (restart counterpart of
    io.snapshot.latest_snapshot)."""
    best, best_i = None, -1
    if not os.path.isdir(directory):
        return None
    for name in os.listdir(directory):
        m = re.fullmatch(r"ckpt(\d{4,})", name)
        full = os.path.join(directory, name)
        if m and os.path.isdir(full) and os.path.exists(
                os.path.join(full, _META)):
            if int(m.group(1)) > best_i:
                best, best_i = full, int(m.group(1))
    return best

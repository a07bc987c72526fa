"""Mesh partitioning for the custom Pallas ops.

The reference's one parallelism mechanism covers its ENTIRE model
(``keras.utils.multi_gpu_model``, reference yolov3/trainer.py:40-43);
the TPU-native equivalent must cover the custom kernels too — a bare
``pallas_call`` inside pjit cannot be partitioned by XLA's SPMD pass,
so without this wrapper "multi-chip" and "fast" would be mutually
exclusive configurations.

Every kernel in ops/winograd.py and ops/stem_pool.py is embarrassingly
parallel over the batch axis (N, the LAST dim of the [H, W, C, N]
view): activations/gradients shard over ``data``, weights/scalars are
replicated, and the per-channel statistic outputs keep their [.., N]
lane-partial layout so the cross-device reduction happens in the
regular XLA graph (``_finish_stats``'s sum over N becomes a psum over
ICI under pjit).

The trainer registers its mesh here (:func:`set_op_mesh`) before
tracing; kernels then wrap their ``pallas_call`` in ``jax.shard_map``
over the data axis.  With no mesh (or a 1-sized data axis) the call is
direct — zero overhead for the single-chip path.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.5 stabilized name
    from jax import shard_map as _jax_shard_map
    _CHECK_KW = "check_vma"
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _jax_shard_map
    _CHECK_KW = "check_rep"  # the experimental signature's name


def shard_map_nocheck(f, *, mesh, in_specs, out_specs):
    """``shard_map`` with replication checking off, normalized across
    jax versions (the stable API takes ``check_vma``, the older
    experimental one ``check_rep``).  All Pallas-op partitioning in
    this package must go through here so a version fix lands once."""
    return _jax_shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, **{_CHECK_KW: False})

_OP_MESH: Optional[Tuple[Mesh, str]] = None


def set_op_mesh(mesh: Optional[Mesh], data_axis: str = "data") -> None:
    """Register the mesh the Pallas ops should shard over (trainer calls
    this before tracing).  ``None`` clears it."""
    global _OP_MESH
    if mesh is None or data_axis not in mesh.shape:
        _OP_MESH = None
    else:
        _OP_MESH = (mesh, data_axis)


def get_op_mesh() -> Optional[Tuple[Mesh, str]]:
    mesh = _OP_MESH
    if mesh is not None and mesh[0].shape[mesh[1]] <= 1:
        return None
    return mesh


def lane_sharded_call(invoke, args, arg_ranks_sharded, out_ranks_sharded):
    """Run ``invoke(*args)`` under shard_map over the registered mesh's
    data axis, sharding the LAST dim of selected args/outputs.

    arg_ranks_sharded: per-arg bool — shard its last dim (activations)
    or replicate (weights/scalars).  out_ranks_sharded: per-output rank
    (all outputs shard their last dim)."""
    ms = get_op_mesh()
    if ms is None:
        return invoke(*args)
    mesh, axis = ms
    nshard = mesh.shape[axis]
    for a, sh in zip(args, arg_ranks_sharded):
        if sh and a.shape[-1] % nshard != 0:
            # lane dim not divisible by the data axis (e.g. a small
            # helper batch while a trainer's mesh is registered): run
            # unsharded — semantically identical, only less parallel
            return invoke(*args)

    def spec(rank, sharded):
        if not sharded:
            return P()
        return P(*([None] * (rank - 1) + [axis]))

    in_specs = tuple(spec(a.ndim, sh)
                     for a, sh in zip(args, arg_ranks_sharded))
    out_specs = tuple(spec(r, True) for r in out_ranks_sharded)
    if len(out_specs) == 1:
        out_specs = out_specs[0]
    return shard_map_nocheck(invoke, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs)(*args)

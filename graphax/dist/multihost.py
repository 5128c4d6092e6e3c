"""Multi-host bootstrap: `jax.distributed.initialize` from the environment,
global meshes with a DCN-outer axis, per-process shard feeding, and
DCN-aware partition block ordering.

The north star (BASELINE.json) is a multi-host TPU pod slice: chips within
a slice talk over ICI, slices talk over DCN (SURVEY §2.8 halo-exchange
row). The reference has no multi-process path at all (its only parallelism
is single-process `nn.DataParallel`, `src/ray_tune.py:58-59`), so this
module is new capability:

- :func:`init_distributed` — env-driven process bootstrap. Run the same
  program on every host with ``GRAPHAX_COORDINATOR`` / ``GRAPHAX_NUM_PROC``
  / ``GRAPHAX_PROC_ID`` set (or under a launcher JAX auto-detects: TPU pod
  metadata, SLURM, Open MPI) and every `jax.devices()` call sees the
  GLOBAL device set.
- :func:`global_mesh` — mesh over the global devices with the DCN axis
  OUTERMOST (`mesh_utils.create_hybrid_device_mesh`): the graph partition's
  shard axis is laid out so consecutive shards share a slice and the
  all_to_all's heavy traffic rides ICI.
- :func:`process_shard_ids` / :func:`feed_process_local` — each process
  materializes ONLY its own [P, ...] stacked-table slices and the global
  array is assembled addressably (`jax.make_array_from_process_local_data`).
- :func:`dcn_block_order` — order the partitioner's blocks so the
  high-edge-cut block pairs land intra-slice (greedy pair merge), cutting
  DCN halo bytes on community graphs.

Only one chip is attached to this box, so real multi-host execution is
environment-gated; the host-side logic (slicing, ordering, feeding) is
unit-tested with simulated process maps in tests/test_multihost.py.

Usage (2 hosts)::

    GRAPHAX_COORDINATOR=host0:8476 GRAPHAX_NUM_PROC=2 GRAPHAX_PROC_ID=0 \
        python -m graphax.drivers.run_gnn --dataset Cora --distributed \
        --mesh_shape 8 &
    GRAPHAX_COORDINATOR=host0:8476 GRAPHAX_NUM_PROC=2 GRAPHAX_PROC_ID=1 \
        python -m graphax.drivers.run_gnn --dataset Cora --distributed \
        --mesh_shape 8
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> tuple:
    """Initialize JAX's multi-process runtime from args or environment.

    Precedence: explicit args, then ``GRAPHAX_COORDINATOR`` /
    ``GRAPHAX_NUM_PROC`` / ``GRAPHAX_PROC_ID``, then JAX's own
    auto-detection (TPU pod metadata, SLURM, OMPI). A no-op when nothing
    is configured (single process) or when already initialized.

    Returns ``(process_count, process_index)``.
    """
    coord = coordinator_address or os.environ.get("GRAPHAX_COORDINATOR")
    nproc = num_processes if num_processes is not None else \
        _env_int("GRAPHAX_NUM_PROC")
    pid = process_id if process_id is not None else \
        _env_int("GRAPHAX_PROC_ID")
    already = getattr(
        getattr(jax.distributed, "global_state", None), "client", None)
    if already is not None:
        return jax.process_count(), jax.process_index()
    if coord is None and nproc is None:
        # nothing configured: stay single-process unless a launcher JAX
        # knows about is present (then let auto-detection handle it).
        # Auto-detection is best-effort: tunneled single-chip environments
        # can carry a vestigial TPU_WORKER_HOSTNAMES that auto-detection
        # chokes on — fall back to single-process rather than dying.
        auto = any(k in os.environ for k in (
            "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE", "TPU_WORKER_HOSTNAMES"))
        if not auto:
            return 1, 0
        try:
            jax.distributed.initialize()
        except Exception as e:
            print(f"graphax: multi-process auto-detection failed ({e}); "
                  f"continuing single-process")
            return 1, 0
        return jax.process_count(), jax.process_index()
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid,
        local_device_ids=local_device_ids)
    return jax.process_count(), jax.process_index()


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v not in (None, "") else None


def num_slices(devices=None) -> int:
    """Number of ICI islands (= processes for CPU/multi-host TPU; TPU pod
    slices report a shared `slice_index` when available)."""
    devices = list(jax.devices()) if devices is None else list(devices)
    keys = {_slice_of(d) for d in devices}
    return max(len(keys), 1)


def _slice_of(d) -> int:
    s = getattr(d, "slice_index", None)
    return int(s) if s is not None else int(d.process_index)


def global_mesh(graph_shards: Optional[int] = None, data: int = 1,
                axis_names=("data", "graph"), devices=None) -> Mesh:
    """Mesh over the GLOBAL device set with DCN outermost.

    The returned mesh has shape ``(data, graph_shards)``; when the devices
    span multiple slices/processes, the device array is built by
    `mesh_utils.create_hybrid_device_mesh` so that the product of mesh axes
    factors as DCN-major: walking the flattened 'graph' axis visits all of
    slice 0's chips before slice 1's. Combined with :func:`dcn_block_order`
    that keeps heavy halo pairs on ICI.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if graph_shards is None:
        graph_shards = n // data
    assert data * graph_shards <= n, \
        f"mesh ({data},{graph_shards}) needs {data * graph_shards} " \
        f"devices, have {n}"
    one_axis = len(axis_names) == 1
    shape = (graph_shards,) if one_axis else (data, graph_shards)
    assert one_axis is False or data == 1
    ns = num_slices(devices)
    if ns > 1 and data * graph_shards == n and graph_shards % ns == 0:
        try:
            from jax.experimental import mesh_utils

            dcn_parallelism = [ns] if one_axis else [1, ns]
            ici_parallelism = [graph_shards // ns] if one_axis \
                else [data, graph_shards // ns]
            dev_array = mesh_utils.create_hybrid_device_mesh(
                ici_parallelism, dcn_parallelism, devices=devices)
            return Mesh(dev_array, axis_names)
        except Exception:
            pass  # fall through: contiguous-by-process order below
    # order devices process-major so contiguous graph shards share a process
    devices = sorted(devices, key=lambda d: (_slice_of(d), d.id))
    dev_array = np.asarray(devices[: data * graph_shards]).reshape(shape)
    return Mesh(dev_array, axis_names)


# ----------------------------------------------------------------------
# Per-process shard feeding
# ----------------------------------------------------------------------

def process_shard_ids(mesh: Mesh, axis_name: str = "graph",
                      process_index: Optional[int] = None,
                      index_of=None) -> np.ndarray:
    """Indices along the mesh's ``axis_name`` whose devices live on this
    process — i.e. which [P, ...] stacked-table slices this host must
    materialize. ``index_of``: device→process override (testing)."""
    if process_index is None:
        process_index = jax.process_index()
    if index_of is None:
        index_of = lambda d: d.process_index
    axis = list(mesh.axis_names).index(axis_name)
    dev = np.moveaxis(mesh.devices, axis, 0)
    ids = []
    for k in range(dev.shape[0]):
        procs = {index_of(d) for d in np.asarray(dev[k]).reshape(-1)}
        if process_index in procs:
            ids.append(k)
    return np.asarray(ids, np.int64)


def feed_process_local(stacked: np.ndarray, mesh: Mesh,
                       axis_name: str = "graph",
                       process_index: Optional[int] = None,
                       index_of=None):
    """Build the globally-sharded device array for a [P, ...] stacked table
    by feeding only this process's shards.

    Single-process meshes take the fast path (`jax.device_put` with the
    NamedSharding). Multi-process: each host slices out
    ``stacked[process_shard_ids(...)]`` and
    `jax.make_array_from_process_local_data` assembles the global array —
    no host ever holds more than its own shards on device.
    """
    import jax.numpy as jnp

    spec = P(axis_name)
    sharding = NamedSharding(mesh, spec)
    if len(getattr(mesh, "devices", np.empty(0)).reshape(-1)) and \
            _mesh_process_count(mesh, index_of) == 1:
        return jax.device_put(jnp.asarray(stacked), sharding)
    local = np.asarray(stacked)[host_local_slice(
        stacked.shape[0], mesh, axis_name, process_index, index_of)]
    return jax.make_array_from_process_local_data(sharding, local,
                                                  stacked.shape)


def host_local_slice(p_total: int, mesh: Mesh, axis_name: str = "graph",
                     process_index: Optional[int] = None,
                     index_of=None) -> slice:
    """The contiguous slice of shard ids this process feeds. Requires the
    mesh's axis to map processes to contiguous index ranges (guaranteed by
    :func:`global_mesh`'s process-major ordering)."""
    ids = process_shard_ids(mesh, axis_name, process_index, index_of)
    assert len(ids) > 0, "process owns no shards on this axis"
    lo, hi = int(ids.min()), int(ids.max())
    assert np.array_equal(ids, np.arange(lo, hi + 1)), \
        f"process shards not contiguous on '{axis_name}': {ids}"
    return slice(lo, hi + 1)


def _mesh_process_count(mesh: Mesh, index_of=None) -> int:
    if index_of is None:
        index_of = lambda d: d.process_index
    return len({index_of(d) for d in mesh.devices.reshape(-1)})


# ----------------------------------------------------------------------
# DCN-aware block ordering
# ----------------------------------------------------------------------

def pair_cut_matrix(row: np.ndarray, col: np.ndarray,
                    labels: np.ndarray, p: int) -> np.ndarray:
    """cut[s, t] = number of edges between parts s and t (symmetrized,
    zero diagonal)."""
    s, t = labels[row], labels[col]
    off = s != t
    cut = np.zeros((p, p), np.int64)
    np.add.at(cut, (s[off], t[off]), 1)
    cut = cut + cut.T
    np.fill_diagonal(cut, 0)
    return cut


def dcn_block_order(row: np.ndarray, col: np.ndarray, labels: np.ndarray,
                    p: int, n_slices: int) -> np.ndarray:
    """Assign the partitioner's p blocks to ``n_slices`` equal groups so
    high-cut pairs land intra-slice, greedily: seed each group with the
    highest-remaining-cut block, then repeatedly add the block with the
    largest cut to the group's current members. Returns ``order`` with
    ``order[k]`` = old block id at new position k (groups contiguous, so a
    DCN-outer mesh maps each group onto one slice)."""
    assert p % n_slices == 0, (p, n_slices)
    per = p // n_slices
    cut = pair_cut_matrix(row, col, labels, p).astype(np.float64)
    unassigned = set(range(p))
    order = []
    for _ in range(n_slices):
        # seed: the unassigned block with the largest total remaining cut
        rem = sorted(unassigned)
        tot = cut[np.ix_(rem, rem)].sum(axis=1)
        group = [rem[int(np.argmax(tot))]]
        unassigned.discard(group[0])
        while len(group) < per:
            rem = sorted(unassigned)
            gain = cut[np.ix_(rem, group)].sum(axis=1)
            nxt = rem[int(np.argmax(gain))]
            group.append(nxt)
            unassigned.discard(nxt)
        order.extend(sorted(group))
    return np.asarray(order, np.int64)


def inter_slice_cut(row: np.ndarray, col: np.ndarray, labels: np.ndarray,
                    p: int, n_slices: int,
                    order: Optional[np.ndarray] = None) -> int:
    """Edges whose endpoints' blocks land on different slices under
    ``order`` (default: identity)."""
    if order is None:
        order = np.arange(p)
    pos = np.empty(p, np.int64)
    pos[order] = np.arange(p)
    per = p // n_slices
    sl = pos[labels] // per
    return int(np.sum(sl[row] != sl[col]))

"""graphax.native — C++ host-side graph-building fast paths (ctypes).

Builds `libgraphbuild.so` from `graphbuild.cpp` on first import if missing
(g++ -O3); every entry point has a NumPy twin in `graphax.sparse.build`, so
the library degrades gracefully when no compiler is available. Set
``GRAPHAX_NO_NATIVE=1`` to force the NumPy paths."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libgraphbuild.so")
_LIB: Optional[ctypes.CDLL] = None


def _build() -> bool:
    src = os.path.join(_HERE, "graphbuild.cpp")
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-o", _SO, src], check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if os.environ.get("GRAPHAX_NO_NATIVE"):
        return None
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.gx_coalesce.restype = ctypes.c_int64
    lib.gx_coalesce.argtypes = [i64p, i64p, f64p, ctypes.c_int64,
                                ctypes.c_int64, i64p, i64p, f64p]
    lib.gx_to_undirected.restype = ctypes.c_int64
    lib.gx_to_undirected.argtypes = [i64p, i64p, ctypes.c_int64,
                                     ctypes.c_int64, i64p, i64p]
    lib.gx_add_self_loops.restype = ctypes.c_int64
    lib.gx_add_self_loops.argtypes = [i64p, i64p, f64p, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_double,
                                      i64p, i64p, f64p]
    lib.gx_lcc.restype = ctypes.c_int64
    lib.gx_lcc.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int64, u8p]
    lib.gx_row_tiles.restype = ctypes.c_int64
    lib.gx_row_tiles.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_int64, ctypes.c_int64, i64p, i64p,
                                 i64p, i64p]
    lib.gx_partition_grow.restype = ctypes.c_int64
    lib.gx_partition_grow.argtypes = [i64p, i64p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int64, i64p]
    _LIB = lib
    return lib


def _i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def available() -> bool:
    return get_lib() is not None


def coalesce(row, col, weight=None):
    """Native coalesce; returns (row, col, w) or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    row, col = _i64(row), _i64(col)
    e = len(row)
    w = np.ascontiguousarray(weight, np.float64) if weight is not None \
        else None
    out_r = np.empty(e, np.int64)
    out_c = np.empty(e, np.int64)
    out_w = np.empty(e, np.float64)
    n = lib.gx_coalesce(
        _ptr(row, ctypes.c_int64), _ptr(col, ctypes.c_int64),
        _ptr(w, ctypes.c_double) if w is not None else None, e, 0,
        _ptr(out_r, ctypes.c_int64), _ptr(out_c, ctypes.c_int64),
        _ptr(out_w, ctypes.c_double))
    return out_r[:n].copy(), out_c[:n].copy(), out_w[:n].copy()


def to_undirected(row, col, num_nodes: int):
    lib = get_lib()
    if lib is None:
        return None
    row, col = _i64(row), _i64(col)
    e = len(row)
    out_r = np.empty(2 * e, np.int64)
    out_c = np.empty(2 * e, np.int64)
    n = lib.gx_to_undirected(_ptr(row, ctypes.c_int64),
                             _ptr(col, ctypes.c_int64), e, num_nodes,
                             _ptr(out_r, ctypes.c_int64),
                             _ptr(out_c, ctypes.c_int64))
    return out_r[:n].copy(), out_c[:n].copy()


def add_self_loops(row, col, weight, fill: float, num_nodes: int):
    lib = get_lib()
    if lib is None:
        return None
    row, col = _i64(row), _i64(col)
    e = len(row)
    w = np.ascontiguousarray(weight, np.float64) if weight is not None \
        else None
    cap = e + num_nodes
    out_r = np.empty(cap, np.int64)
    out_c = np.empty(cap, np.int64)
    out_w = np.empty(cap, np.float64)
    n = lib.gx_add_self_loops(
        _ptr(row, ctypes.c_int64), _ptr(col, ctypes.c_int64),
        _ptr(w, ctypes.c_double) if w is not None else None, e, num_nodes,
        fill, _ptr(out_r, ctypes.c_int64), _ptr(out_c, ctypes.c_int64),
        _ptr(out_w, ctypes.c_double))
    return out_r[:n].copy(), out_c[:n].copy(), out_w[:n].copy()


def largest_connected_component(row, col, num_nodes: int):
    lib = get_lib()
    if lib is None:
        return None
    row, col = _i64(row), _i64(col)
    labels = np.zeros(num_nodes, np.uint8)
    lib.gx_lcc(_ptr(row, ctypes.c_int64), _ptr(col, ctypes.c_int64),
               len(row), num_nodes, _ptr(labels, ctypes.c_uint8))
    return np.where(labels == 1)[0]


def row_tiles(row, col, num_nodes: int, tile: int, block_edges: int):
    """Native block tables; returns (edge_slot, col, local_row, tile_idx)
    with edge_slot == -1 on padding, or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    row, col = _i64(row), _i64(col)
    e = len(row)
    nb = lib.gx_row_tiles(_ptr(row, ctypes.c_int64),
                          _ptr(col, ctypes.c_int64), e, num_nodes, tile,
                          block_edges, None, None, None, None)
    edge_slot = np.empty(nb * block_edges, np.int64)
    col_out = np.empty(nb * block_edges, np.int64)
    local_row = np.empty(nb * block_edges, np.int64)
    tile_idx = np.empty(nb, np.int64)
    lib.gx_row_tiles(_ptr(row, ctypes.c_int64), _ptr(col, ctypes.c_int64),
                     e, num_nodes, tile, block_edges,
                     _ptr(edge_slot, ctypes.c_int64),
                     _ptr(col_out, ctypes.c_int64),
                     _ptr(local_row, ctypes.c_int64),
                     _ptr(tile_idx, ctypes.c_int64))
    shape = (nb, block_edges)
    return (edge_slot.reshape(shape), col_out.reshape(shape),
            local_row.reshape(shape), tile_idx)


def partition_bfs(row, col, num_nodes: int, num_parts: int, cap: int):
    """Balanced greedy (max-gain) region-growing labels [N] in
    [0, num_parts); native with a Python fallback that matches the native
    order bit-for-bit. Returns (labels, edge_cut)."""
    row, col = _i64(row), _i64(col)
    e = len(row)
    lib = get_lib()
    if lib is not None:
        labels = np.empty(num_nodes, np.int64)
        cut = lib.gx_partition_grow(
            _ptr(row, ctypes.c_int64), _ptr(col, ctypes.c_int64), e,
            num_nodes, num_parts, cap, _ptr(labels, ctypes.c_int64))
        return labels, int(cut)
    # Python fallback (same greedy max-gain growing, identical order)
    import heapq
    ptr = np.zeros(num_nodes + 1, np.int64)
    np.add.at(ptr, row + 1, 1)
    np.add.at(ptr, col + 1, 1)
    ptr = np.cumsum(ptr)
    adj = np.empty(2 * e, np.int64)
    cur = ptr[:-1].copy()
    for i in range(e):          # interleaved exactly like the C++ builder
        adj[cur[row[i]]] = col[i]
        cur[row[i]] += 1
        adj[cur[col[i]]] = row[i]
        cur[col[i]] += 1
    labels = np.full(num_nodes, -1, np.int64)
    next_scan = 0
    for s in range(num_parts):
        gain = np.zeros(num_nodes, np.int64)
        heap = []   # (-gain, node): pop = (max gain, min id)

        def admit(v):
            labels[v] = s
            for u in adj[ptr[v]:ptr[v + 1]]:
                if labels[u] == -1:
                    gain[u] += 1
                    heapq.heappush(heap, (-int(gain[u]), int(u)))

        count = 0
        while count < cap:
            pick = -1
            while heap:
                g_neg, u = heapq.heappop(heap)
                if labels[u] == -1 and gain[u] == -g_neg:
                    pick = u
                    break
            if pick == -1:
                while next_scan < num_nodes and labels[next_scan] != -1:
                    next_scan += 1
                if next_scan == num_nodes:
                    break
                pick = next_scan
            admit(pick)
            count += 1
    cut = int((labels[row] != labels[col]).sum())
    return labels, cut

"""ctypes bindings for the native host runtime (native/libstanfem.so).

Provides C++ implementations of the host-side hot paths — .bdf parsing
(data loader) and BFS ordering / incidence transpose (graph builder) — with
automatic build-on-first-use (make) and transparent fallback to the Python
implementations when no toolchain is available. The Python versions remain
the semantic spec; tests assert identical outputs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libstanfem.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


class _BdfMesh(ctypes.Structure):
    _fields_ = [
        ("n_nodes", ctypes.c_int64),
        ("n_elems", ctypes.c_int64),
        ("nodes_per_elem", ctypes.c_int64),
        ("node_ids", ctypes.POINTER(ctypes.c_int64)),
        ("coords", ctypes.POINTER(ctypes.c_double)),
        ("elem_ids", ctypes.POINTER(ctypes.c_int64)),
        ("elem_pids", ctypes.POINTER(ctypes.c_int64)),
        ("conn", ctypes.POINTER(ctypes.c_int64)),
        ("n_errors", ctypes.c_int64),
    ]


def _load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("STAN_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "stanfem.cpp")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.stanfem_bdf_parse.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.stanfem_bdf_parse.restype = ctypes.POINTER(_BdfMesh)
    lib.stanfem_bdf_free.argtypes = [ctypes.POINTER(_BdfMesh)]
    lib.stanfem_bdf_free.restype = None
    lib.stanfem_bfs_order.argtypes = [
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ]
    lib.stanfem_bfs_order.restype = ctypes.c_int
    lib.stanfem_node_incidence.argtypes = [
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.stanfem_node_incidence.restype = ctypes.c_int64
    lib.stanfem_pb_scan_many.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64,
    ]
    lib.stanfem_pb_scan_many.restype = ctypes.c_int64
    lib.stanfem_stencil_interior_f64.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    lib.stanfem_stencil_interior_f64.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def bdf_parse(path: str, strict: bool = False):
    """Parse a .bdf with the native parser.

    Returns (node_ids, coords, elem_ids, elem_pids, conn, n_errors) or None
    when the native library is unavailable or reports an unsupported mesh
    (e.g. mixed families) — callers fall back to the Python parser.
    """
    lib = _load()
    if lib is None:
        return None
    mp = lib.stanfem_bdf_parse(path.encode(), 1 if strict else 0)
    if not mp:
        return None
    try:
        m = mp.contents
        nn, ne, npe = m.n_nodes, m.n_elems, m.nodes_per_elem
        node_ids = np.ctypeslib.as_array(m.node_ids, (nn,)).copy() if nn else np.zeros(0, np.int64)
        coords = (np.ctypeslib.as_array(m.coords, (nn * 3,)).copy().reshape(nn, 3)
                  if nn else np.zeros((0, 3)))
        elem_ids = np.ctypeslib.as_array(m.elem_ids, (ne,)).copy() if ne else np.zeros(0, np.int64)
        elem_pids = np.ctypeslib.as_array(m.elem_pids, (ne,)).copy() if ne else np.zeros(0, np.int64)
        conn = (np.ctypeslib.as_array(m.conn, (ne * npe,)).copy().reshape(ne, npe)
                if ne else np.zeros((0, npe), np.int64))
        n_err = int(m.n_errors)
    finally:
        lib.stanfem_bdf_free(mp)
    return node_ids, coords, elem_ids, elem_pids, conn, n_err


def bfs_order(conn: np.ndarray, nnode: int) -> Optional[np.ndarray]:
    """Native BFS node ordering; None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    conn = np.ascontiguousarray(conn, dtype=np.int64)
    ne, npe = conn.shape
    out = np.empty(nnode, dtype=np.int64)
    rc = lib.stanfem_bfs_order(conn, ne, npe, nnode, out)
    return out if rc == 0 else None


def node_incidence(conn: np.ndarray, nnode: int) -> Optional[np.ndarray]:
    """Native incidence transpose; None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(conn, dtype=np.int64).reshape(-1)
    maxdeg = lib.stanfem_node_incidence(flat, flat.size, nnode, None, 0)
    if maxdeg < 0:
        return None
    idx = np.empty((nnode, max(int(maxdeg), 0)), dtype=np.int64)
    rc = lib.stanfem_node_incidence(
        flat, flat.size, nnode,
        idx.ctypes.data_as(ctypes.c_void_p), int(maxdeg),
    )
    return idx if rc >= 0 else None


def pb_scan_many(buf: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Scan protobuf message bodies into a flat field table.

    buf: uint8 byte array; starts/ends: int64 body ranges. Returns
    (body i32, field i32, wt i8, a i64, b i64) arrays — see
    native/stanfem.cpp stanfem_pb_scan_many for record semantics — or None
    when the native library is unavailable or the input is malformed
    (callers fall back to the generated-protobuf parser).
    """
    lib = _load()
    if lib is None:
        return None
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    n = lib.stanfem_pb_scan_many(buf, buf.size, starts, ends, len(starts),
                                 None, None, None, None, None, 0)
    if n < 0:
        return None
    body = np.empty(n, dtype=np.int32)
    field = np.empty(n, dtype=np.int32)
    wt = np.empty(n, dtype=np.int8)
    a = np.empty(n, dtype=np.int64)
    b = np.empty(n, dtype=np.int64)
    n2 = lib.stanfem_pb_scan_many(
        buf, buf.size, starts, ends, len(starts),
        body.ctypes.data_as(ctypes.c_void_p),
        field.ctypes.data_as(ctypes.c_void_p),
        wt.ctypes.data_as(ctypes.c_void_p),
        a.ctypes.data_as(ctypes.c_void_p),
        b.ctypes.data_as(ctypes.c_void_p), n)
    if n2 != n:
        return None
    return body, field, wt, a, b


def stencil_interior_f64(up: np.ndarray, tab: np.ndarray) -> Optional[np.ndarray]:
    """Float64 interior-table stencil sweep (certification hot loop).

    up: [3, nnx+2, nny+2, nnz+2] ghost-padded grid; tab: [27, 3, 3]
    offset-major ((ox+1)*9 + (oy+1)*3 + (oz+1)) interior table. Returns
    [3, nnx, nny, nnz] or None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    up = np.ascontiguousarray(up, dtype=np.float64)
    tab = np.ascontiguousarray(tab, dtype=np.float64)
    _, pxx, pyy, pzz = up.shape
    nnx, nny, nnz = pxx - 2, pyy - 2, pzz - 2
    out = np.empty((3, nnx, nny, nnz), dtype=np.float64)
    lib.stanfem_stencil_interior_f64(up.reshape(-1), nnx, nny, nnz,
                                     tab.reshape(-1), out.reshape(-1))
    return out

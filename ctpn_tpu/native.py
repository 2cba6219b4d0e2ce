"""ctypes bindings for the native host library (native/libctpn_host.so).

Dispatcher in the spirit of the reference's `lib/fast_rcnn/nms_wrapper.py`:
prefer the compiled kernels, fall back to the pure-NumPy oracles in
`ctpn_tpu/utils/host_ref.py` when the library has not been built
(``make -C native``). The TPU compute path never touches this module.
"""

from __future__ import annotations

import ctypes
import os.path as osp
from typing import List, Optional

import numpy as np

_LIB_PATH = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                     "native", "libctpn_host.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not osp.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.ctpn_nms.restype = ctypes.c_int
    lib.ctpn_nms.argtypes = [f32p, ctypes.c_int, ctypes.c_float, i32p]
    lib.ctpn_bbox_overlaps.restype = None
    lib.ctpn_bbox_overlaps.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, f32p]
    lib.ctpn_bbox_intersections.restype = None
    lib.ctpn_bbox_intersections.argtypes = [
        f32p, ctypes.c_int, f32p, ctypes.c_int, f32p,
    ]
    lib.ctpn_build_graph.restype = None
    lib.ctpn_build_graph.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, i32p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def nms(dets: np.ndarray, thresh: float) -> List[int]:
    """Greedy NMS (reference `nms_wrapper.nms` semantics, host side)."""
    lib = _load()
    dets = np.ascontiguousarray(dets, dtype=np.float32)
    n = len(dets)
    if n == 0:
        return []
    if lib is None:
        from ctpn_tpu.utils.host_ref import py_nms

        return py_nms(dets, thresh)
    # evaluation order: score desc, ties by descending index
    order = dets[:, 4].argsort(kind="stable")[::-1].astype(np.int64)
    ordered = np.ascontiguousarray(dets[order])
    keep = np.zeros(n, np.int32)
    kept = lib.ctpn_nms(ordered, n, thresh, keep)
    return [int(order[k]) for k in keep[:kept]]


def bbox_overlaps(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        from ctpn_tpu.utils.host_ref import bbox_overlaps_np

        return bbox_overlaps_np(boxes, query).astype(np.float32)
    boxes = np.ascontiguousarray(boxes, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    out = np.zeros((len(boxes), len(query)), np.float32)
    lib.ctpn_bbox_overlaps(boxes, len(boxes), query, len(query), out)
    return out


def bbox_intersections(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        from ctpn_tpu.utils.host_ref import bbox_intersections_np

        return bbox_intersections_np(boxes, query).astype(np.float32)
    boxes = np.ascontiguousarray(boxes, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    out = np.zeros((len(boxes), len(query)), np.float32)
    lib.ctpn_bbox_intersections(boxes, len(boxes), query, len(query), out)
    return out


def build_graph_successors(
    boxes: np.ndarray,
    scores: np.ndarray,
    im_w: int,
    max_gap: int = 50,
    min_v_overlaps: float = 0.7,
    min_size_sim: float = 0.7,
) -> np.ndarray:
    """(N,) successor indices (-1 = none) of the text-proposal graph."""
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = len(boxes)
    succ = np.full(n, -1, np.int32)
    if n == 0:
        return succ
    if lib is None:
        from ctpn_tpu.postprocess.oracle import build_graph_np

        g = build_graph_np(boxes.astype(np.float64), scores, (0, im_w))
        for i in range(n):
            js = np.flatnonzero(g[i])
            if len(js):
                succ[i] = js[0]
        return succ
    lib.ctpn_build_graph(
        boxes, scores, n, int(im_w), int(max_gap),
        float(min_v_overlaps), float(min_size_sim), succ,
    )
    return succ

"""Native (C++) runtime components bound via ctypes.

Provides the TPU framework's equivalents of the native code the reference
leans on through its dependencies (SURVEY.md §2.2): the COCO evaluation
engine (pycocotools' C extension role). Python fallbacks exist for every
native path; `available()` gates usage.
"""

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LOAD_FAILED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LOAD_FAILED
    if _LIB is not None or _LOAD_FAILED:
        return _LIB
    try:
        from pod_compare_tpu.native.build import build

        _LIB = ctypes.CDLL(build())
        _LIB.cocoeval_run.restype = ctypes.c_int
        _LIB.match_engine_run.restype = ctypes.c_int
        _LIB.match_engine_fetch.restype = ctypes.c_int
    except Exception:
        _LOAD_FAILED = True
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(arr: np.ndarray, dtype):
    arr = np.ascontiguousarray(arr, dtype=dtype)
    return arr, arr.ctypes.data_as(ctypes.POINTER(np.ctypeslib.as_ctypes_type(dtype)))


def cocoeval_run(
    det_img, det_cat, det_bbox, det_score,
    gt_img, gt_cat, gt_bbox, gt_area, gt_iscrowd, gt_ignore,
    num_images: int, num_cats: int,
    iou_thrs, rec_thrs, area_rngs, max_dets,
):
    """Run the C++ COCO evaluation engine.

    Returns (precision, recall, scores) tensors of shapes
    (T,R,K,A,M), (T,K,A,M), (T,R,K,A,M) — pycocotools layout.
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    T, R = len(iou_thrs), len(rec_thrs)
    K, A, M = num_cats, len(area_rngs), len(max_dets)

    precision = -np.ones((T, R, K, A, M), np.float64)
    recall = -np.ones((T, K, A, M), np.float64)
    scores = -np.ones((T, R, K, A, M), np.float64)

    holders = []

    def p(arr, dtype):
        a, ptr = _ptr(arr, dtype)
        holders.append(a)
        return ptr

    ret = lib.cocoeval_run(
        p(det_img, np.int64), p(det_cat, np.int64),
        p(det_bbox, np.float64), p(det_score, np.float64),
        ctypes.c_int64(len(det_img)),
        p(gt_img, np.int64), p(gt_cat, np.int64), p(gt_bbox, np.float64),
        p(gt_area, np.float64), p(gt_iscrowd, np.uint8), p(gt_ignore, np.uint8),
        ctypes.c_int64(len(gt_img)),
        ctypes.c_int64(num_images), ctypes.c_int64(num_cats),
        p(iou_thrs, np.float64), ctypes.c_int64(T),
        p(rec_thrs, np.float64), ctypes.c_int64(R),
        p(np.asarray(area_rngs, np.float64).reshape(-1), np.float64),
        ctypes.c_int64(A),
        p(np.asarray(max_dets, np.int64), np.int64), ctypes.c_int64(M),
        precision.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        recall.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    assert ret == 0
    return precision, recall, scores


def match_engine_run(
    det_boxes, det_scores, gt_boxes, det_off, gt_off,
    iou_min: float, iou_correct: float,
):
    """Run the C++ matching engine.

    Returns dict of index arrays: tp_det, tp_gt, tp_iou, dup_det, dup_gt,
    dup_iou, fp_det, fn_gt — indices into the flat det/gt arrays.
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    holders = []

    def p(arr, dtype):
        a = np.ascontiguousarray(arr, dtype=dtype)
        holders.append(a)
        return a.ctypes.data_as(
            ctypes.POINTER(np.ctypeslib.as_ctypes_type(dtype))
        )

    counts = np.zeros(4, np.int64)
    num_images = len(det_off) - 1
    ret = lib.match_engine_run(
        p(det_boxes, np.float64), p(det_scores, np.float64),
        p(gt_boxes, np.float64),
        p(det_off, np.int64), p(gt_off, np.int64),
        ctypes.c_int64(num_images),
        ctypes.c_double(iou_min), ctypes.c_double(iou_correct),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    assert ret == 0
    n_tp, n_dup, n_fp, n_fn = [int(c) for c in counts]
    out = {
        "tp_det": np.zeros(n_tp, np.int64),
        "tp_gt": np.zeros(n_tp, np.int64),
        "tp_iou": np.zeros(n_tp, np.float64),
        "dup_det": np.zeros(n_dup, np.int64),
        "dup_gt": np.zeros(n_dup, np.int64),
        "dup_iou": np.zeros(n_dup, np.float64),
        "fp_det": np.zeros(n_fp, np.int64),
        "fn_gt": np.zeros(n_fn, np.int64),
    }
    ret = lib.match_engine_fetch(
        *[
            out[k].ctypes.data_as(
                ctypes.POINTER(
                    ctypes.c_double if out[k].dtype == np.float64 else ctypes.c_int64
                )
            )
            for k in ["tp_det", "tp_gt", "tp_iou", "dup_det", "dup_gt",
                      "dup_iou", "fp_det", "fn_gt"]
        ]
    )
    assert ret == 0
    return out

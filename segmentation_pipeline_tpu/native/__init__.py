"""ctypes bindings for the native C++ runtime (ccl.cpp).

Builds libspt_native.so on first use (g++, cached next to the source);
falls back to scipy.ndimage transparently when no compiler is available.
``connected_components_native``/``grey_dilation_native`` are drop-in
replacements used by post_processing and the instance evaluator.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    with _LIB_LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        here = Path(__file__).parent
        so_path = here / "libspt_native.so"
        sources = [here / "ccl.cpp", here / "nifti_io.cpp"]
        try:
            newest_src = max(s.stat().st_mtime for s in sources if s.exists())
            if (not so_path.exists()
                    or so_path.stat().st_mtime < newest_src):
                subprocess.run(["make", "-C", str(here)], check=True,
                               capture_output=True)
            lib = ctypes.CDLL(str(so_path))
        except Exception:
            _LIB_FAILED = True
            return None

        lib.label_components.restype = ctypes.c_int32
        lib.label_components.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        lib.grey_dilate_cross.restype = None
        lib.grey_dilate_cross.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.component_counts.restype = None
        lib.component_counts.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32]
        lib.nifti_read_header.restype = ctypes.c_int
        lib.nifti_read_header.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8)]
        lib.nifti_read_payload.restype = ctypes.c_int64
        lib.confusion_joint_hist.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int64)]
        lib.confusion_joint_hist.restype = None
        lib.nifti_read_payload.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def connected_components_native(mask: np.ndarray,
                                connectivity: int = 3) -> Tuple[np.ndarray, int]:
    """Label foreground components of a 3D boolean/integer mask.
    connectivity: 1=6, 2=18, 3=26 neighborhood (skimage convention).
    Falls back to scipy when the native lib is unavailable."""
    lib = _build_and_load()
    mask = np.ascontiguousarray(mask)
    if lib is None:
        from scipy import ndimage as ndi

        structure = ndi.generate_binary_structure(3, connectivity)
        labels, num = ndi.label(mask > 0, structure=structure)
        return labels.astype(np.int32), int(num)

    img = np.ascontiguousarray((mask > 0).astype(np.uint8))
    out = np.empty(img.shape, dtype=np.int32)
    W, H, D = img.shape
    num = lib.label_components(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        W, H, D, connectivity)
    return out, int(num)


def grey_dilation_native(img: np.ndarray) -> np.ndarray:
    """Cross-footprint grey dilation of a 3D int volume (the dilation used in
    post-processing). scipy fallback when the native lib is unavailable."""
    lib = _build_and_load()
    src = np.ascontiguousarray(img, dtype=np.int32)
    if lib is None:
        from scipy import ndimage as ndi

        return ndi.grey_dilation(
            src, footprint=ndi.generate_binary_structure(3, 1)).astype(img.dtype)
    out = np.empty_like(src)
    W, H, D = src.shape
    lib.grey_dilate_cross(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        W, H, D)
    return out.astype(img.dtype)


def nifti_read_raw_native(path):
    """Native NIfTI read: returns (raw352_header_bytes, payload_bytes ndarray)
    or None when the native lib is unavailable or the file needs the general
    Python codec (big-endian, exotic layouts).  The gzip inflate and payload
    copy run in C with the GIL released, so loader threads scale."""
    lib = _build_and_load()
    if lib is None:
        return None
    header = np.zeros(16, dtype=np.float64)
    raw352 = np.zeros(352, dtype=np.uint8)
    rc = lib.nifti_read_header(
        str(path).encode(), header.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        raw352.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        return None
    ndim = int(header[0])
    dims = [int(d) for d in header[1:1 + max(ndim, 3)]]
    bitpix = int(header[9])
    count = 1
    for d in dims:
        count *= max(d, 1)
    n_bytes = count * (bitpix // 8)
    payload = np.empty(n_bytes, dtype=np.uint8)
    got = lib.nifti_read_payload(
        str(path).encode(), payload.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_bytes)
    if got != n_bytes:
        return None
    return bytes(raw352.tobytes()), payload


def confusion_joint_hist_native(target: np.ndarray, pred: np.ndarray,
                                lut: np.ndarray, L: int):
    """(L+1)x(L+1) joint histogram of dense label indices in one C pass
    (GIL released by ctypes). target/pred: int32 arrays of equal size;
    lut: int32 value->index table. Returns None if the native lib is
    unavailable."""
    lib = _build_and_load()
    if lib is None:
        return None
    t = np.ascontiguousarray(target.reshape(-1), dtype=np.int32)
    p = np.ascontiguousarray(pred.reshape(-1), dtype=np.int32)
    lut = np.ascontiguousarray(lut, dtype=np.int32)
    counts = np.zeros((L + 1) * (L + 1), dtype=np.int64)
    lib.confusion_joint_hist(
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(t.size),
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(lut.size), ctypes.c_int32(L),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return counts.reshape(L + 1, L + 1)

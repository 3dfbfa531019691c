"""ctypes binding for the native host peak-crop kernel (hostcrop.c).

Build model: the shared library is compiled ON DEMAND with the system C
compiler (cc -O3, no dependencies beyond libc) into
``~/.cache/globalegomocap_tpu/`` and memoized; if no compiler is
available or the build fails, callers fall back to the numpy mirror
(`energy.terms.crop_heatmaps_channels_last_np`) — behaviour is
identical (the kernel is tested bit-exact for crops/origins; the
guard's mass sums differ only in float summation order).

Why native: stage(on_host=True) is the host-ingest producer's hot path
(host_ingest_ab.json) and numpy needs ~5 full passes over each 25 MB
map stack; the C kernel does one streaming pass + a small gather.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "hostcrop.c")
_LIB = None
_TRIED = False


def _build_dir() -> str:
    d = os.environ.get("GLOBALEGOMOCAP_NATIVE_DIR",
                       os.path.join(os.path.expanduser("~"), ".cache",
                                    "globalegomocap_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def _load():
    """Compile (once) and dlopen the kernel; None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("GLOBALEGOMOCAP_NO_NATIVE") == "1":
        return None
    try:
        so = os.path.join(_build_dir(), "libhostcrop.so")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(_SRC)):
            tmp = so + f".build{os.getpid()}"
            # -march=native vectorizes the J-contiguous scan loop
            # (measured 21.3 -> 3.56 ms per 100-frame chunk); fall back
            # to plain -O3 where the flag is unsupported
            for flags in (["-O3", "-march=native"], ["-O3"]):
                try:
                    subprocess.run(
                        ["cc", *flags, "-shared", "-fPIC", "-o", tmp,
                         _SRC],
                        check=True, capture_output=True, timeout=120)
                    break
                except subprocess.CalledProcessError:
                    if flags == ["-O3"]:
                        raise
            os.replace(tmp, so)    # atomic vs concurrent builders
        lib = ctypes.CDLL(so)
        i64 = ctypes.c_int64
        fp = ctypes.POINTER(ctypes.c_float)
        lib.crop_peak_f32.argtypes = [fp, i64, i64, i64, i64, i64,
                                      fp, fp, fp, fp]
        lib.crop_peak_f32.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def crop_peak_native(heatmaps: np.ndarray, k: int):
    """Native equivalent of `crop_heatmaps_channels_last_np` for one
    chunk, returning the FLAT staged-crop contract directly.

    heatmaps: (F, H, W, J) -> (crops (F, k*k*J) f32,
    origins (F, J, 2) f32, (H, W), box (F, J), total (F, J)).
    Returns None when the native kernel is unavailable or the input
    shape/dtype is outside its envelope (caller falls back to numpy).
    """
    lib = _load()
    if lib is None or heatmaps.ndim != 4:
        return None
    f, h, w, j = heatmaps.shape
    k = min(int(k), h, w)
    if j > 64 or k <= 0:
        return None
    heat = np.ascontiguousarray(heatmaps, dtype=np.float32)
    crops = np.empty((f, k * k * j), np.float32)
    origins = np.empty((f, j, 2), np.float32)
    box = np.empty((f, j), np.float32)
    total = np.empty((f, j), np.float32)
    pf = ctypes.POINTER(ctypes.c_float)
    lib.crop_peak_f32(
        heat.ctypes.data_as(pf), f, h, w, j, k,
        crops.ctypes.data_as(pf), origins.ctypes.data_as(pf),
        box.ctypes.data_as(pf), total.ctypes.data_as(pf))
    return crops, origins, (h, w), box, total

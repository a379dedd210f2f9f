"""ctypes bindings for the native host runtime (libdfruntime.so).

Builds lazily with the adjacent Makefile on first use; every entry point
has a numpy fallback (deepfusion_tpu.ops.layout) so the package works
without a toolchain. ``native_available()`` reports which path is active.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..utils.logger import info, warning

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libdfruntime.so")
_REQUIRED_VERSION = 2     # bump with dfruntime.cc's df_runtime_version
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-s", "-C", _HERE], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover
        warning("native runtime build failed (%s); using numpy fallback", e)
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.df_runtime_version.restype = ctypes.c_int
            if lib.df_runtime_version() < _REQUIRED_VERSION:
                # stale prebuilt library from an older source revision:
                # rebuild in place (the .so is gitignored and lazy-built,
                # so a pulled update must not crash on missing symbols)
                info("native runtime v%d < required v%d: rebuilding",
                     lib.df_runtime_version(), _REQUIRED_VERSION)
                # dlopen caches by path: the stale mapping must be
                # dlclosed or the re-CDLL returns the same old module
                handle = lib._handle
                del lib
                ctypes.CDLL(None).dlclose(ctypes.c_void_p(handle))
                os.remove(_LIB_PATH)
                if not _build():
                    return None
                lib = ctypes.CDLL(_LIB_PATH)
                lib.df_runtime_version.restype = ctypes.c_int
        except (OSError, AttributeError) as e:  # pragma: no cover
            warning("native runtime load failed: %s", e)
            return None
        i64, i32p, i8p, u8p = (ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                               ctypes.POINTER(ctypes.c_int8),
                               ctypes.POINTER(ctypes.c_uint8))
        lib.df_pack_conv_weights.argtypes = [i8p] + [i64] * 6 + [i8p]
        lib.df_pack_1x1_weights.argtypes = [i8p] + [i64] * 4 + [i8p]
        lib.df_u8_shift_correction.argtypes = [i8p, i64, i64, i32p]
        lib.df_prep_src.argtypes = [u8p] + [i64] * 8 + [i8p]
        lib.df_pack_image.argtypes = [u8p] + [i64] * 8 + [i8p]
        lib.df_s2d_regroup.argtypes = [u8p] + [i64] * 6 + [u8p]
        lib.df_balance211.argtypes = [i64, i64, i64,
                                      ctypes.POINTER(ctypes.c_int64),
                                      ctypes.POINTER(ctypes.c_int64)]
        lib.df_runtime_version.restype = ctypes.c_int
        _lib = lib
        info("native runtime loaded (version %d)", lib.df_runtime_version())
        return _lib


def native_available() -> bool:
    return _load() is not None


def _i8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))


def pack_conv_weights(wei_oihw: np.ndarray, icp: int, ocp: int) -> np.ndarray:
    lib = _load()
    wei = np.ascontiguousarray(wei_oihw, dtype=np.int8)
    oc, ic, kh, kw = wei.shape
    if lib is None:
        from ..ops import layout
        return layout.pack_conv_weights(wei, icp, ocp)
    out = np.empty((kh * kw * icp, ocp), dtype=np.int8)
    lib.df_pack_conv_weights(_i8p(wei), oc, ic, kh, kw, icp, ocp, _i8p(out))
    return out


def pack_1x1_weights(wei: np.ndarray, icp: int, ocp: int) -> np.ndarray:
    lib = _load()
    wei = np.ascontiguousarray(wei, dtype=np.int8)
    oc1, ic = wei.shape[0], wei.shape[1]
    if lib is None:
        from ..ops import layout
        return layout.pack_1x1_weights(wei, icp, ocp)
    out = np.empty((icp, ocp), dtype=np.int8)
    lib.df_pack_1x1_weights(_i8p(wei.reshape(oc1, ic)), oc1, ic, icp, ocp,
                            _i8p(out))
    return out


def u8_shift_correction(packed: np.ndarray) -> np.ndarray:
    lib = _load()
    packed = np.ascontiguousarray(packed, dtype=np.int8)
    if lib is None:
        from ..ops import layout
        return layout.u8_shift_correction(packed)
    rows, cols = packed.shape
    out = np.empty((cols,), dtype=np.int32)
    lib.df_u8_shift_correction(
        _i8p(packed), rows, cols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def prep_src(src_u8: np.ndarray, ph: int, pw: int, icp: int) -> np.ndarray:
    """Host-side activation prep (pad + shift, width padded to a multiple
    of 8 like ops.layout.prep_src); the device path uses the traced jnp
    version instead."""
    from ..utils.mathutil import round_up

    lib = _load()
    src = np.ascontiguousarray(src_u8, dtype=np.uint8)
    n, ih, iw, ic = src.shape
    owp = round_up(iw + 2 * pw, 8)
    if lib is None:
        out = np.full((n, ih + 2 * ph, owp, icp), -128, np.int8)
        out[:, ph:ph + ih, pw:pw + iw, :ic] = (
            src.astype(np.int16) - 128).astype(np.int8)
        return out
    out = np.empty((n, ih + 2 * ph, owp, icp), dtype=np.int8)
    lib.df_prep_src(src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    n, ih, iw, ic, ph, pw, owp, icp, _i8p(out))
    return out


def pack_image(src_u8: np.ndarray, spec) -> np.ndarray:
    """Native model-boundary pack into the packed domain
    (ops.packed.pack_image twin; spec is a PackedSpec)."""
    from ..utils.logger import check
    lib = _load()
    src = np.ascontiguousarray(src_u8, dtype=np.uint8)
    n, h, w, c = src.shape
    check((h, w, c) == (spec.h, spec.w, spec.c),
          "pack_image: shape does not match spec")
    if lib is None:
        from ..ops.packed import pack_image as py
        return py(src, spec)
    out = np.empty((n, spec.rows * spec.iwp, spec.cp), dtype=np.int8)
    lib.df_pack_image(src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      n, h, w, c, spec.cp, spec.halo, spec.col_off,
                      spec.iwp, _i8p(out))
    return out


def s2d_regroup(x_u8: np.ndarray, ih2: int, iw2: int, sh: int, sw: int,
                ic: int) -> np.ndarray:
    """Native space-to-depth regroup (ops.layout._s2d_regroup twin) —
    the strided conv's model-boundary prep."""
    from ..utils.logger import check
    lib = _load()
    x = np.ascontiguousarray(x_u8, dtype=np.uint8)
    n = x.shape[0]
    check(x.shape[1:] == (ih2 * sh, iw2 * sw, ic),
          "s2d_regroup: shape does not match the s2d geometry")
    if lib is None:
        from ..ops.layout import _s2d_regroup
        return _s2d_regroup(x, ih2, iw2, sh, sw, ic, np)
    out = np.empty((n, ih2, iw2, sh * sw * ic), dtype=np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.df_s2d_regroup(x.ctypes.data_as(u8p), n, ih2, iw2, sh, sw, ic,
                       out.ctypes.data_as(u8p))
    return out


def balance211(amount: int, team: int, member: int):
    lib = _load()
    if lib is None:
        from ..utils.mathutil import balance211 as py
        return py(amount, team, member)
    s, e = ctypes.c_int64(), ctypes.c_int64()
    lib.df_balance211(amount, team, member, ctypes.byref(s), ctypes.byref(e))
    return s.value, e.value

"""ctypes bindings for the native CPU kernels (native/fgt_native.cpp).

The library is auto-built with g++ on first use (one ``make`` invocation);
every entry point has a pure-Python fallback, so the framework works
without a toolchain — just slower on the CPU-side stages.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger("fgt_tpu")

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfgt_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            if os.environ.get("FGT_NO_NATIVE"):
                return None
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception as e:  # no toolchain -> python fallback
                logger.info("native build unavailable (%s)", e)
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.info("native load failed (%s)", e)
            return None
        lib.laplace_fill.restype = ctypes.c_int
        lib.laplace_fill.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int]
        lib.diffuse_flows.restype = None
        lib.diffuse_flows.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int]
        lib.bilinear_interp.restype = None
        lib.bilinear_interp.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        if not (hasattr(lib, "flownn_pass")
                and hasattr(lib, "unfilled_mask")
                and hasattr(lib, "flownn_fuse")):  # stale older .so
            subprocess.run(["make", "-C", _NATIVE_DIR, "clean", "all"],
                           check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
        lib.flownn_pass.restype = None
        lib.flownn_pass.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        lib.flownn_sample.restype = None
        lib.flownn_sample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.flownn_fuse.restype = None
        lib.flownn_fuse.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.unfilled_mask.restype = None
        lib.unfilled_mask.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
        logger.info("native CPU kernels loaded (%s)", _LIB_PATH)
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def laplace_fill(img: np.ndarray, mask: np.ndarray, tol: float = 1e-7,
                 max_iter: int = 20000) -> np.ndarray:
    """In-place Laplace solve on mask pixels (SOR). img: [H, W] float64."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float64)
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = img.shape
    lib.laplace_fill(_ptr(img, ctypes.c_double), _ptr(m, ctypes.c_uint8),
                     h, w, tol, max_iter)
    return img


def diffuse_flows(flows: np.ndarray, masks: np.ndarray, tol: float = 1e-7,
                  max_iter: int = 20000) -> np.ndarray:
    """Batched hole diffusion. flows: [N, H, W, C] f32; masks: [N, H, W]."""
    lib = _load()
    assert lib is not None
    f = np.ascontiguousarray(flows, np.float32)
    m = np.ascontiguousarray(masks.astype(np.uint8))
    n, h, w, c = f.shape
    out = np.empty_like(f)
    lib.diffuse_flows(_ptr(f, ctypes.c_float), _ptr(m, ctypes.c_uint8),
                      _ptr(out, ctypes.c_float), n, h, w, c, tol, max_iter)
    return out


def flownn_pass(mask: np.ndarray, flow_follow: np.ndarray,
                flow_check: np.ndarray, forward: bool, thres: float):
    """One directional flowNN chaining pass (native, single call).

    mask: [N, H, W] uint8; flow_follow/flow_check: [N-1, H, W, 2] f32.
    Returns (have u8, nn_x f32, nn_y f32, nn_t i32, cons_u f32, cons_v f32),
    each [N, H, W]."""
    lib = _load()
    assert lib is not None
    m = np.ascontiguousarray(mask, np.uint8)
    ff = np.ascontiguousarray(flow_follow, np.float32)
    fc = np.ascontiguousarray(flow_check, np.float32)
    n, h, w = m.shape
    have = np.zeros((n, h, w), np.uint8)
    nn_x = np.zeros((n, h, w), np.float32)
    nn_y = np.zeros((n, h, w), np.float32)
    nn_t = np.full((n, h, w), -1, np.int32)
    cons_u = np.zeros((n, h, w), np.float32)
    cons_v = np.zeros((n, h, w), np.float32)
    lib.flownn_pass(_ptr(m, ctypes.c_uint8), _ptr(ff, ctypes.c_float),
                    _ptr(fc, ctypes.c_float), int(forward), n, h, w,
                    float(thres), _ptr(have, ctypes.c_uint8),
                    _ptr(nn_x, ctypes.c_float), _ptr(nn_y, ctypes.c_float),
                    _ptr(nn_t, ctypes.c_int32), _ptr(cons_u, ctypes.c_float),
                    _ptr(cons_v, ctypes.c_float))
    return have, nn_x, nn_y, nn_t, cons_u, cons_v


def flownn_sample(grad: np.ndarray, have: np.ndarray, nn_x: np.ndarray,
                  nn_y: np.ndarray, nn_t: np.ndarray, forward: bool,
                  inplace: bool = False) -> np.ndarray:
    """Chain-endpoint sampling. grad: [N, H, W, C] f32 (copied and
    returned filled; with ``inplace=True`` a contiguous f32 grad is
    mutated directly — the evolving-array semantics make the kernel
    in-place by construction, and the copy here cost ~17 s per call on
    the slow-first-touch host at outpainting scale);
    have/nn_*: the flownn_pass outputs."""
    lib = _load()
    assert lib is not None
    if inplace:
        assert (grad.dtype == np.float32
                and grad.flags["C_CONTIGUOUS"]), "inplace needs C f32"
        g = grad
    else:
        g = np.array(grad, np.float32, copy=True, order="C")
    hv = np.ascontiguousarray(have, np.uint8)
    nx = np.ascontiguousarray(nn_x, np.float32)
    ny = np.ascontiguousarray(nn_y, np.float32)
    nt = np.ascontiguousarray(nn_t, np.int32)
    n, h, w, c = g.shape
    lib.flownn_sample(_ptr(g, ctypes.c_float), _ptr(hv, ctypes.c_uint8),
                      _ptr(nx, ctypes.c_float), _ptr(ny, ctypes.c_float),
                      _ptr(nt, ctypes.c_int32), int(forward), n, h, w, c)
    return g


def flownn_fuse(gx: np.ndarray, gy: np.ndarray, s_bn: np.ndarray,
                s_fn: np.ndarray, bn_pass, fn_pass, mask: np.ndarray,
                alpha: float) -> np.ndarray:
    """BN/FN candidate fusion, in place (reference
    get_flowNN_gradient.py:466-534). gx/gy: [N, H, W, C] f32 contiguous,
    MUTATED at hole pixels; s_bn/s_fn: [N, H, W, 2C] sampled evolving
    gradients (gx|gy stacked on channels); bn_pass/fn_pass: flownn_pass
    outputs; mask: [N, H, W] uint8. Returns tofill [N, H, W] uint8."""
    lib = _load()
    assert lib is not None
    n, h, w, c = gx.shape
    for a in (gx, gy, s_bn, s_fn):
        assert a.dtype == np.float32 and a.flags["C_CONTIGUOUS"]
    have_bn, _, _, _, cu_bn, cv_bn = bn_pass
    have_fn, _, _, _, cu_fn, cv_fn = fn_pass
    tofill = np.empty((n, h, w), np.uint8)
    lib.flownn_fuse(
        _ptr(gx, ctypes.c_float), _ptr(gy, ctypes.c_float),
        _ptr(s_bn, ctypes.c_float), _ptr(s_fn, ctypes.c_float),
        _ptr(have_bn, ctypes.c_uint8), _ptr(cu_bn, ctypes.c_float),
        _ptr(cv_bn, ctypes.c_float), _ptr(have_fn, ctypes.c_uint8),
        _ptr(cu_fn, ctypes.c_float), _ptr(cv_fn, ctypes.c_float),
        _ptr(mask, ctypes.c_uint8), _ptr(tofill, ctypes.c_uint8),
        float(alpha), n, h, w, c)
    return tofill


def bilinear_interp(img: np.ndarray, xs: np.ndarray,
                    ys: np.ndarray) -> np.ndarray:
    """img: [H, W(, C)] f32; xs/ys: flat float coords. Zero outside."""
    lib = _load()
    assert lib is not None
    squeeze = img.ndim == 2
    im = np.ascontiguousarray(
        img[..., None] if squeeze else img, np.float32)
    h, w, c = im.shape
    x = np.ascontiguousarray(xs.reshape(-1), np.float32)
    y = np.ascontiguousarray(ys.reshape(-1), np.float32)
    out = np.empty((x.size, c), np.float32)
    lib.bilinear_interp(_ptr(im, ctypes.c_float), h, w, c,
                        _ptr(x, ctypes.c_float), _ptr(y, ctypes.c_float),
                        x.size, _ptr(out, ctypes.c_float))
    return out[:, 0] if squeeze else out


def unfilled_mask(hole: np.ndarray, gm: np.ndarray) -> np.ndarray:
    """Poisson connectivity check: hole px unreachable through
    gradient-valid paths. hole/gm: [H, W] bool-ish; returns [H, W] bool."""
    lib = _load()
    assert lib is not None
    h_arr = np.ascontiguousarray(hole.astype(np.uint8))
    g_arr = np.ascontiguousarray(gm.astype(np.uint8))
    h, w = h_arr.shape
    out = np.empty((h, w), np.uint8)
    lib.unfilled_mask(_ptr(h_arr, ctypes.c_uint8), _ptr(g_arr, ctypes.c_uint8),
                      h, w, _ptr(out, ctypes.c_uint8))
    return out.astype(bool)

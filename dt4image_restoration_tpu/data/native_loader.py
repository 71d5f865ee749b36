"""Native (C++) batch-state assembly for the training input pipeline.

The reference's DataLoader path re-opens the HDF5 file and re-parses the
trajectory json for every item (/root/reference/dataset/datasets.py:50-51,
63), and its uint8 -> float conversion runs through a float64 numpy round
trip per image — all under the GIL, which is what caps
``background_batches`` overlap (benchmarks/RESULTS.md, input pipeline at
dataset scale: host assembly 170 ms/step vs 11.5 ms/step device compute).

This module is the TPU-framework answer: batch state assembly as ONE call
into a small C++ kernel that

  * gathers trajectory-window image rows out of a preloaded contiguous
    uint8 state array (zero h5py/json work on the hot path),
  * converts uint8 -> float32 through a 256-entry LUT built in double
    precision, so results are BIT-EXACT with the numpy path
    ``np.float32(arr / 255)`` (float64 divide, then cast),
  * fills padding rows (index -1) with zeros (the short-trajectory
    zero-pad, datasets.py:120-135 here), and
  * releases the GIL for the whole call (ctypes) and splits rows across
    ``std::thread`` workers — on a production host the assembly thread no
    longer serializes against the dispatch thread.

The compiled library is cached under /tmp keyed by a source hash (the same
pattern as the XLA compile cache, utils/compile_cache.py). Everything falls
back to an exact numpy implementation when a C++ toolchain is unavailable
or ``DT4IR_NATIVE_DISABLE=1``.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_CPP_SOURCE = r"""
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// lut[v] = (float)((double)v / 255.0): bit-exact with numpy's
// np.float32(uint8_array / 255) (float64 divide, then float32 cast).
struct Lut {
    float v[256];
    Lut() {
        for (int i = 0; i < 256; ++i)
            v[i] = static_cast<float>(static_cast<double>(i) / 255.0);
    }
};
const Lut kLut;

void gather_range(const std::uint8_t* src, std::int64_t img_elems,
                  const std::int64_t* rows, float* out,
                  std::int64_t begin, std::int64_t end) {
    for (std::int64_t i = begin; i < end; ++i) {
        float* dst = out + i * img_elems;
        const std::int64_t r = rows[i];
        if (r < 0) {
            std::memset(dst, 0, sizeof(float) * img_elems);
            continue;
        }
        const std::uint8_t* s = src + r * img_elems;
        for (std::int64_t j = 0; j < img_elems; ++j)
            dst[j] = kLut.v[s[j]];
    }
}

}  // namespace

extern "C" void dt4ir_gather_scale(const std::uint8_t* src,
                                   std::int64_t img_elems,
                                   const std::int64_t* rows,
                                   std::int64_t n_rows,
                                   float* out,
                                   std::int32_t n_threads) {
    if (n_threads <= 1 || n_rows < 2 * n_threads) {
        gather_range(src, img_elems, rows, out, 0, n_rows);
        return;
    }
    std::vector<std::thread> workers;
    const std::int64_t chunk = (n_rows + n_threads - 1) / n_threads;
    for (std::int32_t t = 0; t < n_threads; ++t) {
        const std::int64_t begin = t * chunk;
        if (begin >= n_rows) break;
        const std::int64_t end = std::min(begin + chunk, n_rows);
        workers.emplace_back(gather_range, src, img_elems, rows, out,
                             begin, end);
    }
    for (auto& w : workers) w.join();
}
"""

# Per-UID, 0700: a world-writable shared /tmp path would let another local
# user plant a precomputed-digest .so that we would CDLL into the process.
_CACHE_DIR = os.environ.get(
    "DT4IR_NATIVE_CACHE",
    f"/tmp/dt4ir_native_{os.getuid() if hasattr(os, 'getuid') else 'u'}")


def _secure_cache_dir() -> str:
    """The cache dir, created 0700; if it exists but is not exclusively
    ours (wrong owner or group/other-writable), fall back to a fresh
    private directory rather than trusting its contents."""
    os.makedirs(_CACHE_DIR, mode=0o700, exist_ok=True)
    st = os.stat(_CACHE_DIR)
    uid_ok = not hasattr(os, "getuid") or st.st_uid == os.getuid()
    if uid_ok and not (st.st_mode & 0o022):
        return _CACHE_DIR
    return tempfile.mkdtemp(prefix="dt4ir_native_")

# LUT for the numpy fallback — same double-derived values as the C++ side.
_LUT_NP = (np.arange(256, dtype=np.float64) / 255.0).astype(np.float32)

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build_lib() -> Optional[ctypes.CDLL]:
    """Compile (or load the cached) shared library; None on any failure."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed or os.environ.get("DT4IR_NATIVE_DISABLE") == "1":
        return None
    digest = hashlib.sha256(_CPP_SOURCE.encode()).hexdigest()[:16]
    try:
        cache_dir = _secure_cache_dir()
        so_path = os.path.join(cache_dir, f"libdt4ir_loader_{digest}.so")
        if not os.path.exists(so_path):
            with tempfile.TemporaryDirectory(dir=cache_dir) as tmp:
                src = os.path.join(tmp, "loader.cpp")
                with open(src, "w") as f:
                    f.write(_CPP_SOURCE)
                tmp_so = os.path.join(tmp, "loader.so")
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", src, "-o", tmp_so],
                    check=True, capture_output=True)
                # Atomic rename: concurrent builders (multi-process tests)
                # race benignly — last rename wins with identical bytes.
                os.replace(tmp_so, so_path)
        lib = ctypes.CDLL(so_path)
        lib.dt4ir_gather_scale.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ]
        lib.dt4ir_gather_scale.restype = None
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _build_failed = True
        return None
    return _lib


def native_available() -> bool:
    return _build_lib() is not None


def default_threads() -> int:
    return min(os.cpu_count() or 1, 8)


def _gather_numpy(src: np.ndarray, flat_rows: np.ndarray) -> np.ndarray:
    """Exact numpy fallback (also the test oracle for the C++ kernel)."""
    out = np.zeros((flat_rows.size, src.shape[1]), np.float32)
    valid = flat_rows >= 0
    out[valid] = _LUT_NP[src[flat_rows[valid]]]
    return out


def gather_scale_u8(src: np.ndarray, rows: np.ndarray,
                    n_threads: Optional[int] = None) -> np.ndarray:
    """``out[i] = float32(src[rows[i]] / 255)``; ``rows[i] < 0`` -> zeros.

    ``src`` is the preloaded (n_images, img_elems) uint8 state array;
    ``rows`` any-shape int64 indices. Returns float32 with shape
    ``rows.shape + (img_elems,)``. Native when the C++ kernel is available
    (GIL released for the whole call), exact numpy otherwise.
    """
    src = np.ascontiguousarray(src)
    if src.dtype != np.uint8 or src.ndim != 2:
        raise ValueError(f"src must be (n, img_elems) uint8, got "
                         f"{src.dtype} {src.shape}")
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    out_shape = rows.shape + (src.shape[1],)
    flat_rows = rows.reshape(-1)
    if flat_rows.size and (flat_rows.max() >= src.shape[0]):
        raise IndexError(f"row index {int(flat_rows.max())} out of range "
                         f"for {src.shape[0]} images")
    lib = _build_lib()
    if lib is None:
        return _gather_numpy(src, flat_rows).reshape(out_shape)
    out = np.empty((flat_rows.size, src.shape[1]), np.float32)
    lib.dt4ir_gather_scale(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(src.shape[1]),
        flat_rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(flat_rows.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int32(n_threads if n_threads is not None
                       else default_threads()))
    return out.reshape(out_shape)

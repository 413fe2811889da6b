"""ctypes bindings for the native host-side point ops + record codec.

Compiles unidom_tpu/io/native/pointops.cpp with g++ on first use (cached
next to the source); falls back to numpy implementations when no compiler
is available so the package never hard-fails.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_DIR, "pointops.cpp")
_LIB = os.path.join(_DIR, "libpointops.so")

_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
    except Exception:
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.fps.argtypes = [f32p, ctypes.c_int, ctypes.c_int, i32p]
    lib.ball_query.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int,
                               ctypes.c_float, ctypes.c_int, i32p]
    lib.three_nn.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, f32p, i32p]
    lib.write_records.argtypes = [ctypes.c_char_p, f32p, i32p, ctypes.c_int, ctypes.c_int]
    lib.write_records.restype = ctypes.c_int
    lib.count_records.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
    lib.count_records.restype = ctypes.c_int
    lib.read_records.argtypes = [ctypes.c_char_p, f32p, i32p, ctypes.c_int]
    lib.read_records.restype = ctypes.c_int
    _lib = lib
    return _lib


# ------------------------------------------------------------------ #
# numpy-facing wrappers (native when possible, numpy fallback)
# ------------------------------------------------------------------ #


def fps(xyz, n_samples):
    """(N, 3) float32 -> (n_samples,) int32 FPS indices."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    lib = get_lib()
    out = np.zeros(n_samples, np.int32)
    if lib is not None:
        lib.fps(xyz, len(xyz), n_samples, out)
        return out
    # numpy fallback
    min_d2 = np.full(len(xyz), np.inf)
    last = 0
    for s in range(1, n_samples):
        d2 = ((xyz - xyz[last]) ** 2).sum(-1)
        np.minimum(min_d2, d2, out=min_d2)
        last = int(min_d2.argmax())
        out[s] = last
    return out


def ball_query(xyz, centers, radius, k):
    xyz = np.ascontiguousarray(xyz, np.float32)
    centers = np.ascontiguousarray(centers, np.float32)
    lib = get_lib()
    out = np.zeros((len(centers), k), np.int32)
    if lib is not None:
        lib.ball_query(xyz, len(xyz), centers, len(centers), radius, k, out)
        return out
    for c in range(len(centers)):
        d2 = ((xyz - centers[c]) ** 2).sum(-1)
        hits = np.flatnonzero(d2 < radius * radius)[:k]
        if len(hits):
            out[c, : len(hits)] = hits
            out[c, len(hits):] = hits[0]
    return out


def three_nn(unknown, known):
    unknown = np.ascontiguousarray(unknown, np.float32)
    known = np.ascontiguousarray(known, np.float32)
    lib = get_lib()
    d = np.zeros((len(unknown), 3), np.float32)
    i = np.zeros((len(unknown), 3), np.int32)
    if lib is not None:
        lib.three_nn(unknown, len(unknown), known, len(known), d, i)
        return d, i
    d2 = ((unknown[:, None, :] - known[None]) ** 2).sum(-1)
    i = np.argsort(d2, -1)[:, :3].astype(np.int32)
    d = np.sqrt(np.take_along_axis(d2, i, -1)).astype(np.float32)
    return d, i


def write_record_file(path, clouds):
    """clouds: list of (n_i, d) float32 arrays -> packed binary file."""
    dims = clouds[0].shape[1]
    data = np.ascontiguousarray(np.concatenate([c.reshape(-1, dims) for c in clouds]),
                                np.float32).reshape(-1)
    sizes = np.asarray([len(c) for c in clouds], np.int32)
    lib = get_lib()
    if lib is not None:
        n = lib.write_records(path.encode(), data, sizes, len(clouds), dims)
        assert n == len(clouds)
        return path
    with open(path, "wb") as f:
        off = 0
        for s in sizes:
            f.write(np.int32(s).tobytes())
            f.write(np.int32(dims).tobytes())
            f.write(data[off : off + s * dims].tobytes())
            off += s * dims
    return path


def read_record_file(path, dims=3):
    lib = get_lib()
    if lib is not None:
        total = ctypes.c_int64()
        n = lib.count_records(path.encode(), ctypes.byref(total))
        assert n >= 0, path
        out = np.zeros(int(total.value) * dims, np.float32)
        sizes = np.zeros(n, np.int32)
        lib.read_records(path.encode(), out, sizes, n)
    else:
        blobs, sizes_l = [], []
        with open(path, "rb") as f:
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    break
                n_i, d = np.frombuffer(hdr, np.int32)
                blobs.append(np.frombuffer(f.read(4 * n_i * d), np.float32))
                sizes_l.append(n_i)
        out = np.concatenate(blobs) if blobs else np.zeros(0, np.float32)
        sizes = np.asarray(sizes_l, np.int32)
    clouds, off = [], 0
    for s in sizes:
        clouds.append(out[off : off + s * dims].reshape(s, dims))
        off += s * dims
    return clouds

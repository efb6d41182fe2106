"""Volume file IO: TVOL (native codec), raw dumps (SURVEY.md §2.1).

The reference loads raw/.vol voxel files with native C code; the
tpuvr equivalent is ``native/volcodec.cpp`` (zero-RLE TVOL format + PPM
writer), auto-built with g++ on first use and bound via ctypes. A pure
numpy fallback keeps every environment working.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from functools import lru_cache
from typing import Optional

import numpy as np

log = logging.getLogger("tpuvr")

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO, ".build", "libvolcodec.so")
_SRC = os.path.join(_REPO, "native", "volcodec.cpp")

_MAGIC = b"TVOL0001"
_RUN = 0xFFFFFFFF


@lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native codec; None if unavailable."""
    try:
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-shared", "-std=c++17",
                 "-o", _LIB_PATH, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.tvol_write.restype = ctypes.c_int
        lib.tvol_read.restype = ctypes.c_int
        lib.tvol_read_header.restype = ctypes.c_int
        lib.ppm_write.restype = ctypes.c_int
        return lib
    except Exception as e:  # no g++ / sandboxed build
        log.warning("native volcodec unavailable (%s); numpy fallback", e)
        return None


def save_tvol(path: str, volume, rle: bool = True):
    """Write a (Z, Y, X, C) or (Z, Y, X) float32 volume as TVOL."""
    arr = np.ascontiguousarray(np.asarray(volume, dtype=np.float32))
    if arr.ndim == 3:
        arr = arr[..., None]
    z, y, x, c = arr.shape
    lib = _lib()
    if lib is not None:
        rc = lib.tvol_write(
            path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            z, y, x, c, 1 if rle else 0,
        )
        if rc != 0:
            raise IOError(f"tvol_write failed with code {rc}")
        return
    _save_tvol_numpy(path, arr, rle)


def load_tvol(path: str) -> np.ndarray:
    """Read a TVOL file -> (Z, Y, X, C) float32."""
    lib = _lib()
    if lib is not None:
        dims = (ctypes.c_uint32 * 4)()
        rc = lib.tvol_read_header(path.encode(), dims)
        if rc != 0:
            raise IOError(f"tvol_read_header failed with code {rc}")
        z, y, x, c = (int(d) for d in dims)
        out = np.empty((z, y, x, c), dtype=np.float32)
        rc = lib.tvol_read(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.size,
        )
        if rc != 0:
            raise IOError(f"tvol_read failed with code {rc}")
        return out
    return _load_tvol_numpy(path)


def write_ppm_native(path: str, rgb, gamma: float = 2.2) -> bool:
    """Native gamma-encoding PPM writer; returns False if lib missing."""
    lib = _lib()
    if lib is None:
        return False
    arr = np.ascontiguousarray(np.asarray(rgb, dtype=np.float32))
    h, w = arr.shape[:2]
    rc = lib.ppm_write(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, ctypes.c_float(1.0 / gamma),
    )
    if rc != 0:
        raise IOError(f"ppm_write failed with code {rc}")
    return True


def load_raw(path: str, shape, dtype=np.uint8, normalize: bool = True):
    """Load a classic raw volume dump (the reference's main input format).

    Args:
      shape: (Z, Y, X).
      dtype: on-disk scalar type (uint8/uint16/float32).
      normalize: scale integer types to [0, 1].

    Returns (Z, Y, X) float32 density.
    """
    data = np.fromfile(path, dtype=dtype).reshape(shape)
    data = data.astype(np.float32)
    if normalize and np.issubdtype(dtype, np.integer):
        data /= float(np.iinfo(dtype).max)
    return data


def load_tiff_stack(paths, normalize: bool = True,
                    scale: Optional[float] = None) -> np.ndarray:
    """Load a TIFF slice stack (one image per Z plane) into (Z, Y, X).

    The reference-class renderer's third input format besides raw/.vol
    (SURVEY.md §2.1 volume loader). Accepts a list of file paths or a
    glob pattern; slices are sorted lexicographically and must share one
    (Y, X) shape *and* one sample dtype (a mixed uint8/uint16 stack would
    otherwise be silently mis-scaled). Integer samples are scaled to
    [0, 1] when ``normalize``; ``scale`` overrides the divisor (useful for
    mode 'I' int32 TIFFs whose full-scale is rarely 2^31-1).
    """
    from PIL import Image

    if isinstance(paths, (str, bytes)):
        import glob as _glob

        paths = sorted(_glob.glob(paths))
    if not paths:
        raise ValueError("load_tiff_stack: no slice files found")
    planes = []
    for p in paths:
        with Image.open(p) as img:
            if img.mode not in ("F", "I", "I;16", "L"):
                img = img.convert("F")
            planes.append(np.asarray(img).copy())
    shapes = {pl.shape for pl in planes}
    if len(shapes) != 1:
        raise ValueError(f"inconsistent slice shapes: {sorted(shapes)}")
    dtypes = {pl.dtype for pl in planes}
    if len(dtypes) != 1:
        raise ValueError(
            f"inconsistent slice dtypes: {sorted(str(d) for d in dtypes)}; "
            "normalization needs one sample type per stack"
        )
    vol = np.stack(planes).astype(np.float32)
    dtype = planes[0].dtype
    if scale is not None:
        vol /= float(scale)
    elif normalize and np.issubdtype(dtype, np.integer):
        vol /= float(np.iinfo(dtype).max)
    return vol


def density_to_grid(density, emission=(1.0, 1.0, 1.0)):
    """(Z, Y, X) density -> (Z, Y, X, 4) grid with constant emission."""
    d = np.asarray(density, dtype=np.float32)
    rgb = np.broadcast_to(
        np.asarray(emission, dtype=np.float32), (*d.shape, 3)
    )
    return np.concatenate([d[..., None], rgb], axis=-1)


# ---------------------------------------------------------------- fallback

def _save_tvol_numpy(path: str, arr: np.ndarray, rle: bool):
    z, y, x, c = arr.shape
    flat = arr.reshape(-1)
    chunks = [b""]
    if rle:
        codec = 1
        zero = flat == 0.0
        # Boundaries of equal-value runs of the zero mask.
        idx = np.flatnonzero(np.diff(zero.astype(np.int8))) + 1
        starts = np.concatenate([[0], idx])
        ends = np.concatenate([idx, [flat.size]])
        for s, e in zip(starts, ends):
            if zero[s]:
                run = e - s
                while run > 0:
                    chunk = min(run, 0xFFFFFFF0)
                    chunks.append(
                        np.asarray([_RUN, chunk], np.uint32).tobytes()
                    )
                    run -= chunk
            else:
                lit = flat[s:e]
                chunks.append(
                    np.asarray([lit.size], np.uint32).tobytes()
                    + lit.tobytes()
                )
        payload = b"".join(chunks)
    else:
        codec = 0
        payload = flat.tobytes()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(np.asarray([z, y, x, c, codec], np.uint32).tobytes())
        f.write(np.asarray([len(payload)], np.uint64).tobytes())
        f.write(payload)


def _load_tvol_numpy(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise IOError("bad TVOL magic")
        z, y, x, c, codec = np.frombuffer(f.read(20), np.uint32)
        (nbytes,) = np.frombuffer(f.read(8), np.uint64)
        payload = f.read(int(nbytes))
    n = int(z) * int(y) * int(x) * int(c)
    if codec == 0:
        flat = np.frombuffer(payload, np.float32, n).copy()
    else:
        out = np.empty(n, np.float32)
        pos = oi = 0
        buf = np.frombuffer(payload, np.uint8)
        while pos < len(payload):
            word = int(np.frombuffer(buf[pos:pos + 4], np.uint32)[0])
            pos += 4
            if word == _RUN:
                run = int(np.frombuffer(buf[pos:pos + 4], np.uint32)[0])
                pos += 4
                out[oi:oi + run] = 0.0
                oi += run
            else:
                out[oi:oi + word] = np.frombuffer(
                    buf[pos:pos + word * 4], np.float32
                )
                pos += word * 4
                oi += word
        flat = out
    return flat.reshape(int(z), int(y), int(x), int(c))

"""ctypes bindings for the native IO runtime (liblaserslamio.so).

Auto-builds with ``make`` on first import if a compiler is available;
falls back to pure-numpy implementations otherwise (``HAVE_NATIVE``
tells you which path is active).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, 'liblaserslamio.so')

_lib = None


def _try_load():
    global _lib
    if _lib is not None:
        return _lib
    # Always invoke make: a no-op when the .so is current, a rebuild when
    # io.cpp is newer (a stale library would miss newly added symbols).
    try:
        subprocess.run(['make', '-C', _DIR], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        if not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        _bind(lib)
    except (OSError, AttributeError):
        # Missing file, or a stale .so without a newer symbol.
        return None
    _lib = lib
    return lib


def _bind(lib) -> None:
    lib.decode_kitti_bin.restype = ctypes.c_long
    lib.decode_kitti_bin.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_long]
    lib.voxel_downsample.restype = ctypes.c_long
    lib.voxel_downsample.argtypes = [ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_long, ctypes.c_float,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_long]
    lib.loader_open.restype = ctypes.c_void_p
    lib.loader_open.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                ctypes.c_long, ctypes.c_long,
                                ctypes.c_float, ctypes.c_long]
    lib.loader_next.restype = ctypes.c_long
    lib.loader_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.c_long,
                                ctypes.POINTER(ctypes.c_long)]
    lib.loader_close.restype = None
    lib.loader_close.argtypes = [ctypes.c_void_p]
    lib.decode_velodyne_packets.restype = ctypes.c_long
    lib.decode_velodyne_packets.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long]


HAVE_NATIVE = _try_load() is not None


def decode_kitti_bin(path: str, max_points: int = 200_000) -> np.ndarray:
    """Decode a KITTI velodyne .bin to [N,3] xyz float32."""
    lib = _try_load()
    if lib is None:
        raw = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
        return raw[:max_points, :3].copy()
    out = np.empty((max_points, 3), np.float32)
    n = lib.decode_kitti_bin(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_points)
    if n < 0:
        raise FileNotFoundError(path)
    return out[:n]


def voxel_downsample(points: np.ndarray, cell: float) -> np.ndarray:
    """Host-side first-point-per-voxel downsample."""
    points = np.ascontiguousarray(points, np.float32)
    lib = _try_load()
    if lib is None:
        cells = np.floor(points / cell).astype(np.int64)
        _, idx = np.unique(cells, axis=0, return_index=True)
        return points[np.sort(idx)]
    out = np.empty_like(points)
    m = lib.voxel_downsample(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(points), cell,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(points))
    return out[:m]


class PrefetchLoader:
    """Background-thread scan loader: decode (+ optional host voxel
    pre-filter) of a file list into a ring buffer.

    Iterates (index, points[N,3]) in order.  Uses the native SPSC loader
    when available; otherwise a synchronous fallback.
    """

    def __init__(self, paths: Sequence[str], max_points: int = 200_000,
                 voxel_cell: float = 0.0, depth: int = 4):
        self._paths = list(paths)
        self._max_points = max_points
        self._voxel_cell = voxel_cell
        self._lib = _try_load()
        self._handle = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self._paths))(
                *[p.encode() for p in self._paths])
            self._handle = self._lib.loader_open(
                arr, len(self._paths), max_points,
                ctypes.c_float(voxel_cell), depth)

    def __iter__(self):
        if self._handle is not None:
            buf = np.empty((self._max_points, 3), np.float32)
            idx = ctypes.c_long()
            while True:
                n = self._lib.loader_next(
                    self._handle,
                    buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    self._max_points, ctypes.byref(idx))
                if idx.value < 0:
                    break
                yield int(idx.value), buf[:n].copy()
        else:
            for i, p in enumerate(self._paths):
                pts = decode_kitti_bin(p, self._max_points)
                if self._voxel_cell > 0:
                    pts = voxel_downsample(pts, self._voxel_cell)
                yield i, pts

    def close(self):
        if self._handle is not None:
            self._lib.loader_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# Default VLP-16 elevation angles (degrees), firing order — the public
# interleaved -15..+15 pattern from the VLP-16 manual.
VLP16_ELEV_DEG = (-15.0, 1.0, -13.0, 3.0, -11.0, 5.0, -9.0, 7.0,
                  -7.0, 9.0, -5.0, 11.0, -3.0, 13.0, -1.0, 15.0)


def decode_velodyne_packets(raw: bytes,
                            elev_deg: Sequence[float] = VLP16_ELEV_DEG,
                            max_points: int = 200_000) -> np.ndarray:
    """Decode raw 1206-byte Velodyne data packets to [N,3] xyz float32.

    Re-owns the sensor front-end the reference delegates to the upstream
    ROS velodyne driver (velodyne_assembler consumes its PointCloud2
    output, velodyne_assembler_ros.cpp:57-75).  Packet layout: 12 blocks
    of (0xEEFF flag, uint16 azimuth in 0.01 deg, 32 x (uint16 distance in
    2 mm, uint8 intensity)); zero-distance returns are dropped.  Azimuth
    is interpolated per channel across the block (channel c adds
    ``gap * c/32`` of the azimuth step to the next decoded block — the
    second VLP-16 firing sequence really fires ~0.2 deg later at 600 rpm);
    dual-return packets (factory byte 0x39/0x3A/0x3B at offset 1204)
    decode only the even block of each (last, strongest) pair so points
    are not duplicated.  Feed the result per packet into
    ``pipeline.assembler.RevolutionAssembler``.
    """
    n_packets = len(raw) // 1206
    if n_packets == 0:
        return np.zeros((0, 3), np.float32)
    elev = np.deg2rad(np.asarray(elev_deg, np.float32))
    lib = _try_load()
    if lib is not None:
        data = np.frombuffer(raw, dtype=np.uint8, count=n_packets * 1206)
        out = np.empty((max_points, 3), np.float32)
        n = lib.decode_velodyne_packets(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n_packets,
            elev.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(elev),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_points)
        return out[:n].copy()
    # numpy fallback (same semantics as the native decoder)
    data = np.frombuffer(raw, dtype=np.uint8,
                         count=n_packets * 1206).reshape(n_packets, 1206)
    mode = data[:, 1204]
    dual = np.isin(mode, (0x39, 0x3A, 0x3B))
    blocks = data[:, :1200].reshape(n_packets, 12, 100)
    # Dual-return: keep only even blocks of each (last, strongest) pair.
    block_keep = np.ones((n_packets, 12), bool)
    block_keep[dual, 1::2] = False
    blocks = blocks[block_keep]              # [B,100] decode-ordered
    flag = blocks[:, 0].astype(np.uint16) | (
        blocks[:, 1].astype(np.uint16) << 8)
    az = (blocks[:, 2].astype(np.uint32) |
          (blocks[:, 3].astype(np.uint32) << 8)).astype(np.float32) * 0.01
    # Per-block azimuth gap to the next decoded block (wrap into [0,360);
    # gaps across stream discontinuities (> 10 deg) and the final block
    # reuse the previous block's gap, as in the native decoder).
    gap = np.zeros_like(az)
    if len(az) > 1:
        gap[:-1] = np.mod(az[1:] - az[:-1], 360.0)
        bad = gap > 10.0
        bad[-1] = True
        prev = 0.0
        for i in range(len(gap)):
            if bad[i]:
                gap[i] = prev
            else:
                prev = gap[i]
    rec = blocks[:, 4:100].reshape(-1, 32, 3)
    dist = (rec[..., 0].astype(np.uint32) |
            (rec[..., 1].astype(np.uint32) << 8)).astype(np.float32) * 0.002
    ch_frac = (np.arange(32, dtype=np.float32) / 32.0)[None, :]
    az_rad = np.deg2rad(az[:, None] + gap[:, None] * ch_frac)
    ch = np.arange(32) % len(elev)
    d = elev[ch][None, :]
    r = dist
    x = r * np.cos(d) * np.sin(az_rad)
    y = r * np.cos(d) * np.cos(az_rad)
    z = r * np.sin(d)
    keep = (dist > 0) & (flag == 0xEEFF)[:, None]
    pts = np.stack([x[keep], y[keep], z[keep]], axis=1).astype(np.float32)
    return pts[:max_points]

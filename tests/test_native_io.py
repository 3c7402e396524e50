"""Native IO runtime tests (C++ loader with numpy-fallback parity)."""

import os

import numpy as np
import pytest

from laser_slam_tpu import native


def write_bin(tmp_path, name, n, rng):
    pts = rng.normal(size=(n, 4)).astype(np.float32) * 10
    path = os.path.join(tmp_path, name)
    pts.tofile(path)
    return path, pts[:, :3]


def test_native_library_builds():
    # The build environment ships g++; the native path must be active.
    assert native.HAVE_NATIVE, 'liblaserslamio.so failed to build'


def test_decode_kitti_bin(tmp_path, rng):
    path, xyz = write_bin(tmp_path, '000000.bin', 1000, rng)
    got = native.decode_kitti_bin(path)
    np.testing.assert_allclose(got, xyz, rtol=1e-6)


def test_voxel_downsample(rng):
    base = rng.uniform(-10, 10, size=(100, 3)).astype(np.float32)
    dup = np.repeat(base, 5, axis=0) + \
        rng.normal(size=(500, 3)).astype(np.float32) * 0.001
    out = native.voxel_downsample(dup, 0.5)
    assert len(out) < 250
    assert len(out) >= 50


def test_prefetch_loader(tmp_path, rng):
    paths, want = [], []
    for i in range(5):
        p, xyz = write_bin(tmp_path, f'{i:06d}.bin', 200 + i, rng)
        paths.append(p)
        want.append(xyz)
    loader = native.PrefetchLoader(paths, max_points=1000)
    got = list(loader)
    loader.close()
    assert [i for i, _ in got] == list(range(5))
    for (_, pts), w in zip(got, want):
        np.testing.assert_allclose(pts, w, rtol=1e-6)


def test_prefetch_loader_with_voxel(tmp_path, rng):
    p, xyz = write_bin(tmp_path, 'a.bin', 1000, rng)
    loader = native.PrefetchLoader([p], max_points=2000, voxel_cell=2.0)
    (_, pts), = list(loader)
    loader.close()
    assert 0 < len(pts) <= 1000

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


def make_velodyne_packet(azimuths_deg, dist_m, elev_deg=native.VLP16_ELEV_DEG):
    """Encode one 1206-byte data packet: 12 blocks at the given azimuths
    (len 12), every channel at ``dist_m``."""
    pkt = bytearray(1206)
    for b, az in enumerate(azimuths_deg):
        off = b * 100
        pkt[off:off + 2] = (0xEEFF).to_bytes(2, 'little')
        pkt[off + 2:off + 4] = int(round(az * 100)).to_bytes(2, 'little')
        raw = int(round(dist_m / 0.002))
        for c in range(32):
            ro = off + 4 + c * 3
            pkt[ro:ro + 2] = raw.to_bytes(2, 'little')
            pkt[ro + 2] = 7  # intensity (ignored)
    return bytes(pkt)


def test_decode_velodyne_packets_geometry():
    """Native decode recovers range/azimuth/elevation exactly and drops
    zero-distance returns."""
    az = [0.0, 30.0, 60.0, 90.0, 120.0, 150.0,
          180.0, 210.0, 240.0, 270.0, 300.0, 330.0]
    raw = make_velodyne_packet(az, dist_m=10.0)
    pts = native.decode_velodyne_packets(raw)
    assert pts.shape == (12 * 32, 3)
    r = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(r, 10.0, atol=1e-3)
    # Elevation pattern: channel k has elevation VLP16_ELEV_DEG[k % 16].
    elev = np.degrees(np.arcsin(pts[:, 2] / r))
    want = np.asarray(native.VLP16_ELEV_DEG * 2 * 12)
    np.testing.assert_allclose(elev, want, atol=0.05)
    # Azimuth convention: x = r cos(d) sin(a), y = r cos(d) cos(a).
    got_az = np.degrees(np.arctan2(pts[:, 0], pts[:, 1])) % 360.0
    want_az = np.repeat(np.asarray(az), 32) % 360.0
    np.testing.assert_allclose(got_az % 360, want_az, atol=0.05)

    # Zero-distance returns are dropped.
    raw0 = make_velodyne_packet(az, dist_m=0.0)
    assert len(native.decode_velodyne_packets(raw0)) == 0


def test_decode_velodyne_native_matches_numpy_fallback(monkeypatch):
    az = np.linspace(0, 330, 12)
    raw = make_velodyne_packet(az, dist_m=25.5) + make_velodyne_packet(
        az + 15.0, dist_m=3.25)
    a = native.decode_velodyne_packets(raw)
    monkeypatch.setattr(native, '_try_load', lambda: None)
    b = native.decode_velodyne_packets(raw)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_velodyne_packets_through_assembler():
    """Raw packets -> native decode -> RevolutionAssembler yields one
    revolution per azimuth wrap (velodyne_assembler_ros.cpp:100-103)."""
    from laser_slam_tpu.config import AssemblerConfig
    from laser_slam_tpu.pipeline import assembler as asm
    packets = []
    t = 0
    for rev in range(3):
        for start in range(0, 360, 30):
            az = [start + 2.5 * b for b in range(12)]
            raw = make_velodyne_packet(az, dist_m=8.0)
            pts = native.decode_velodyne_packets(raw)
            packets.append(asm.Packet(time_ns=t, points=pts))
            t += 10_000_000
    out = list(asm.assemble_stream(
        packets, AssemblerConfig(naive_assembling=True)))
    # First wrap flushes the partial pre-wrap chunk, then one full
    # revolution per wrap; the final revolution stays buffered.
    assert len(out) == 3
    assert len(out[0][1]) == 384           # partial first chunk
    for _, cloud in out[1:]:
        assert len(cloud) == 12 * 12 * 32  # full revolutions

"""Sensor-native spherical scan encoding: ship ranges, derive xyz on device.

A mechanically spun LiDAR measures RANGES on a fixed (ring, azimuth)
grid; Cartesian xyz is derived data.  The reference pipeline consumes
xyz ``PointCloud2`` messages that the upstream velodyne driver expands
from raw uint16 range words (2 mm units, decoded by our packet decoder
at ``native/io.cpp``; reference consumption at
``laser_slam_ros/src/laser_slam_worker.cpp:96-107``).  Shipping those
expanded float32 triples over a bandwidth-limited host->device link
costs 12 B/point; the sensor's own encoding is 2 B/point.  On the
benched deployment (~40 MB/s tunnel) the xyz upload alone is ~39 ms for
a KITTI-density scan — more than the entire device-side SLAM step — so
the TPU-native move is to upload the uint16 range image and run the
spherical->Cartesian decode as the first fused stage of the online step
(`pipeline.online.online_step_ranges`).

Conventions match :func:`pipeline.velodyne_sim.beam_directions` (ring-
major layout, azimuth ``2*pi*(j+0.5)/n_azimuth`` from +x, elevation per
ring from the sensor's beam table): decoding a range image produced by
the beam simulator reproduces its xyz points bit-for-bit up to the
2 mm range quantization.  A range word of 0 means "no echo" (the raw
Velodyne convention), so validity rides in-band and no separate mask
is uploaded.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.ops import cloud as pc

# Native Velodyne range LSB (2 mm) — max encodable range 131.07 m.
RANGE_UNIT_M = 0.002


class BeamTable(NamedTuple):
    """Per-ring / per-column direction tables (device-resident, built
    once per sensor model — the analogue of the driver's calibration
    table).  Rings: ``sin_elev/cos_elev [B]``; azimuth columns:
    ``cos_az/sin_az [A]``."""
    sin_elev: jax.Array
    cos_elev: jax.Array
    cos_az: jax.Array
    sin_az: jax.Array


def beam_table(elev_deg, n_azimuth: int) -> BeamTable:
    """Build the decode table for a beam-model sensor.

    Mirrors :func:`velodyne_sim.beam_directions` exactly: azimuth 0 at
    +x, counter-clockwise, column centers at ``(j + 0.5) / n_azimuth``
    of a revolution.
    """
    elev = np.deg2rad(np.asarray(elev_deg, np.float64))
    az = 2.0 * np.pi * (np.arange(n_azimuth) + 0.5) / n_azimuth
    return BeamTable(
        sin_elev=jnp.asarray(np.sin(elev), jnp.float32),
        cos_elev=jnp.asarray(np.cos(elev), jnp.float32),
        cos_az=jnp.asarray(np.cos(az), jnp.float32),
        sin_az=jnp.asarray(np.sin(az), jnp.float32))


def encode_ranges(ranges_m: np.ndarray, valid: np.ndarray,
                  range_unit_m: float = RANGE_UNIT_M) -> np.ndarray:
    """Host-side encode: metric ranges [B,A] -> uint16 range words
    (0 = no echo).  Valid ranges clip to [1, 65535] units; ranges BEYOND
    the encodable ceiling (65535 units = 131.07 m at the native LSB)
    become no-echo rather than silently aliasing to the ceiling — a real
    sensor reports no return past its range limit, and a 200 m wall
    masquerading as a 131 m point would poison ICP."""
    words = np.rint(np.asarray(ranges_m, np.float64) / range_unit_m)
    over = words > np.iinfo(np.uint16).max
    words = np.clip(words, 1, np.iinfo(np.uint16).max)
    return np.where(valid & ~over, words, 0).astype(np.uint16)


def decode_range_image(ranges_u16: jax.Array, table: BeamTable,
                       range_unit_m: float = RANGE_UNIT_M) -> pc.Cloud:
    """uint16 range image [..., B, A] -> Cloud([..., B*A, 3]).

    Ring-major flattening (all azimuths of ring 0, then ring 1, ...),
    matching the raw packet order after revolution assembly.  Invalid
    (zero-range) slots are masked and parked at the sentinel.  Jittable;
    leading batch dimensions broadcast (used by the chunked ingest).
    """
    r = ranges_u16.astype(jnp.float32) * jnp.float32(range_unit_m)
    valid = ranges_u16 > 0
    xy = r * table.cos_elev[:, None]                 # horizontal projection
    pts = jnp.stack([xy * table.cos_az[None, :],
                     xy * table.sin_az[None, :],
                     r * table.sin_elev[:, None]], axis=-1)
    batch = ranges_u16.shape[:-2]
    n = ranges_u16.shape[-2] * ranges_u16.shape[-1]
    pts = pts.reshape(batch + (n, 3))
    mask = valid.reshape(batch + (n,))
    return pc.park_invalid(pc.Cloud(pts, mask))


def decode_and_pack(ranges_u16: jax.Array, table: BeamTable,
                    range_unit_m: float = RANGE_UNIT_M):
    """Decode then front-pack: returns ``(points [..., B*A, 3], n_valid)``
    in the packed-first layout :func:`pipeline.online.online_step`
    expects (valid points first, in ring-major order — the same order
    the xyz ingest path receives from the simulator/assembler, so both
    paths consume identical layouts and share rng-dependent filters)."""
    scan = decode_range_image(ranges_u16, table, range_unit_m)
    packed = pc._pack_scatter(scan, scan.points.shape[-2])
    return packed.points, scan.count().astype(jnp.int32)

"""Rosbag v2.0 container reader (pipeline/rosbag.py).

The test writes a tiny spec-conformant bag (records, connections,
chunks — uncompressed and bz2) and reads it back, mirroring the
reference's native input path (laser_slam_worker.cpp:50-51 consumes a
replayed bag's PointCloud2 topic)."""

import bz2
import struct

import numpy as np
import pytest

from laser_slam_tpu.pipeline.rosbag import (RosbagReader, RosbagStream)

_U32 = struct.Struct('<I')


# ---------------------------------------------------------------------------
# Minimal bag writer (test-side only)
# ---------------------------------------------------------------------------

def _header(fields: dict) -> bytes:
    out = b''
    for k, v in fields.items():
        item = k.encode() + b'=' + v
        out += _U32.pack(len(item)) + item
    return out


def _record(fields: dict, data: bytes) -> bytes:
    h = _header(fields)
    return _U32.pack(len(h)) + h + _U32.pack(len(data)) + data


def _time(secs, nsecs):
    return struct.pack('<II', secs, nsecs)


def _string(s: str) -> bytes:
    b = s.encode()
    return _U32.pack(len(b)) + b


def _ros_header(seq, secs, nsecs, frame) -> bytes:
    return _U32.pack(seq) + struct.pack('<II', secs, nsecs) + _string(frame)


def _pointcloud2(secs, nsecs, xyz: np.ndarray, frame='velodyne') -> bytes:
    n = len(xyz)
    fields = b'' + _U32.pack(4)
    for i, name in enumerate(('x', 'y', 'z', 'intensity')):
        fields += _string(name) + struct.pack('<IBI', 4 * i, 7, 1)
    pts = np.zeros((n, 4), np.float32)
    pts[:, :3] = xyz
    raw = pts.tobytes()
    return (_ros_header(0, secs, nsecs, frame)
            + struct.pack('<II', 1, n)            # height, width
            + fields
            + struct.pack('<B', 0)                # is_bigendian
            + struct.pack('<II', 16, 16 * n)      # point_step, row_step
            + _U32.pack(len(raw)) + raw
            + struct.pack('<B', 1))               # is_dense


def _odometry(secs, nsecs, pose7, child='base_link') -> bytes:
    qw, qx, qy, qz, tx, ty, tz = [float(v) for v in pose7]
    return (_ros_header(0, secs, nsecs, 'odom') + _string(child)
            + struct.pack('<3d', tx, ty, tz)
            + struct.pack('<4d', qx, qy, qz, qw)
            + struct.pack('<36d', *([0.0] * 36))       # pose covariance
            + struct.pack('<6d', *([0.0] * 6))         # twist
            + struct.pack('<36d', *([0.0] * 36)))      # twist covariance


def _tf_message(entries) -> bytes:
    out = _U32.pack(len(entries))
    for secs, nsecs, frame, child, pose7 in entries:
        qw, qx, qy, qz, tx, ty, tz = [float(v) for v in pose7]
        out += (_ros_header(0, secs, nsecs, frame) + _string(child)
                + struct.pack('<3d', tx, ty, tz)
                + struct.pack('<4d', qx, qy, qz, qw))
    return out


def _connection(conn_id, topic, msg_type) -> bytes:
    return _record(
        {'op': b'\x07', 'conn': _U32.pack(conn_id), 'topic': topic.encode()},
        _header({'topic': topic.encode(), 'type': msg_type.encode(),
                 'md5sum': b'0' * 32, 'message_definition': b''}))


def _message(conn_id, secs, nsecs, payload) -> bytes:
    t = struct.pack('<II', secs, nsecs)
    return _record({'op': b'\x02', 'conn': _U32.pack(conn_id),
                    'time': t}, payload)


def _chunk(inner: bytes, compression='none') -> bytes:
    data = inner if compression == 'none' else bz2.compress(inner)
    return _record({'op': b'\x05', 'compression': compression.encode(),
                    'size': _U32.pack(len(inner))}, data)


def _write_bag(path, chunks, pre_records=()):
    with open(path, 'wb') as f:
        f.write(b'#ROSBAG V2.0\n')
        f.write(_record({'op': b'\x03', 'index_pos': struct.pack('<Q', 0),
                         'conn_count': _U32.pack(2),
                         'chunk_count': _U32.pack(len(chunks))},
                        b' ' * 128))               # padded bag header
        for r in pre_records:
            f.write(r)
        for c in chunks:
            f.write(c)


@pytest.fixture
def simple_bag(tmp_path):
    rng = np.random.default_rng(3)
    scans = [rng.normal(size=(50, 3)).astype(np.float32) for _ in range(3)]
    poses = [np.array([1, 0, 0, 0, float(i), 0, 0], np.float32)
             for i in range(3)]
    inner = (_connection(0, '/velodyne_points', 'sensor_msgs/PointCloud2')
             + _connection(1, '/odom', 'nav_msgs/Odometry'))
    for i, (xyz, p7) in enumerate(zip(scans, poses)):
        inner += _message(1, 10 + i, 0, _odometry(10 + i, 0, p7))
        inner += _message(0, 10 + i, 500, _pointcloud2(10 + i, 500, xyz))
    path = tmp_path / 'test.bag'
    _write_bag(path, [_chunk(inner)])
    return str(path), scans, poses


def test_reader_decodes_pointcloud2_and_odometry(simple_bag):
    path, scans, poses = simple_bag
    msgs = list(RosbagReader(path))
    pc = [m for m in msgs if m.msg_type.endswith('PointCloud2')]
    od = [m for m in msgs if m.msg_type.endswith('Odometry')]
    assert len(pc) == 3 and len(od) == 3
    for i, m in enumerate(pc):
        stamp_ns, xyz = m.data
        assert stamp_ns == (10 + i) * 1_000_000_000 + 500
        np.testing.assert_allclose(xyz, scans[i], rtol=1e-6)
        assert m.topic == '/velodyne_points'
    for i, m in enumerate(od):
        stamp_ns, child, p7 = m.data
        assert child == 'base_link'
        np.testing.assert_allclose(p7, poses[i])


def test_reader_topic_filter(simple_bag):
    path, _, _ = simple_bag
    msgs = list(RosbagReader(path, topics={'/odom'}))
    assert len(msgs) == 3
    assert all(m.topic == '/odom' for m in msgs)


def test_bz2_chunks_and_tf(tmp_path):
    xyz = np.eye(3, dtype=np.float32)
    p7 = np.array([1, 0, 0, 0, 1, 2, 3], np.float32)
    inner = (_connection(0, '/points', 'sensor_msgs/PointCloud2')
             + _connection(1, '/tf', 'tf2_msgs/TFMessage')
             + _message(1, 5, 0, _tf_message(
                 [(5, 0, 'odom', 'base_link', p7),
                  (5, 0, 'map', 'other', p7)]))
             + _message(0, 5, 1, _pointcloud2(5, 1, xyz)))
    path = tmp_path / 'bz2.bag'
    _write_bag(path, [_chunk(inner, compression='bz2')])
    msgs = list(RosbagReader(str(path)))
    assert len(msgs) == 2
    tf = [m for m in msgs if m.msg_type.endswith('TFMessage')][0]
    assert tf.data[0][2] == 'base_link'
    np.testing.assert_allclose(tf.data[0][3], p7)
    pc = [m for m in msgs if m.msg_type.endswith('PointCloud2')][0]
    np.testing.assert_allclose(pc.data[1], xyz)


def test_unchunked_messages_and_nan_drop(tmp_path):
    """Bags written without chunking (records at top level) also read;
    NaN rows (unreturned rays of organized clouds) are dropped."""
    xyz = np.array([[1, 2, 3], [np.nan, 0, 0], [4, 5, 6]], np.float32)
    recs = (_connection(0, '/points', 'sensor_msgs/PointCloud2')
            + _message(0, 7, 0, _pointcloud2(7, 0, xyz)))
    path = tmp_path / 'flat.bag'
    _write_bag(path, [], pre_records=[recs])
    (m,) = list(RosbagReader(str(path)))
    np.testing.assert_allclose(m.data[1], xyz[[0, 2]])


def test_stream_pairs_scans_with_latest_odom(simple_bag):
    path, scans, poses = simple_bag
    frames = list(RosbagStream(path, scan_topic='/velodyne_points',
                               odom_topic='/odom'))
    assert len(frames) == 3
    for i, f in enumerate(frames):
        np.testing.assert_allclose(f.points, scans[i], rtol=1e-6)
        np.testing.assert_allclose(f.odom_pose7, poses[i])
        assert f.time_ns == (10 + i) * 1_000_000_000 + 500


def test_stream_tf_odometry(tmp_path):
    xyz = np.eye(4, 3, dtype=np.float32)
    p7 = np.array([1, 0, 0, 0, 9, 0, 0], np.float32)
    inner = (_connection(0, '/points', 'sensor_msgs/PointCloud2')
             + _connection(1, '/tf', 'tf2_msgs/TFMessage')
             + _message(1, 5, 0, _tf_message(
                 [(5, 0, 'odom', 'base_link', p7)]))
             + _message(0, 6, 0, _pointcloud2(6, 0, xyz)))
    path = tmp_path / 'tf.bag'
    _write_bag(path, [_chunk(inner)])
    frames = list(RosbagStream(str(path), scan_topic='/points',
                               tf_child_frame='base_link'))
    assert len(frames) == 1
    np.testing.assert_allclose(frames[0].odom_pose7, p7)


def _velodyne_scan(secs, nsecs, raw_packets) -> bytes:
    out = _ros_header(0, secs, nsecs, 'velodyne')
    out += _U32.pack(len(raw_packets))
    for pkt in raw_packets:
        out += struct.pack('<II', secs, nsecs) + pkt
    return out


def test_velodyne_bag_stream_assembles_revolutions(tmp_path):
    """Raw VelodyneScan packets from a bag -> native decode ->
    RevolutionAssembler: the reference's velodyne_assembler node fed
    straight from the bag (velodyne_assembler_ros.cpp:57-143)."""
    from test_native_io import make_velodyne_packet
    from laser_slam_tpu.config import AssemblerConfig
    from laser_slam_tpu.pipeline.rosbag import VelodyneBagStream

    msgs = []
    t = 0
    for rev in range(3):
        pkts = []
        for start in range(0, 360, 30):
            az = [start + 2.5 * b for b in range(12)]
            pkts.append(make_velodyne_packet(az, dist_m=8.0))
        msgs.append((10 + rev, 0, pkts))
    inner = _connection(0, '/velodyne_packets',
                        'velodyne_msgs/VelodyneScan')
    for secs, nsecs, pkts in msgs:
        inner += _message(0, secs, nsecs, _velodyne_scan(secs, nsecs, pkts))
    path = tmp_path / 'vel.bag'
    _write_bag(path, [_chunk(inner)])

    frames = list(VelodyneBagStream(
        str(path), scan_topic='/velodyne_packets',
        assembler_config=AssemblerConfig(naive_assembling=True)))
    # First wrap flushes the partial pre-wrap chunk, then full
    # revolutions (same segmentation as test_native_io's assembler test).
    assert len(frames) == 3
    assert len(frames[1].points) == 12 * 12 * 32
    r = np.linalg.norm(frames[1].points, axis=1)
    np.testing.assert_allclose(r, 8.0, atol=1e-2)


def test_bad_magic_raises(tmp_path):
    path = tmp_path / 'not.bag'
    path.write_bytes(b'hello world')
    with pytest.raises(ValueError, match='not a rosbag'):
        list(RosbagReader(str(path)))

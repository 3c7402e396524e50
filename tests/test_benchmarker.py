"""Benchmarker metrics-registry tests (reference C5 semantics)."""

import os
import time

from laser_slam_tpu.config import BenchmarkerConfig
from laser_slam_tpu.core.benchmarker import Benchmarker


def test_value_topics_statistics():
    b = Benchmarker()
    b.enable()
    for v in (1.0, 2.0, 3.0):
        b.add_value('topic/a', v)
    stats = b.statistics()
    mean, std, count = stats['topic/a']
    assert mean == 2.0 and count == 3
    assert abs(std - (2.0 / 3.0) ** 0.5) < 1e-9


def test_measurements_and_scoped(tmp_path):
    b = Benchmarker(BenchmarkerConfig(results_directory=str(tmp_path)))
    b.enable()
    b.notify_new_step()
    b.start_measurement('m')
    time.sleep(0.01)
    b.stop_measurement('m')
    b.start_measurement('ignored')
    b.stop_measurement('ignored', ignore=True)
    stats = b.statistics()
    assert stats['m'][0] >= 5.0  # >= 5ms
    assert 'ignored' not in stats


def test_disabled_records_nothing():
    b = Benchmarker()
    b.add_value('x', 1.0)
    assert b.statistics() == {}


def test_save_data_layout(tmp_path):
    b = Benchmarker(BenchmarkerConfig(results_directory=str(tmp_path)))
    b.enable()
    b.add_value('icp/time_ms', 5.0)
    b.add_value('icp/time_ms', 7.0)
    root = b.save_data()
    assert os.path.exists(os.path.join(root, 'statistics.txt'))
    series = [f for f in os.listdir(root) if f != 'statistics.txt']
    assert len(series) == 1
    with open(os.path.join(root, 'statistics.txt')) as f:
        line = f.read()
    assert 'icp/time_ms' in line and '6.0' in line


def test_reset_topic_prefix():
    b = Benchmarker()
    b.enable()
    b.add_value('a/x', 1.0)
    b.add_value('b/y', 2.0)
    b.reset_topic('a/')
    stats = b.statistics()
    assert 'a/x' not in stats and 'b/y' in stats


def test_clock():
    import time as _time
    from laser_slam_tpu.core.benchmarker import Clock
    c = Clock()
    _time.sleep(0.01)
    c.take_time()
    assert c.get_real_time() >= 9.0
    assert c.get_cpu_time() >= 0.0
    assert c.take_real_time() >= c.get_real_time() - 1e-6

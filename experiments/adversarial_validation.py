"""Measured detector precision/recall + ICP-gate rejection rates on
adversarial streams (round-4 ask #5: PARITY.md must carry rates, not just
single-detection success).

Two streams:
  revisit   two-lap off-center circle in the box room (true revisits
            exist every lap; the detector should find them)
  aliased   line through identical repeated rooms (NO true revisits:
            every candidate is a false positive; the ICP gate must
            reject them all)

Ground truth: a candidate (key_a, key_b) is a TRUE match iff the two
ground-truth positions are within GT_RADIUS_M.

Accepted = runner.detections, rejected = runner.rejected_detections (the
candidates that cleared the descriptor threshold but failed the ICP
verification gate).  Rates are computed over accepted+rejected (the
candidate pool the gate actually judged).

Run (CPU ok):  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
               PYTHONPATH=. python experiments/adversarial_validation.py
Paste the printed markdown into PARITY.md (robustness section).
"""

import numpy as np

from laser_slam_tpu.config import (EstimatorConfig, IcpConfig,
                                   InputFilterConfig, LaserTrackConfig,
                                   PlaceRecognitionConfig, SolverConfig)
from laser_slam_tpu.pipeline import online
from laser_slam_tpu.pipeline import velodyne_sim as vs

GT_RADIUS_M = 5.0


def make_runner(pr_cfg):
    est_cfg = EstimatorConfig(
        laser_track=LaserTrackConfig(
            nscan_in_sub_map=3,
            odometry_noise_model=(0.02,) * 3 + (0.05,) * 3,
            icp_noise_model=(0.01,) * 6,
            input_filters=InputFilterConfig(scan_capacity=4096),
            icp=IcpConfig(matcher='brute', reading_capacity=1024,
                          reading_sampling_ratio=0.5)),
        solver=SolverConfig(gn_iterations=2, pcg_iterations=30))
    return online.OnlineRunner(est_cfg, pose_capacity=128,
                               factor_capacity=512, archive_points=512,
                               place_recognition=pr_cfg)


def run_stream(stream, pr_cfg):
    frames = list(stream)
    r = make_runner(pr_cfg)
    for f in frames:
        r.process_scan(f.time_ns, f.points, f.odom_pose7)
    r.flush_detections()
    gt = {i: f.gt_pose7 for i, f in enumerate(frames)}

    def is_true(a, b):
        return np.linalg.norm(gt[a][4:] - gt[b][4:]) < GT_RADIUS_M

    acc = [(a, b) for a, b, *_ in r.detections]
    rej = [(a, b) for a, b, *_ in r.rejected_detections]
    tp = sum(is_true(a, b) for a, b in acc)
    fp = len(acc) - tp
    # Rejected candidates: correctly rejected (false) vs missed (true).
    rej_false = sum(not is_true(a, b) for a, b in rej)
    rej_true = len(rej) - rej_false
    return dict(n_frames=len(frames), accepted=len(acc), tp=tp, fp=fp,
                rejected=len(rej), rej_false=rej_false, rej_true=rej_true)


def main():
    pr_cfg = PlaceRecognitionConfig(detect_every=1, exclude_recent_keys=8,
                                    distance_threshold=0.30,
                                    db_capacity=128, verify_with_icp=True)

    revisit = vs.BeamStream(n_scans=32, n_beams=16, n_azimuth=512,
                            trajectory='circle', radius_m=10.0,
                            center_m=(8.0, 5.0), laps=2, odom_noise=0.01,
                            range_noise_m=0.01, seed=31)
    aliased = vs.BeamStream(n_scans=20, n_beams=16, n_azimuth=512,
                            trajectory='line', step_m=3.0,
                            scene=vs.make_repeated_rooms_scene(
                                n_rooms=3, room_spacing_m=30.0),
                            odom_noise=0.005, range_noise_m=0.01, seed=5)

    rows = []
    for name, stream in (('revisit (2-lap circle)', revisit),
                         ('aliased (repeated rooms)', aliased)):
        s = run_stream(stream, pr_cfg)
        cand = s['accepted'] + s['rejected']
        precision = (s['tp'] / s['accepted']) if s['accepted'] else 1.0
        gate_reject_rate = (s['rej_false'] / max(s['rej_false']
                                                 + s['fp'], 1))
        rows.append((name, s, cand, precision, gate_reject_rate))
        print(f"{name}: {s}", flush=True)

    print('\nMarkdown for PARITY.md:\n')
    print('| Stream | Candidates | Accepted (TP/FP) | Rejected '
          '(false/true) | Precision | Gate catch rate |')
    print('|---|---|---|---|---|---|')
    for name, s, cand, precision, gr in rows:
        print(f"| {name} | {cand} | {s['accepted']} ({s['tp']}/{s['fp']}) "
              f"| {s['rejected']} ({s['rej_false']}/{s['rej_true']}) "
              f"| {precision:.2f} | {gr:.2f} |")


if __name__ == '__main__':
    main()

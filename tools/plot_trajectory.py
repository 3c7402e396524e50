"""Plot trajectories and maps (the rviz-equivalent offline view).

The reference's observability is rviz subscriptions to the trajectory
Path and local-map PointCloud2 (laser_slam_worker.cpp:54-60,319-370);
here the same artifacts render to a PNG from exported files.

Usage:
    PYTHONPATH=. python tools/plot_trajectory.py out.png \
        --traj traj.csv [--traj traj2.csv] [--map map.xyz|map.npz] \
        [--gt gt.csv]
"""

import argparse

import numpy as np


def load_traj(path):
    m = np.atleast_2d(np.loadtxt(path, delimiter=','))
    return m  # rows: time, x, y, z


def main():
    p = argparse.ArgumentParser()
    p.add_argument('output')
    p.add_argument('--traj', action='append', default=[],
                   help='trajectory CSV (time,x,y,z); repeatable')
    p.add_argument('--gt', default=None, help='ground-truth CSV')
    p.add_argument('--map', dest='map_path', default=None,
                   help='map cloud (.xyz or occupancy .npz)')
    args = p.parse_args()

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 9))
    if args.map_path:
        if args.map_path.endswith('.npz'):
            from laser_slam_tpu.pipeline.occupancy import OccupancyGrid
            pts = OccupancyGrid.load(args.map_path).occupied_points()
        else:
            pts = np.loadtxt(args.map_path)
        if len(pts):
            ax.scatter(pts[:, 0], pts[:, 1], s=0.2, c='0.7', linewidths=0,
                       label=f'map ({len(pts)} pts)')
    for i, t in enumerate(args.traj):
        m = load_traj(t)
        ax.plot(m[:, 1], m[:, 2], '-', lw=1.5, label=f'track {i}')
        ax.plot(m[0, 1], m[0, 2], 'go', ms=6)
        ax.plot(m[-1, 1], m[-1, 2], 'rs', ms=6)
    if args.gt:
        m = load_traj(args.gt)
        ax.plot(m[:, 1], m[:, 2], 'k--', lw=1.0, label='ground truth')
    ax.set_aspect('equal')
    ax.set_xlabel('x [m]')
    ax.set_ylabel('y [m]')
    ax.legend(loc='best')
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.output, dpi=130)
    print('wrote', args.output)


if __name__ == '__main__':
    main()

"""Accuracy vs ICP iteration budget (AA-ICP motivation check).

If registration accuracy saturates well before the differential checkers
fire, capping max_iterations is a free throughput win and Anderson
acceleration has little to add; if accuracy still improves at 6+, AA is
worth prototyping.  Run ALONE.

MEASURED (TPU v5e, 16 pairs, 64k/8k observable scene, 0.3 m init noise):

    max_it   mean_iters   err mean / max (mm)
       4        4.00        34.4 / 444
       6        5.94         8.5 /  61
       8        6.69         5.0 /   7.0   <- noise floor
      40        6.88         5.0 /   7.0   <- checkers stop HERE

CONCLUSION: the differential checkers (0.001/0.01, smooth 4) already
stop at the accuracy knee — zero wasted iterations on this workload.
AA-ICP (arxiv 1709.05479) could at best save ~2 of ~7 iterations for
added divergence risk; not productized.  (An earlier version of this
experiment used a ground+parallel-walls scene that leaves x
unobservable for point-to-plane — accuracy comparisons on degenerate
scenes are meaningless; the scene below constrains all axes.)
"""

import time

import numpy as np


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
    import jax.numpy as jnp
    import laser_slam_tpu  # noqa: F401
    from laser_slam_tpu.config import IcpConfig
    from laser_slam_tpu.ops import cloud as pc
    from laser_slam_tpu.ops import icp as icp_mod
    from laser_slam_tpu.ops import se3

    REF_N, READ_N, B = 65536, 8192, 16
    rng = np.random.default_rng(11)
    # Fully observable scene: ground constrains z, y-walls constrain y,
    # x-walls constrain x (a ground+parallel-walls scene leaves x free
    # for point-to-plane and invalidates accuracy comparisons).
    q = REF_N // 4
    ground = np.stack([rng.uniform(-50, 50, 2 * q),
                       rng.uniform(-50, 50, 2 * q),
                       rng.normal(0, 0.02, 2 * q)], 1)
    walls_y = np.stack([rng.uniform(-50, 50, q),
                        np.sign(rng.normal(size=q)) * 50 +
                        rng.normal(0, 0.05, q),
                        rng.uniform(0, 8, q)], 1)
    walls_x = np.stack([np.sign(rng.normal(size=q)) * 50 +
                        rng.normal(0, 0.05, q),
                        rng.uniform(-50, 50, q),
                        rng.uniform(0, 8, q)], 1)
    world = np.concatenate([ground, walls_y, walls_x]).astype(np.float32)
    ref = pc.make_cloud(world, capacity=REF_N)
    normals = pc.estimate_normals(ref, knn=10)

    Ts, readings = [], []
    for _ in range(B):
        sel = rng.integers(0, REF_N, READ_N)
        xi = np.concatenate([rng.normal(0, 0.01, 3),
                             rng.normal(0, 0.3, 3)]).astype(np.float32)
        T = se3.exp(jnp.asarray(xi))
        pts = np.asarray(pc.transform(
            se3.inverse(T), pc.Cloud(jnp.asarray(world[sel]),
                                     jnp.ones(READ_N, bool))).points)
        Ts.append(np.asarray(T))
        readings.append(pc.make_cloud(pts, capacity=READ_N))

    for max_it in (2, 3, 4, 5, 6, 8, 12, 40):
        cfg = IcpConfig(matcher='projective', reading_capacity=READ_N,
                        reading_sampling_ratio=1.0,
                        max_iterations=max_it,
                        max_correspondence_dist_m=3.0)
        solve = jax.jit(lambda rd, c=cfg: icp_mod.icp(
            rd, ref, normals, se3.identity(), c))
        outs = [jax.block_until_ready(solve(rd)) for rd in readings]
        errs = [float(np.linalg.norm(np.asarray(
            se3.translation(o.T)) - T[4:]))
            for o, T in zip(outs, Ts)]
        iters = float(np.mean([int(o.iterations) for o in outs]))
        print(f'max_it={max_it:3d}: mean_iters={iters:5.2f} '
              f'err mean {np.mean(errs)*1000:7.2f} mm '
              f'max {np.max(errs)*1000:7.2f} mm')


if __name__ == '__main__':
    main()

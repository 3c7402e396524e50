"""ICP-level matcher comparison on TPU (64k reference / 8k reading).

Same workload as bench.py's matcher loop, minus the CPU baseline — for
fast iteration on the exact-NN tiers.  Run ALONE.

NOTE: the ground+parallel-walls scene here leaves x unobservable for
point-to-plane, which is fine for TIMING (identical work per matcher)
but meaningless for accuracy — see experiments/icp_iteration_budget.py
for an observable scene and the accuracy-vs-iterations data.
"""

import time

import numpy as np


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
    import jax.numpy as jnp  # noqa: F401
    import laser_slam_tpu  # noqa: F401
    from laser_slam_tpu.config import IcpConfig
    from laser_slam_tpu.ops import cloud as pc
    from laser_slam_tpu.ops import icp as icp_mod
    from laser_slam_tpu.ops import se3

    REF_N, READ_N, N_SOLVES = 65536, 8192, 16
    rng = np.random.default_rng(11)
    # Structured scene (planes + clutter) so normals are meaningful.
    ground = np.stack([rng.uniform(-50, 50, REF_N // 2),
                       rng.uniform(-50, 50, REF_N // 2),
                       rng.normal(0, 0.02, REF_N // 2)], 1)
    walls = np.stack([rng.uniform(-50, 50, REF_N // 2),
                      np.sign(rng.normal(size=REF_N // 2)) * 50 +
                      rng.normal(0, 0.05, REF_N // 2),
                      rng.uniform(0, 8, REF_N // 2)], 1)
    world = np.concatenate([ground, walls]).astype(np.float32)
    ref = pc.make_cloud(world, capacity=REF_N)
    normals = pc.estimate_normals(ref, knn=10)

    readings = []
    for i in range(N_SOLVES):
        sel = rng.integers(0, REF_N, READ_N)
        xi = np.concatenate([rng.normal(0, 0.01, 3),
                             rng.normal(0, 0.3, 3)]).astype(np.float32)
        T = se3.exp(jnp.asarray(xi))
        pts = np.asarray(pc.transform(se3.inverse(T),
                                      pc.Cloud(jnp.asarray(world[sel]),
                                               jnp.ones(READ_N, bool))).points)
        readings.append(pc.make_cloud(pts, capacity=READ_N))

    for matcher in ('brute', 'pallas', 'projective'):
        cfg = IcpConfig(matcher=matcher, reading_capacity=READ_N,
                        reading_sampling_ratio=1.0,
                        max_correspondence_dist_m=3.0)
        solve = jax.jit(lambda rd, c=cfg: icp_mod.icp(
            rd, ref, normals, se3.identity(), c))
        r0 = jax.block_until_ready(solve(readings[0]))
        t0 = time.perf_counter()
        outs = [solve(rd) for rd in readings]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        iters = float(np.mean([int(o.iterations) for o in outs]))
        valid = int(np.sum([int(o.valid) for o in outs]))
        print(f'{matcher:11s} {N_SOLVES / dt:7.2f} pairs/s  '
              f'mean_iters={iters:5.1f} valid={valid}/{N_SOLVES}')


if __name__ == '__main__':
    main()

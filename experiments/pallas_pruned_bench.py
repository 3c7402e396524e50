"""Morton-pruned exact-NN kernel vs the flat VPU kernel on real TPU.

VERDICT r3 item 7: the exact-NN (kd-tree-parity) tier was only ~6x CPU
(94 pairs/s); the two levers named were query-side coarse-to-fine and a
reference-tile AABB reject that skips the score loop.  This measures the
second lever — pallas_nn.nn_indices_pruned — against the flat kernel at
the bench workload (8192 queries x 65536 refs), sweeping the reference
tile size rb (pruning granularity vs per-tile overhead), on two scene
kinds:

  uniform   points uniform in a 100 m cube (bench fixture; every query
            tile touches few reference tiles -> best case for pruning)
  shell     beam-scan-like: points on room walls (the e2e workload;
            elongated tiles, moderate pruning)

Timing protocol copied from pallas_nn_bench.py: K=16 chained calls
inside one jit per device sync (the axon tunnel costs ~30 ms/sync).
The pruned timings INCLUDE the per-call query Morton sort + tile-bound
ordering (the reference sort is hoisted, as in ICP where build_pruned_ref
runs once per solve).

Run ALONE (one TPU process at a time):
    python experiments/pallas_pruned_bench.py
"""

import time

import numpy as np


def make_scene(kind: str, R: int, Q: int, rng):
    if kind == 'uniform':
        ref = rng.uniform(-50, 50, (R, 3)).astype(np.float32)
    else:  # 'shell': points on the walls/floor of a 100 m room
        n = R // 5
        u = rng.uniform(-50, 50, (R, 2)).astype(np.float32)
        z = rng.uniform(0, 8, R).astype(np.float32)
        ref = np.empty((R, 3), np.float32)
        ref[:n] = np.stack([u[:n, 0], u[:n, 1], np.zeros(n)], 1)
        ref[n:2 * n] = np.stack([u[n:2 * n, 0], np.full(n, 50.0),
                                 z[n:2 * n]], 1)
        ref[2 * n:3 * n] = np.stack([u[2 * n:3 * n, 0], np.full(n, -50.0),
                                     z[2 * n:3 * n]], 1)
        ref[3 * n:4 * n] = np.stack([np.full(n, 50.0),
                                     u[3 * n:4 * n, 1], z[3 * n:4 * n]], 1)
        ref[4 * n:] = np.stack([np.full(R - 4 * n, -50.0),
                                u[4 * n:, 1], z[4 * n:]], 1)
    queries = (ref[rng.integers(0, R, Q)]
               + rng.normal(0, 0.05, (Q, 3))).astype(np.float32)
    return ref, queries


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
    import jax.numpy as jnp
    import laser_slam_tpu  # noqa: F401
    from laser_slam_tpu.ops import pallas_nn

    Q, R = 8192, 65536
    K = 16
    interp = not pallas_nn.on_tpu()
    print(f'backend={jax.default_backend()} device={jax.devices()[0]}')

    def timed(name, op, q, reps=8):
        @jax.jit
        def chained(q0):
            def body(carry, _):
                d2 = op(carry)
                return carry + 0.0 * d2[:, None], d2
            carry, d2s = jax.lax.scan(body, q0, None, length=K)
            return d2s[-1]
        out = jax.block_until_ready(chained(q))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(chained(q))
            times.append((time.perf_counter() - t0) * 1e3 / K)
        print(f'  {name:24s} {np.median(times):8.3f} ms/call  '
              f'(min {np.min(times):.3f})')
        return np.asarray(out), float(np.median(times))

    rng = np.random.default_rng(3)
    for kind in ('uniform', 'shell'):
        ref_np, q_np = make_scene(kind, R, Q, rng)
        q = jnp.asarray(q_np)
        r = jnp.asarray(ref_np)
        print(f'\n== scene={kind} Q={Q} R={R} cutoff=3.0 ==')
        d2_flat, t_flat = timed('flat nn_indices', lambda qq: (
            pallas_nn.nn_indices(qq, r, interpret=interp)[0]), q)
        for rb in (1024, 2048, 4096):
            pref = pallas_nn.build_pruned_ref(r, rb=rb)
            jax.block_until_ready(pref)
            d2_pr, t_pr = timed(
                f'pruned rb={rb}', lambda qq, p=pref: (
                    pallas_nn.nn_indices_pruned(qq, p, cutoff=3.0,
                                                interpret=interp)[0]), q)
            inside = d2_flat <= 9.0
            np.testing.assert_allclose(d2_pr[inside], d2_flat[inside],
                                       atol=1e-2)
            assert np.all(d2_pr[~inside] > 9.0)
            print(f'    -> {t_flat / t_pr:.2f}x vs flat (exact inside '
                  f'radius: {int(inside.sum())}/{Q} verified)')


if __name__ == '__main__':
    main()

"""Milestone F microbench: Pallas NN kernels vs XLA brute on real TPU.

The ICP correspondence workload (VERDICT r1 item 6): 8192 query points
against a 65536-point reference map, payload = [point | normal] (6 f32).
Measures, per variant, median ms per call over `reps` calls:

  brute       neighbors.nn_brute (XLA matmul + running argmin) + gather
  payload     pallas_nn.nn_payload (one-hot payload matmul, no gathers)
  pruned      pallas_nn.nn_payload_pruned (Morton + AABB tile skipping)
  indices     pallas_nn.nn_indices (VPU argmin) + XLA payload gather

Decision rule: a pallas variant must beat brute by >=2x to stay the
`pallas` matcher default; otherwise the kernels get demoted to this
experiments dir (docs/design.md records the negative result).

Run ALONE (one TPU process at a time):  python experiments/pallas_nn_bench.py
"""

import time

import numpy as np


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
    import jax.numpy as jnp
    import laser_slam_tpu  # noqa: F401  (sets matmul precision)
    from laser_slam_tpu.ops import neighbors, pallas_nn

    Q, R = 8192, 65536
    rng = np.random.default_rng(3)
    ref = rng.uniform(-50, 50, (R, 3)).astype(np.float32)
    nrm = rng.standard_normal((R, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    queries = (ref[rng.integers(0, R, Q)] +
               rng.normal(0, 0.05, (Q, 3))).astype(np.float32)

    q = jnp.asarray(queries)
    r = jnp.asarray(ref)
    payload = jnp.asarray(np.concatenate([ref, nrm], axis=1))
    on_tpu = pallas_nn.on_tpu()
    print(f'backend={jax.default_backend()} device={jax.devices()[0]}')

    def timed(name, fn, reps=20):
        out = jax.block_until_ready(fn())  # compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn())
            times.append((time.perf_counter() - t0) * 1e3)
        print(f'{name:10s} {np.median(times):8.3f} ms  '
              f'(min {np.min(times):.3f})')
        return out, float(np.median(times))

    brute = jax.jit(lambda: (lambda i_d: (payload[i_d[0]], i_d[1]))(
        neighbors.nn_brute(q, r)))
    (pay_b, d2_b), t_brute = timed('brute', brute)

    results = {'brute': t_brute}
    if on_tpu or True:  # interpret mode off-TPU is slow but correct
        interp = not on_tpu
        payload_fn = jax.jit(lambda: pallas_nn.nn_payload(
            q, r, payload, interpret=interp))
        (d2_p, pay_p), t_pay = timed('payload', payload_fn,
                                     reps=20 if on_tpu else 1)
        np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_b),
                                   atol=1e-2)
        results['payload'] = t_pay

        pruned_fn = jax.jit(lambda: pallas_nn.nn_payload_pruned(
            q, r, payload, interpret=interp))
        (d2_r, pay_r), t_pr = timed('pruned', pruned_fn,
                                    reps=20 if on_tpu else 1)
        results['pruned'] = t_pr

        idx_fn = jax.jit(lambda: (lambda d_i: (d_i[0], payload[d_i[1]]))(
            pallas_nn.nn_indices(q, r, interpret=interp)))
        (d2_i, pay_i), t_idx = timed('indices', idx_fn,
                                     reps=20 if on_tpu else 1)
        np.testing.assert_allclose(np.asarray(d2_i), np.asarray(d2_b),
                                   atol=1e-2)
        results['indices'] = t_idx

        # Kernel alone (no payload fetch) to isolate the gather cost.
        kern_fn = jax.jit(lambda: pallas_nn.nn_indices(
            q, r, interpret=interp))
        _, t_kern = timed('idx-kernel', kern_fn, reps=20 if on_tpu else 1)
        results['idx_kernel'] = t_kern

    best = min((v, k) for k, v in results.items() if k != 'brute')
    print(f'\nbest pallas: {best[1]} at {best[0]:.3f} ms '
          f'-> {t_brute / best[0]:.2f}x vs brute '
          f'({">=2x PASS" if t_brute / best[0] >= 2 else "FAIL"})')


if __name__ == '__main__':
    main()

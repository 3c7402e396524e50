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
    import importlib.util
    import os

    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
    import jax.numpy as jnp
    import laser_slam_tpu  # noqa: F401  (sets matmul precision)
    from laser_slam_tpu.ops import neighbors, pallas_nn

    # Demoted payload kernels live beside this script, not in the package.
    spec = importlib.util.spec_from_file_location(
        'payload_variants',
        os.path.join(os.path.dirname(__file__),
                     'pallas_payload_variants.py'))
    payload_variants = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(payload_variants)

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

    # Host<->device sync over the axon tunnel costs ~30 ms, swamping a
    # single kernel call.  Amortize: K chained applications inside ONE
    # jit (a data dependency through the carry defeats CSE/hoisting),
    # one device sync per measurement.
    K = 16

    def timed(name, op, reps=8):
        """op: q [Q,3] -> d2 [Q] (plus whatever else).  Times K chained
        calls per sync; reports ms per single call."""
        @jax.jit
        def chained(q0):
            def body(carry, _):
                d2 = op(carry)
                return carry + 0.0 * d2[:, None], d2
            carry, d2s = jax.lax.scan(body, q0, None, length=K)
            return d2s[-1]
        out = jax.block_until_ready(chained(q))  # compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(chained(q))
            times.append((time.perf_counter() - t0) * 1e3 / K)
        print(f'{name:10s} {np.median(times):8.3f} ms/call  '
              f'(min {np.min(times):.3f})')
        return out, float(np.median(times))

    interp = not on_tpu
    d2_b, t_brute = timed('brute', lambda qq: (
        lambda i_d: payload[i_d[0]][:, 0] * 0.0 + i_d[1])(
            neighbors.nn_brute(qq, r)))

    results = {'brute': t_brute}

    d2_p, t_pay = timed('payload', lambda qq: (
        lambda d_p: d_p[0] + 0.0 * d_p[1][:, 0])(
            payload_variants.nn_payload(qq, r, payload, interpret=interp)))
    np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_b),
                               atol=1e-2)
    results['payload'] = t_pay

    _, t_pr = timed('pruned', lambda qq: (
        lambda d_p: d_p[0] + 0.0 * d_p[1][:, 0])(
            payload_variants.nn_payload_pruned(qq, r, payload, interpret=interp)))
    results['pruned'] = t_pr

    d2_i, t_idx = timed('indices', lambda qq: (
        lambda d_i: d_i[0] + 0.0 * payload[d_i[1]][:, 0])(
            pallas_nn.nn_indices(qq, r, interpret=interp)))
    np.testing.assert_allclose(np.asarray(d2_i), np.asarray(d2_b),
                               atol=1e-2)
    results['indices'] = t_idx

    # Kernel alone (no payload fetch) to isolate the gather cost.
    _, t_kern = timed('idx-kernel', lambda qq: pallas_nn.nn_indices(
        qq, r, interpret=interp)[0])
    results['idx_kernel'] = t_kern

    best = min((v, k) for k, v in results.items() if k != 'brute')
    print(f'\nbest pallas: {best[1]} at {best[0]:.3f} ms '
          f'-> {t_brute / best[0]:.2f}x vs brute '
          f'({">=2x PASS" if t_brute / best[0] >= 2 else "FAIL"})')


if __name__ == '__main__':
    main()

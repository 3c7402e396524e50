"""Tile-size sweep for the VPU-broadcast exact-NN kernel.  Run ALONE.

The shipped nn_indices uses 256x2048 tiles.  Sweep QB x RB over the
8192 x 65536 workload to check for headroom.
"""

import functools
import time

import numpy as np


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import laser_slam_tpu  # noqa: F401
    from laser_slam_tpu.ops import pallas_nn

    Q, R = 8192, 65536
    rng = np.random.default_rng(3)
    ref = rng.uniform(-50, 50, (R, 3)).astype(np.float32)
    queries = (ref[rng.integers(0, R, Q)] +
               rng.normal(0, 0.05, (Q, 3))).astype(np.float32)
    q = jnp.asarray(queries)
    r = jnp.asarray(ref)
    K = 16

    def timed(name, op, reps=8):
        @jax.jit
        def chained(q0):
            def body(carry, _):
                d2 = op(carry)
                return carry + 0.0 * d2[:, None], d2
            _, d2s = jax.lax.scan(body, q0, None, length=K)
            return d2s[-1]
        out = jax.block_until_ready(chained(q))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(chained(q))
            ts.append((time.perf_counter() - t0) * 1e3 / K)
        print(f'{name:14s} {np.median(ts):7.3f} ms/call (min {np.min(ts):.3f})')
        return np.asarray(out), float(np.median(ts))

    kern = pallas_nn._nn_idx_kernel

    @functools.partial(jax.jit, static_argnames=('qb', 'rb'))
    def nn_tiled(queries, ref_points, qb, rb):
        q_ext = jnp.concatenate(
            [queries, jnp.zeros((Q, 5), jnp.float32)], axis=1)
        r_t = jnp.concatenate(
            [ref_points.T, jnp.zeros((5, R), jnp.float32)], axis=0)
        d2, idx = pl.pallas_call(
            kern,
            grid=(Q // qb, R // rb),
            in_specs=[
                pl.BlockSpec((qb, 8), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, rb), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((qb, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((qb, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Q, 1), jnp.float32),
                jax.ShapeDtypeStruct((Q, 1), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((qb, 1), jnp.float32),
                pltpu.VMEM((qb, 1), jnp.int32),
            ],
        )(q_ext, r_t)
        return d2[:, 0]

    base, _ = timed('256x2048*', lambda qq: pallas_nn.nn_indices(qq, r)[0])
    for qb, rb in ((128, 2048), (256, 1024), (256, 4096), (512, 2048),
                   (512, 4096), (1024, 2048), (128, 8192), (8192, 65536)):
        try:
            out, _ = timed(f'{qb}x{rb}', lambda qq, a=qb, b=rb: nn_tiled(
                qq, r, a, b))
            np.testing.assert_allclose(out, base, atol=1e-3)
        except Exception as e:
            print(f'{qb}x{rb}: failed ({type(e).__name__})')


if __name__ == '__main__':
    main()

"""Kernel-variant shootout for the exact-NN tier (milestone F).

Variants over the 8192-query / 65536-ref workload:
  indices-hi   nn_indices as shipped (dot_general inherits the global
               HIGHEST matmul precision -> 6 bf16 passes on the MXU)
  indices-bf16   same kernel, precision=HIGH (1 bf16 pass, rank-only fidelity)
  vpu          NEW: scores via VPU broadcast (q-r)^2 — no MXU, exact f32,
               no 128-deep contraction padding waste
Run ALONE:  python experiments/pallas_nn_variants.py
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
    from laser_slam_tpu.ops import neighbors, pallas_nn

    Q, R = 8192, 65536
    QB, RB = 256, 2048
    rng = np.random.default_rng(3)
    ref = rng.uniform(-50, 50, (R, 3)).astype(np.float32)
    queries = (ref[rng.integers(0, R, Q)] +
               rng.normal(0, 0.05, (Q, 3))).astype(np.float32)
    q = jnp.asarray(queries)
    r = jnp.asarray(ref)
    interp = not pallas_nn.on_tpu()
    print(f'backend={jax.default_backend()}')

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
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(chained(q))
            times.append((time.perf_counter() - t0) * 1e3 / K)
        print(f'{name:12s} {np.median(times):8.3f} ms/call '
              f'(min {np.min(times):.3f})')
        return np.asarray(out), float(np.median(times))

    # Ground truth from the existing brute path.
    d2_ref, t_brute = timed('brute', lambda qq: neighbors.nn_brute(qq, r)[1])

    # The MXU-matmul nn_indices now lives with the demoted kernels.
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        'payload_variants',
        os.path.join(os.path.dirname(__file__),
                     'pallas_payload_variants.py'))
    payload_variants = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(payload_variants)
    _, t_hi = timed('indices-hi', lambda qq: payload_variants.nn_indices(
        qq, r, interpret=interp)[0])

    # --- precision variants of the MXU score matmul --------------------
    def make_idx_kernel(precision):
        def kern(q_ref, r_ref, d2_ref, idx_ref, best_score, best_idx):
            j = pl.program_id(1)
            nj = pl.num_programs(1)

            @pl.when(j == 0)
            def _():
                best_score[:] = jnp.full_like(best_score, jnp.inf)
                best_idx[:] = jnp.zeros_like(best_idx)

            s = jax.lax.dot_general(
                q_ref[:], r_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            tile_min = jnp.min(s, axis=1, keepdims=True)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            rb = s.shape[1]
            tile_arg = jnp.min(jnp.where(s <= tile_min, col, rb), axis=1,
                               keepdims=True)
            take = tile_min < best_score[:]
            best_score[:] = jnp.where(take, tile_min, best_score[:])
            best_idx[:] = jnp.where(take, tile_arg + j * rb, best_idx[:])

            @pl.when(j == nj - 1)
            def _():
                d2_ref[:] = best_score[:]
                idx_ref[:] = best_idx[:]
        return kern

    @functools.partial(jax.jit, static_argnames=('precision',))
    def nn_idx_prec(queries, ref_points, precision):
        q_norm2 = jnp.sum(queries * queries, axis=1, keepdims=True)
        q_ext = jnp.concatenate(
            [queries, jnp.ones((Q, 1), jnp.float32),
             jnp.zeros((Q, 4), jnp.float32)], axis=1)
        r_ext = jnp.concatenate(
            [-2.0 * ref_points,
             jnp.sum(ref_points * ref_points, axis=1, keepdims=True),
             jnp.zeros((R, 4), jnp.float32)], axis=1)
        d2, idx = pl.pallas_call(
            make_idx_kernel(precision),
            grid=(Q // QB, R // RB),
            in_specs=[
                pl.BlockSpec((QB, 8), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, 8), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((QB, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((QB, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Q, 1), jnp.float32),
                jax.ShapeDtypeStruct((Q, 1), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((QB, 1), jnp.float32),
                pltpu.VMEM((QB, 1), jnp.int32),
            ],
            interpret=interp,
        )(q_ext, r_ext)
        return jnp.maximum(d2 + q_norm2, 0.0)[:, 0], idx[:, 0]

    d2_p3, t_p3 = timed('indices-bf16', lambda qq: nn_idx_prec(
        qq, r, jax.lax.Precision.DEFAULT)[0])
    print(f'  bf16 max |d2 - ref| = {np.max(np.abs(d2_p3 - d2_ref)):.2e}')

    # --- VPU broadcast variant ----------------------------------------
    def vpu_kernel(q_ref, rt_ref, d2_ref, idx_ref, best_score, best_idx):
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            best_score[:] = jnp.full_like(best_score, jnp.inf)
            best_idx[:] = jnp.zeros_like(best_idx)

        qt = q_ref[:]       # [QB, 8] xyz in cols 0..2
        rt = rt_ref[:]      # [8, RB] xyz in rows 0..2 (transposed layout)
        dx = qt[:, 0:1] - rt[0:1, :]
        dy = qt[:, 1:2] - rt[1:2, :]
        dz = qt[:, 2:3] - rt[2:3, :]
        s = dx * dx + dy * dy + dz * dz          # [QB, RB] exact f32
        tile_min = jnp.min(s, axis=1, keepdims=True)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        rb = s.shape[1]
        tile_arg = jnp.min(jnp.where(s <= tile_min, col, rb), axis=1,
                           keepdims=True)
        take = tile_min < best_score[:]
        best_score[:] = jnp.where(take, tile_min, best_score[:])
        best_idx[:] = jnp.where(take, tile_arg + j * rb, best_idx[:])

        @pl.when(j == nj - 1)
        def _():
            d2_ref[:] = best_score[:]
            idx_ref[:] = best_idx[:]

    @jax.jit
    def nn_vpu(queries, ref_points):
        q_ext = jnp.concatenate(
            [queries, jnp.zeros((Q, 5), jnp.float32)], axis=1)
        r_t = jnp.concatenate(
            [ref_points.T, jnp.zeros((5, R), jnp.float32)], axis=0)
        d2, idx = pl.pallas_call(
            vpu_kernel,
            grid=(Q // QB, R // RB),
            in_specs=[
                pl.BlockSpec((QB, 8), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, RB), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((QB, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((QB, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Q, 1), jnp.float32),
                jax.ShapeDtypeStruct((Q, 1), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((QB, 1), jnp.float32),
                pltpu.VMEM((QB, 1), jnp.int32),
            ],
            interpret=interp,
        )(q_ext, r_t)
        return d2[:, 0], idx[:, 0]

    d2_v, t_vpu = timed('vpu', lambda qq: nn_vpu(qq, r)[0])
    print(f'  vpu max |d2 - ref| = {np.max(np.abs(d2_v - d2_ref)):.2e}')

    for name, t in (('indices-hi', t_hi), ('indices-bf16', t_p3),
                    ('vpu', t_vpu)):
        print(f'{name}: {t_brute / t:.2f}x vs brute')


if __name__ == '__main__':
    main()

"""Stage-by-stage device timing of the online step at KITTI density
(131k raw -> 32k store -> 8k reading, 64x1024 range image).  The e2e
bench shows ~40 ms/scan of device compute at this density vs ~1 ms at
16k; this pins down which stage scales badly.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" \
     JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
     python experiments/kitti_step_profile.py
"""
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from laser_slam_tpu.pipeline import online
from laser_slam_tpu.pipeline import velodyne_sim as vs
from laser_slam_tpu.ops import cloud as pc
from laser_slam_tpu.ops import icp as icp_mod
from laser_slam_tpu.ops import range_image as ri
from laser_slam_tpu.ops import se3
from experiments.chunked_e2e import beam_cfg


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f'{name:42s} {np.median(ts)*1e3:8.2f} ms', flush=True)
    return out


def main():
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_tpu_cache')
    print('device:', jax.devices()[0].device_kind, flush=True)

    sk = vs.BeamStream(n_scans=16, n_beams=64, n_azimuth=2048,
                       trajectory='circle', radius_m=20.0,
                       world_size_m=80.0, range_noise_m=0.01,
                       odom_noise=0.005, seed=12)
    frames = list(sk)
    cfg = beam_cfg(131072, 32768, 1024, 1024)
    lt = cfg.laser_track
    f = lt.input_filters

    r = online.OnlineRunner(cfg, pose_capacity=2048, factor_capacity=8192)
    for fr in frames[:8]:
        r.process_scan(fr.time_ns, fr.points, fr.odom_pose7)
    jax.block_until_ready(r.state.traj_poses)
    state = r.state

    fr = frames[8]
    pts_np = np.full((131072, 3), pc.SENTINEL, np.float32)
    n = min(len(fr.points), 131072)
    pts_np[:n] = np.asarray(fr.points, np.float32)[:n]
    points = jax.device_put(pts_np)
    n_valid = jnp.int32(n)
    rng = jax.random.PRNGKey(0)

    # full step for reference
    od = jax.device_put(np.asarray(fr.odom_pose7, np.float32))

    def full(st):
        st2, _ = online.online_step(st, points, n_valid, od, r.config, 0)
        return st2.traj_poses
    # can't donate state repeatedly; copy each call via jax.tree (cheap HBM)
    st_copy = jax.tree.map(jnp.array, state)
    out = online.online_step(st_copy, points, n_valid, od, r.config, 0)
    jax.block_until_ready(out[0].traj_poses)
    ts = []
    for _ in range(5):
        st_copy = jax.tree.map(jnp.array, state)
        jax.block_until_ready(st_copy)
        t0 = time.perf_counter()
        out = online.online_step(st_copy, points, n_valid, od, r.config, 0)
        jax.block_until_ready(out[0].traj_poses)
        ts.append(time.perf_counter() - t0)
    print(f'{"FULL online_step":42s} {np.median(ts)*1e3:8.2f} ms', flush=True)

    # --- stage 1: ingest filters ------------------------------------
    @jax.jit
    def ingest(points, n_valid, rng):
        mask = jnp.arange(points.shape[0]) < n_valid
        scan = pc.Cloud(jnp.where(mask[:, None], points, pc.SENTINEL), mask)
        if f.chain:
            scan = pc.apply_filter_chain(scan, f.chain, rng)
        else:
            scan = pc.range_filter(scan, f.min_distance_m, f.max_distance_m)
            if f.random_sampling_ratio < 1.0:
                scan = pc.random_sampling_filter(
                    scan, f.random_sampling_ratio, rng)
        return scan
    scan131 = timeit('ingest filters (131k)', ingest, points, n_valid, rng)

    # --- stage 2: compact_decimate 131k -> 32k ----------------------
    cd = jax.jit(functools.partial(pc.compact_decimate, capacity=32768))
    scan32 = timeit('compact_decimate 131k->32k', cd, scan131)

    # --- stage 3: normals (image_pca 32x1024) on 32k store ----------
    nrm_fn = jax.jit(lambda s: ri.compute_normals(s, lt.icp))
    normals = timeit('compute_normals image_pca (32k)', nrm_fn, scan32)

    # --- stage 4: submap assembly (ring 5 x 32k transform) ----------
    @jax.jit
    def assemble(state):
        track_id = 0
        prev_traj = state.traj_poses[state.track_last_key[track_id]]
        T_a_w = se3.inverse(prev_traj)
        ring_keys = state.ring_keys[track_id]
        ring_points = state.ring_points[track_id]
        ring_mask = state.ring_mask[track_id]
        ring_normals = state.ring_normals[track_id]
        ring_rel = jax.vmap(lambda k: jnp.where(
            k >= 0,
            se3.compose(T_a_w, state.traj_poses[jnp.maximum(k, 0)]),
            se3.identity()))(ring_keys)
        pts = se3.apply(ring_rel[:, None, :], ring_points)
        nrm = se3.quat_rotate(ring_rel[:, None, :4], ring_normals)
        K, N, _ = ring_points.shape
        submap = pc.Cloud(
            jnp.where(ring_mask[..., None], pts,
                      pc.SENTINEL).reshape(K * N, 3),
            ring_mask.reshape(K * N))
        return submap, nrm.reshape(K * N, 3)
    submap, submap_normals = timeit('submap assembly (5x32k)', assemble,
                                    state)

    # --- stage 5: reading prep (sample + decimate -> 8192) ----------
    @jax.jit
    def reading_prep(scan, rng):
        reading = scan
        if lt.icp.reading_sampling_ratio < 1.0:
            reading = pc.random_sampling_filter(
                reading, lt.icp.reading_sampling_ratio, rng)
        return pc.compact_decimate(reading, lt.icp.reading_capacity)
    reading = timeit('reading prep 32k->8k', reading_prep, scan32, rng)

    # --- stage 6: ICP -----------------------------------------------
    guess = jax.device_put(np.asarray(se3.identity(), np.float32))
    icp_fn = jax.jit(lambda rd, sm, nm, g: icp_mod.icp_point_to_plane(
        rd, sm, nm, g, lt.icp))
    timeit('icp_point_to_plane (proj, 8k vs 163k)', icp_fn, reading,
           submap, submap_normals, guess)

    # --- stage 7: window solve --------------------------------------
    ws = jax.jit(lambda st: online._window_solve(st, st.n_poses - 1,
                                                 r.config)[0])
    timeit('window solve (64)', ws, state)

    # --- stage 8: ring push -----------------------------------------
    @jax.jit
    def ring_push(state, scan, normals):
        track_id = 0
        return state.ring_points.at[track_id].set(
            jnp.roll(state.ring_points[track_id], -1, axis=0)
            .at[-1].set(scan.points)), state.ring_normals.at[track_id].set(
            jnp.roll(state.ring_normals[track_id], -1, axis=0)
            .at[-1].set(normals))
    timeit('ring push (5x32k roll)', ring_push, state, scan32, normals)


if __name__ == '__main__':
    main()

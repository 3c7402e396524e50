"""Pallas NN kernel tests (interpret mode on CPU) vs the brute matcher."""

import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.config import IcpConfig
from laser_slam_tpu.ops import cloud as pc
from laser_slam_tpu.ops import icp as icp_mod
from laser_slam_tpu.ops import neighbors as nb
from laser_slam_tpu.ops import pallas_nn
from laser_slam_tpu.ops import se3


def test_nn_indices_matches_brute(rng):
    ref = rng.normal(size=(4096, 3)).astype(np.float32) * 5
    q = rng.normal(size=(512, 3)).astype(np.float32) * 5
    d2, idx = pallas_nn.nn_indices(jnp.asarray(q), jnp.asarray(ref),
                                   interpret=True)
    bi, bd2 = nb.nn_brute(jnp.asarray(q), jnp.asarray(ref))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(bi))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(bd2), atol=1e-3)


def test_nn_indices_awkward_shapes(rng):
    """Shapes that don't divide the preferred 256x2048 tiles still work
    (the tile picker falls back to divisors)."""
    ref = rng.normal(size=(1536, 3)).astype(np.float32) * 5
    q = rng.normal(size=(192, 3)).astype(np.float32) * 5
    d2, idx = pallas_nn.nn_indices(jnp.asarray(q), jnp.asarray(ref),
                                   interpret=True)
    bi, bd2 = nb.nn_brute(jnp.asarray(q), jnp.asarray(ref))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(bi))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(bd2), atol=1e-3)


def test_nn_indices_ignores_parked_ref(rng):
    """SENTINEL-parked reference rows can never win for a real query."""
    ref_valid = rng.normal(size=(100, 3)).astype(np.float32)
    ref = pc.make_cloud(ref_valid, capacity=128)
    q = jnp.asarray(ref_valid[:64] + 0.01)
    d2, idx = pallas_nn.nn_indices(q, ref.points, interpret=True)
    assert np.all(np.asarray(idx) < 100)
    assert np.all(np.asarray(d2) < 1.0)


def test_icp_pallas_matcher_matches_brute(rng):
    n = 512
    n4 = n // 4
    pts = np.concatenate([
        np.stack([rng.uniform(-10, 10, n4), rng.uniform(-10, 10, n4),
                  np.zeros(n4)], 1),
        np.stack([rng.uniform(-10, 10, n4), np.full(n4, 10.0),
                  rng.uniform(0, 5, n4)], 1),
        np.stack([np.full(n4, -10.0), rng.uniform(-10, 10, n4),
                  rng.uniform(0, 5, n4)], 1),
        np.stack([rng.uniform(2, 4, n - 3 * n4), rng.uniform(2, 4, n - 3 * n4),
                  np.full(n - 3 * n4, 2.0)], 1),
    ]).astype(np.float32)
    pts[:, 2] -= 1.0
    ref = pc.make_cloud(pts, capacity=512)
    normals = pc.estimate_normals(ref, knn=10)
    T_true = se3.exp(jnp.asarray([0.02, -0.01, 0.04, 0.2, -0.1, 0.05],
                                 jnp.float32))
    reading = pc.transform(se3.inverse(T_true), ref)

    res_b = icp_mod.icp(reading, ref, normals, se3.identity(),
                        IcpConfig(matcher='brute'))
    res_p = icp_mod.icp(reading, ref, normals, se3.identity(),
                        IcpConfig(matcher='pallas'))
    assert bool(res_p.valid)
    # Same algorithm, same correspondences: results must agree closely.
    np.testing.assert_allclose(np.asarray(res_p.T), np.asarray(res_b.T),
                               atol=1e-3)
    err_t = np.linalg.norm(np.asarray(
        se3.translation(res_p.T) - se3.translation(T_true)))
    assert err_t < 0.01, err_t


def test_nn_pruned_matches_brute_within_radius(rng):
    """Pruned kernel is exact for every query with a neighbor inside the
    cutoff; beyond-cutoff queries report d2=inf (kd-tree maxDist
    semantics, icp_default.yaml:11-14)."""
    ref = rng.normal(size=(4096, 3)).astype(np.float32) * 5
    q = rng.normal(size=(512, 3)).astype(np.float32) * 5
    cutoff = 1.0
    pref = pallas_nn.build_pruned_ref(jnp.asarray(ref))
    d2, idx = pallas_nn.nn_indices_pruned(jnp.asarray(q), pref,
                                          cutoff=cutoff, interpret=True)
    bi, bd2 = nb.nn_brute(jnp.asarray(q), jnp.asarray(ref))
    d2 = np.asarray(d2)
    idx = np.asarray(idx)
    bd2 = np.asarray(bd2)
    bi = np.asarray(bi)
    perm = np.asarray(pref.perm)
    inside = bd2 <= cutoff ** 2
    assert inside.sum() > 50  # the fixture must exercise both branches
    # Within radius: same winner (sorted idx maps back via perm).
    np.testing.assert_array_equal(perm[idx[inside]], bi[inside])
    np.testing.assert_allclose(d2[inside], bd2[inside], atol=1e-3)
    # Outside: flagged unmatchable.
    assert np.all(d2[~inside] > cutoff ** 2)


def test_nn_pruned_small_tiles_many_prunable(rng):
    """Clustered scene: most reference tiles lie far outside the radius
    of most query tiles, exercising the aliased-DMA prune path."""
    clusters = rng.uniform(-40, 40, size=(16, 3)).astype(np.float32)
    ref = (clusters[:, None, :]
           + rng.normal(size=(16, 256, 3)).astype(np.float32)).reshape(-1, 3)
    q = (clusters[:4, None, :]
         + rng.normal(size=(4, 128, 3)).astype(np.float32)).reshape(-1, 3)
    pref = pallas_nn.build_pruned_ref(jnp.asarray(ref), rb=256)
    d2, idx = pallas_nn.nn_indices_pruned(jnp.asarray(q), pref,
                                          cutoff=3.0, interpret=True)
    d2, idx = np.asarray(d2), np.asarray(idx)
    perm = np.asarray(pref.perm)
    # Exact float64 oracle: nn_brute's matmul form carries ~4e-4 m^2
    # error at 40 m scene scale, enough to flip near-ties; the pruned
    # kernel is coordinate-wise exact and must match the true winner.
    full = ((q[:, None].astype(np.float64)
             - ref[None].astype(np.float64)) ** 2).sum(-1)
    bi = full.argmin(1)
    bd2 = full.min(1)
    inside = bd2 <= 9.0
    assert inside.sum() > 400  # fixture sanity: clusters overlap
    np.testing.assert_array_equal(perm[idx[inside]], bi[inside])
    np.testing.assert_allclose(d2[inside], bd2[inside], atol=1e-3)
    assert np.all(d2[~inside] > 9.0)


def test_nn_pruned_parked_rows(rng):
    """SENTINEL-parked rows: real queries only ever win valid reference
    rows; parked queries either report unmatchable (d2=inf) or match a
    parked reference row (d2=0 at SENTINEL) — both harmless because the
    ICP residual masks invalid queries (icp.py match_payload msk)."""
    ref_valid = rng.normal(size=(100, 3)).astype(np.float32)
    ref = pc.make_cloud(ref_valid, capacity=128)
    pref = pallas_nn.build_pruned_ref(ref.points)
    q = jnp.concatenate([jnp.asarray(ref_valid[:64] + 0.01),
                         jnp.full((64, 3), pc.SENTINEL)], axis=0)
    d2, idx = pallas_nn.nn_indices_pruned(q, pref, cutoff=3.0,
                                          interpret=True)
    d2, idx = np.asarray(d2), np.asarray(idx)
    perm = np.asarray(pref.perm)
    assert np.all(perm[idx[:64]] < 100)
    assert np.all(d2[:64] < 1.0)
    # Parked queries never claim a VALID reference row within radius.
    assert np.all((perm[idx[64:]] >= 100) | (d2[64:] > 9.0))


def test_icp_pruned_matches_unpruned(rng):
    """matcher='pallas' with pallas_prune on/off converges to the same
    pose (pruning is exact within the correspondence radius)."""
    n = 512
    n4 = n // 4
    pts = np.concatenate([
        np.stack([rng.uniform(-10, 10, n4), rng.uniform(-10, 10, n4),
                  np.zeros(n4)], 1),
        np.stack([rng.uniform(-10, 10, n4), np.full(n4, 10.0),
                  rng.uniform(0, 5, n4)], 1),
        np.stack([np.full(n4, -10.0), rng.uniform(-10, 10, n4),
                  rng.uniform(0, 5, n4)], 1),
        np.stack([rng.uniform(2, 4, n - 3 * n4), rng.uniform(2, 4, n - 3 * n4),
                  np.full(n - 3 * n4, 2.0)], 1),
    ]).astype(np.float32)
    pts[:, 2] -= 1.0
    ref = pc.make_cloud(pts, capacity=512)
    normals = pc.estimate_normals(ref, knn=10)
    T_true = se3.exp(jnp.asarray([0.02, -0.01, 0.04, 0.2, -0.1, 0.05],
                                 jnp.float32))
    reading = pc.transform(se3.inverse(T_true), ref)

    res_flat = icp_mod.icp(reading, ref, normals, se3.identity(),
                           IcpConfig(matcher='pallas', pallas_prune=False))
    res_pr = icp_mod.icp(reading, ref, normals, se3.identity(),
                         IcpConfig(matcher='pallas', pallas_prune=True))
    assert bool(res_pr.valid)
    np.testing.assert_allclose(np.asarray(res_pr.T), np.asarray(res_flat.T),
                               atol=1e-3)

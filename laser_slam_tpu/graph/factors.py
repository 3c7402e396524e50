"""Pose-graph factor representation as fixed-capacity arrays.

TPU-native replacement for GTSAM's ``NonlinearFactorGraph`` of
``ExpressionFactor<SE3>`` objects (laser_track.cpp:431-458,
incremental_estimator.cpp:119-133).  Factors live in padded arrays with a
weight channel: an inactive slot has weight 0, and "factor removal" (the
reference's iSAM2 ``removeFactorIndices``, incremental_estimator.cpp:258)
is a weight write, never a reshape.

Two factor families cover the reference's graph:
* relative factors — odometry, ICP and loop-closure ``RelativePose``
  measurements: residual log(meas^-1 * Ta^-1 * Tb).
* prior factors    — absolute pose measurements: residual log(meas^-1 * T).

Noise models are diagonal sigma 6-vectors ([rot, trans]); robust factors
get a Cauchy IRLS weight (GTSAM Robust(Cauchy(1)) — laser_track.cpp:38-54).
The ``fixed_a`` flag reproduces the reference's fix_first_node constant
expression trick (laser_track.cpp:440-444): key_a is treated as a constant
and receives no update from that factor.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from laser_slam_tpu.ops import se3


class FactorGraphData(NamedTuple):
    """Padded device representation of the factor graph."""
    # Relative factors
    rel_meas: jax.Array        # [F,7] measured T_a_b
    rel_keys: jax.Array        # [F,2] int32 (key_a, key_b)
    rel_sqrt_info: jax.Array   # [F,6] diagonal sqrt information (1/sigma)
    rel_robust: jax.Array      # [F]   bool: Cauchy IRLS weighting
    rel_fixed_a: jax.Array     # [F]   bool: key_a held constant
    rel_weight: jax.Array      # [F]   f32: 1 active, 0 inactive/removed
    # Prior factors
    prior_meas: jax.Array      # [P,7]
    prior_keys: jax.Array      # [P]   int32
    prior_sqrt_info: jax.Array # [P,6]
    prior_weight: jax.Array    # [P]

    @property
    def rel_capacity(self) -> int:
        return self.rel_meas.shape[-2]

    @property
    def prior_capacity(self) -> int:
        return self.prior_meas.shape[-2]


def empty_graph(rel_capacity: int, prior_capacity: int) -> FactorGraphData:
    return FactorGraphData(
        rel_meas=jnp.broadcast_to(se3.identity(), (rel_capacity, 7)),
        rel_keys=jnp.zeros((rel_capacity, 2), jnp.int32),
        rel_sqrt_info=jnp.zeros((rel_capacity, 6), jnp.float32),
        rel_robust=jnp.zeros((rel_capacity,), bool),
        rel_fixed_a=jnp.zeros((rel_capacity,), bool),
        rel_weight=jnp.zeros((rel_capacity,), jnp.float32),
        prior_meas=jnp.broadcast_to(se3.identity(), (prior_capacity, 7)),
        prior_keys=jnp.zeros((prior_capacity,), jnp.int32),
        prior_sqrt_info=jnp.zeros((prior_capacity, 6), jnp.float32),
        prior_weight=jnp.zeros((prior_capacity,), jnp.float32),
    )


class HostGraph:
    """Host-side mutable factor store with capacity-doubling numpy arrays.

    The incremental front-end appends factors scan by scan (the reference
    pushes into ``NonlinearFactorGraph`` — laser_track.cpp:211-222); this
    class owns the authoritative copy and materializes a
    :class:`FactorGraphData` (padded to the next power-of-two bucket) for
    each jitted solve.
    """

    def __init__(self, rel_capacity: int = 1024, prior_capacity: int = 64):
        self._rel_cap = rel_capacity
        self._prior_cap = prior_capacity
        self.n_rel = 0
        self.n_prior = 0
        self.rel_meas = np.zeros((rel_capacity, 7), np.float32)
        self.rel_meas[:, 0] = 1.0
        self.rel_keys = np.zeros((rel_capacity, 2), np.int32)
        self.rel_sqrt_info = np.zeros((rel_capacity, 6), np.float32)
        self.rel_robust = np.zeros((rel_capacity,), bool)
        self.rel_fixed_a = np.zeros((rel_capacity,), bool)
        self.rel_weight = np.zeros((rel_capacity,), np.float32)
        self.prior_meas = np.zeros((prior_capacity, 7), np.float32)
        self.prior_meas[:, 0] = 1.0
        self.prior_keys = np.zeros((prior_capacity,), np.int32)
        self.prior_sqrt_info = np.zeros((prior_capacity, 6), np.float32)
        self.prior_weight = np.zeros((prior_capacity,), np.float32)

    def _grow_rel(self):
        new_cap = self._rel_cap * 2
        for name in ('rel_meas', 'rel_keys', 'rel_sqrt_info', 'rel_robust',
                     'rel_fixed_a', 'rel_weight'):
            old = getattr(self, name)
            new = np.zeros((new_cap,) + old.shape[1:], old.dtype)
            new[:self._rel_cap] = old
            setattr(self, name, new)
        self.rel_meas[self._rel_cap:, 0] = 1.0
        self._rel_cap = new_cap

    def _grow_prior(self):
        new_cap = self._prior_cap * 2
        for name in ('prior_meas', 'prior_keys', 'prior_sqrt_info',
                     'prior_weight'):
            old = getattr(self, name)
            new = np.zeros((new_cap,) + old.shape[1:], old.dtype)
            new[:self._prior_cap] = old
            setattr(self, name, new)
        self.prior_meas[self._prior_cap:, 0] = 1.0
        self._prior_cap = new_cap

    def add_relative(self, key_a: int, key_b: int, T_a_b, sigmas,
                     robust: bool = False, fixed_a: bool = False) -> int:
        """Append a relative factor; returns its index."""
        if self.n_rel == self._rel_cap:
            self._grow_rel()
        i = self.n_rel
        self.rel_meas[i] = np.asarray(T_a_b, np.float32)
        self.rel_keys[i] = (key_a, key_b)
        self.rel_sqrt_info[i] = 1.0 / np.asarray(sigmas, np.float32)
        self.rel_robust[i] = robust
        self.rel_fixed_a[i] = fixed_a
        self.rel_weight[i] = 1.0
        self.n_rel += 1
        return i

    def add_prior(self, key: int, T_w, sigmas) -> int:
        """Append a prior factor; returns its index (for later removal)."""
        if self.n_prior == self._prior_cap:
            self._grow_prior()
        i = self.n_prior
        self.prior_meas[i] = np.asarray(T_w, np.float32)
        self.prior_keys[i] = key
        self.prior_sqrt_info[i] = 1.0 / np.asarray(sigmas, np.float32)
        self.prior_weight[i] = 1.0
        self.n_prior += 1
        return i

    def remove_prior(self, index: int) -> None:
        """Deactivate a prior factor (reference: iSAM2 removeFactorIndices,
        incremental_estimator.cpp:258)."""
        self.prior_weight[index] = 0.0

    def remove_relative(self, index: int) -> None:
        self.rel_weight[index] = 0.0

    def _bucket(self, n: int, minimum: int) -> int:
        cap = minimum
        while cap < n:
            cap *= 2
        return cap

    def to_device(self, rel_bucket_min: int = 256,
                  prior_bucket_min: int = 16) -> FactorGraphData:
        """Materialize a padded device graph (bucketed to limit recompiles)."""
        rc = self._bucket(max(self.n_rel, 1), rel_bucket_min)
        pcap = self._bucket(max(self.n_prior, 1), prior_bucket_min)
        return FactorGraphData(
            rel_meas=jnp.asarray(self.rel_meas[:rc]),
            rel_keys=jnp.asarray(self.rel_keys[:rc]),
            rel_sqrt_info=jnp.asarray(self.rel_sqrt_info[:rc]),
            rel_robust=jnp.asarray(self.rel_robust[:rc]),
            rel_fixed_a=jnp.asarray(self.rel_fixed_a[:rc]),
            rel_weight=jnp.asarray(self.rel_weight[:rc]),
            prior_meas=jnp.asarray(self.prior_meas[:pcap]),
            prior_keys=jnp.asarray(self.prior_keys[:pcap]),
            prior_sqrt_info=jnp.asarray(self.prior_sqrt_info[:pcap]),
            prior_weight=jnp.asarray(self.prior_weight[:pcap]),
        )

"""Improved precision & recall over InceptionV3 pool3 features.

Reference semantics: /root/reference/evaluation/pytorch-fid/evaluator.py
:246-482 (ManifoldEstimator / DistanceBlock, adapted there from Kynkaanniemi
et al.'s improved-precision-and-recall-metric).  All distances are SQUARED
Euclidean (evaluator.py:470-482); the manifold radius of a feature vector is
its distance to its k-th nearest neighbor with self counted at index 0
(evaluator.py:300-332, nhood_sizes=(3,)); precision = fraction of sample
features inside ANY reference hypersphere, recall = fraction of reference
features inside ANY sample hypersphere (evaluator.py:377-410).

TPU-native design: the pairwise distance sweeps are one jitted matmul-based
kernel per (row, col) tile — the `‖u‖² − 2uvᵀ + ‖v‖²` expansion rides the
MXU — with the k-NN partition and the boolean coverage folds on the host
(they are O(N²) bytes, trivially cheap next to the feature extraction).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def pairwise_sq_dists(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """(N, D), (M, D) -> (N, M) squared Euclidean distances, clamped >= 0
    (evaluator.py:470-482)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _d(a, b):
        nu = jnp.sum(a * a, axis=1)[:, None]
        nv = jnp.sum(b * b, axis=1)[None, :]
        return jnp.maximum(nu - 2.0 * a @ b.T + nv, 0.0)

    return np.asarray(_d(jnp.asarray(u, jnp.float32), jnp.asarray(v, jnp.float32)))


def manifold_radii(features: np.ndarray, k: int = 3,
                   row_batch: int = 10000, col_batch: int = 10000) -> np.ndarray:
    """Per-sample squared radius to the k-th nearest neighbor (self included
    at distance 0, so index k of the ascending partition — evaluator.py:306,324)."""
    n = len(features)
    radii = np.zeros((n,), np.float32)
    for b1 in range(0, n, row_batch):
        e1 = min(b1 + row_batch, n)
        dist = np.zeros((e1 - b1, n), np.float32)
        for b2 in range(0, n, col_batch):
            e2 = min(b2 + col_batch, n)
            dist[:, b2:e2] = pairwise_sq_dists(features[b1:e1], features[b2:e2])
        radii[b1:e1] = np.partition(dist, k, axis=1)[:, k]
    return radii


def precision_recall(ref_features: np.ndarray, sample_features: np.ndarray,
                     k: int = 3, row_batch: int = 10000,
                     col_batch: int = 10000) -> Tuple[float, float]:
    """-> (precision, recall) with neighborhood size k (evaluator.py:246-255)."""
    radii_ref = manifold_radii(ref_features, k, row_batch, col_batch)
    radii_sample = manifold_radii(sample_features, k, row_batch, col_batch)

    ref_covered = np.zeros((len(ref_features),), bool)
    sample_covered = np.zeros((len(sample_features),), bool)
    for b1 in range(0, len(ref_features), row_batch):
        e1 = min(b1 + row_batch, len(ref_features))
        for b2 in range(0, len(sample_features), col_batch):
            e2 = min(b2 + col_batch, len(sample_features))
            d = pairwise_sq_dists(ref_features[b1:e1], sample_features[b2:e2])
            # ref_i inside a sample sphere -> recall; sample_j inside a ref
            # sphere -> precision (evaluator.py:440-462)
            ref_covered[b1:e1] |= np.any(d <= radii_sample[None, b2:e2], axis=1)
            sample_covered[b2:e2] |= np.any(d <= radii_ref[b1:e1, None], axis=0)
    precision = float(np.mean(sample_covered))
    recall = float(np.mean(ref_covered))
    return precision, recall

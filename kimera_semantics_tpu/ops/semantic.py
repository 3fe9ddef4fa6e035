"""Bayesian semantic label fusion math.

Re-derivation of `SemanticIntegratorBase::setSemanticProbabilities` and
`updateSemanticVoxelProbabilities` (semantic_integrator_base.cpp:93-128, 283-314).

The reference builds an LxL log-likelihood matrix with diagonal log(p),
off-diagonal log(1-p), and the *unknown column zeroed* (so label-0 measurements
are uninformative), then updates `priors += L @ measurement_frequencies` under a
striped mutex per voxel. Because that matrix has rank-1-plus-diagonal structure,
the update decomposes exactly into commutative scatter-adds (SURVEY 2c):

  L @ onehot(l) = log(1-p) * ones + (log(p) - log(1-p)) * e_l      for l != 0
  L @ onehot(0) = 0

so per measured label l != 0 we accumulate `sem_count += 1` and
`sem_delta[l] += log(p) - log(1-p)` — no locks, no dense L-vector traffic.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp

from ..config import SemanticConfig, UNKNOWN_LABEL


@dataclasses.dataclass(frozen=True)
class Likelihood:
    log_match: float
    log_nonmatch: float

    @property
    def delta(self) -> float:
        return self.log_match - self.log_nonmatch


def make_likelihood(cfg: SemanticConfig) -> Likelihood:
    p = cfg.semantic_measurement_probability
    if not (0.0 < p < 1.0):
        raise ValueError("semantic_measurement_probability must be in (0, 1)")
    lm, lnm = math.log(p), math.log(1.0 - p)
    if lm <= lnm:
        # Mirrors the reference's sanity CHECK (semantic_integrator_base.cpp:104-108).
        raise ValueError("match likelihood must exceed non-match likelihood")
    return Likelihood(log_match=lm, log_nonmatch=lnm)


def likelihood_matrix(cfg: SemanticConfig, num_labels: int) -> np.ndarray:
    """The explicit LxL matrix, for tests/docs (semantic_integrator_base.cpp:109-128)."""
    lk = make_likelihood(cfg)
    mat = np.full((num_labels, num_labels), lk.log_nonmatch, dtype=np.float32)
    np.fill_diagonal(mat, lk.log_match)
    mat[:, UNKNOWN_LABEL] = 0.0
    return mat


def dynamic_label_mask(labels: jnp.ndarray, cfg: SemanticConfig) -> jnp.ndarray:
    """`isSemanticLabelValid` (semantic_integrator_base.h:170-175): points carrying
    a dynamic label (e.g. humans, label 20 in the launch files) are skipped
    entirely — TSDF included (semantic_tsdf_integrator_fast.cpp:75-77)."""
    ok = jnp.ones(labels.shape, dtype=bool)
    for dyn in cfg.dynamic_labels:
        ok = ok & (labels != dyn)
    return ok


def informative(labels: jnp.ndarray) -> jnp.ndarray:
    """Labels that actually move the posterior (unknown column is zeroed)."""
    return labels != UNKNOWN_LABEL


def normalize_probabilities(logodds: jnp.ndarray) -> jnp.ndarray:
    """L2-normalization of the log-odds vector, mirroring the reference's
    `normalizeProbabilities` (semantic_integrator_base.cpp:311-348). NB: the
    reference never calls this in the hot path; provided for API parity."""
    norm = jnp.linalg.norm(logodds, axis=-1, keepdims=True)
    return jnp.where(norm > 0.0, logodds / jnp.maximum(norm, 1e-12), logodds)

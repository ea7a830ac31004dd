"""Counterfactual evaluation: the linear datamodeling score (LDS).

The reference's quality evidence for its influence scores is LDS
(examples/glue/evaluate_lds.py; README tables at examples/wikitext/README.md:
108-112 and examples/glue/README.md:130-141): sample M random train subsets,
retrain on each, and rank-correlate the *predicted* effect of each subset
(the sum of that subset's influence scores) with the *measured* effect (the
query measurement of the retrained model).

This module provides the metric plus a retraining harness. The harness takes
user callables (`train_fn`, `measure_fn`) so any model/optimizer works; on
TPU the retrains are independent jitted programs and can simply be looped —
each retrain reuses the same compiled step.
"""

from typing import Any, Callable, Optional, Sequence, Tuple

import numpy as np


def sample_subset_masks(
    train_size: int,
    num_subsets: int,
    subset_fraction: float = 0.5,
    seed: int = 0,
) -> np.ndarray:
    """(num_subsets, train_size) boolean masks, each keeping ~fraction rows."""
    rng = np.random.default_rng(seed)
    keep = int(round(subset_fraction * train_size))
    masks = np.zeros((num_subsets, train_size), dtype=bool)
    for j in range(num_subsets):
        masks[j, rng.choice(train_size, size=keep, replace=False)] = True
    return masks


def _rankdata(x: np.ndarray) -> np.ndarray:
    """Average ranks along the last axis (ties averaged)."""
    order = np.argsort(x, axis=-1, kind="stable")
    ranks = np.empty_like(x, dtype=np.float64)
    arange = np.arange(x.shape[-1], dtype=np.float64)
    np.put_along_axis(ranks, order, np.broadcast_to(arange, x.shape), axis=-1)
    # Average ties.
    sorted_x = np.take_along_axis(x, order, axis=-1)
    out = ranks.copy()
    for row in range(x.shape[0]) if x.ndim == 2 else [None]:
        sx = sorted_x if row is None else sorted_x[row]
        rk = ranks if row is None else ranks[row]
        ox = order if row is None else order[row]
        i = 0
        n = sx.shape[-1]
        dest = out if row is None else out[row]
        while i < n:
            j = i
            while j + 1 < n and sx[j + 1] == sx[i]:
                j += 1
            if j > i:
                dest[ox[i : j + 1]] = 0.5 * (i + j)
            i = j + 1
    return out


def spearman_correlation(pred: np.ndarray, actual: np.ndarray) -> np.ndarray:
    """Row-wise Spearman rank correlation of (Q, M) against (Q, M)."""
    pred = np.atleast_2d(np.asarray(pred, np.float64))
    actual = np.atleast_2d(np.asarray(actual, np.float64))
    rp = _rankdata(pred)
    ra = _rankdata(actual)
    rp = rp - rp.mean(axis=-1, keepdims=True)
    ra = ra - ra.mean(axis=-1, keepdims=True)
    denom = np.sqrt((rp**2).sum(-1) * (ra**2).sum(-1))
    denom = np.where(denom == 0, 1.0, denom)
    return (rp * ra).sum(-1) / denom


def linear_datamodeling_score(
    scores: np.ndarray,
    subset_measurements: np.ndarray,
    subset_masks: np.ndarray,
) -> Tuple[float, np.ndarray]:
    """LDS from precomputed pairwise scores and retrain measurements.

    Args:
        scores: (Q, N) pairwise influence scores (query x train).
        subset_measurements: (M, Q) measured query outcomes of the model
            retrained on each subset.
        subset_masks: (M, N) boolean subset membership.

    Returns:
        (mean LDS, per-query LDS (Q,)): Spearman correlation between the
        subset-summed scores and the retrained measurements, per query.

    Higher-influence training examples should *reduce* the measurement (loss)
    when included; the correlation handles either sign convention — callers
    compare strategies against each other, as the reference READMEs do.
    """
    scores = np.asarray(scores, np.float64)
    masks = np.asarray(subset_masks, np.float64)
    predicted = scores @ masks.T  # (Q, M)
    actual = np.asarray(subset_measurements, np.float64).T  # (Q, M)
    per_query = spearman_correlation(predicted, actual)
    return float(per_query.mean()), per_query


def collect_subset_measurements(
    train_fn: Callable[[np.ndarray, int], Any],
    measure_fn: Callable[[Any], np.ndarray],
    masks: np.ndarray,
    seed: int = 0,
) -> np.ndarray:
    """Retrains on every subset mask and measures each model: (M, Q) matrix.

    The expensive half of the LDS harness, independent of any score matrix —
    compute it ONCE and evaluate any number of strategies/recipes against it
    via `evaluate_lds(..., measurements=...)` (a 4-strategy comparison would
    otherwise retrain 4x)."""
    measurements = []
    for j in range(masks.shape[0]):
        idx = np.nonzero(masks[j])[0]
        state = train_fn(idx, seed + j)
        measurements.append(np.asarray(measure_fn(state)))
    return np.stack(measurements)


def evaluate_lds(
    scores: np.ndarray,
    train_fn: Callable[[np.ndarray, int], Any],
    measure_fn: Callable[[Any], np.ndarray],
    train_size: int,
    num_subsets: int = 64,
    subset_fraction: float = 0.5,
    seed: int = 0,
    masks: Optional[np.ndarray] = None,
    measurements: Optional[np.ndarray] = None,
) -> Tuple[float, np.ndarray]:
    """Full retraining harness.

    Args:
        scores: (Q, N) pairwise influence scores.
        train_fn: `(subset_indices, seed) -> model_state` retrains on a subset.
        measure_fn: `model_state -> (Q,)` per-query measurements.
        train_size: N.
        num_subsets / subset_fraction / seed: subset sampling config
            (reference uses 500 x 50%; CI uses tens).
        masks: optional precomputed (M, N) masks.
        measurements: optional precomputed (M, Q) matrix from
            `collect_subset_measurements` — skips the retrains entirely
            (must correspond 1:1 to `masks`).

    Returns:
        (mean LDS, per-query LDS).
    """
    if masks is None:
        masks = sample_subset_masks(train_size, num_subsets, subset_fraction, seed)
    if measurements is None:
        measurements = collect_subset_measurements(train_fn, measure_fn, masks, seed)
    return linear_datamodeling_score(scores, measurements, masks)

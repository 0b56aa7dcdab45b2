"""Minimal-sample drawing: uniform and Gumbel-softmax top-k (differentiable).

The Gumbel sampler mirrors the reference straight-through estimator
(``/root/reference/samplers/gumbel_sampler.py:25-42``):
``g ~ Gumbel(0,1)``, ``y_soft = softmax((logits + g)/τ)``, hard top-k one-hot,
``ret = y_hard − stop_grad(y_soft) + y_soft``. Minimal points are the
mask-selected rows, which propagate gradients into the logits through
``y_soft`` at the selected entries (the reference materializes the same
selection via boolean masking at ``ransac.py:63-65``).

TPU design: one call draws ALL hypotheses' samples at once — (H, m) index
tensors / (H, N) straight-through masks — from a single ``jax.random`` key.
No python loops, no rejection: fixed shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_topk_sample(
    key: jax.Array,
    logits: jnp.ndarray,
    num_hypotheses: int,
    num_samples: int,
    tau: float = 1.0,
):
    """Draw ``num_hypotheses`` Gumbel-top-k minimal samples.

    Args:
        key: PRNG key.
        logits: (N,) per-correspondence scores (any prob_type flavor; the
            reference feeds normalized weights / raw weights / log-sigmoid
            logits interchangeably, ``model_cl.py:472-484``).
        num_hypotheses: H.
        num_samples: k (minimal sample size, or 8 for the 8PC sampler).
        tau: Gumbel-softmax temperature (reference fixes τ=1).

    Returns:
        indices: (H, k) int32 selected rows (ascending index order per
            hypothesis, matching the reference's mask-select ordering).
        st_mask: (H, N) straight-through mask: 1.0 at the selected entries in
            the forward pass, gradient of softmax((logits+g)/τ) in the
            backward pass.
        soft_weights: (H, N) the soft weights y_soft.
    """
    n = logits.shape[-1]
    gumbels = jax.random.gumbel(key, (num_hypotheses, n), logits.dtype)
    perturbed = (logits[None, :] + gumbels) / tau
    y_soft = jax.nn.softmax(perturbed, axis=-1)
    _, topk_idx = jax.lax.top_k(perturbed, num_samples)
    topk_idx = jnp.sort(topk_idx, axis=-1)
    y_hard = jnp.zeros_like(y_soft).at[
        jnp.arange(num_hypotheses)[:, None], topk_idx
    ].set(1.0)
    st_mask = y_hard - jax.lax.stop_gradient(y_soft) + y_soft
    return topk_idx.astype(jnp.int32), st_mask, y_soft


def gumbel_topk_select(
    key: jax.Array,
    logits: jnp.ndarray,
    num_hypotheses: int,
    num_samples: int,
    tau: float = 1.0,
):
    """Gather-free Gumbel top-k draw: the (H, k) SELECTED entries only.

    Identical distribution and bit-identical selected values to
    :func:`gumbel_topk_sample` + ``take_along_axis`` — but computed without
    any (H, N) gather. XLA cost analysis on the TPU shows
    ``take_along_axis(st_mask, indices)`` on (H=2048, N=2000) batched ×8
    is an **8.7 GB** byte-mover (per-index tile reads in the lowered
    gather), ~70% of the whole hypothesis-draw cost (docs/PROFILE.md §4).
    ``lax.top_k`` already returns the selected VALUES, and the softmax at
    a selected entry is ``exp(v − rowmax) / Σexp(pert − rowmax)`` — all
    per-row reductions, no gather. Gradients match: the top-k value VJP
    scatters cotangents to exactly the selected entries, and the
    log-sum-exp VJP spreads to all logits — the same pullback as the
    full-softmax-then-gather formulation.

    Returns:
        indices: (H, k) int32, ascending per hypothesis (same order as
            :func:`gumbel_topk_sample`).
        st_sel: (H, k) straight-through factors at the selected entries
            (forward ≡ ``1 − y_soft + y_soft``, backward ≡ softmax grad).
        soft_sel: (H, k) the soft weights at the selected entries (what
            ``take_along_axis(y_soft, indices)`` returned).
    """
    n = logits.shape[-1]
    gumbels = jax.random.gumbel(key, (num_hypotheses, n), logits.dtype)
    perturbed = (logits[None, :] + gumbels) / tau
    vals, topk_idx = jax.lax.top_k(perturbed, num_samples)
    # jax.nn.softmax semantics: subtract the stop-gradient row max — which
    # top_k already produced as its first (descending) value.
    row_max = jax.lax.stop_gradient(vals[:, :1])
    order = jnp.argsort(topk_idx, axis=-1)
    topk_idx = jnp.take_along_axis(topk_idx, order, axis=-1)  # (H, k): tiny
    vals = jnp.take_along_axis(vals, order, axis=-1)
    denom = jnp.sum(jnp.exp(perturbed - row_max), axis=-1, keepdims=True)
    soft_sel = jnp.exp(vals - row_max) / denom
    st_sel = 1.0 - jax.lax.stop_gradient(soft_sel) + soft_sel
    return topk_idx.astype(jnp.int32), st_sel, soft_sel


def select_minimal_samples(matches: jnp.ndarray, indices: jnp.ndarray, st_sel: jnp.ndarray):
    """(H, k, D) minimal samples from :func:`gumbel_topk_select` outputs:
    the straight-through product applied at the gathered rows (forward- and
    backward-identical to :func:`gather_minimal_samples` on the full
    mask, without the (H, N)-sized intermediates)."""
    return matches[indices] * st_sel[:, :, None]


def gather_minimal_samples(matches: jnp.ndarray, indices: jnp.ndarray, st_mask: jnp.ndarray):
    """Materialize (H, k, D) minimal samples with straight-through gradients.

    Forward: the selected match rows. Backward: gradients flow to
    ``st_mask`` (hence the logits) exactly as in the reference's
    ``matches * samples`` mask-select (``ransac.py:63-65``).
    """
    # Gather FIRST, then mask: multiplying before the gather materializes a
    # (H, N, D) intermediate (0.5 GB/call at bench scale) whose gradient
    # w.r.t. st_mask is nonzero only at the gathered entries anyway —
    # gathering st_mask alongside the rows is forward- and backward-equal
    # (take_along_axis VJP scatters the cotangent back to those entries).
    rows = matches[indices]                                  # (H, k, D)
    st_sel = jnp.take_along_axis(st_mask, indices, axis=1)   # (H, k)
    return rows * st_sel[:, :, None]


def prosac_rank_probabilities(num_points: int) -> jnp.ndarray:
    """PROSAC-style probabilities from SNN-ratio ordering (reference
    ``feature_utils.py:52-58``): correspondences assumed pre-sorted by
    quality; probability decays linearly with rank. Feed as (log-)weights to
    the Gumbel sampler for importance-ordered sampling."""
    i = jnp.arange(num_points, dtype=jnp.float32)
    return 1.0 - i / num_points


def prosac_logits_from_weights(weights: jnp.ndarray) -> jnp.ndarray:
    """PROSAC ordering as sampling logits: each correspondence gets the log
    rank-probability of its RANK under descending predicted quality.

    This reproduces the reference SOTA path's ordering semantics (it sorts
    by predicted weight before the MAGSAC++ hand-off,
    ``/root/reference/test_magsac.py:45``): sampling importance depends on
    the order statistics of the predictions, not their magnitudes.

    Args:
        weights: (..., N) predicted per-correspondence quality.

    Returns:
        (..., N) logits for :func:`gumbel_topk_sample`.
    """
    ranks = jnp.argsort(jnp.argsort(-weights, axis=-1), axis=-1)
    probs = prosac_rank_probabilities(weights.shape[-1]).astype(weights.dtype)
    return jnp.log(jnp.clip(probs, 1e-9, None))[ranks]


def uniform_sample(key: jax.Array, num_points: int, num_hypotheses: int, num_samples: int):
    """(H, k) uniform minimal-sample indices, without replacement per
    hypothesis (the reference's ``torch.randint`` sampler can repeat a point
    within a sample — ``samplers/uniform_sampler.py:15-19`` — which only
    produces degenerate solves; we sample without replacement).
    """
    keys = jax.random.split(key, num_hypotheses)

    def one(k):
        return jax.random.choice(k, num_points, (num_samples,), replace=False)

    return jax.vmap(one)(keys).astype(jnp.int32)

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


def gather_minimal_samples(matches: jnp.ndarray, indices: jnp.ndarray, st_mask: jnp.ndarray):
    """Materialize (H, k, D) minimal samples with straight-through gradients.

    Forward: the selected match rows. Backward: gradients flow to
    ``st_mask`` (hence the logits) exactly as in the reference's
    ``matches * samples`` mask-select (``ransac.py:63-65``).
    """
    masked = matches[None, :, :] * st_mask[:, :, None]  # (H, N, D)
    return jnp.take_along_axis(masked, indices[:, :, None], axis=1)


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

"""Multi-chip sharding: the ``(pairs, hyp)`` mesh.

The reference is strictly single-device (SURVEY.md §2.13: no
torch.distributed/NCCL anywhere); scaling strategy here is designed fresh
for TPU pods:

* **pairs axis** (data parallelism): image pairs are sharded; per-pair
  metrics/losses are reduced with ``psum`` over ``pairs``.
* **hyp axis** (hypothesis parallelism — the domain analogue of tensor
  parallelism): each device generates and scores ``H / n_hyp`` hypotheses
  for every pair in its shard; the best model is a cross-device argmax
  reduction (``pmax`` on scores + deterministic lowest-lane tie-break,
  matching single-device semantics).

Collectives ride ICI via ``shard_map`` over a ``jax.sharding.Mesh``;
multi-host meshes come from ``jax.distributed.initialize`` + the same code.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from differentiable_ransac_tpu.config import RansacConfig
from differentiable_ransac_tpu.engine import ransac_fixed, refit_best


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Multi-host initialization (N≥2 TPU hosts): thin wrapper over
    ``jax.distributed.initialize`` — call once per host before building
    meshes; afterwards ``jax.devices()`` spans the pod slice and
    :func:`make_mesh` shards over all of it. No-op when already initialized
    or running single-host. Returns the global device count."""
    import jax

    if coordinator_address is not None:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:
            # Typically "already initialized" — benign, but log it so a real
            # init failure (bad coordinator, port clash) is visible.
            import logging

            logging.getLogger(__name__).warning(
                "jax.distributed.initialize: %s (continuing with %d devices)",
                e, jax.device_count(),
            )
    return jax.device_count()


def make_mesh(pairs: int = 1, hyp: Optional[int] = None, devices=None) -> Mesh:
    """Build a ``(pairs, hyp)`` mesh over the available devices.

    Args:
        pairs: size of the data-parallel axis.
        hyp: size of the hypothesis-parallel axis (default: all remaining
            devices).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if hyp is None:
        hyp = devices.size // pairs
    assert pairs * hyp == devices.size, (pairs, hyp, devices.size)
    return Mesh(devices.reshape(pairs, hyp), ("pairs", "hyp"))


def _global_argmax_select(score, payloads, axis_name):
    """Cross-shard argmax with deterministic tie-breaking.

    Every shard contributes its local best ``score`` and payload tensors;
    returns the payloads of the globally best shard (lowest shard index wins
    ties — identical to a single-device argmax over the concatenated lanes).
    """
    gmax = jax.lax.pmax(score, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    big = jnp.iinfo(jnp.int32).max
    winner = jax.lax.pmin(jnp.where(score == gmax, my_idx, big), axis_name)
    is_winner = (my_idx == winner).astype(payloads[0].dtype)
    out = tuple(jax.lax.psum(p * is_winner, axis_name) for p in payloads)
    return gmax, out


def sharded_ransac(
    cfg: RansacConfig,
    mesh: Mesh,
    points: jnp.ndarray,
    logits: jnp.ndarray,
    keys: jax.Array,
    thresholds: jnp.ndarray,
    point_mask: Optional[jnp.ndarray] = None,
    rescued: bool = True,
):
    """Batched best-model search sharded over ``(pairs, hyp)``.

    Args:
        cfg: static engine config; ``cfg.num_hypotheses`` is the GLOBAL
            hypothesis budget (split over the ``hyp`` axis).
        mesh: from :func:`make_mesh`.
        points: (B, N, D) with B divisible by the ``pairs`` axis.
        logits: (B, N).
        keys: (B,) uint32 per-pair seed material (folded with the hyp-shard
            index so shards draw disjoint samples).
        thresholds: (B,) focal-normalized thresholds.
        point_mask: optional (B, N).

    Returns:
        (best_models (B, 3, 3), best_masks (B, N), best_scores (B,)).
    """
    from differentiable_ransac_tpu.engine import ransac_fixed_rescued

    n_hyp = mesh.shape["hyp"]
    local_h = -(-cfg.num_hypotheses // n_hyp)
    engine = ransac_fixed_rescued if rescued else ransac_fixed

    def per_pair(pts, lg, seed, thr, pmask):
        shard = jax.lax.axis_index("hyp")
        key = jax.random.fold_in(jax.random.PRNGKey(seed), shard)
        out = engine(cfg, pts, lg, key, threshold=thr,
                     point_mask=pmask, num_hypotheses=local_h)
        score, (model, mask) = _global_argmax_select(
            out["best_score"],
            (out["best_model"], out["best_mask"].astype(pts.dtype)),
            "hyp",
        )
        model, mask, score = refit_best(
            cfg, pts, model, mask > 0.5, score, thr, pmask
        )
        return model, mask, score

    def shard_fn(points_blk, logits_blk, keys_blk, thr_blk, pmask_blk):
        return jax.vmap(per_pair)(points_blk, logits_blk, keys_blk, thr_blk, pmask_blk)

    if point_mask is None:
        point_mask = jnp.ones(points.shape[:2], points.dtype)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("pairs"), P("pairs"), P("pairs"), P("pairs"), P("pairs")),
        out_specs=(P("pairs"), P("pairs"), P("pairs")),
        check_vma=False,
    )
    return fn(points, logits, keys, thresholds, point_mask)


def sharded_match_loss_hypotheses(
    cfg: RansacConfig,
    mesh: Mesh,
    points: jnp.ndarray,
    logits: jnp.ndarray,
    gt_models: jnp.ndarray,
    gt_masks: jnp.ndarray,
    keys: jax.Array,
):
    """Training-mode hypothesis generation + match loss over the mesh.

    Each ``hyp`` shard generates ``H / n_hyp`` hypotheses per pair and
    computes its partial symmetric-epipolar loss; partial sums are reduced
    with ``psum`` over ``hyp`` then averaged over ``pairs`` — numerically
    equal to the single-device mean over all H hypotheses. Differentiable:
    gradients flow back through the shard_map and its collectives.

    Args:
        points: (B, N, 4) calibrated correspondences.
        logits: (B, N) sampler scores (gradient target).
        gt_models: (B, 3, 3).
        gt_masks: (B, N) GT inlier masks.
        keys: (B,) uint32 seeds.

    Returns:
        scalar loss.
    """
    from differentiable_ransac_tpu.engine import ransac_train

    n_hyp = mesh.shape["hyp"]
    n_pairs = mesh.shape["pairs"]
    local_h = -(-cfg.num_hypotheses // n_hyp)
    local_cfg = cfg.replace(
        max_iterations=local_h, ransac_batch_size=min(cfg.ransac_batch_size, local_h)
    )

    def per_pair(pts, lg, gt, gtm, seed):
        shard = jax.lax.axis_index("hyp")
        key = jax.random.fold_in(jax.random.PRNGKey(seed), shard)
        models, valid = ransac_train(local_cfg, pts, lg, gt, key)
        # partial sums for a global mean over hypotheses
        from differentiable_ransac_tpu.ops.epipolar import symmetric_epipolar_squared

        geod = symmetric_epipolar_squared(pts[:, :2], pts[:, 2:4], models)
        e = jnp.minimum(geod, 1.0)
        gtm = gtm.astype(e.dtype)
        denom = jnp.maximum(jnp.sum(gtm), 1.0)
        per_h = jnp.sum(e * gtm[None, :], axis=-1) / denom
        v = valid.astype(e.dtype)
        return jnp.sum(per_h * v), jnp.sum(v)

    def shard_fn(points_blk, logits_blk, gt_blk, gtm_blk, keys_blk):
        loss_sum, count = jax.vmap(per_pair)(points_blk, logits_blk, gt_blk, gtm_blk, keys_blk)
        loss_sum = jax.lax.psum(loss_sum, "hyp")   # (Bp,)
        count = jax.lax.psum(count, "hyp")
        per_pair_loss = loss_sum / jnp.maximum(count, 1.0)
        total = jax.lax.psum(jnp.sum(per_pair_loss), "pairs")
        return total[None] / points.shape[0]

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("pairs"), P("pairs"), P("pairs"), P("pairs"), P("pairs")),
        out_specs=P(),
        check_vma=False,
    )
    return fn(points, logits, gt_models, gt_masks, keys)[0]

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

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from differentiable_ransac_tpu.config import RansacConfig
from differentiable_ransac_tpu.engine import ransac_fixed, refit_best

# Every public sharded_* entry point builds its shard_map callable through a
# cached factory and calls it under jax.jit. Calling a shard_map EAGERLY
# (outside jit) routes per-primitive through the eager SPMD dispatch path,
# which re-lowers the engine graph piecemeal: measured 200-460 s for a graph
# whose jitted trace+lower+compile is 7.6 s on the 8-device CPU mesh
# (docs/PROFILE.md). Inside an outer jit (the train/eval steps) the inner
# jit is inlined and free; called eagerly (tests, ad-hoc use) it makes
# compile time normal again. The factories are keyed on the STATIC
# configuration only — array arguments flow through the jit boundary.


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


def mesh_from_spec(spec: Optional[str], batch_size: int) -> Optional[Mesh]:
    """Parse a driver ``--mesh`` spec into a mesh (or None).

    ``spec``: ``"P,H"`` (pairs axis × hyp axis) or ``"auto"`` (1 × all
    local devices); None/empty → None. Single-device products also return
    None (callers fall back to the single-device step). Shared by every
    driver that exposes ``--mesh``.
    """
    if not spec:
        return None
    n_dev = len(jax.devices())
    if spec == "auto":
        p_ax, h_ax = 1, n_dev
    else:
        p_ax, h_ax = (int(x) for x in spec.split(","))
    if p_ax * h_ax <= 1:
        print(f"--mesh {spec}: single device — using the single-device step")
        return None
    assert batch_size % p_ax == 0, (
        f"batch size {batch_size} not divisible by pairs axis {p_ax}")
    mesh = make_mesh(pairs=p_ax, hyp=h_ax)
    print(f"mesh: {dict(mesh.shape)} over {n_dev} devices")
    return mesh


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
    if point_mask is None:
        point_mask = jnp.ones(points.shape[:2], points.dtype)
    fn = _sharded_ransac_fn(cfg, mesh, rescued)
    return fn(points, logits, keys, thresholds, point_mask)


@functools.lru_cache(maxsize=64)
def _sharded_ransac_fn(cfg: RansacConfig, mesh: Mesh, rescued: bool):
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

    return jax.jit(jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("pairs"), P("pairs"), P("pairs"), P("pairs"), P("pairs")),
        out_specs=(P("pairs"), P("pairs"), P("pairs")),
        check_vma=False,
    ))


def sharded_ransac_adaptive(
    cfg: RansacConfig,
    mesh: Mesh,
    points: jnp.ndarray,
    logits: jnp.ndarray,
    keys: jax.Array,
    thresholds: jnp.ndarray,
    point_mask: Optional[jnp.ndarray] = None,
    chunk: int = 512,
    rescue_k: int = 64,
    sigma_mult: Optional[jnp.ndarray] = None,
):
    """Multi-device ADAPTIVE search: ``ransac_test_fast`` over ``(pairs, hyp)``.

    The eval-path semantics (reference ``ransac.py:109-215``: evaluate
    hypothesis chunks until the adaptive bound is met, then refit) at
    multi-chip scale:

    * every ``hyp`` shard runs the f32 chunk loop in LOCKSTEP, drawing
      disjoint samples (key folded with the shard index);
    * the adaptive bound is driven by the GLOBAL strict-inlier best —
      ``pmax`` over ``hyp`` each round — and ``iterations`` counts global
      hypotheses (``chunk · n_hyp`` per round), so all shards terminate on
      the same round, matching the single-device bound ± chunk granularity;
    * each shard carries its own top-``rescue_k`` samples; after the loop
      every shard re-solves its carry at f64 and fully scores it, and the
      global winner is a deterministic cross-shard argmax
      (lowest-shard-index tie-break);
    * LO + the final keep-if-better refit run identically on all shards
      from the selected winner (the LO key is derived from the per-pair
      seed only, so shards stay in agreement).

    Args:
        cfg: static engine config (``max_iterations`` is the GLOBAL budget).
        points: (B, N, D) with B divisible by the ``pairs`` axis.
        logits: (B, N).
        keys: (B,) uint32 per-pair seed material.
        thresholds: (B,) focal-normalized thresholds.
        point_mask: optional (B, N).
        chunk: per-shard hypotheses per round.
        rescue_k: per-shard carried samples.

    Returns:
        (best_models (B, 3, 3), best_masks (B, N), best_scores (B,),
        iterations (B,) — global hypotheses evaluated per pair).
    """
    if point_mask is None:
        point_mask = jnp.ones(points.shape[:2], points.dtype)
    # dummy ones when unused (static branch inside per_pair selects None)
    sm_arr = (jnp.ones((points.shape[0],), points.dtype)
              if sigma_mult is None else jnp.asarray(sigma_mult))
    fn = _sharded_ransac_adaptive_fn(cfg, mesh, chunk, rescue_k,
                                     sigma_mult is not None)
    return fn(points, logits, keys, thresholds, point_mask, sm_arr)


@functools.lru_cache(maxsize=64)
def _sharded_ransac_adaptive_fn(cfg: RansacConfig, mesh: Mesh, chunk: int,
                                rescue_k: int, has_sigma: bool):
    from differentiable_ransac_tpu.engine import (
        _BestState,
        _fast_rescue_local,
        _fast_search_loop,
        _local_optimization,
        _refit_and_update,
    )

    def per_pair(pts, lg, seed, thr, pmask, sm):
        shard = jax.lax.axis_index("hyp")
        key = jax.random.fold_in(jax.random.PRNGKey(seed), shard)
        thr = jnp.asarray(thr).astype(pts.dtype)
        sm = sm if has_sigma else None
        st = _fast_search_loop(cfg, pts, lg, key, thr, pmask, chunk,
                               rescue_k, axis_name="hyp", sigma_mult=sm)
        model, mask, score = _fast_rescue_local(cfg, pts, thr, pmask, st, sm)
        score, (model, mask) = _global_argmax_select(
            score, (model, mask.astype(pts.dtype)), "hyp"
        )
        mask = mask > 0.5
        final = _BestState(
            score=score,
            model=model,
            mask=mask,
            inliers=jnp.sum(mask).astype(pts.dtype),
            iterations=st.iterations,
            max_iters=st.max_iters,
            # shard-uniform key: LO's inner draws must agree across shards
            key=jax.random.fold_in(jax.random.PRNGKey(seed), 0x10),
        )
        if cfg.lo:
            final = _local_optimization(cfg, pts, thr, pmask, final, sm)
        final = _refit_and_update(cfg, pts, thr, pmask, final, sigma_mult=sm)
        return final.model, final.mask, final.score, final.iterations

    def shard_fn(points_blk, logits_blk, keys_blk, thr_blk, pmask_blk, sm_blk):
        return jax.vmap(per_pair)(points_blk, logits_blk, keys_blk, thr_blk,
                                  pmask_blk, sm_blk)

    return jax.jit(jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("pairs"),) * 6,
        out_specs=(P("pairs"), P("pairs"), P("pairs"), P("pairs")),
        check_vma=False,
    ))


def sharded_hypothesis_losses(
    cfg: RansacConfig,
    mesh: Mesh,
    points: jnp.ndarray,
    logits: jnp.ndarray,
    gt_models: jnp.ndarray,
    gt_masks: jnp.ndarray,
    keys: jax.Array,
    score_points: Optional[jnp.ndarray] = None,
    Ks: Optional[tuple] = None,
    topk: int = 0,
    gt_R: Optional[jnp.ndarray] = None,
    gt_t: Optional[jnp.ndarray] = None,
):
    """Training-mode hypothesis generation + losses over the mesh.

    Each ``hyp`` shard generates ``H / n_hyp`` hypotheses per pair ONCE and
    computes partial sums of every requested loss from them; partial sums
    are reduced with ``psum`` over ``hyp`` then averaged over ``pairs`` —
    numerically equal to the single-device mean over all H hypotheses.
    Differentiable: gradients flow back through the shard_map and its
    collectives.

    Losses:

    * **match** (w2, reference ``loss.py:107-153``): symmetric epipolar
      error of GT inliers vs every hypothesis — always computed.
    * **pose** (w0, reference ``loss.py:11-68``): mean relative-pose error
      ``(errR + errT)/2`` over hypotheses via the differentiable Horn
      pose recovery + cheirality voting — computed when ``gt_R``/``gt_t``
      are given (each shard recovers poses only for its own hypotheses;
      the mean is psum-reduced, identical to the single-device
      :func:`differentiable_ransac_tpu.losses.pose_loss`).

    Args:
        points: (B, N, 4) correspondences the SOLVER sees (calibrated for
            E-mode; pixels for F-mode).
        logits: (B, N) sampler scores (gradient target).
        gt_models: (B, 3, 3).
        gt_masks: (B, N) GT inlier masks.
        keys: (B,) uint32 seeds.
        score_points: optional (B, N, 4) coords the LOSSES see (calibrated
            coords in F-mode, reference ``loss.py:119-120``); defaults to
            ``points``.
        Ks: optional ``(K1s, K2s)`` (B, 3, 3) pairs — when given, each F
            hypothesis is lifted to E = K2ᵀ F K1 before the losses
            (reference ``loss.py:117-118``).
        topk: if > 0, the match loss averages only the best hypotheses by
            mean error (reference ``loss.py:147-150``). Under hypothesis
            sharding the selection is per-shard top-⌈topk/n_hyp⌉ — a
            stratified approximation of the global top-k (exact when
            hypothesis quality is exchangeable across shards, which holds
            here: shards draw IID samples from the same sampler).
        gt_R: optional (B, 3, 3) GT rotations — enables the pose loss.
        gt_t: optional (B, 3) GT translations.

    Returns:
        dict with ``"match"`` (scalar) and, if ``gt_R`` is given,
        ``"pose"`` (scalar).
    """
    want_pose = gt_R is not None
    if score_points is None:
        score_points = points
    B = points.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=points.dtype), (B, 3, 3))
    K1s, K2s = Ks if Ks is not None else (eye, eye)
    if gt_R is None:
        gt_R = eye
        gt_t = jnp.ones((B, 3), points.dtype)

    fn = _sharded_hypothesis_losses_fn(cfg, mesh, topk, Ks is not None,
                                       want_pose)
    match, pose = fn(points, score_points, logits, gt_models, gt_masks, keys,
                     K1s, K2s, gt_R, jnp.asarray(gt_t).reshape(B, 3))
    out = {"match": match[0]}
    if want_pose:
        out["pose"] = pose[0]
    return out


@functools.lru_cache(maxsize=64)
def _sharded_hypothesis_losses_fn(cfg: RansacConfig, mesh: Mesh, topk: int,
                                  has_Ks: bool, want_pose: bool):
    from differentiable_ransac_tpu.engine import ransac_train
    from differentiable_ransac_tpu.ops import pose as pose_ops

    n_hyp = mesh.shape["hyp"]
    n_pairs = mesh.shape["pairs"]
    local_h = -(-cfg.num_hypotheses // n_hyp)
    local_topk = min(-(-topk // n_hyp), local_h) if topk else 0
    local_cfg = cfg.replace(
        max_iterations=local_h, ransac_batch_size=min(cfg.ransac_batch_size, local_h)
    )

    def per_pair(pts, spts, lg, gt, gtm, seed, K1, K2, R, t):
        shard = jax.lax.axis_index("hyp")
        key = jax.random.fold_in(jax.random.PRNGKey(seed), shard)
        models, valid = ransac_train(local_cfg, pts, lg, gt, key)
        if has_Ks:
            models = jnp.einsum("ji,hjk,kl->hil", K2, models, K1)
        # partial sums for a global mean over hypotheses
        from differentiable_ransac_tpu.ops.epipolar import symmetric_epipolar_squared

        geod = symmetric_epipolar_squared(spts[:, :2], spts[:, 2:4], models)
        e = jnp.minimum(geod, 1.0)
        gtm = gtm.astype(e.dtype)
        denom = jnp.maximum(jnp.sum(gtm), 1.0)
        per_h = jnp.sum(e * gtm[None, :], axis=-1) / denom
        v = valid.astype(e.dtype)
        if local_topk:
            ranked = jnp.where(valid, per_h, jnp.inf)
            neg_top, _ = jax.lax.top_k(-ranked, local_topk)
            vals = -neg_top
            ok = jnp.isfinite(vals)
            match_sum = jnp.sum(jnp.where(ok, vals, 0.0))
            match_cnt = jnp.sum(ok).astype(e.dtype)
        else:
            match_sum = jnp.sum(per_h * v)
            match_cnt = jnp.sum(v)
        if want_pose:
            err_R, err_t = pose_ops.evaluate_pose(
                models, spts[:, :2], spts[:, 2:4], R, t, svd=False)
            per_h_pose = (err_R + err_t) / 2.0
            pose_sum = jnp.sum(per_h_pose * v)
            pose_cnt = jnp.sum(v)
        else:
            pose_sum = jnp.asarray(0.0, e.dtype)
            pose_cnt = jnp.asarray(0.0, e.dtype)
        return match_sum, match_cnt, pose_sum, pose_cnt

    def shard_fn(points_blk, spts_blk, logits_blk, gt_blk, gtm_blk, keys_blk,
                 K1_blk, K2_blk, R_blk, t_blk):
        sums = jax.vmap(per_pair)(
            points_blk, spts_blk, logits_blk, gt_blk, gtm_blk, keys_blk,
            K1_blk, K2_blk, R_blk, t_blk)
        match_sum, match_cnt, pose_sum, pose_cnt = (
            jax.lax.psum(s, "hyp") for s in sums)  # each (Bp,)
        match = jax.lax.psum(
            jnp.sum(match_sum / jnp.maximum(match_cnt, 1.0)), "pairs")
        pose = jax.lax.psum(
            jnp.sum(pose_sum / jnp.maximum(pose_cnt, 1.0)), "pairs")
        B = points_blk.shape[0] * n_pairs  # global batch
        return match[None] / B, pose[None] / B

    return jax.jit(jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("pairs"),) * 10,
        out_specs=(P(), P()),
        check_vma=False,
    ))


def sharded_match_loss_hypotheses(
    cfg: RansacConfig,
    mesh: Mesh,
    points: jnp.ndarray,
    logits: jnp.ndarray,
    gt_models: jnp.ndarray,
    gt_masks: jnp.ndarray,
    keys: jax.Array,
    score_points: Optional[jnp.ndarray] = None,
    Ks: Optional[tuple] = None,
    topk: int = 0,
):
    """Match loss only — thin wrapper over
    :func:`sharded_hypothesis_losses` (kept for API stability)."""
    return sharded_hypothesis_losses(
        cfg, mesh, points, logits, gt_models, gt_masks, keys,
        score_points=score_points, Ks=Ks, topk=topk,
    )["match"]


def sharded_rigid_residual_loss(
    cfg: RansacConfig,
    mesh: Mesh,
    points: jnp.ndarray,
    logits: jnp.ndarray,
    keys: jax.Array,
):
    """Rigid-training residual loss over the mesh (the sharded counterpart
    of ``train.make_train_step_rigid``'s objective, reference
    ``train_point.py:9-30``): each ``hyp`` shard generates its slice of the
    hypotheses and contributes partial (Σ residual, Σ valid) sums; the
    psum-reduced mean equals the single-device
    ``mean(ransac_train_rigid(...)[3])`` over the union of shard lane sets.
    Differentiable through the collectives.

    Args:
        points: (B, N, 6) src‖ref 3D correspondences.
        logits: (B, N) sampler scores (gradient target).
        keys: (B,) uint32 per-pair seeds.

    Returns:
        scalar loss.
    """
    fn = _sharded_rigid_residual_fn(cfg, mesh)
    return fn(points, logits, keys)[0]


@functools.lru_cache(maxsize=64)
def _sharded_rigid_residual_fn(cfg: RansacConfig, mesh: Mesh):
    from differentiable_ransac_tpu.engine import ransac_train_rigid

    n_hyp = mesh.shape["hyp"]
    n_pairs = mesh.shape["pairs"]
    local_h = -(-cfg.num_hypotheses // n_hyp)
    local_cfg = cfg.replace(
        max_iterations=local_h,
        ransac_batch_size=min(cfg.ransac_batch_size, local_h),
    )

    def per_pair(pts, lg, seed):
        shard = jax.lax.axis_index("hyp")
        key = jax.random.fold_in(jax.random.PRNGKey(seed), shard)
        _, valid, res_sums, _ = ransac_train_rigid(local_cfg, pts, lg, key)
        # res_sums are already zeroed on invalid hypotheses
        return jnp.sum(res_sums), jnp.sum(valid.astype(pts.dtype))

    def shard_fn(points_blk, logits_blk, keys_blk):
        s, c = jax.vmap(per_pair)(points_blk, logits_blk, keys_blk)
        s = jax.lax.psum(s, "hyp")  # (Bp,)
        c = jax.lax.psum(c, "hyp")
        N = points_blk.shape[1]
        per_pair_mean = s / (jnp.maximum(c, 1.0) * N)
        total = jax.lax.psum(jnp.sum(per_pair_mean), "pairs")
        B = points_blk.shape[0] * n_pairs
        return total[None] / B

    return jax.jit(jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("pairs"),) * 3,
        out_specs=P(),
        check_vma=False,
    ))

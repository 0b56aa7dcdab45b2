"""Pose recovery from essential matrices — fully in-framework, batched.

Replaces the reference's OpenCV boundary (``cv2.recoverPose`` /
``cv2.triangulatePoints`` at ``/root/reference/cv_utils.py:48-189``) with
JAX-native batched DLT triangulation and cheirality checks, plus both the
SVD decomposition (``cv_utils.py:83-116``) and the SVD-free differentiable
Horn-1990 decomposition (``cv_utils.py:118-164``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from differentiable_ransac_tpu.ops.epipolar import cross_matrix

# Kept as host numpy: a module-level jnp.array would trigger device-backend
# initialization at import time (breaks lazy PJRT plugin registration).
_W = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])


def decompose_essential_svd(E: jnp.ndarray):
    """SVD decomposition of (..., 3, 3) E into (R1, R2, t).

    Follows the reference layout (``cv_utils.py:83-116``): R1 = U W Vᵀ,
    R2 = U Wᵀ Vᵀ with det-corrected U, Vᵀ, and t = last column of the raw U.
    Uses the eigh-based TPU-safe SVD (see :func:`ops.linalg.svd3x3`).
    """
    from differentiable_ransac_tpu.ops.linalg import svd3x3

    u, s, vt = svd3x3(E)
    du = jnp.sign(jnp.linalg.det(u))[..., None, None]
    dv = jnp.sign(jnp.linalg.det(vt))[..., None, None]
    u_ = u * du
    vt_ = vt * dv
    w = jnp.asarray(_W, E.dtype)
    r1 = u_ @ w @ vt_
    r2 = u_ @ w.T @ vt_
    t = u[..., :, -1]
    return r1, r2, t


def decompose_essential_horn(E: jnp.ndarray, eps: float = 1e-12):
    """SVD-free differentiable decomposition (Horn 1990).

    Reference: ``cv_utils.py:118-164`` (``new_decompose_E``). Chooses the
    largest pairwise cross product of E's columns as the baseline direction,
    recovers R via the cofactor identity ``(b·b) R = Cof(E)ᵀ − [b]× E``.
    Branch-free: the argmax over the three cross products is a masked select.

    Returns (R1, R2, t_unit) for batched (..., 3, 3) inputs.
    """
    e1, e2, e3 = E[..., :, 0], E[..., :, 1], E[..., :, 2]
    c12 = jnp.cross(e1, e2)
    c23 = jnp.cross(e2, e3)
    c31 = jnp.cross(e3, e1)
    crosses = jnp.stack([c12, c23, c31], axis=-2)  # (..., 3, 3)
    norms = jnp.linalg.norm(crosses, axis=-1)
    largest = jnp.argmax(norms, axis=-1)
    chosen = jnp.take_along_axis(crosses, largest[..., None, None], axis=-2)[..., 0, :]
    chosen_norm = jnp.linalg.norm(chosen, axis=-1, keepdims=True)
    scale = jnp.sqrt(0.5 * jnp.einsum("...ij,...ij->...", E, E))[..., None]
    b1 = scale * chosen / (chosen_norm + eps)
    b1_unit = b1 / (jnp.linalg.norm(b1, axis=-1, keepdims=True) + eps)

    B1 = cross_matrix(b1)
    bb = jnp.einsum("...i,...i->...", b1, b1)[..., None, None]
    # (b·b) R = Cof(E)ᵀ − [b]× E; the reference's matrix_cofactor_tensor
    # returns inv(E)ᵀ·det(E) which equals Cof(E) in its orientation.
    cof = cofactor(E)
    r1 = (cof - B1 @ E) / (bb + eps)
    r2 = (cof + B1 @ E) / (bb + eps)
    return r1, r2, b1_unit


def cofactor(M: jnp.ndarray) -> jnp.ndarray:
    """Cofactor matrix of (..., 3, 3), computed directly (no inverse/det
    singularities — unlike the reference's ``inv(M).T * det`` at
    ``cv_utils.py:166-178``)."""
    a = M[..., 0, 0]; b = M[..., 0, 1]; c = M[..., 0, 2]
    d = M[..., 1, 0]; e = M[..., 1, 1]; f = M[..., 1, 2]
    g = M[..., 2, 0]; h = M[..., 2, 1]; i = M[..., 2, 2]
    row0 = jnp.stack([e * i - f * h, -(d * i - f * g), d * h - e * g], axis=-1)
    row1 = jnp.stack([-(b * i - c * h), a * i - c * g, -(a * h - b * g)], axis=-1)
    row2 = jnp.stack([b * f - c * e, -(a * f - c * d), a * e - b * d], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def triangulate_dlt(P0: jnp.ndarray, P1: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Batched DLT triangulation (the ``cv2.triangulatePoints`` replacement,
    reference call site ``cv_utils.py:183``).

    Args:
        P0, P1: (3, 4) camera matrices (or batched (..., 3, 4)).
        x1, x2: (..., N, 2) image points.

    Returns:
        (..., N, 4) homogeneous 3D points (unnormalized).
    """
    rows = []
    for P, x in ((P0, x1), (P1, x2)):
        rows.append(x[..., 0:1] * P[..., 2:3, :] - P[..., 0:1, :])
        rows.append(x[..., 1:2] * P[..., 2:3, :] - P[..., 1:2, :])
    from differentiable_ransac_tpu.ops.linalg import jacobi_eigh

    rows = jnp.broadcast_arrays(*rows)  # P0 rows are unbatched; P1's may not be
    A = jnp.stack(rows, axis=-2)  # (..., N, 4, 4)
    gram = jnp.einsum("...mi,...mj->...ij", A, A)
    # Jacobi (pure mul/add, same gap-regularized VJP) instead of XLA's
    # EighTpu custom call: on hypothesis-batched pose recovery the custom
    # call's 2×2-block operands tile-pad 64× (3.84 GB per operand at
    # B=32·H-chunk=64·4·N=500 — the second OOM the F-mode w0 loss hit),
    # while Jacobi stays in unpadded elementwise form.
    shape = gram.shape
    _, vecs = jax.vmap(jacobi_eigh)(gram.reshape((-1, 4, 4)))
    return vecs.reshape(shape)[..., :, 0]


def cheirality_mask(
    P: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray, distance_threshold: float = 50.0
) -> jnp.ndarray:
    """Per-point cheirality check against candidate pose P (reference
    ``cv_utils.py:180-189``).

    P0 is the canonical [I|0]. Returns (..., N) boolean: point is in front of
    both cameras and within the distance threshold.
    """
    P0 = jnp.eye(3, 4, dtype=P.dtype)
    Q = triangulate_dlt(P0, P, x1, x2)  # (..., N, 4) homogeneous
    w = Q[..., 3]
    Qh = Q / jnp.where(jnp.abs(w[..., None]) > 1e-12, w[..., None], 1.0)
    Qp = jnp.einsum("...ij,...nj->...ni", P, Qh)
    return (
        (Q[..., 2] * Q[..., 3] > 0)
        & (Qh[..., 2] < distance_threshold)
        & (Qp[..., 2] > 0)
        & (Qp[..., 2] < distance_threshold)
    )


def recover_pose(
    E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray, svd: bool = True,
    distance_threshold: float = 50.0, return_mask: bool = False,
):
    """Choose (R, t) among the 4 candidate decompositions by cheirality voting.

    Branch-free equivalent of the reference's ``recoverPose``
    (``cv_utils.py:48-80``) — works on batched E of shape (..., 3, 3).

    Note the reference's selection mixes candidates and returns
    ``(R1,t) (R2,t) (R1,-t) (R2,-t)`` for best index 0..3 (an off-by-one
    quirk of ``cv_utils.py:73-80``); we return the candidate that actually
    won the vote.

    Returns (R, t) (and the winning inlier mask if ``return_mask``).
    """
    decompose = decompose_essential_svd if svd else decompose_essential_horn
    r1, r2, t = decompose(E)
    t = t.reshape(r1.shape[:-2] + (3,))
    cands_R = jnp.stack([r1, r2, r1, r2], axis=-3)  # (..., 4, 3, 3)
    cands_t = jnp.stack([t, t, -t, -t], axis=-2)  # (..., 4, 3)
    P = jnp.concatenate([cands_R, cands_t[..., None]], axis=-1)  # (..., 4, 3, 4)
    mask = cheirality_mask(P, x1[..., None, :, :], x2[..., None, :, :], distance_threshold)
    votes = jnp.sum(mask, axis=-1)  # (..., 4)
    best = jnp.argmax(votes, axis=-1)
    R = jnp.take_along_axis(cands_R, best[..., None, None, None], axis=-3)[..., 0, :, :]
    tt = jnp.take_along_axis(cands_t, best[..., None, None], axis=-2)[..., 0, :]
    if return_mask:
        m = jnp.take_along_axis(mask, best[..., None, None], axis=-2)[..., 0, :]
        return R, tt, m
    return R, tt


def gt_inlier_mask(gt_E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray,
                   distance_threshold: float = 50.0) -> jnp.ndarray:
    """Ground-truth inlier mask from the GT essential matrix.

    In-framework replacement of the loss-side ``cv2.recoverPose(gt_E, ...)``
    mask extraction (reference ``loss.py:98-104, 126-134``). Non-differentiable
    by design: treat as constant labels.
    """
    _, _, mask = recover_pose(gt_E, x1, x2, svd=True,
                              distance_threshold=distance_threshold, return_mask=True)
    return jax.lax.stop_gradient(mask)


def rotation_error(R: jnp.ndarray, R_gt: jnp.ndarray) -> jnp.ndarray:
    """Angular rotation error in radians (reference ``cv_utils.py:361-378``)."""
    tr = jnp.einsum("...ij,...ij->...", R, R_gt)
    return jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))


def translation_error(t: jnp.ndarray, t_gt: jnp.ndarray, eps: float = 1e-15) -> jnp.ndarray:
    """Angular translation error (sign-invariant), radians
    (reference ``cv_utils.py:381-400``)."""
    t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + eps)
    tg = t_gt / (jnp.linalg.norm(t_gt, axis=-1, keepdims=True) + eps)
    loss_t = jnp.clip(1.0 - jnp.sum(t * tg, axis=-1) ** 2, eps, None)
    return jnp.arccos(jnp.sqrt(jnp.clip(1.0 - loss_t + 1e-8, 0.0, 1.0)))


def evaluate_pose(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray,
                  R_gt: jnp.ndarray, t_gt: jnp.ndarray, svd: bool = True):
    """(err_R°, err_t°) via in-framework pose recovery
    (reference ``eval_essential_matrix``, ``cv_utils.py:503-525``)."""
    R, t = recover_pose(E, x1, x2, svd=svd)
    err_q = rotation_error(R, R_gt) * (180.0 / jnp.pi)
    # broadcast one GT translation against (..., 3) recovered candidates
    # (t_gt may arrive as (3,) or (3, 1) while E is hypothesis-batched)
    t_gt = jnp.broadcast_to(jnp.reshape(t_gt, (3,)), t.shape)
    err_t = translation_error(t, t_gt) * (180.0 / jnp.pi)
    return err_q, err_t


def quaternion_from_rotation(R: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) from (..., 3, 3) rotations.

    Branch-free variant of the eigenvector method used by the reference
    (``cv_utils.py:249-273``): builds the symmetric 4×4 K matrix and takes
    the eigenvector of the largest eigenvalue.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    K = jnp.stack(
        [
            jnp.stack([m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12], axis=-1),
            jnp.stack([m01 + m10, m11 - m00 - m22, m12 + m21, m02 - m20], axis=-1),
            jnp.stack([m02 + m20, m12 + m21, m22 - m00 - m11, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, m02 - m20, m10 - m01, m00 + m11 + m22], axis=-1),
        ],
        axis=-2,
    ) / 3.0
    from differentiable_ransac_tpu.ops.linalg import safe_eigh

    w, V = safe_eigh(K)
    v = V[..., :, -1]  # largest eigenvalue
    q = jnp.stack([v[..., 3], v[..., 0], v[..., 1], v[..., 2]], axis=-1)
    return q * jnp.sign(q[..., :1] + 1e-30)


def rodrigues_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle in degrees — replacement for the
    ``cv2.Rodrigues``-then-norm idiom (reference ``cv_utils.py:664-666``)."""
    tr = jnp.einsum("...ii->...", R)
    return jnp.degrees(jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)))

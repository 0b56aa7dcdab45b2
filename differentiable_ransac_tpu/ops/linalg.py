"""Small-matrix linear algebra helpers for the minimal solvers.

TPU note: the solver hot loops need null spaces of tiny Gram matrices
(9×9, 4×4, 3×3) for thousands of hypotheses at once. We use symmetric
eigendecomposition of ``AᵀA`` (``jnp.linalg.eigh`` — batched, differentiable,
XLA-native on TPU) instead of the reference's ``torch.linalg.svd`` of
``AᵀA`` (e.g. ``essential_matrix_estimator_nister.py:117-119``): identical
null spaces, better TPU mapping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def safe_eigh(a: jnp.ndarray):
    """``jnp.linalg.eigh`` with a gap-regularized backward pass.

    The standard eigh VJP contains ``1/(λⱼ−λᵢ)`` terms that blow up for
    (near-)degenerate eigenvalues — exactly the situation of the solvers'
    null spaces, where 4 eigenvalues cluster at ~0 (the reference's torch
    SVD backward NaNs the same way; its training loop skips batches on NaN,
    ``train.py:145-182``). Here the gap is Lorentzian-regularized,
    ``g/(g²+ε)``: within-cluster rotations (which do not change the solution
    set) contribute ~0 gradient instead of NaN, while well-separated modes
    keep their exact gradient.
    """
    return jnp.linalg.eigh(a)


def _safe_eigh_fwd(a):
    w, v = jnp.linalg.eigh(a)
    return (w, v), (w, v)


def _safe_eigh_bwd(res, cots):
    w, v = res
    dw, dv = cots
    scale = jnp.max(jnp.abs(w), axis=-1, keepdims=True) + 1e-30
    eps = (1e-6 * scale[..., None]) ** 2
    gap = w[..., None, :] - w[..., :, None]  # λⱼ − λᵢ at (i, j)
    F = gap / (gap * gap + eps)
    vt_dv = jnp.einsum("...ki,...kj->...ij", v, dv)
    inner = F * vt_dv
    eye = jnp.eye(w.shape[-1], dtype=w.dtype)
    core = eye * dw[..., None, :] + inner
    da = jnp.einsum("...ik,...kl,...jl->...ij", v, core, v)
    return ((da + jnp.swapaxes(da, -1, -2)) / 2.0,)


safe_eigh.defvjp(_safe_eigh_fwd, _safe_eigh_bwd)


def null_space_from_gram(A: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-dimensional (approximate) null space of batched ``A`` via ``AᵀA``.

    Args:
        A: (..., M, N) constraint matrices.
        k: null-space dimensionality to extract.

    Returns:
        (..., N, k): eigenvectors of ``AᵀA`` for the k smallest eigenvalues,
        ordered from smallest eigenvalue up.
    """
    gram = jnp.einsum("...mi,...mj->...ij", A, A)
    _, vecs = safe_eigh(gram)  # ascending eigenvalues
    return vecs[..., :k]


def gauss_jordan_solve(A: jnp.ndarray, B: jnp.ndarray, eps: float = 0.0):
    """Solve ``A @ X = B`` for one small static-size system by unrolled
    Gauss–Jordan elimination with partial pivoting.

    The TPU replacement for ``linalg.solve`` in the Nistér 10×10 elimination
    (reference ``essential_matrix_estimator_nister.py:159``): a fully
    ``vmap``-able sequence of mul/adds that compiles in any dtype (XLA's
    batched-LU custom call does not compile for f64 on TPU). Singularity is
    reported via the returned flag instead of the reference's
    shape-changing rank filter (``:155-163``).

    Args:
        A: (n, n). B: (n, m).

    Returns:
        (X (n, m), ok ()): ``ok`` is False when a pivot vanished.
    """
    n = A.shape[-2]
    M = jnp.concatenate([A, B], axis=-1)
    rows = jnp.arange(n)
    ok = jnp.asarray(True)
    for j in range(n):
        col = jnp.abs(M[:, j])
        score = jnp.where(rows < j, -jnp.inf, col)
        p = jnp.argmax(score)
        # swap rows j and p
        rowj, rowp = M[j], M[p]
        M = M.at[p].set(rowj).at[j].set(rowp)
        piv = M[j, j]
        ok = ok & (jnp.abs(piv) > eps)
        M = M.at[j].set(M[j] / jnp.where(jnp.abs(piv) > eps, piv, 1.0))
        factors = jnp.where(rows == j, 0.0, M[:, j])
        M = M - factors[:, None] * M[j][None, :]
    return M[:, n:], ok


def svd3x3(M: jnp.ndarray):
    """Batched SVD of (..., 3, 3) matrices. Thin wrapper for now; a closed-form
    Pallas kernel is the planned fast path."""
    return jnp.linalg.svd(M)


def project_to_essential(E: jnp.ndarray) -> jnp.ndarray:
    """Project (..., 3, 3) onto the essential manifold: singular values (1,1,0)."""
    u, s, vt = jnp.linalg.svd(E)
    d = jnp.zeros_like(s).at[..., 0].set(1.0).at[..., 1].set(1.0)
    return jnp.einsum("...ik,...k,...kj->...ij", u, d, vt)


def normalize_frobenius(M: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Scale (..., 3, 3) matrices to unit Frobenius norm."""
    n = jnp.sqrt(jnp.sum(M * M, axis=(-2, -1), keepdims=True))
    return M / (n + eps)

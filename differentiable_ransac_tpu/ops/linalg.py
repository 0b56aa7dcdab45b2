"""Small-matrix linear algebra helpers for the minimal solvers.

TPU note: the solver hot loops need null spaces of tiny Gram matrices
(9×9, 4×4, 3×3) for thousands of hypotheses at once. We use symmetric
eigendecomposition of ``AᵀA`` (``jnp.linalg.eigh`` — batched, differentiable,
XLA-native on TPU) instead of the reference's ``torch.linalg.svd`` of
``AᵀA`` (e.g. ``essential_matrix_estimator_nister.py:117-119``): identical
null spaces, better TPU mapping.
"""

from __future__ import annotations

import functools

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

    Returns a plain ``(eigenvalues, eigenvectors)`` tuple (NOT the
    ``EighResult`` namedtuple): the custom-VJP fwd rule must produce the
    same pytree structure as the primal, and jit-of-shard_map enforces it.
    """
    w, v = jnp.linalg.eigh(a)
    return w, v


def _safe_eigh_fwd(a):
    w, v = jnp.linalg.eigh(a)
    return (w, v), (w, v)


def _safe_eigh_bwd(res, cots):
    w, v = res
    dw, dv = cots
    scale = jnp.max(jnp.abs(w), axis=-1, keepdims=True) + 1e-30
    # floor at the smallest normal: for an all-zero spectrum (e.g. Horn's N
    # on a fully repeated sample) (1e-6·scale)² underflows to 0 and
    # F = 0/0 = NaN (tests/test_degenerate.py::test_rigid_repeated_points)
    eps = jnp.maximum((1e-6 * scale[..., None]) ** 2,
                      jnp.asarray(jnp.finfo(w.dtype).tiny, w.dtype))
    gap = w[..., None, :] - w[..., :, None]  # λⱼ − λᵢ at (i, j)
    F = gap / (gap * gap + eps)
    vt_dv = jnp.einsum("...ki,...kj->...ij", v, dv)
    inner = F * vt_dv
    eye = jnp.eye(w.shape[-1], dtype=w.dtype)
    core = eye * dw[..., None, :] + inner
    da = jnp.einsum("...ik,...kl,...jl->...ij", v, core, v)
    return ((da + jnp.swapaxes(da, -1, -2)) / 2.0,)


safe_eigh.defvjp(_safe_eigh_fwd, _safe_eigh_bwd)


def _jacobi_eigh_impl(A: jnp.ndarray, sweeps: int):
    """Unrolled cyclic Jacobi eigendecomposition for a single small
    symmetric matrix (vmap for batches)."""
    n = A.shape[-1]
    V = jnp.eye(n, dtype=A.dtype)
    eps = jnp.asarray(jnp.finfo(A.dtype).tiny * 1e3, A.dtype)
    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                apq = A[p, q]
                app = A[p, p]
                aqq = A[q, q]
                # Givens rotation zeroing A[p, q] (branch-free Rutishauser).
                tau = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) > eps, apq, 1.0))
                t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
                t = jnp.where(jnp.abs(apq) > eps, jnp.where(tau == 0.0, 1.0, t), 0.0)
                c = 1.0 / jnp.sqrt(1.0 + t * t)
                s = t * c
                # A ← JᵀAJ: update rows/cols p, q (static indices).
                row_p = A[p, :] * c - A[q, :] * s
                row_q = A[p, :] * s + A[q, :] * c
                A = A.at[p, :].set(row_p).at[q, :].set(row_q)
                col_p = A[:, p] * c - A[:, q] * s
                col_q = A[:, p] * s + A[:, q] * c
                A = A.at[:, p].set(col_p).at[:, q].set(col_q)
                vp = V[:, p] * c - V[:, q] * s
                vq = V[:, p] * s + V[:, q] * c
                V = V.at[:, p].set(vp).at[:, q].set(vq)
    w = jnp.diagonal(A)
    order = jnp.argsort(w)
    return w[order], V[:, order]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _jacobi_eigh_vjp(sweeps: int, A: jnp.ndarray):
    return _jacobi_eigh_impl(A, sweeps)


def _jacobi_fwd(sweeps, A):
    w, v = _jacobi_eigh_impl(A, sweeps)
    return (w, v), (w, v)


def _jacobi_bwd(sweeps, res, cots):
    return _safe_eigh_bwd(res, cots)


_jacobi_eigh_vjp.defvjp(_jacobi_fwd, _jacobi_bwd)


def jacobi_eigh(A: jnp.ndarray, sweeps: int = 8):
    """Symmetric eigendecomposition via unrolled cyclic Jacobi — the
    TPU-native replacement for ``linalg.eigh`` in the solver hot path.

    Why not XLA's eigh: on TPU its f64 lowering compiles pathologically
    slowly and its vmapped f64 backward produces NaNs; Jacobi is pure
    mul/add with static indices — any dtype, fast to compile, exactly
    vmappable. Backward uses the same gap-regularized VJP as
    :func:`safe_eigh` (degenerate clusters contribute ~0 gradient instead
    of NaN).

    Args:
        A: (n, n) symmetric (vmap for batches; n small — solvers use 4/9).
        sweeps: fixed Jacobi sweeps (8 reaches fp64 machine precision for
            n ≤ 16).

    Returns:
        (w (n,), V (n, n)): ascending eigenvalues, eigenvectors in columns.
    """
    return _jacobi_eigh_vjp(sweeps, A)


def gram_schmidt(X: jnp.ndarray, eps: float = 1e-30) -> jnp.ndarray:
    """Modified Gram–Schmidt orthonormalization of the columns of (n, k)."""
    cols = []
    k = X.shape[-1]
    for i in range(k):
        v = X[:, i]
        for u in cols:
            v = v - jnp.dot(u, v) * u
        n = jnp.sqrt(jnp.sum(v * v))
        cols.append(v / jnp.where(n > eps, n, 1.0))
    return jnp.stack(cols, axis=-1)


def _null_space_impl(A: jnp.ndarray, k: int):
    """Hybrid precise null space: f32 XLA eigh (fast custom call) seeds one
    f64 inverse-iteration step through the unrolled GJ solve.

    Background: the minimal-solver null spaces need ~f64 accuracy (f32
    conditioning costs 2-3 digits), but XLA's f64 eigh compiles
    pathologically slowly on TPU and an unrolled Jacobi does too. A is
    (m, n) with an EXACT ≥k-dim null space (m ≤ n − k for minimal samples),
    so a single (G + εI)⁻¹ inverse-iteration step amplifies the null
    directions by ~1/ε and recovers full working precision from the f32
    seed. For non-minimal fits the smallest eigenvalue is noise-driven and
    one step still contracts the f32 seed error by λ₁/λ₂.
    """
    n = A.shape[-1]
    gram32 = jnp.einsum("mi,mj->ij", A.astype(jnp.float32), A.astype(jnp.float32))
    w32, v32 = jnp.linalg.eigh(gram32)  # ascending
    V0 = v32[:, :k].astype(A.dtype)
    if A.dtype == jnp.float32:
        return V0, (w32, v32)
    G = jnp.einsum("mi,mj->ij", A, A)
    eps = 1e-13 * (jnp.trace(G) / n + 1e-30)
    X, ok = gauss_jordan_solve(G + eps * jnp.eye(n, dtype=A.dtype), V0)
    X = jnp.where(ok & jnp.all(jnp.isfinite(X)), X, V0)
    return gram_schmidt(X), (w32, v32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _null_space_vjp(k: int, A: jnp.ndarray):
    X, _ = _null_space_impl(A, k)
    return X


def _null_space_fwd(k, A):
    X, (w32, v32) = _null_space_impl(A, k)
    return X, (A, X, w32, v32)


def _null_space_bwd(k, res, dX):
    A, X, w32, v32 = res
    n = A.shape[-1]
    dtype = A.dtype
    # Gap-regularized eigh VJP with the refined null block substituted into
    # the f32 spectrum's basis (approximately orthonormal — gradients are
    # regularized anyway; cf. safe_eigh).
    V_full = jnp.concatenate([X, v32[:, k:].astype(dtype)], axis=-1)
    dv_full = jnp.concatenate([dX, jnp.zeros((n, n - k), dtype)], axis=-1)
    w = w32.astype(dtype)
    dw = jnp.zeros((n,), dtype)
    (dG,) = _safe_eigh_bwd((w, V_full), (dw, dv_full))
    dA = A @ (dG + dG.T)
    return (dA,)


_null_space_vjp.defvjp(_null_space_fwd, _null_space_bwd)


def null_space_rows_complement(A: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact null space for MINIMAL systems (``M = N − k`` rows): the
    orthogonal complement of the row space.

    No eigendecomposition at all — XLA's batched tiny ``eigh`` costs ~15 µs
    per 9×9 matrix on TPU (a data-dependent Jacobi while-loop) and dominated
    the entire hypothesis pipeline. Here: two-pass modified Gram–Schmidt on
    the M rows, projector ``P = I − QᵀQ``, then k orthonormal columns
    extracted by pivoted deflation. ~20 fused VPU ops, fully ``vmap``-able,
    differentiable, any dtype.

    Args:
        A: (M, N) with M = N − k (minimal sample constraint matrix). Rows
            may carry arbitrary nonzero scales (weighted solves): the row
            SPACE — hence its complement — is scale-invariant.
        k: null-space dimension.

    Returns:
        (N, k) orthonormal null-space basis (order is an arbitrary rotation
        within the exact null cluster, as with any eigh of a degenerate
        block).
    """
    m, n = A.shape
    # two-pass MGS on rows ("twice is enough" re-orthogonalization)
    rows = []
    # NaN-safe normalization: sqrt/rsqrt must never SEE a (near-)zero sum —
    # guarding only the division still leaks ∞ into the backward through
    # d√s/ds at s=0 (rank-deficient samples: repeated correspondences zero
    # the row after orthogonalization; tests/test_degenerate.py). The rank
    # cutoff is RELATIVE to the sample scale (machine-eps · ‖A‖²): an
    # orthogonalization residual below √eps·‖A‖ is numerical noise, and
    # treating it as a direction puts 1/‖v‖ ≈ 1/noise into the backward —
    # finite, but large enough to overflow the solver's f32 out-dtype cast
    # downstream. Real minimal samples have residuals ≫ √eps·‖A‖; ones
    # that don't are degenerate and simply rank lower in the forward.
    scale_sq = jnp.max(jnp.sum(A * A, axis=-1))
    cut = jnp.maximum(
        scale_sq * jnp.asarray(float(jnp.finfo(A.dtype).eps), A.dtype),
        jnp.asarray(float(jnp.finfo(A.dtype).tiny), A.dtype),
    )

    def _unit(v):
        s = jnp.sum(v * v)
        ok = s > cut
        # sqrt+divide (not rsqrt): bit-identical to the historical v/‖v‖,
        # and sqrt only ever sees the guarded value
        return jnp.where(ok, v / jnp.sqrt(jnp.where(ok, s, 1.0)), 0.0)

    for i in range(m):
        v = A[i]
        for _pass in range(2):
            for u in rows:
                v = v - jnp.dot(u, v) * u
        rows.append(_unit(v))
    Q = jnp.stack(rows)  # (m, n) orthonormal (zero rows if rank-deficient)
    P = jnp.eye(n, dtype=A.dtype) - Q.T @ Q
    cols = []
    for _ in range(k):
        norms = jnp.sum(P * P, axis=0)
        j = jnp.argmax(norms)
        c = _unit(P[:, j])
        cols.append(c)
        P = P - c[:, None] * (c[None, :] @ P)
    return jnp.stack(cols, axis=-1)


def null_space_from_gram(A: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-dimensional (approximate) null space of a single ``A``
    (vmapped by the solvers).

    Minimal systems (M = N − k rows) take the eigendecomposition-free
    row-complement path (:func:`null_space_rows_complement`) — the TPU hot
    path. Overdetermined systems (non-minimal refits) use the hybrid
    f32-eigh-seed + f64 inverse-iteration solve with column preconditioning
    (pixel-coordinate Grams span ~12 orders of magnitude, which wipes out
    the null structure in a raw f32 seed; null(A·D) = D⁻¹·null(A) maps the
    basis back exactly).

    Args:
        A: (M, N) constraint matrix.
        k: null-space dimensionality to extract.

    Returns:
        (N, k): orthonormal basis (smallest-eigenvalue modes first for the
        overdetermined path).
    """
    if A.shape[0] + k == A.shape[1]:
        return null_space_rows_complement(A, k)
    norms = jnp.sqrt(jnp.sum(A * A, axis=0)) + 1e-30
    D = 1.0 / norms
    Xs = _null_space_vjp(k, A * D[None, :])
    return gram_schmidt(Xs * D[:, None])


def _gauss_jordan_impl(A: jnp.ndarray, B: jnp.ndarray, rtol: float = 1e-13):
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
        rtol: relative pivot tolerance — a pivot below ``rtol·max|A|`` marks
            the system numerically singular (degenerate minimal samples
            produce ~1e-300 pivots whose reciprocals overflow downstream;
            an exact-zero test does not catch them).

    Returns:
        (X (n, m), ok ()): ``ok`` is False when the system is singular.
    """
    n = A.shape[-2]
    scale = jnp.max(jnp.abs(A)) + 1e-300
    tol = rtol * scale
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
        piv_ok = jnp.abs(piv) > tol
        ok = ok & piv_ok
        M = M.at[j].set(M[j] / jnp.where(piv_ok, piv, 1.0))
        factors = jnp.where(rows == j, 0.0, M[:, j])
        M = M - factors[:, None] * M[j][None, :]
    X = M[:, n:]
    # zero (rather than propagate) the output of singular lanes so no inf
    # reaches downstream gradients
    return jnp.where(ok, X, 0.0), ok


@jax.custom_vjp
def _gauss_jordan_vjp(A: jnp.ndarray, B: jnp.ndarray):
    return _gauss_jordan_impl(A, B)


def _gj_fwd(A, B):
    X, ok = _gauss_jordan_impl(A, B)
    return (X, ok), (A, X, ok)


def _gj_bwd(res, cots):
    A, X, ok = res
    dX, _dok = cots
    dX = jnp.where(jnp.isfinite(dX), dX, 0.0)
    # Implicit differentiation of A X = B: dB = A⁻ᵀ dX, dA = −dB Xᵀ.
    # (Autodiff through the elimination itself produces 1/pivot² terms that
    # explode on near-singular lanes; the implicit form pays conditioning
    # only once, and singular lanes return zero gradients.)
    gB, ok2 = _gauss_jordan_impl(A.T, dX)
    gB = jnp.where(ok & ok2 & jnp.all(jnp.isfinite(gB)), gB, 0.0)
    gA = -gB @ X.T
    return gA, gB


_gauss_jordan_vjp.defvjp(_gj_fwd, _gj_bwd)


def gauss_jordan_solve(A: jnp.ndarray, B: jnp.ndarray):
    """Solve ``A @ X = B`` (see :func:`_gauss_jordan_impl`) with an implicit
    VJP that stays bounded on near-singular systems."""
    return _gauss_jordan_vjp(A, B)


def svd3x3(M: jnp.ndarray, eps: float = 1e-12):
    """TPU-safe SVD of (..., 3, 3) via symmetric eigendecomposition.

    XLA's small-matrix SVD custom call crashes the TPU compiler in several
    compositions (TransposeFolding ``buffer != nullptr`` check failures).
    Construction: V from ``eigh(MᵀM)`` (descending), ``s = √λ``,
    ``u_i = M v_i / s_i`` re-orthogonalized, ``u₃ = u₁ × u₂`` — exactly the
    structure the essential/rank-2 consumers need (any valid SVD gives the
    same pose/projection sets).

    Returns (U, s, Vt) with ``M ≈ U diag(s) Vt``.
    """
    MtM = jnp.einsum("...ki,...kj->...ij", M, M)
    w, V = safe_eigh(MtM)  # ascending
    V = V[..., ::-1]
    s = jnp.sqrt(jnp.clip(w[..., ::-1], 0.0, None))
    u1 = jnp.einsum("...ij,...j->...i", M, V[..., 0]) / (s[..., 0:1] + eps)
    u1 = u1 / (jnp.linalg.norm(u1, axis=-1, keepdims=True) + eps)
    u2 = jnp.einsum("...ij,...j->...i", M, V[..., 1]) / (s[..., 1:2] + eps)
    u2 = u2 - jnp.sum(u1 * u2, axis=-1, keepdims=True) * u1
    u2 = u2 / (jnp.linalg.norm(u2, axis=-1, keepdims=True) + eps)
    u3 = jnp.cross(u1, u2)
    U = jnp.stack([u1, u2, u3], axis=-1)
    return U, s, jnp.swapaxes(V, -1, -2)


def project_to_essential(E: jnp.ndarray) -> jnp.ndarray:
    """Project (..., 3, 3) onto the essential manifold: singular values (1,1,0)."""
    u, s, vt = svd3x3(E)
    d = jnp.zeros_like(s).at[..., 0].set(1.0).at[..., 1].set(1.0)
    return jnp.einsum("...ik,...k,...kj->...ij", u, d, vt)


def normalize_frobenius(M: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Scale (..., 3, 3) matrices to unit Frobenius norm."""
    n = jnp.sqrt(jnp.sum(M * M, axis=(-2, -1), keepdims=True))
    return M / (n + eps)

"""Nistér 5-point essential-matrix solver — TPU-native, branch-free.

Re-derivation of the pipeline in the reference
(``/root/reference/estimators/essential_matrix_estimator_nister.py:69-408``)
as a single-sample, fixed-shape function for ``jax.vmap``:

1. 5×9 epipolar constraint, 4-dim null space via ``eigh`` of the 9×9 Gram.
2. The ten Nistér constraints (det(E)=0 and EEᵀE − ½tr(EEᵀ)E = 0) expanded
   over the degree-3 monomial basis. The reference hand-codes the polynomial
   products (``o1``/``o2``, ``:410-430``); here they are static sparse
   3-tensors contracted with ``einsum`` — built programmatically from
   exponent arithmetic at import time.
3. Gauss–Jordan elimination of the 10×20 system via batched LU solve.
4. The degree-10 univariate polynomial as a symbolic 3×3 polynomial
   determinant (the reference transcribes its 11 cofactor-sum coefficients
   over 170 lines, ``:178-348``; we compute the same determinant with
   polynomial convolutions).
5. All ten roots at once with the Aberth–Ehrlich simultaneous iteration
   (replacing the per-sample companion-matrix ``eigvals`` python loop,
   ``:355-377``).
6. Back-substitution of (x, y) per root via 2×2 normal equations over the
   three derived rows; E composed from the orthonormal null-space basis and
   Frobenius-normalized (``:395-399``).

Always emits exactly 10 solution slots with a validity mask (the reference
pads with identity, ``:400-401``).

Model convention: returned E satisfies ``x2ᵀ E x1 = 0`` for
correspondences ``(x1, y1, x2, y2)`` in calibrated (K-normalized) coords.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from differentiable_ransac_tpu.ops.linalg import (
    gauss_jordan_solve,
    null_space_from_gram,
    project_to_essential,
)
from differentiable_ransac_tpu.ops.polynomial import (
    aberth_roots,
    polymul,
    polyval,
    sturm_bisect_roots,
)

SAMPLE_SIZE = 5
SOLUTIONS = 10

# ---------------------------------------------------------------------------
# Static monomial-product tensors.
#
# Degree-1 basis  (4):  [x, y, z, 1]
# Degree-2 basis (10):  [x², xy, xz, x, y², yz, y, z², z, 1]
# Degree-3 basis (20):  [x³, y³, x²y, xy², x²z, x², y²z, y², xyz, xy,
#                        xz², xz, x, yz², yz, y, z³, z², z, 1]
# (same monomial orders as the reference's o1/o2 helpers so intermediate
# values are directly comparable).
# ---------------------------------------------------------------------------

_DEG1 = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]
_DEG2 = [
    (2, 0, 0), (1, 1, 0), (1, 0, 1), (1, 0, 0), (0, 2, 0),
    (0, 1, 1), (0, 1, 0), (0, 0, 2), (0, 0, 1), (0, 0, 0),
]
_DEG3 = [
    (3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
    (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
    (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
    (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0),
]


def _product_tensor(basis_a, basis_b, basis_out) -> np.ndarray:
    """T[p, i, j] = 1 iff basis_a[i] * basis_b[j] == basis_out[p]."""
    index = {m: p for p, m in enumerate(basis_out)}
    T = np.zeros((len(basis_out), len(basis_a), len(basis_b)), np.float32)
    for i, ma in enumerate(basis_a):
        for j, mb in enumerate(basis_b):
            prod = tuple(a + b for a, b in zip(ma, mb))
            T[index[prod], i, j] = 1.0
    return T

_O1 = _product_tensor(_DEG1, _DEG1, _DEG2)   # (10, 4, 4)
_O2 = _product_tensor(_DEG2, _DEG1, _DEG3)   # (20, 10, 4)


def _o1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) × (..., 4) -> (..., 10) polynomial product."""
    return jnp.einsum("...i,...j,pij->...p", a, b, jnp.asarray(_O1, a.dtype))


def _o2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., 10) × (..., 4) -> (..., 20) polynomial product."""
    return jnp.einsum("...i,...j,pij->...p", a, b, jnp.asarray(_O2, a.dtype))


def _constraint_rows(matches: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """5×9 epipolar constraint rows; column order is the reference's
    column-major vec(E): e[3j+i] = E_ij
    (``essential_matrix_estimator_nister.py:87-115``)."""
    x1, y1 = matches[..., 0], matches[..., 1]
    x2, y2 = matches[..., 2], matches[..., 3]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x1 * x2, x1 * y2, x1, y1 * x2, y1 * y2, y1, x2, y2, ones], axis=-1
    )
    if weights is not None:
        A = A * weights[..., None]
    return A


def essential_5pt_nister(
    matches: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    solve_dtype=jnp.float64,
    root_solver: str = "aberth",
    root_iters: int = 0,
    root_polish: int = 0,
):
    """Nistér 5PC for a single minimal sample.

    The core runs in ``solve_dtype`` (default f64): the 10×20 elimination and
    degree-10 determinant expansion lose 2-3 digits to conditioning in f32,
    producing a heavy error tail. The per-sample matrices are tiny, so the
    f64 cost is negligible next to the f32 scoring matmuls. Output is cast
    back to the input dtype.

    Args:
        matches: (5, 4) calibrated correspondences.
        weights: optional (5,) row weights.
        solve_dtype: dtype of the solver core.
        root_solver: degree-10 real-root backend — "aberth" (simultaneous
            iteration, default, fast) or "sturm" (isolation + bisection,
            guaranteed bracketing; the reference's StrumPolynomialSolver
            capability, ``math_utils.py:111-501``). Caveat: the Sturm chain
            counts DISTINCT real roots, so a repeated (multiplicity ≥ 2)
            real root of the degree-10 polynomial yields fewer candidate
            solutions than the Aberth backend on the same sample — a
            measure-zero event for noisy minimal samples, and the RANSAC
            layer is robust to a missing candidate (the sample simply ranks
            lower); prefer "aberth" when exact solution multiplicity
            matters.
        root_iters: Aberth iteration budget override (0 = backend default).
            A reduced "draft" budget is meant for f32 prescreen ranking in
            the fast engines, where the carried winners are re-solved at
            full precision afterwards. Ignored by the sturm backend.
        root_polish: Newton-polish step override (0 = backend default).

    Returns:
        (models (10, 3, 3), valid (10,) bool). Invalid slots are identity.
    """
    out_dtype = matches.dtype
    matches = matches.astype(solve_dtype)
    if weights is not None:
        weights = weights.astype(solve_dtype)
    dtype = matches.dtype
    A = _constraint_rows(matches, weights)  # (5, 9)
    ns = null_space_from_gram(A, 4)  # (9, 4) ascending eigenvalues
    # Reference basis order: [4th-smallest, 3rd, 2nd, smallest] — the
    # constant-term basis vector is the smallest-eigenvalue one.
    ns = ns[:, ::-1]

    # P[i, j] = degree-1 coefficient 4-vector of E_ij over [x, y, z, 1].
    # e[3j+i] = E_ij  =>  P[i, j, :] = ns[3*j + i].
    P = jnp.transpose(ns.reshape(3, 3, 4), (1, 0, 2))  # (i, j, 4)

    # --- determinant constraint (degree-3, 20-dim) -----------------------
    det_row = (
        _o2(_o1(P[0, 1], P[1, 2]) - _o1(P[0, 2], P[1, 1]), P[2, 0])
        + _o2(_o1(P[0, 2], P[1, 0]) - _o1(P[0, 0], P[1, 2]), P[2, 1])
        + _o2(_o1(P[0, 0], P[1, 1]) - _o1(P[0, 1], P[1, 0]), P[2, 2])
    )

    # --- trace constraint rows: EEᵀE − ½ tr(EEᵀ) E = 0 -------------------
    # d[i, k] = (E Eᵀ)_{ik} as a degree-2 (10-dim) polynomial.
    d = jnp.einsum("ikp,jkq,spq->ijs", P, P, jnp.asarray(_O1, dtype))
    trace_half = 0.5 * (d[0, 0] + d[1, 1] + d[2, 2])
    eye3 = jnp.eye(3, dtype=dtype)
    d = d - trace_half[None, None, :] * eye3[:, :, None]
    # row(i, j) = Σ_k o2(d[i, k], P[k, j])  (degree-3, 20-dim).
    trace_rows = jnp.einsum("iks,kjm,psm->ijp", d, P, jnp.asarray(_O2, dtype))
    trace_rows = trace_rows.reshape(9, 20)

    M = jnp.concatenate([trace_rows, det_row[None, :]], axis=0)  # (10, 20)

    # --- Gauss–Jordan elimination ---------------------------------------
    # The magnitude bound is the fixed-shape analogue of the reference's
    # rank filter (``essential_matrix_estimator_nister.py:155-163``):
    # near-singular systems produce astronomically scaled eliminations whose
    # downstream squares overflow (also in gradients).
    elim, gj_ok = gauss_jordan_solve(M[:, :10], M[:, 10:])  # (10, 10)
    elim_ok = gj_ok & jnp.all(jnp.isfinite(elim)) & (jnp.max(jnp.abs(elim)) < 1e8)
    elim = jnp.where(elim_ok, elim, 0.0)

    # --- derived rows: x·p_i(z) + y·q_i(z) + c_i(z) = 0 ------------------
    # Remaining monomial order: [xz², xz, x, yz², yz, y, z³, z², z, 1].
    def derived(i):
        r4 = elim[4 + 2 * i]
        r5 = elim[5 + 2 * i]
        p = jnp.stack([r4[2], r4[1] - r5[2], r4[0] - r5[1], -r5[0]])        # z⁰..z³
        q = jnp.stack([r4[5], r4[4] - r5[5], r4[3] - r5[4], -r5[3]])        # z⁰..z³
        c = jnp.stack([r4[9], r4[8] - r5[9], r4[7] - r5[8], r4[6] - r5[7], -r5[6]])  # z⁰..z⁴
        return p, q, c

    p0, q0, c0 = derived(0)
    p1, q1, c1 = derived(1)
    p2, q2, c2 = derived(2)

    # --- degree-10 polynomial: det [[p, q, c]]ᵢ as convolutions ----------
    poly = (
        polymul(p0, polymul(q1, c2) - polymul(q2, c1))
        - polymul(q0, polymul(p1, c2) - polymul(p2, c1))
        + polymul(c0, polymul(p1, q2) - polymul(p2, q1))
    )  # (11,) ascending
    # Normalize the coefficient scale (roots unchanged): degenerate samples
    # can shrink the whole polynomial to ~1e-20, which breaks relative
    # tolerances in the root solver's implicit backward pass.
    #
    # stop_gradient on the normalizer: roots are invariant to a common
    # coefficient scaling, so the quotient-rule term through the max() is
    # exactly zero at a root (Σ_k (∂z/∂c_k)·c_k = −p(z)/p'(z) = 0) — but
    # computing it multiplies root cotangents by 1/scale (up to ~1e250 on
    # collapsed lanes) before the cancellation, overflowing f64 and NaN-ing
    # the whole logit gradient (observed on TPU only: its f32 eigh seeds
    # pick different near-degenerate samples than CPU's). The floor bounds
    # 1/scale for the forward division itself.
    poly_scale = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(poly)), jnp.sqrt(jnp.finfo(dtype).tiny))
    )
    poly = poly / poly_scale

    if root_solver == "sturm":
        roots, root_valid = sturm_bisect_roots(poly[None, :])  # (1, 10)
    else:
        roots, root_valid = aberth_roots(
            poly[None, :],
            iters=root_iters or 40,
            newton_polish=root_polish or 5,
        )  # (1, 10)
    z = roots[0]
    root_valid = root_valid[0]
    # No non-finite primal may flow on (inf primals NaN the backward pass of
    # every multiplication they touch, even on masked-out lanes).
    z = jnp.where(root_valid & jnp.isfinite(z), z, 0.0)

    # --- back-substitute (x, y) per root ---------------------------------
    pz = jnp.stack([polyval(p0, z), polyval(p1, z), polyval(p2, z)], axis=-1)  # (10, 3)
    qz = jnp.stack([polyval(q0, z), polyval(q1, z), polyval(q2, z)], axis=-1)
    cz = jnp.stack([polyval(c0, z), polyval(c1, z), polyval(c2, z)], axis=-1)
    # Least squares over the three rows: [pz qz]·[x, y]ᵀ = −cz.
    a11 = jnp.sum(pz * pz, axis=-1)
    a12 = jnp.sum(pz * qz, axis=-1)
    a22 = jnp.sum(qz * qz, axis=-1)
    b1 = -jnp.sum(pz * cz, axis=-1)
    b2 = -jnp.sum(qz * cz, axis=-1)
    det2 = a11 * a22 - a12 * a12
    det_ok = jnp.abs(det2) > 1e-20
    inv_det = 1.0 / jnp.where(det_ok, det2, 1.0)
    x = (a22 * b1 - a12 * b2) * inv_det
    y = (a11 * b2 - a12 * b1) * inv_det
    # Genuine solutions have O(1) coordinates over the orthonormal basis (E
    # is later normalized by √(x²+y²+z²+1)); astronomically scaled (x, y)
    # only arise from catastrophic cancellation in det2 on degenerate
    # samples. Clamp + invalidate them so their magnitudes can't amplify
    # backward-pass cotangents into overflow.
    xy_ok = (jnp.abs(x) < 1e6) & (jnp.abs(y) < 1e6)
    det_ok = det_ok & xy_ok
    x = jnp.clip(jnp.where(jnp.isfinite(x), x, 0.0), -1e6, 1e6)
    y = jnp.clip(jnp.where(jnp.isfinite(y), y, 0.0), -1e6, 1e6)

    # --- compose E from the null-space basis ------------------------------
    B = ns.T  # (4, 9): rows are basis vectors [B0, B1, B2, B3]
    e = (
        x[:, None] * B[0][None, :]
        + y[:, None] * B[1][None, :]
        + z[:, None] * B[2][None, :]
        + B[3][None, :]
    )  # (10, 9)
    # Orthonormal basis ⇒ normalize via the coefficients
    # (``essential_matrix_estimator_nister.py:397-399``).
    inv_norm = 1.0 / jnp.sqrt(x * x + y * y + z * z + 1.0)
    e = e * inv_norm[:, None]
    # e[3j+i] = E_ij: reshape row-major gives (j, i) — transpose.
    E = jnp.transpose(e.reshape(10, 3, 3), (0, 2, 1))

    valid = root_valid & det_ok & elim_ok & jnp.all(jnp.isfinite(E), axis=(-2, -1))
    # Domain validity: a genuine solution interpolates its own minimal
    # sample. Candidates from complex-root real parts violate the epipolar
    # constraint on the very points that produced them and are masked here
    # (the reference instead lets MSAC scoring reject them downstream).
    from differentiable_ransac_tpu.ops.epipolar import sampson_squared

    own = sampson_squared(E, matches)  # (10, 5)
    # dtype-aware tolerance: f64 cores interpolate to ~1e-12, f32 to ~1e-6
    own_tol = 1e-8 if dtype == jnp.float64 else 1e-3
    valid = valid & (jnp.max(own, axis=-1) < own_tol)
    # Variety validity: the own-sample check alone is NOT sufficient — every
    # vector of the 4-dim null space satisfies the epipolar constraint on
    # the 5 sample points by construction, so complex-root real parts can
    # interpolate perfectly while lying OFF the essential variety. A genuine
    # solution must also satisfy the defining equations det(E) = 0 and
    # 2EEᵀE − tr(EEᵀ)E = 0 (scale-invariant: E is unit-Frobenius here).
    EEt = jnp.einsum("nij,nkj->nik", E, E)
    trace_res = 2.0 * jnp.einsum("nij,njk->nik", EEt, E) - jnp.einsum(
        "nii,njk->njk", EEt, E
    )
    det_res = jnp.abs(jnp.linalg.det(E))
    variety_tol = 1e-6 if dtype == jnp.float64 else 2e-2
    valid = valid & (det_res < variety_tol) & (
        jnp.max(jnp.abs(trace_res), axis=(-2, -1)) < variety_tol
    )
    E = jnp.where(valid[:, None, None], E, jnp.eye(3, dtype=dtype))
    return E.astype(out_dtype), valid


def essential_5pt_stewenius(
    matches: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    solve_dtype=jnp.float64,
):
    """Stewenius-formulation 5PC (reference
    ``estimators/essential_matrix_estimator_stewenius.py:5-172``).

    The Stewenius action-matrix method and the Nistér elimination share the
    same 10×20 polynomial system; the action matrix's eigenvalues are
    exactly the roots of the degree-10 determinant polynomial this module
    already solves (its characteristic polynomial), and the eigenvector
    back-substitution recovers the same (x, y) per root. On TPU a
    non-symmetric 10×10 eigendecomposition is unavailable, so both solver
    entry points run the shared elimination + Aberth pipeline — the solution
    sets are mathematically identical. (The reference's Stewenius class is
    unreachable from its default wiring and carries an unset ``self.device``
    bug, SURVEY.md §2.4.)

    The completeness claim is validated in ``tests/test_stewenius.py``:
    solution-set equality (both inclusions) against OpenCV's independent
    native 5-point solver on random minimal samples, plus on-variety checks
    (det(E)=0, trace constraint) for every emitted solution.
    """
    return essential_5pt_nister(matches, weights, solve_dtype)


def essential_nonminimal(matches: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Non-minimal E refit: weighted DLT null vector + projection onto the
    essential manifold (singular values (1,1,0)).

    The in-framework counterpart of the reference's pymagsac bundle
    adjustment hand-off (``essential_matrix_estimator_nister.py:51-63``);
    the C++ σ-consensus module supersedes this on the SOTA inference path.

    Args:
        matches: (N, 4) calibrated correspondences.
        weights: optional (N,) weights / inlier mask.

    Returns:
        (3, 3) essential matrix with ‖E‖_F = √2 convention (unit singulars).
    """
    out_dtype = matches.dtype
    matches = matches.astype(jnp.float64)
    if weights is not None:
        weights = weights.astype(jnp.float64)
    A = _constraint_rows(matches, weights)
    ns = null_space_from_gram(A, 1)  # (9, 1)
    e = ns[:, 0]
    E = jnp.transpose(e.reshape(3, 3))  # column-major layout
    return project_to_essential(E).astype(out_dtype)

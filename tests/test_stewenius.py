"""5PC solution-set completeness — validating the Stewenius-equivalence
claim (``solvers/essential.py`` ``essential_5pt_stewenius``).

The claim: the shared elimination + Aberth pipeline produces the COMPLETE
solution variety of the 5-point problem, i.e. the same solution set any
correct formulation (Nistér companion-eig, Stewenius action-matrix eig)
yields. Validated two independent ways:

1. Set equality against OpenCV's native 5-point solver (an entirely
   independent C++ implementation) on random minimal samples.
2. Every emitted solution satisfies the defining equations of the variety —
   ``det(E) = 0`` and the trace constraint ``2EEᵀE − tr(EEᵀ)E = 0`` — whose
   common zeros are exactly what the Stewenius action matrix enumerates.

(The root-finder itself is separately validated against the
companion-matrix eigenvalue method — the action matrix of multiplication
in C[z]/(p₁₀) — in tests/test_polynomial.py.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differentiable_ransac_tpu.data.synthetic import two_view_problem
from differentiable_ransac_tpu.solvers import essential_5pt_nister
from differentiable_ransac_tpu.solvers.essential import essential_5pt_stewenius

cv2 = pytest.importorskip("cv2")


def _norm(E):
    E = np.asarray(E, np.float64)
    return E / np.linalg.norm(E)


def _dist(A, B):
    A, B = _norm(A), _norm(B)
    return min(np.linalg.norm(A - B), np.linalg.norm(A + B))


def _opencv_solutions(pts1, pts2):
    E, _ = cv2.findEssentialMat(pts1.astype(np.float64),
                                pts2.astype(np.float64), np.eye(3),
                                method=cv2.RANSAC, threshold=1e-3)
    if E is None:
        return []
    return [E[3 * i:3 * i + 3] for i in range(E.shape[0] // 3)]


def _our_solutions(sample):
    models, valid = jax.jit(essential_5pt_nister)(jnp.asarray(sample))
    models = np.asarray(models)[np.asarray(valid)]
    return [m for m in models]


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_solution_set_matches_opencv(seed):
    p = two_view_problem(n_points=5, noise=0.0, outlier_ratio=0.0, seed=seed)
    sample = p["matches"].astype(np.float64)
    ours = _our_solutions(sample)
    cvs = _opencv_solutions(sample[:, :2], sample[:, 2:])
    assert ours and cvs
    # every OpenCV solution appears in our set ...
    for E in cvs:
        assert min(_dist(E, O) for O in ours) < 1e-5
    # ... and every solution of ours appears in OpenCV's
    for O in ours:
        assert min(_dist(O, E) for E in cvs) < 1e-5
    # GT is recovered by both
    assert min(_dist(p["E"], O) for O in ours) < 1e-5


@pytest.mark.parametrize("seed", [7, 8, 9])
def test_solutions_lie_on_the_variety(seed):
    """det(E)=0 and 2EEᵀE − tr(EEᵀ)E = 0 — the equations whose common
    zeros the Stewenius action matrix enumerates."""
    p = two_view_problem(n_points=5, noise=0.5, outlier_ratio=0.0, seed=seed)
    sample = p["matches"].astype(np.float64)
    for E in _our_solutions(sample):
        E = _norm(E)
        assert abs(np.linalg.det(E)) < 1e-8
        EEt = E @ E.T
        resid = 2.0 * EEt @ E - np.trace(EEt) * E
        assert np.abs(resid).max() < 1e-7


def test_stewenius_entry_point_identical():
    """The Stewenius entry point returns the identical solution set (it
    shares the pipeline; this pins the aliasing contract)."""
    p = two_view_problem(n_points=5, noise=0.0, outlier_ratio=0.0, seed=11)
    sample = jnp.asarray(p["matches"].astype(np.float64))
    m1, v1 = essential_5pt_nister(sample)
    m2, v2 = essential_5pt_stewenius(sample)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2))

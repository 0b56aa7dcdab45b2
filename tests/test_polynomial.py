"""Root-finder tests vs numpy.roots ground truth."""

import numpy as np
import jax.numpy as jnp

from differentiable_ransac_tpu.ops.polynomial import (
    sturm_bisect_roots,
    aberth_roots,
    cubic_roots,
    polymul,
    polyval,
)


def _np_real_roots(coeffs_ascending, tol=1e-4):
    r = np.roots(coeffs_ascending[::-1])
    return np.sort(r[np.abs(r.imag) < tol * (1 + np.abs(r.real))].real)


def test_polyval_matches_numpy():
    rng = np.random.default_rng(0)
    c = rng.normal(size=(5, 7)).astype(np.float32)
    x = rng.normal(size=(5,)).astype(np.float32)
    got = np.asarray(polyval(jnp.asarray(c), jnp.asarray(x)))
    want = np.array([np.polyval(c[i, ::-1], x[i]) for i in range(5)])
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_polymul_matches_numpy():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(3, 4)).astype(np.float32)
    b = rng.normal(size=(3, 5)).astype(np.float32)
    got = np.asarray(polymul(jnp.asarray(a), jnp.asarray(b)))
    for i in range(3):
        want = np.convolve(a[i], b[i])
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)


def test_cubic_roots_three_real():
    # (x-1)(x-2)(x-3) = x³ - 6x² + 11x - 6
    c = jnp.asarray([[-6.0, 11.0, -6.0, 1.0]])
    roots, valid = cubic_roots(c)
    got = np.sort(np.asarray(roots)[0][np.asarray(valid)[0]])
    np.testing.assert_allclose(got, [1.0, 2.0, 3.0], atol=1e-4)


def test_cubic_roots_one_real():
    # (x-2)(x²+1) = x³ - 2x² + x - 2
    c = jnp.asarray([[-2.0, 1.0, -2.0, 1.0]])
    roots, valid = cubic_roots(c)
    v = np.asarray(valid)[0]
    got = np.asarray(roots)[0][v]
    assert v.sum() == 1
    np.testing.assert_allclose(got, [2.0], atol=1e-4)


def test_cubic_roots_random_batch():
    rng = np.random.default_rng(2)
    c = rng.normal(size=(64, 4)).astype(np.float32)
    roots, valid = cubic_roots(jnp.asarray(c))
    roots, valid = np.asarray(roots), np.asarray(valid)
    for i in range(64):
        want = _np_real_roots(c[i].astype(np.float64))
        got = np.sort(np.unique(roots[i][valid[i]].round(3)))
        assert len(got) >= len(want) - 0  # all real roots found
        for w in want:
            assert np.min(np.abs(roots[i][valid[i]] - w)) < 1e-2, (i, want, roots[i], valid[i])


def test_cubic_roots_quadratic_degenerate():
    # leading coeff 0: x² - 3x + 2 → roots 1, 2
    c = jnp.asarray([[2.0, -3.0, 1.0, 0.0]])
    roots, valid = cubic_roots(c)
    got = np.sort(np.asarray(roots)[0][np.asarray(valid)[0]])
    np.testing.assert_allclose(got, [1.0, 2.0], atol=1e-4)


def test_aberth_known_roots():
    # ten real roots separated by 1.0 — representative of solvable cases
    roots_gt = np.arange(10, dtype=np.float64) - 4.5
    c = np.poly(roots_gt)[::-1].copy()  # ascending
    roots, valid = aberth_roots(jnp.asarray(c[None], jnp.float32))
    got = np.sort(np.asarray(roots)[0][np.asarray(valid)[0]])
    assert len(got) == 10
    np.testing.assert_allclose(got, np.sort(roots_gt), atol=2e-2)


def test_aberth_clustered_roots_fp32_best_effort():
    # ten real roots packed into [0.25, 2.5]: at fp32 coefficient rounding
    # alone perturbs these roots; require most to be found to modest accuracy
    # (the engine's MSAC scoring is robust to marginal root error — the
    # reference itself consumes real parts of complex eigenvalues).
    roots_gt = np.arange(1, 11, dtype=np.float64) / 4.0
    c = np.poly(roots_gt)[::-1].copy()
    roots, valid = aberth_roots(jnp.asarray(c[None], jnp.float32))
    got = np.asarray(roots)[0][np.asarray(valid)[0]]
    assert len(got) >= 7
    matched = sum(1 for w in roots_gt if np.min(np.abs(got - w)) < 0.1)
    assert matched >= 7


def test_aberth_mixed_complex():
    # (x² + 1)(x - 1)(x - 2) ... 2 real roots, 2 complex
    c = np.poly([1j, -1j, 1.0, 2.0])[::-1].real.copy()
    roots, valid = aberth_roots(jnp.asarray(c[None], jnp.float32))
    v = np.asarray(valid)[0]
    got = np.sort(np.asarray(roots)[0][v])
    assert v.sum() == 2
    np.testing.assert_allclose(got, [1.0, 2.0], atol=1e-3)


def test_aberth_random_batch():
    rng = np.random.default_rng(3)
    cs = rng.normal(size=(32, 11)).astype(np.float32)
    roots, valid = aberth_roots(jnp.asarray(cs))
    roots, valid = np.asarray(roots), np.asarray(valid)
    for i in range(32):
        want = _np_real_roots(cs[i].astype(np.float64))
        got = roots[i][valid[i]]
        # every true real root is found
        for w in want:
            assert np.min(np.abs(got - w)) < 5e-3 * (1 + abs(w)), (i, want, got)


# --- Sturm isolation + bisection (the reference's StrumPolynomialSolver /
# StrumPolynomialSolverBatch capability, math_utils.py:111-501) -------------

def test_sturm_bisect_exact_real_roots():
    rng = np.random.default_rng(7)
    for _ in range(8):
        n_real = int(rng.integers(0, 6)) * 2
        real_roots = np.sort(rng.uniform(-3, 3, n_real))
        pairs = [np.array([a + 1j * b, a - 1j * b])
                 for a, b in rng.uniform(0.5, 2, ((10 - n_real) // 2, 2))]
        allr = np.concatenate([real_roots] + [p for p in pairs]) if pairs \
            else real_roots
        c = np.poly(allr)[::-1].real.copy()
        roots, valid = sturm_bisect_roots(jnp.asarray(c[None], jnp.float64))
        got = np.sort(np.asarray(roots)[0][np.asarray(valid)[0]])
        assert len(got) == len(real_roots)
        if len(got):
            np.testing.assert_allclose(got, real_roots, atol=1e-8)


def test_sturm_bisect_random_batch_matches_numpy():
    rng = np.random.default_rng(8)
    cs = rng.normal(size=(16, 11))
    roots, valid = sturm_bisect_roots(jnp.asarray(cs))
    roots, valid = np.asarray(roots), np.asarray(valid)
    for i in range(16):
        want = _np_real_roots(cs[i], tol=1e-9)
        got = np.sort(roots[i][valid[i]])
        assert len(got) == len(want), (i, want, got)
        if len(want):
            np.testing.assert_allclose(got, want, atol=1e-7)


def test_sturm_bisect_agrees_with_aberth():
    """Cross-validation: the two independent root finders agree on the
    real-root set of Nistér-style degree-10 polynomials."""
    rng = np.random.default_rng(9)
    cs = rng.normal(size=(16, 11))
    rs, vs = sturm_bisect_roots(jnp.asarray(cs))
    ra, va = aberth_roots(jnp.asarray(cs))
    for i in range(16):
        sturm_set = np.sort(np.asarray(rs)[i][np.asarray(vs)[i]])
        ab = np.asarray(ra)[i][np.asarray(va)[i]]
        for w in sturm_set:  # every Sturm (= true) real root is in Aberth's
            assert np.min(np.abs(ab - w)) < 1e-5 * (1 + abs(w))


def test_sturm_bisect_implicit_gradient():
    import jax

    rng = np.random.default_rng(10)
    C = np.stack([np.poly(np.sort(rng.uniform(-2, 2, 4)))[::-1]
                  for _ in range(4)])

    def f_sturm(c):
        r, v = sturm_bisect_roots(c)
        return jnp.sum(jnp.where(v, r, 0.0) ** 2)

    def f_aberth(c):
        r, v = aberth_roots(c)
        return jnp.sum(jnp.where(v, r, 0.0) ** 2)

    g = jax.grad(f_sturm)(jnp.asarray(C))
    ga = jax.grad(f_aberth)(jnp.asarray(C))
    assert bool(jnp.all(jnp.isfinite(g)))
    # same implicit-function VJP ⇒ same gradients where both find the roots
    np.testing.assert_allclose(np.asarray(g), np.asarray(ga),
                               rtol=1e-4, atol=1e-6)

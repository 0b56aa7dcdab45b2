"""Batched, fixed-shape polynomial machinery for the minimal solvers.

TPU-first design notes
----------------------
The reference finds the roots of its solver polynomials with per-sample
non-symmetric eigendecompositions of companion matrices inside a Python loop
(``/root/reference/estimators/essential_matrix_estimator_nister.py:355-377``,
``fundamental_matrix_estimator.py:291-298``). XLA:TPU has no complex
non-symmetric ``eig``; more importantly a per-item loop defeats batching.
Here every root-finder is a *branch-free, fixed-iteration, fully vmapped*
program:

* cubic: closed-form trigonometric/Cardano solution with ``where`` masks.
* degree-n (Nistér's degree-10): Aberth–Ehrlich simultaneous iteration in
  complex arithmetic (all 10 roots at once per hypothesis, ~30 iterations of
  pure VPU math), followed by Newton polishing of the near-real roots.

Both return a fixed number of root slots plus validity masks — never a
data-dependent shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def polyval(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate polynomial with coefficients in *ascending* order.

    ``coeffs`` (..., D+1): ``p(x) = c0 + c1 x + ... + cD x^D``. Horner scheme.
    ``x``: broadcastable to ``coeffs[..., 0]``.
    """
    d = coeffs.shape[-1]
    acc = jnp.broadcast_to(coeffs[..., d - 1], jnp.broadcast_shapes(coeffs[..., 0].shape, x.shape))
    for i in range(d - 2, -1, -1):
        acc = acc * x + coeffs[..., i]
    return acc


def polyder(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Derivative, ascending coefficient order: (..., D+1) -> (..., D)."""
    d = coeffs.shape[-1] - 1
    k = jnp.arange(1, d + 1, dtype=coeffs.dtype)
    return coeffs[..., 1:] * k


def polymul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Product of two batched polynomials (ascending coefficients).

    (..., Da+1) × (..., Db+1) -> (..., Da+Db+1). Small static degrees: the
    convolution is unrolled at trace time into fused multiply-adds.
    """
    da, db = a.shape[-1], b.shape[-1]
    out = [jnp.zeros_like(a[..., 0] * b[..., 0])] * (da + db - 1)
    for i in range(da):
        for j in range(db):
            out[i + j] = out[i + j] + a[..., i] * b[..., j]
    return jnp.stack(out, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def cubic_roots(c: jnp.ndarray, eps: float = 1e-12):
    """Real roots of batched cubics ``c0 + c1 x + c2 x² + c3 x³ = 0``.

    Branch-free closed form (the TPU replacement for the reference's
    4×4-companion ``eigvals`` at ``fundamental_matrix_estimator.py:291-298``
    and the ``multi_cubic`` regimes at ``math_utils.py:5-108``).

    Backward is the shared implicit-differentiation rule
    (:func:`_implicit_root_cotangent`), NOT autodiff of the closed form:
    the trigonometric/Cardano expressions hit 0·∞ = NaN ``where``-traps on
    the degenerate variety (discriminant 0 — a DOUBLE root — puts ∞ into
    the unselected branch's derivative), while the implicit rule is exact
    at simple roots and Lorentzian-bounded at multiple ones
    (``tests/test_degenerate.py::test_cubic_double_root``).

    Args:
        c: (..., 4) ascending coefficients.

    Returns:
        (roots (..., 3), valid (..., 3) bool). Invalid slots hold the real
        root duplicated (degenerate/complex cases), so downstream code can
        compute on all slots and mask later.
    """
    return _cubic_roots_impl(c, eps)


def _cubic_roots_impl(c: jnp.ndarray, eps: float = 1e-12):
    c0, c1, c2, c3 = c[..., 0], c[..., 1], c[..., 2], c[..., 3]
    # Guard against a (near-)quadratic leading coefficient: fall back to the
    # quadratic/linear roots in those lanes.
    is_cubic = jnp.abs(c3) > eps * (jnp.abs(c0) + jnp.abs(c1) + jnp.abs(c2) + 1.0)
    safe_c3 = jnp.where(is_cubic, c3, 1.0)
    a = c2 / safe_c3
    b = c1 / safe_c3
    d = c0 / safe_c3
    # Depressed cubic t³ + p t + q with x = t - a/3.
    p = b - a * a / 3.0
    q = 2.0 * a**3 / 27.0 - a * b / 3.0 + d
    shift = -a / 3.0

    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3
    # Three-real-root regime (disc <= 0): trigonometric solution.
    p_neg = jnp.minimum(p, -eps)
    m = 2.0 * jnp.sqrt(-p_neg / 3.0)
    arg = jnp.clip(3.0 * q / (p_neg * m), -1.0, 1.0)
    theta = jnp.arccos(arg) / 3.0
    two_pi_3 = 2.0 * jnp.pi / 3.0
    t_trig = jnp.stack(
        [m * jnp.cos(theta), m * jnp.cos(theta - two_pi_3), m * jnp.cos(theta - 2 * two_pi_3)],
        axis=-1,
    )
    # One-real-root regime (disc > 0): Cardano.
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u3 = -q / 2.0 + sq
    v3 = -q / 2.0 - sq
    cbrt = lambda x: jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)
    t_single = cbrt(u3) + cbrt(v3)
    t_card = jnp.stack([t_single, t_single, t_single], axis=-1)

    three_real = disc <= 0.0
    roots = jnp.where(three_real[..., None], t_trig, t_card) + shift[..., None]

    # Quadratic fallback for degenerate leading coefficient.
    is_quad = jnp.abs(c2) > eps * (jnp.abs(c0) + jnp.abs(c1) + 1.0)
    qa = jnp.where(is_quad, c2, 1.0)
    qdisc = c1 * c1 - 4.0 * qa * c0
    qsq = jnp.sqrt(jnp.maximum(qdisc, 0.0))
    r0 = (-c1 + qsq) / (2.0 * qa)
    r1 = (-c1 - qsq) / (2.0 * qa)
    lin = -c0 / jnp.where(jnp.abs(c1) > eps, c1, 1.0)
    quad_roots = jnp.stack([r0, r1, r0], axis=-1)
    quad_valid = jnp.stack(
        [qdisc >= 0, qdisc >= 0, jnp.zeros_like(qdisc, bool)], axis=-1
    ) & is_quad[..., None]
    lin_roots = jnp.stack([lin, lin, lin], axis=-1)
    lin_valid = jnp.stack(
        [jnp.abs(c1) > eps, jnp.zeros_like(c1, bool), jnp.zeros_like(c1, bool)], axis=-1
    )

    cubic_valid = jnp.concatenate(
        [jnp.ones_like(three_real[..., None]), jnp.broadcast_to(three_real[..., None], three_real.shape + (2,))],
        axis=-1,
    )
    roots = jnp.where(
        is_cubic[..., None], roots, jnp.where(is_quad[..., None], quad_roots, lin_roots)
    )
    valid = jnp.where(
        is_cubic[..., None], cubic_valid, jnp.where(is_quad[..., None], quad_valid, lin_valid)
    )
    # One Newton polish step (helps fp32 accuracy). Coefficients gain a
    # root-slot axis so they broadcast over the 3 roots.
    c_asc = c[..., None, :]
    fp = polyval(polyder(c_asc), roots)
    f = polyval(c_asc, roots)
    roots = roots - jnp.where(jnp.abs(fp) > eps, f / jnp.where(jnp.abs(fp) > eps, fp, 1.0), 0.0)
    return roots, valid


def _cubic_roots_fwd(c, eps):
    roots, valid = _cubic_roots_impl(c, eps)
    return (roots, valid), (c, roots, valid)


def _cubic_roots_bwd(eps, res, cots):
    c, roots, valid = res
    droots, _dvalid = cots
    return (_implicit_root_cotangent(c, roots, valid, droots),)


cubic_roots.defvjp(_cubic_roots_fwd, _cubic_roots_bwd)


def _monic_fujiwara_scaled(coeffs: jnp.ndarray):
    """Monic-normalize and variable-rescale so all roots lie in |y| ≤ 2.

    Keeps every Horner intermediate O(1) — mandatory for fp32 (an unscaled
    degree-10 evaluation at the Cauchy radius overflows). Fujiwara-style
    bound: ``alpha = max_k |c_{D-k}/c_D|^{1/k}`` ⇒ roots of
    ``q(y) = p(alpha·y)`` satisfy ``|y| ≤ 2`` and ``|q_k/q_D| ≤ 1``.

    Returns:
        (q (..., D+1) ascending monic-scaled coefficients, alpha (...,),
        lead_ok (...,) bool). True roots are ``alpha · y``.
    """
    d = coeffs.shape[-1] - 1
    lead = coeffs[..., -1]
    lead_ok = jnp.abs(lead) > 1e-30
    safe_lead = jnp.where(lead_ok, lead, 1.0)
    monic = coeffs / safe_lead[..., None]
    exponents = 1.0 / jnp.arange(d, 0, -1, dtype=monic.dtype)  # k = 0..D-1
    alpha = jnp.max(jnp.abs(monic[..., :-1]) ** exponents, axis=-1)
    alpha = jnp.clip(alpha, 1e-3, 1e3)
    # q_k = monic_k · alpha^(k−D); |q_k| ≤ 1 by construction of alpha.
    powers = alpha[..., None] ** jnp.arange(-d, 1, dtype=monic.dtype)
    return monic * powers, alpha, lead_ok


def _aberth_roots_impl(
    coeffs: jnp.ndarray,
    iters: int = 40,
    newton_polish: int = 5,
    real_tol: float = 3e-2,
):
    """All complex roots of batched degree-D polynomials via Aberth–Ehrlich.

    A branch-free simultaneous root iteration: the TPU-native replacement for
    the reference's per-item companion-matrix ``torch.linalg.eigvals``
    (``essential_matrix_estimator_nister.py:355-377``). Every hypothesis's 10
    roots converge in parallel, purely on the VPU, under ``vmap``.

    Args:
        coeffs: (..., D+1) ascending real coefficients; the leading
            coefficient may be (near-)zero — such lanes produce spurious
            far-away roots which are marked invalid.
        iters: fixed Aberth iterations.
        newton_polish: fixed Newton steps on the real parts afterwards.
        real_tol: |Im z| / (1+|Re z|) below which a root counts as real.

    Returns:
        (roots_real (..., D), valid (..., D) bool): Newton-polished real
        parts of the roots and a *permissive* validity mask (finite, not
        clearly complex). Callers must apply their own domain-specific
        filter — e.g. the 5PC solver checks that each candidate model
        interpolates its minimal sample. This mirrors the reference, which
        consumes real parts of all companion-matrix eigenvalues (including
        complex ones) and lets downstream scoring reject the fakes
        (``essential_matrix_estimator_nister.py:370,379-402``).
    """
    # TPU has no complex dtype support: complex arithmetic is carried as
    # explicit (re, im) float pairs — pure VPU math.
    d = coeffs.shape[-1] - 1
    monic, alpha, lead_ok = _monic_fujiwara_scaled(coeffs)

    # Initial guesses: roots of unity at radius 0.7, slightly rotated to
    # break symmetry with real-coefficient conjugate pairs.
    k = jnp.arange(d, dtype=monic.dtype)
    angles = 2.0 * jnp.pi * k / d + 0.4
    init_re = 0.7 * jnp.cos(angles) * jnp.ones_like(alpha)[..., None]
    init_im = 0.7 * jnp.sin(angles) * jnp.ones_like(alpha)[..., None]

    # Division guards must sit near the dtype's underflow threshold: scaled
    # coefficients legitimately reach ~1e-20 and their products ~1e-35; an
    # absolute 1e-30 guard silently zeroes real Newton steps (f64) or is
    # unreachable (f32).
    tiny = float(jnp.finfo(monic.dtype).tiny) * 1e4

    def cmul(ar, ai, br, bi):
        return ar * br - ai * bi, ar * bi + ai * br

    def cdiv(ar, ai, br, bi):
        den = br * br + bi * bi
        den = jnp.where(den > tiny, den, 1.0)
        return (ar * br + ai * bi) / den, (ai * br - ar * bi) / den

    def cpolyval(cf, zr, zi):
        """Horner over real coefficients at complex points (re, im)."""
        n = cf.shape[-1]
        ar = jnp.broadcast_to(cf[..., n - 1, None] * jnp.ones_like(zr), zr.shape)
        ai = jnp.zeros_like(zi)
        for i in range(n - 2, -1, -1):
            ar, ai = cmul(ar, ai, zr, zi)
            ar = ar + cf[..., i, None]
        return ar, ai

    dmonic = polyder(monic)

    def body(z, _):
        zr, zi = z
        fr, fi = cpolyval(monic, zr, zi)
        gr, gi = cpolyval(dmonic, zr, zi)
        nr, ni = cdiv(fr, fi, gr, gi)  # Newton step f/f'
        # Σ_j 1/(z_i − z_j): pairwise differences in real-pair form.
        dr = zr[..., :, None] - zr[..., None, :]
        di = zi[..., :, None] - zi[..., None, :]
        den = dr * dr + di * di
        off = ~jnp.eye(d, dtype=bool)
        den_ok = (den > tiny) & off
        den_safe = jnp.where(den_ok, den, 1.0)
        inv_r = jnp.where(den_ok, dr / den_safe, 0.0)
        inv_i = jnp.where(den_ok, -di / den_safe, 0.0)
        sr = jnp.sum(inv_r, axis=-1)
        si = jnp.sum(inv_i, axis=-1)
        # Aberth correction: w = n / (1 − n·s)
        pr, pi = cmul(nr, ni, sr, si)
        wr, wi = cdiv(nr, ni, 1.0 - pr, -pi)
        return (zr - wr, zi - wi), None

    (re, im), _ = jax.lax.scan(body, (init_re, init_im), None, length=iters)
    is_real = jnp.abs(im) <= real_tol * (1.0 + jnp.abs(re))

    # Newton-polish the real parts against the *scaled* polynomial (scale-free
    # arithmetic), then map back: z = alpha · y.
    rr = re
    rc = monic[..., None, :]
    rd = polyder(monic)[..., None, :]
    for _ in range(newton_polish):
        f = polyval(rc, rr)
        fp = polyval(rd, rr)
        fp_ok = jnp.abs(fp) > tiny
        rr = rr - jnp.where(fp_ok, f / jnp.where(fp_ok, fp, 1.0), 0.0)

    valid = is_real & lead_ok[..., None] & jnp.isfinite(rr)
    # Sanitize: non-finite slots become 0 so no inf/NaN primal reaches
    # downstream consumers (a multiplication VJP computes cotangent·primal —
    # an inf primal NaNs the backward pass even under a zero cotangent).
    rr = jnp.where(jnp.isfinite(rr), rr, 0.0)
    return rr * alpha[..., None], valid


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _aberth_vjp(iters, newton_polish, real_tol, coeffs):
    return _aberth_roots_impl(coeffs, iters, newton_polish, real_tol)


def _aberth_fwd(iters, newton_polish, real_tol, coeffs):
    roots, valid = _aberth_roots_impl(coeffs, iters, newton_polish, real_tol)
    return (roots, valid), (coeffs, roots, valid)


def _implicit_root_cotangent(coeffs, roots, valid, droots):
    """Shared implicit-differentiation backward for any converged real-root
    finder: a root satisfies ``p(z; c) = 0`` ⇒ ``∂z/∂c_k = −z^k / p'(z)``."""
    # Invalid slots can hold ±inf/NaN roots; every use below must see a
    # finite placeholder or the masked-out lanes still poison the sums
    # (0·inf = NaN).
    roots = jnp.where(valid & jnp.isfinite(roots), roots, 0.0)
    droots = jnp.where(jnp.isfinite(droots), droots, 0.0)
    dp = polyval(polyder(coeffs)[..., None, :], roots)  # p'(z) per slot
    # Lorentzian-regularized reciprocal: multiple roots contribute ~0. The
    # regularizer is relative to both the polynomial scale and |p'| itself,
    # and the sensitivity is hard-capped — gradients through (near-)multiple
    # roots are genuinely unbounded; a bounded surrogate keeps training
    # stable (same spirit as safe_eigh's gap regularization).
    scale = jnp.max(jnp.abs(coeffs), axis=-1, keepdims=True) + 1e-30
    eps = (1e-9 * (scale + jnp.abs(dp))) ** 2
    inv_dp = dp / (dp * dp + eps)
    # The cap scales inversely with the polynomial magnitude, but a
    # numerically-degenerate sample (coeffs ≲ 1e-20: e.g. repeated
    # correspondences, whose cubic is 0 up to rounding) must not inflate it
    # past the f32 range — a 1e61 cotangent is finite in f64 but becomes
    # inf→NaN at the solver's out-dtype cast
    # (tests/test_degenerate.py::test_7pc_repeated_points).
    cap = 1e8 / jnp.maximum(scale, 1e-20)
    inv_dp = jnp.clip(inv_dp, -cap, cap)
    sens = jnp.where(valid, -droots * inv_dp, 0.0)  # (..., D)
    # dc_k = Σ_slots sens_i · z_i^k, built with cumulative powers.
    dc = []
    zp = jnp.ones_like(roots)
    for k in range(coeffs.shape[-1]):
        dc.append(jnp.sum(sens * zp, axis=-1))
        zp = zp * roots
    return jnp.stack(dc, axis=-1)


def _aberth_bwd(iters, newton_polish, real_tol, res, cots):
    coeffs, roots, valid = res
    droots, _dvalid = cots
    return (_implicit_root_cotangent(coeffs, roots, valid, droots),)


_aberth_vjp.defvjp(_aberth_fwd, _aberth_bwd)


def _sturm_chain(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Batched Sturm chain of ``p``, zero-padded to a fixed-shape stack.

    ``p_{k+1} = −rem(p_{k−1}, p_k)``; with degrees decreasing by exactly one
    (generic case; degenerate remainders are scale-guarded) the remainder of
    (deg n) by (deg n−1) is two elimination steps.

    Args:
        coeffs: (..., D+1) ascending coefficients.

    Returns:
        (..., D+1, D+1) — chain entry k holds the degree-(D−k) polynomial in
        its first D+1−k slots (ascending), zero-padded.
    """
    d = coeffs.shape[-1] - 1
    chain = [coeffs, polyder(coeffs)]
    for _ in range(d - 1):
        p_hi = chain[-2]  # (..., n+1) degree n
        p_lo = chain[-1]  # (..., n)   degree n-1
        lead_lo = p_lo[..., -1]
        safe = jnp.where(jnp.abs(lead_lo) > 1e-300, lead_lo, 1.0)[..., None]
        q1 = p_hi[..., -1:] / safe  # x-term quotient
        t = p_hi[..., :-1] - q1 * jnp.concatenate(
            [jnp.zeros_like(p_lo[..., :1]), p_lo[..., :-1]], axis=-1
        )
        q0 = t[..., -1:] / safe
        r = t[..., :-1] - q0 * p_lo[..., :-1]
        chain.append(-r)
    pad = [
        jnp.concatenate(
            [p, jnp.zeros(p.shape[:-1] + (d + 1 - p.shape[-1],), p.dtype)], axis=-1
        )
        for p in chain
    ]
    return jnp.stack(pad, axis=-2)


def _chain_sign_changes(chain: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Sign-change counts of a Sturm ``chain`` (..., K, C) at ``x`` (..., P)."""
    v = polyval(chain[..., :, None, :], x[..., None, :])  # (..., K, P)
    s = jnp.where(v > 0, 1, jnp.where(v < 0, -1, 0))
    flips = jnp.zeros(s.shape[:-2] + s.shape[-1:], jnp.int32)
    prev = s[..., 0, :]
    for k in range(1, s.shape[-2]):
        cur = s[..., k, :]
        effective = jnp.where(cur == 0, prev, cur)
        flips = flips + (effective * prev < 0).astype(jnp.int32)
        prev = effective
    return flips


def sturm_sign_changes(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Number of sign changes of the Sturm chain of ``p`` at points ``x``.

    Fixed-shape Sturm machinery (the reference re-implements graph-cut
    RANSAC's Sturm solver in Python loops, ``math_utils.py:111-501``).
    ``count(a) − count(b)`` is the number of real roots in ``(a, b]``.

    Args:
        coeffs: (D+1,) ascending coefficients of one polynomial.
        x: (...,) evaluation points.

    Returns:
        (...,) int32 sign-change counts.
    """
    chain = _sturm_chain(coeffs)
    flat = jnp.reshape(x, (-1,))
    return _chain_sign_changes(chain, flat).reshape(jnp.shape(x))


def sturm_count_real_roots(coeffs: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    """Number of distinct real roots of ``p`` in (lo, hi]."""
    counts = sturm_sign_changes(coeffs, jnp.asarray([lo, hi], coeffs.dtype))
    return counts[0] - counts[1]


def _sturm_bisect_impl(coeffs: jnp.ndarray, iters: int, newton_polish: int):
    d = coeffs.shape[-1] - 1
    q, alpha, lead_ok = _monic_fujiwara_scaled(coeffs)
    chain = _sturm_chain(q)
    radius = 2.0 + 1e-6  # Fujiwara: all roots of q lie in |y| ≤ 2
    ends = jnp.stack(
        [jnp.full(q.shape[:-1], -radius, q.dtype), jnp.full(q.shape[:-1], radius, q.dtype)],
        axis=-1,
    )
    s_ends = _chain_sign_changes(chain, ends)  # (..., 2)
    s_left = s_ends[..., 0]
    total = s_left - s_ends[..., 1]  # distinct real roots in (−R, R]
    target = jnp.arange(1, d + 1)  # slot i hunts the (i+1)-th root
    valid = target <= total[..., None]

    lo = jnp.full(q.shape[:-1] + (d,), -radius, q.dtype)
    hi = jnp.full_like(lo, radius)

    def body(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        # cumulative count N(mid) = #roots in (−R, mid]: nondecreasing in
        # mid, so bisection on N(mid) ≥ target brackets the target root.
        n_mid = s_left[..., None] - _chain_sign_changes(chain, mid)
        go_left = n_mid >= target
        return (jnp.where(go_left, lo, mid), jnp.where(go_left, mid, hi)), None

    (lo, hi), _ = jax.lax.scan(body, (lo, hi), None, length=iters)
    y = 0.5 * (lo + hi)

    # Bracket-guarded Newton polish against the scaled polynomial.
    tiny = float(jnp.finfo(q.dtype).tiny) * 1e4
    qd = polyder(q)
    for _ in range(newton_polish):
        f = polyval(q[..., None, :], y)
        fp = polyval(qd[..., None, :], y)
        ok = jnp.abs(fp) > tiny
        y_new = y - jnp.where(ok, f / jnp.where(ok, fp, 1.0), 0.0)
        y = jnp.where((y_new >= lo) & (y_new <= hi), y_new, y)

    roots = y * alpha[..., None]
    valid = valid & lead_ok[..., None] & jnp.isfinite(roots)
    return jnp.where(valid, roots, 0.0), valid


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _sturm_bisect_vjp(iters, newton_polish, coeffs):
    return _sturm_bisect_impl(coeffs, iters, newton_polish)


def _sturm_bisect_fwd(iters, newton_polish, coeffs):
    roots, valid = _sturm_bisect_impl(coeffs, iters, newton_polish)
    return (roots, valid), (coeffs, roots, valid)


def _sturm_bisect_bwd(iters, newton_polish, res, cots):
    coeffs, roots, valid = res
    droots, _dvalid = cots
    return (_implicit_root_cotangent(coeffs, roots, valid, droots),)


_sturm_bisect_vjp.defvjp(_sturm_bisect_fwd, _sturm_bisect_bwd)


def sturm_bisect_roots(coeffs: jnp.ndarray, iters: int = 60, newton_polish: int = 3):
    """All real roots of batched polynomials via Sturm isolation + bisection.

    The reference's ``StrumPolynomialSolver`` / ``StrumPolynomialSolverBatch``
    capability (recursive interval isolation + Ridders/Newton polishing,
    ``/root/reference/math_utils.py:111-291,294-501``) redesigned as a
    branch-free fixed-shape TPU program: instead of a data-dependent
    worklist of isolating intervals, slot ``i`` bisects the *cumulative
    root-count function* ``N(x) = count(−R) − count(x)`` (nondecreasing,
    Sturm-exact) to the unique point where it first reaches ``i+1`` — the
    (i+1)-th real root in ascending order. Guaranteed bracketing, no
    isolation recursion, identical work per lane ⇒ perfectly vmappable.

    ``aberth_roots`` supersedes this in speed (it also finds complex roots);
    this is the guaranteed-real-root fallback and the validation oracle.
    Differentiation is the same implicit-function VJP as Aberth's.

    Args:
        coeffs: (..., D+1) ascending real coefficients.
        iters: bisection iterations (60 ⇒ interval ≤ 4·2⁻⁶⁰, f64-exact).
        newton_polish: bracket-guarded Newton steps afterwards.

    Returns:
        (roots (..., D), valid (..., D) bool) — ascending real roots in the
        first ``total`` slots; invalid slots hold 0. Multiple roots are
        reported once (Sturm counts distinct roots).
    """
    return _sturm_bisect_vjp(iters, newton_polish, coeffs)


def aberth_roots(
    coeffs: jnp.ndarray,
    iters: int = 40,
    newton_polish: int = 5,
    real_tol: float = 3e-2,
):
    """See :func:`_aberth_roots_impl` for the forward iteration.

    Differentiation is IMPLICIT: a converged root satisfies ``p(z; c) = 0``,
    hence ``∂z/∂c_k = −z^k / p'(z)`` — exact, one Horner evaluation, and
    numerically bounded. (Back-propagating through the 40 Aberth iterations
    explodes: the iteration map's Jacobian is uncontrolled and junk lanes
    produce NaNs on TPU.) Near-multiple roots (p'≈0) get a gap-regularized
    reciprocal, contributing ~0 gradient instead of NaN.
    """
    return _aberth_vjp(iters, newton_polish, real_tol, coeffs)

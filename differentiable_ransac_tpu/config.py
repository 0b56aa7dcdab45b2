"""Configuration for the TPU ∇-RANSAC framework.

Mirrors the behavior knobs of the reference's argparse config
(``/root/reference/utils.py:7-83``) as typed dataclasses: sampler id, fmat
switch, thresholds, loss weights w0/w1/w2, precision, prob type, topk,
ransac batch size, etc. These knobs define the behavior matrix of the
framework; defaults follow the reference defaults.
"""

from __future__ import annotations

import dataclasses
import enum
import jax.numpy as jnp


class ModelKind(enum.Enum):
    """Which geometric model is estimated."""

    ESSENTIAL = "essential"       # 5PC Nistér (sample_size 5, 10 solutions)
    FUNDAMENTAL = "fundamental"   # 7PC (sample_size 7, 4 solution slots) / 8PC
    RIGID = "rigid"               # 3-point Kabsch (sample_size 3, 1 solution)


class SamplerKind(enum.IntEnum):
    """Sampler ids, matching the reference flag ``-sam``.

    0 - uniform; 1/2 - Gumbel-softmax top-k at the solver's minimal sample
    size; 3 - Gumbel-softmax top-8 (8PC non-minimal samples for F).
    (reference: ``utils.py:39-41``, ``model_cl.py:180-208``)
    """

    UNIFORM = 0
    GUMBEL = 1
    GUMBEL_ST = 2
    GUMBEL_8PT = 3


class ScoringKind(enum.IntEnum):
    """Model-quality function used to rank hypotheses during the search.

    MSAC: soft truncated-quadratic support (reference
    ``scorings/msac_score.py:33-48``). MAGSAC: σ-marginalized quality — the
    model-selection criterion of the reference's SOTA inference path, where
    the whole search is handed to C++ MAGSAC++ (``test_magsac.py:61-69``);
    here it is an elementwise function of the same Sampson d² evaluated on
    TPU (see :func:`differentiable_ransac_tpu.scoring.magsac_score`).
    RANSAC: plain hard inlier count over the same support as MSAC — the
    classic criterion the ``-s 0`` flag documents.
    """

    MSAC = 0
    MAGSAC = 1
    RANSAC = 2


class ProbType(enum.IntEnum):
    """How the predicted weights are presented to the sampler.

    (reference ``-p``: 0 normalized weights, 1 unnormalized, 2 logits;
    ``model_cl.py:472-484``)
    """

    NORMALIZED = 0
    UNNORMALIZED = 1
    LOGITS = 2


_PRECISION_TO_DTYPE = {0: jnp.float16, 1: jnp.float32, 2: jnp.float64}


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    """Static configuration of the RANSAC engine.

    All fields are hashable/static so a config instance can be closed over by
    ``jax.jit`` without retracing per call.
    """

    model: ModelKind = ModelKind.ESSENTIAL
    sampler: SamplerKind = SamplerKind.GUMBEL
    # Inlier-outlier threshold in px; normalized by focal length for E
    # (reference ``ransac.py:49-53``).
    threshold: float = 0.75
    confidence: float = 0.999
    max_iterations: int = 5000
    # Number of hypotheses evaluated per chunk (reference ransac_batch_size=64).
    ransac_batch_size: int = 64
    # Local optimization: 0 off, 1 single LSQ refit, 2 iterated LSQ refit,
    # 3 inner RANSAC (reference ``ransac.py:217-299``).
    lo: int = 0
    lo_iters: int = 64
    # Weighted non-minimal solves (reference ``-wei``).
    weighted: bool = False
    # Hypothesis-quality function (MSAC default; MAGSAC = σ-consensus
    # model selection during the search, the reference's SOTA path).
    scoring: ScoringKind = ScoringKind.MSAC
    # σ-marginalization levels for MAGSAC scoring (matches the native
    # polish, ``csrc/sigma_consensus.cpp`` kSigmaLevels).
    sigma_levels: int = 10
    # Maximum noise scale σ_max for MAGSAC scoring, as a multiplier on the
    # (focal-normalized) threshold; 0.0 -> 1.0 (σ_max = threshold).
    sigma_max: float = 0.0
    # Final-refit rounds (IRLS): refit on the winner's support, rescore,
    # keep if better, repeat. The reference does ONE refit
    # (``ransac.py:148-195``); >1 iterates it to convergence of the inlier
    # set. In MAGSAC scoring mode each round is σ-weighted over ALL points
    # (the σ-consensus polish of MAGSAC++, same marginal weights as the
    # native ``csrc/sigma_consensus.cpp``) instead of binary-mask LSQ.
    refit_rounds: int = 4
    train: bool = False
    # Train mode only: clip each hypothesis's sample-cotangent to this norm
    # in the backward pass (0 disables). The minimal solvers' implicit VJPs
    # amplify bounded loss cotangents to ~1e13 near sample degeneracies,
    # drowning every other loss after global-norm clipping — see
    # ``engine._clip_sample_cotangent``.
    grad_sample_clip: float = 1.0
    eps: float = 1e-5
    precision: int = 1  # 0 fp16, 1 fp32, 2 fp64 (reference ``utils.py:42-43``)
    # Precision of the minimal-solver cores (elimination, root finding):
    # 2 = f64 (accurate; default), 1 = f32 (faster compile/run, 2-3 digits
    # looser — the reference's torch-f32 accuracy class).
    solver_precision: int = 2
    # Degree-10 real-root backend of the 5PC solver: "aberth" (simultaneous
    # iteration, default, also finds complex roots) or "sturm" (Sturm
    # isolation + cumulative-count bisection — guaranteed bracketing; the
    # reference's StrumPolynomialSolver capability, math_utils.py:111-501).
    root_solver: str = "aberth"
    # Preemptive two-stage scoring (fixed-budget search): score every model
    # on `prescreen` points first, fully score only the best `prescreen_keep`
    # fraction. 0 disables. The VPU elementwise tail of H·S·N Sampson
    # evaluations dominates the hypothesis loop; prescreening cuts it ~N/prescreen x
    # with negligible ranking error (the preemption idea of Nistér 2003).
    prescreen: int = 0
    prescreen_keep: float = 0.05

    @property
    def dtype(self):
        return _PRECISION_TO_DTYPE[self.precision]

    @property
    def fmat(self) -> bool:
        return self.model == ModelKind.FUNDAMENTAL

    @property
    def sample_size(self) -> int:
        if self.sampler == SamplerKind.GUMBEL_8PT:
            return 8
        return minimal_sample_size(self.model)

    @property
    def solutions_per_sample(self) -> int:
        if self.sampler == SamplerKind.GUMBEL_8PT:
            return 1
        return {
            ModelKind.ESSENTIAL: 10,
            ModelKind.FUNDAMENTAL: 4,
            ModelKind.RIGID: 1,
        }[self.model]

    @property
    def num_chunks(self) -> int:
        """Number of hypothesis chunks to reach max_iterations.

        The reference advances ``iterations += ransac_batch_size`` per chunk
        until ``iterations >= max_iters`` (``ransac.py:55,144``), i.e. it
        evaluates ``ceil(max_iters / rbs)`` chunks.
        """
        return -(-self.max_iterations // self.ransac_batch_size)

    @property
    def num_hypotheses(self) -> int:
        return self.num_chunks * self.ransac_batch_size

    def replace(self, **kw) -> "RansacConfig":
        return dataclasses.replace(self, **kw)


def minimal_sample_size(model: ModelKind) -> int:
    return {
        ModelKind.ESSENTIAL: 5,
        ModelKind.FUNDAMENTAL: 7,
        ModelKind.RIGID: 3,
    }[model]


def default_train_config(model: ModelKind, sampler: SamplerKind = SamplerKind.GUMBEL) -> RansacConfig:
    """Training defaults: fixed iteration budget (reference model_cl.py:212-219)."""
    max_iters = 1000 if model != ModelKind.ESSENTIAL else 100
    return RansacConfig(model=model, sampler=sampler, train=True, max_iterations=max_iters)


def default_test_config(model: ModelKind, sampler: SamplerKind = SamplerKind.GUMBEL) -> RansacConfig:
    return RansacConfig(model=model, sampler=sampler, train=False, max_iterations=5000)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Top-level training options (reference ``utils.py:7-83`` knobs)."""

    batch_size: int = 32
    nfeatures: int = 2000
    snn_threshold: float = 0.8
    learning_rate: float = 1e-4
    epochs: int = 10
    # Loss weights: w0 pose, w1 classification, w2 epipolar/match loss.
    w0: float = 0.0
    w1: float = 0.0
    w2: float = 1.0
    prob_type: ProbType = ProbType.LOGITS
    topk: bool = False
    k: int = 300
    scheduler: int = 0
    eta_min: float = 1e-4
    grad_clip: float = 5.0
    seed: int = 0
    session: str = ""


def session_string(prefix: str, cfg: "TrainConfig", ransac: "RansacConfig") -> str:
    """Output-dir naming convention (reference ``utils.py:98-128``)."""
    s = prefix + "_"
    s += "F_" if ransac.fmat else "E_"
    s += f"sam_{int(ransac.sampler)}_"
    s += f"e_{cfg.epochs}_"
    s += f"rs_{cfg.nfeatures}"
    s += "_r%.2f_" % cfg.snn_threshold
    s += "t%.2f_" % ransac.threshold
    if cfg.w0 != 0:
        s += "w0_%.2f_" % cfg.w0
    if cfg.w1 != 0:
        s += "w1_%.2f_" % cfg.w1
    if cfg.w2 != 0:
        s += "w2_%.2f_" % cfg.w2
    s += cfg.session
    return s


# The 12 PhotoTourism test scenes (reference ``utils.py:131-147``).
OUTDOOR_TEST_SCENES = (
    "buckingham_palace",
    "brandenburg_gate",
    "colosseum_exterior",
    "grand_place_brussels",
    "notre_dame_front_facade",
    "palace_of_westminster",
    "pantheon_exterior",
    "prague_old_town_square",
    "sacre_coeur",
    "taj_mahal",
    "trevi_fountain",
    "westminster_abbey",
)

"""Pallas TPU kernels for the scoring hot loop.

The MSAC scorer evaluates H models against N points. The XLA path
materializes two (H, 3, N) epipolar-line tensors in HBM between the matmuls
and the elementwise tail; this fused kernel keeps everything in VMEM — each
grid step loads a tile of models (tiny) and a tile of points, computes the
Sampson distances and accumulates soft-inlier scores in-register. HBM
traffic drops from ~3·H·3·N floats to H·N inputs read once.

Used by the engine when ``use_pallas_scoring=True`` (TPU only); the jnp path
is the reference implementation and the fallback everywhere else.

Status note: correctness is pinned against the jnp scorer (interpret-mode
tests). On the current axon-tunneled dev chip, Mosaic kernel compilation is
broken by the tunnel itself (it injects a warning string into
``TPU_WORKER_HOSTNAMES`` server-side), so the flag defaults to off; on
directly-attached TPUs the kernel compiles through the standard Mosaic path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from differentiable_ransac_tpu.scoring import msac_threshold


def _msac_kernel(models_ref, x1_ref, y1_ref, x2_ref, y2_ref, mask_ref,
                 thr_ref, out_ref):
    """One grid step: TILE_H models × TILE_N points.

    models_ref: (TILE_H, 16) — flattened 3×3 models padded to 16 lanes.
    x1/y1/x2/y2/mask_ref: (1, TILE_N) point coordinate rows.
    thr_ref: (1, 1) squared threshold in SMEM.
    out_ref: (TILE_H, 1) accumulated scores.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    x1 = x1_ref[0, :][None, :]
    y1 = y1_ref[0, :][None, :]
    x2 = x2_ref[0, :][None, :]
    y2 = y2_ref[0, :][None, :]
    pmask = mask_ref[0, :][None, :]
    m = models_ref[:, :]  # (TILE_H, 16)

    def col(k):
        return m[:, k][:, None]  # (TILE_H, 1)

    # epipolar lines: M x1 and Mᵀ x2 (model layout row-major m0..m8)
    mx1_0 = col(0) * x1 + col(1) * y1 + col(2)
    mx1_1 = col(3) * x1 + col(4) * y1 + col(5)
    mx1_2 = col(6) * x1 + col(7) * y1 + col(8)
    mtx2_0 = col(0) * x2 + col(3) * y2 + col(6)
    mtx2_1 = col(1) * x2 + col(4) * y2 + col(7)
    num = x2 * mx1_0 + y2 * mx1_1 + mx1_2
    den = mx1_0 * mx1_0 + mx1_1 * mx1_1 + mtx2_0 * mtx2_0 + mtx2_1 * mtx2_1
    d2 = num * num / (den + 1e-15)
    thr = thr_ref[0, 0]
    soft = jnp.maximum(1.0 - d2 / thr, 0.0) * pmask
    out_ref[:, :] += jnp.sum(soft, axis=1, keepdims=True)


try:  # pallas imports fail gracefully on unsupported backends
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


TILE_H = 8
TILE_N = 512


def msac_scores_pallas(matches: jnp.ndarray, models: jnp.ndarray, threshold,
                       point_mask: jnp.ndarray | None = None,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused soft-MSAC scores of (H, 3, 3) models over (N, 4) matches.

    Matches the jnp scorer (:func:`differentiable_ransac_tpu.scoring.msac_score`)
    bit-for-bit up to reduction order. Forward-only (use the jnp path for
    training); returns (H,) scores.
    """
    assert _PALLAS_OK, "pallas unavailable"
    H = models.shape[0]
    N = matches.shape[0]
    dtype = jnp.float32
    matches = matches.astype(dtype)
    pad_h = (-H) % TILE_H
    pad_n = (-N) % TILE_N
    m = jnp.pad(models.reshape(H, 9).astype(dtype), ((0, pad_h), (0, 7)))
    x1 = jnp.pad(matches[:, 0], (0, pad_n)).reshape(1, -1)
    y1 = jnp.pad(matches[:, 1], (0, pad_n)).reshape(1, -1)
    x2 = jnp.pad(matches[:, 2], (0, pad_n)).reshape(1, -1)
    y2 = jnp.pad(matches[:, 3], (0, pad_n)).reshape(1, -1)
    if point_mask is None:
        pmask = (jnp.arange(N + pad_n) < N).astype(dtype).reshape(1, -1)
    else:
        pmask = jnp.pad(point_mask.astype(dtype), (0, pad_n)).reshape(1, -1)
    thr = jnp.asarray(msac_threshold(threshold), dtype).reshape(1, 1)

    Hp = H + pad_h
    Np = N + pad_n
    grid = (Hp // TILE_H, Np // TILE_N)

    out = pl.pallas_call(
        _msac_kernel,
        out_shape=jax.ShapeDtypeStruct((Hp, 1), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_H, 16), lambda i, j: (i, 0)),
            pl.BlockSpec((1, TILE_N), lambda i, j: (0, j)),
            pl.BlockSpec((1, TILE_N), lambda i, j: (0, j)),
            pl.BlockSpec((1, TILE_N), lambda i, j: (0, j)),
            pl.BlockSpec((1, TILE_N), lambda i, j: (0, j)),
            pl.BlockSpec((1, TILE_N), lambda i, j: (0, j)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE_H, 1), lambda i, j: (i, 0)),
        interpret=interpret,
    )(m, x1, y1, x2, y2, pmask, thr)
    return out[:H, 0]

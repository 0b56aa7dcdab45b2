"""CLNet-style consensus-learning network in Flax — the learned
per-correspondence importance predictor.

Architecture parity with the reference ``DS_Block``
(``/root/reference/model_cl.py:367-436``): 7-channel input
(x1, y1, x2, y2, snn_ratio, scale_ratio, Δangle) → 128-ch pointwise embed →
4 ResNet blocks → DGCNN graph block (k=9) → 4 ResNet blocks → ``linear_0``
giving intermediate weights w0 → GCN attention aggregation on
``stop_gradient(w0)`` with residual → 1 ResNet block → ``linear_1`` → logits.

TPU-first layout: correspondences are channels-last ``(B, N, C)`` tensors;
every 1×1 conv is a Dense over C (an MXU matmul with N as the batch-of-rows
dimension); the kNN graph is one ``(B, N, N)`` Gram matmul + ``top_k``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def knn_indices(x: jnp.ndarray, k: int, exact: bool = False) -> jnp.ndarray:
    """k nearest neighbors in feature space (reference ``model_cl.py:29-36``).

    Args:
        x: (B, N, C) features.
        k: neighbor count (self included, as in the reference).
        exact: use exact ``top_k`` (a full sort over N per query — slow on
            TPU). Default uses ``approx_max_k`` (TPU-native partial
            reduction, ~0.95 recall): DGCNN edge features are robust to
            approximate neighborhoods.

    Returns:
        (B, N, k) int32 neighbor indices.
    """
    # -‖a-b‖² = 2ab - ‖a‖² - ‖b‖²; one MXU Gram matmul.
    inner = jnp.einsum("bnc,bmc->bnm", x, x)
    sq = jnp.sum(x**2, axis=-1)
    neg_dist = 2 * inner - sq[:, :, None] - sq[:, None, :]
    if exact:
        _, idx = jax.lax.top_k(neg_dist, k)
    else:
        _, idx = jax.lax.approx_max_k(neg_dist, k, recall_target=0.95)
    return idx


def graph_features(x: jnp.ndarray, k: int, exact: bool = False) -> jnp.ndarray:
    """DGCNN edge features ``[x, x − x_nn]`` (reference ``model_cl.py:39-62``).

    Args:
        x: (B, N, C).

    Returns:
        (B, N, k, 2C).
    """
    idx = knn_indices(x, k, exact=exact)  # (B, N, k)
    neighbors = jnp.take_along_axis(x[:, None, :, :], idx[..., None], axis=2)
    center = jnp.broadcast_to(x[:, :, None, :], neighbors.shape)
    return jnp.concatenate([center, center - neighbors], axis=-1)


class InstanceNorm(nn.Module):
    """Per-(sample, channel) normalization over the N axis — equivalent to the
    reference's ``nn.InstanceNorm2d`` (affine-free) on (B, C, N, 1)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=-2, keepdims=True)
        var = jnp.var(x, axis=-2, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


class ResNetBlock(nn.Module):
    """1×1-conv residual block (reference ``model_cl.py:65-86``)."""

    channels: int
    pre: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        right = nn.Dense(self.channels)(x) if self.pre else x
        out = nn.Dense(self.channels)(x)
        out = InstanceNorm()(out)
        out = nn.BatchNorm(use_running_average=not train)(out)
        out = nn.relu(out)
        out = nn.Dense(self.channels)(out)
        out = InstanceNorm()(out)
        out = nn.BatchNorm(use_running_average=not train)(out)
        return nn.relu(out + right)


class DGCNNBlock(nn.Module):
    """Graph conv over k neighbors (reference ``model_cl.py:89-119``):
    (1,3)-strided conv then (1,3) valid conv collapse the neighbor axis."""

    channels: int
    knn_num: int = 9
    exact_knn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.knn_num in (9, 6)
        feats = graph_features(x, self.knn_num, self.exact_knn)  # (B, N, k, 2C)
        out = nn.Conv(self.channels, kernel_size=(1, 3), strides=(1, 3), padding="VALID")(feats)
        out = nn.BatchNorm(use_running_average=not train)(out)
        out = nn.relu(out)
        tail = (1, 3) if self.knn_num == 9 else (1, 2)
        out = nn.Conv(self.channels, kernel_size=tail, padding="VALID")(out)
        out = nn.BatchNorm(use_running_average=not train)(out)
        out = nn.relu(out)
        return out[:, :, 0, :]  # (B, N, C)


class GCNBlock(nn.Module):
    """Attention-adjacency graph aggregation (reference ``model_cl.py:122-157``).

    The normalized-Laplacian aggregation is computed under ``stop_gradient``
    exactly as the reference wraps it in ``torch.no_grad`` (``:139-147``).

    ``aggregation="reference"`` (default) reproduces the reference's shipped
    behavior bit-for-bit — which is NOT the CLNet paper's rank-1 attention:
    ``attention()`` computes ``bmm(wᵀ, w)`` of a (B, N, 1) tensor
    (``model_cl.py:131-134``), i.e. a (B, 1, 1) GLOBAL SCALAR ``s = Σ aₖ²``
    broadcast over the adjacency, so the aggregation reduces to the uniform
    mix ``out_i = (s·Σ_j x_j + x_i) / (N·s + 1)`` — O(NC), no matmul.
    Pretrained reference checkpoints were trained under these semantics, so
    weight import requires them.

    ``aggregation="rank1"`` computes the paper-intended ``A = a aᵀ + I``
    normalized-Laplacian aggregation, factored exactly as
    ``L x = d ⊙ (a (aᵀ (d ⊙ x))) + d² ⊙ x`` with ``d = 1/√(a·Σa + 1)``
    (no O(N²C) matmul or O(N²) adjacency materialization).
    """

    channels: int
    aggregation: str = "reference"

    @nn.compact
    def __call__(self, x, w, train: bool = False):
        def aggregate(w, x):
            a = nn.relu(jnp.tanh(w))  # (B, N)
            if self.aggregation == "reference":
                n = x.shape[1]
                s = jnp.sum(a * a, axis=-1, keepdims=True)[..., None]  # (B,1,1)
                return (s * jnp.sum(x, axis=1, keepdims=True) + x) / (n * s + 1.0)
            deg = a * jnp.sum(a, axis=-1, keepdims=True) + 1.0
            d = jax.lax.rsqrt(deg)  # (B, N)
            dx = x * d[..., None]
            proj = jnp.einsum("bn,bnc->bc", a, dx)
            out = d[..., None] * (a[..., None] * proj[:, None, :]) + d[..., None] * dx
            return out

        out = aggregate(jax.lax.stop_gradient(w), x)
        out = nn.Dense(self.channels)(out)
        out = nn.BatchNorm(use_running_average=not train)(out)
        return nn.relu(out)


class DSBlock(nn.Module):
    """The CLNet backbone (reference ``model_cl.py:367-436``).

    ``sampling_rate < 1`` enables the CLNet pruning path (the reference's
    ``down_sampling`` machinery, ``model_cl.py:407-425`` — dead at its
    shipped ``sampling_rate=1.0`` but part of the architecture): after the
    intermediate weights ``w0``, only the top ``⌈N·sr⌉`` correspondences by
    ``w0`` are kept (hard top-k, indices under stop-gradient exactly as the
    reference gathers under ``torch.no_grad``; the FEATURES keep their
    gradient, matching ``feature_out = torch.gather(features, …)`` outside
    the no_grad block). The GCN aggregation and the final embed/linear run
    on the pruned set, and the logits are scattered back to the full N with
    a large negative fill — fixed shapes end-to-end, so the pruned variant
    jits exactly like the dense one.
    """

    channels: int = 128
    knn_num: int = 9
    exact_knn: bool = False
    sampling_rate: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, N, 7) -> logits (B, N)."""
        out = nn.Dense(self.channels)(x)
        out = nn.BatchNorm(use_running_average=not train)(out)
        out = nn.relu(out)

        for _ in range(4):
            out = ResNetBlock(self.channels)(out, train)
        out = DGCNNBlock(self.channels, self.knn_num, self.exact_knn)(out, train)
        for _ in range(4):
            out = ResNetBlock(self.channels)(out, train)

        w0 = nn.Dense(1)(out)[..., 0]  # (B, N)

        if self.sampling_rate < 1.0:
            n = out.shape[1]
            k = max(int(n * self.sampling_rate), 1)
            _, idx = jax.lax.top_k(jax.lax.stop_gradient(w0), k)  # (B, k)
            out_k = jnp.take_along_axis(out, idx[..., None], axis=1)
            w0_k = jnp.take_along_axis(w0, idx, axis=1)
            out_g = GCNBlock(self.channels)(
                out_k, jax.lax.stop_gradient(w0_k), train)
            out_k = out_g + out_k
            out_k = ResNetBlock(self.channels)(out_k, train)
            w1_k = nn.Dense(1)(out_k)[..., 0]  # (B, k)
            # scatter back to full length; pruned points get a logit low
            # enough that sigmoid ≈ 0 and the Gumbel sampler never draws them
            b_idx = jnp.arange(w0.shape[0])[:, None]
            w1 = jnp.full_like(w0, -30.0).at[b_idx, idx].set(w1_k)
            return w1, w0

        out_g = GCNBlock(self.channels)(out, jax.lax.stop_gradient(w0), train)
        out = out_g + out
        out = ResNetBlock(self.channels)(out, train)
        w1 = nn.Dense(1)(out)[..., 0]
        return w1, w0


class CLNet(nn.Module):
    """Weight predictor head (reference ``CLNet``/``DeepRansac_CLNet`` weight
    path, ``model_cl.py:600-642``): DS block → log-sigmoid → prob_type
    selection."""

    channels: int = 128
    knn_num: int = 9
    exact_knn: bool = False
    # < 1.0 enables CLNet iterative pruning (keep top N·sr by w0; reference
    # ``model_cl.py:407-425``); shipped reference default is 1.0 (off).
    sampling_rate: float = 1.0

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False):
        """points: (B, N, 7).

        Returns dict with ``logits`` (raw w1), ``log_probs``, ``weights``
        (sigmoid), ``normalized_weights`` — the three prob_type flavors
        (reference ``model_cl.py:461-484``).
        """
        w1, w0 = DSBlock(self.channels, self.knn_num, self.exact_knn,
                         self.sampling_rate)(points, train)
        log_probs = jax.nn.log_sigmoid(w1)
        weights = jnp.exp(log_probs)
        normalized = weights / jnp.sum(weights, axis=-1, keepdims=True)
        return {
            "logits": log_probs,
            "raw": w1,
            "w0": w0,
            "log_probs": log_probs,
            "weights": weights,
            "normalized_weights": normalized,
        }


def select_prob_type(outputs: dict, prob_type: int) -> jnp.ndarray:
    """0: normalized weights, 1: unnormalized, 2: logits
    (reference ``model_cl.py:472-484``)."""
    return [outputs["normalized_weights"], outputs["weights"], outputs["log_probs"]][prob_type]

"""Import reference (PyTorch) CLNet checkpoints into the Flax CLNet.

The reference ships pretrained ``DS_Block`` weight predictors
(``/root/reference/pretrained_models/``, loaded by ``train.py:226-229`` /
``test.py:140``). Our :class:`~differentiable_ransac_tpu.models.clnet.CLNet`
is architecture-parity with the reference ``DS_Block``
(``model_cl.py:367-436``), so its checkpoints convert tensor-for-tensor:

==============================  =====================================
reference (torch state_dict)     flax param tree
==============================  =====================================
``ds_0.conv.0`` (Conv2d 7→128)   ``DSBlock_0/Dense_0``
``ds_0.conv.1`` (BatchNorm2d)    ``DSBlock_0/BatchNorm_0``
``ds_0.embed_0.{0..3}``          ``DSBlock_0/ResNetBlock_{0..3}``
``ds_0.embed_0.4`` (DGCNN)       ``DSBlock_0/DGCNNBlock_0``
``ds_0.embed_0.{5..8}``          ``DSBlock_0/ResNetBlock_{4..7}``
``ds_0.linear_0``                ``DSBlock_0/Dense_1``
``ds_0.gcn``                     ``DSBlock_0/GCNBlock_0``
``ds_0.embed_1.0``               ``DSBlock_0/ResNetBlock_8``
``ds_0.linear_1``                ``DSBlock_0/Dense_2``
==============================  =====================================

ResNet blocks: ``left.0/left.4`` (1×1 convs) → ``Dense_0/Dense_1``,
``left.2/left.6`` (BatchNorm2d) → ``BatchNorm_0/BatchNorm_1``; the
reference's ``right`` conv is unused at ``pre=False``
(``model_cl.py:81-82``) and is skipped. 1×1 Conv2d kernels (O, I, 1, 1)
transpose to Dense kernels (I, O); DGCNN (O, I, 1, 3) kernels transpose to
flax Conv (1, 3, I, O). InstanceNorm2d layers are affine-free on both
sides (no parameters).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.net`` checkpoint as numpy arrays (CPU torch)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: v.detach().numpy() for k, v in sd.items()}


def _dense(sd, key):
    return {
        "kernel": sd[f"{key}.weight"][:, :, 0, 0].T.astype(np.float32),
        "bias": sd[f"{key}.bias"].astype(np.float32),
    }


def _conv(sd, key):
    # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    return {
        "kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0).astype(np.float32),
        "bias": sd[f"{key}.bias"].astype(np.float32),
    }


def _bn(sd, key):
    params = {
        "scale": sd[f"{key}.weight"].astype(np.float32),
        "bias": sd[f"{key}.bias"].astype(np.float32),
    }
    stats = {
        "mean": sd[f"{key}.running_mean"].astype(np.float32),
        "var": sd[f"{key}.running_var"].astype(np.float32),
    }
    return params, stats


def _resnet_block(sd, key):
    bn0_p, bn0_s = _bn(sd, f"{key}.left.2")
    bn1_p, bn1_s = _bn(sd, f"{key}.left.6")
    params = {
        "Dense_0": _dense(sd, f"{key}.left.0"),
        "BatchNorm_0": bn0_p,
        "Dense_1": _dense(sd, f"{key}.left.4"),
        "BatchNorm_1": bn1_p,
    }
    stats = {"BatchNorm_0": bn0_s, "BatchNorm_1": bn1_s}
    return params, stats


def clnet_params_from_torch(
    sd: Dict[str, np.ndarray], prefix: str = "ds_0"
) -> Tuple[dict, dict]:
    """Convert a reference DS_Block state_dict to (params, batch_stats)
    for :class:`CLNet`. ``prefix`` is the torch module name of the DS block
    (``ds_0`` in ``DeepRansac_CLNet``/``CLNet``, ``model_cl.py:445,606``).
    """
    p: dict = {}
    s: dict = {}

    stem_bn_p, stem_bn_s = _bn(sd, f"{prefix}.conv.1")
    p["Dense_0"] = _dense(sd, f"{prefix}.conv.0")
    p["BatchNorm_0"] = stem_bn_p
    s["BatchNorm_0"] = stem_bn_s

    for i in range(4):
        bp, bs = _resnet_block(sd, f"{prefix}.embed_0.{i}")
        p[f"ResNetBlock_{i}"] = bp
        s[f"ResNetBlock_{i}"] = bs

    dg_bn0_p, dg_bn0_s = _bn(sd, f"{prefix}.embed_0.4.conv.1")
    dg_bn1_p, dg_bn1_s = _bn(sd, f"{prefix}.embed_0.4.conv.4")
    p["DGCNNBlock_0"] = {
        "Conv_0": _conv(sd, f"{prefix}.embed_0.4.conv.0"),
        "BatchNorm_0": dg_bn0_p,
        "Conv_1": _conv(sd, f"{prefix}.embed_0.4.conv.3"),
        "BatchNorm_1": dg_bn1_p,
    }
    s["DGCNNBlock_0"] = {"BatchNorm_0": dg_bn0_s, "BatchNorm_1": dg_bn1_s}

    for i in range(4):
        bp, bs = _resnet_block(sd, f"{prefix}.embed_0.{5 + i}")
        p[f"ResNetBlock_{4 + i}"] = bp
        s[f"ResNetBlock_{4 + i}"] = bs

    p["Dense_1"] = _dense(sd, f"{prefix}.linear_0")

    gcn_bn_p, gcn_bn_s = _bn(sd, f"{prefix}.gcn.conv.1")
    p["GCNBlock_0"] = {
        "Dense_0": _dense(sd, f"{prefix}.gcn.conv.0"),
        "BatchNorm_0": gcn_bn_p,
    }
    s["GCNBlock_0"] = {"BatchNorm_0": gcn_bn_s}

    bp, bs = _resnet_block(sd, f"{prefix}.embed_1.0")
    p["ResNetBlock_8"] = bp
    s["ResNetBlock_8"] = bs

    p["Dense_2"] = _dense(sd, f"{prefix}.linear_1")

    return {"DSBlock_0": p}, {"DSBlock_0": s}


def load_reference_clnet(path: str, prefix: str = "ds_0") -> Tuple[dict, dict]:
    """One-call import: reference ``.net`` checkpoint → (params, batch_stats)
    ready for ``CLNet().apply({"params": ..., "batch_stats": ...}, x)``."""
    return clnet_params_from_torch(load_torch_state_dict(path), prefix)

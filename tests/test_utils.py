"""Flags / logging / config utility tests."""

import json
import sys

import numpy as np

from differentiable_ransac_tpu.config import (
    ModelKind,
    OUTDOOR_TEST_SCENES,
    RansacConfig,
    SamplerKind,
    TrainConfig,
    session_string,
)
from differentiable_ransac_tpu.utils import MetricsLogger, build_parser, configs_from_args


def _parse(argv):
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        return build_parser("t").parse_args()
    finally:
        sys.argv = old


def test_reference_demo_invocation():
    # the reference demo config: -nf 2000 -bs 32 -fmat 1 -sam 3 -t 2
    args = _parse(["-nf", "2000", "-bs", "32", "-fmat", "1", "-sam", "3", "-t", "2"])
    tcfg, rcfg = configs_from_args(args)
    assert rcfg.model == ModelKind.FUNDAMENTAL
    assert rcfg.sampler == SamplerKind.GUMBEL_8PT
    assert rcfg.sample_size == 8
    assert rcfg.threshold == 2.0
    assert rcfg.max_iterations == 5000
    assert tcfg.nfeatures == 2000 and tcfg.batch_size == 32


def test_reference_sota_invocation():
    # -nf 2000 -bs 32 -fmat 0 -sam 1 -bm 1 -t 2
    args = _parse(["-nf", "2000", "-bs", "32", "-fmat", "0", "-sam", "1", "-bm", "1", "-t", "2"])
    _, rcfg = configs_from_args(args)
    assert rcfg.model == ModelKind.ESSENTIAL
    assert rcfg.sample_size == 5
    assert args.batch_mode == 1


def test_train_iteration_defaults():
    _, r_e = configs_from_args(_parse(["-tr", "1"]))
    assert r_e.max_iterations == 100  # 5PC train default
    _, r_f = configs_from_args(_parse(["-tr", "1", "-fmat", "1"]))
    assert r_f.max_iterations == 1000


def test_session_string_shape():
    t = TrainConfig(w2=1.0, epochs=3)
    r = RansacConfig(model=ModelKind.FUNDAMENTAL, sampler=SamplerKind.GUMBEL_8PT)
    s = session_string("x", t, r)
    assert s.startswith("x_F_sam_3_e_3_")
    assert "w2_1.00" in s


def test_twelve_scene_list():
    assert len(OUTDOOR_TEST_SCENES) == 12
    assert "sacre_coeur" in OUTDOOR_TEST_SCENES


def test_metrics_logger(tmp_path):
    lg = MetricsLogger(str(tmp_path), "sess", tensorboard=False)
    lg.log(1, {"loss": 0.5}, prefix="train/")
    lg.log(2, {"loss": 0.25})
    lg.log_text("scene: AUC=0.5")
    lg.close()
    lines = (tmp_path / "sess" / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    row = json.loads(lines[0])
    assert row["train/loss"] == 0.5 and row["step"] == 1
    assert (tmp_path / "sess" / "test.txt").read_text().startswith("scene:")


def test_package_forces_true_f32_matmuls():
    """Importing the package must pin matmul precision to 'highest': TPU's
    default single-bf16-pass f32 contractions collapse pixel-scale epipolar
    algebra (measured: F1 0.648 -> 0.151 on identical records, PARITY.md
    round-3 note)."""
    import jax

    import differentiable_ransac_tpu  # noqa: F401 — import applies config

    assert str(jax.config.jax_default_matmul_precision) == "highest"

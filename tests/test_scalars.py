"""Scalar-stream logging: JSONL always, TensorBoard when importable
(HAC/train.py:283-286,634-645 parity)."""

import pytest
import json
import os

from gauspcc_tpu.utils.scalars import ScalarLogger

pytestmark = pytest.mark.smoke


def test_jsonl_and_tensorboard_sinks(tmp_path):
    log = ScalarLogger(str(tmp_path))
    log.log(10, {"train/loss": 0.5, "train/psnr": 30.0, "skip": None})
    log.log(20, {"train/loss": 0.25})
    log.close()

    lines = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    assert lines[0]["step"] == 10 and lines[0]["train/loss"] == 0.5
    assert "skip" not in lines[0]
    assert lines[1]["train/loss"] == 0.25

    assert "jsonl" in log.sinks
    if "tensorboard" in log.sinks:
        assert any(f.startswith("events.out.tfevents")
                   for f in os.listdir(tmp_path))


def test_wandb_gated_off_without_package(tmp_path):
    log = ScalarLogger(str(tmp_path), use_wandb=True)
    assert "wandb" not in log.sinks or log._wandb is not None
    log.close()

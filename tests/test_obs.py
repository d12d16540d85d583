"""Observability tests: tee logger, JSONL sink, experiment-logger schema,
visualiser save path conventions."""
import json
import os
import sys

import numpy as np

from underwater_image_restoration_tpu.core.config import Config
from underwater_image_restoration_tpu.obs import (
    ExperimentLogger,
    JsonlSink,
    Logger,
    StepTimer,
    save_from_array,
)


def test_tee_logger_duplicates_and_restores(tmp_path, capsys):
    path = str(tmp_path / "sub" / "log.txt")
    with Logger(path):
        print("hello tee")
    assert sys.stdout is not None
    assert "hello tee" in open(path).read()
    assert "hello tee" in capsys.readouterr().out


def test_jsonl_sink(tmp_path):
    p = str(tmp_path / "m.jsonl")
    s = JsonlSink(p)
    s.log({"train/loss": 0.5}, step=3)
    s.finish()
    rec = json.loads(open(p).read().strip())
    assert rec["train/loss"] == 0.5 and rec["_step"] == 3


def test_experiment_logger_schema(tmp_path):
    cfg = Config(use_wandb=False)
    el = ExperimentLogger(cfg, save_dir=str(tmp_path))
    m = el.format_train_metrics(0.1, 1e-3)
    assert m == {"train/loss": 0.1, "train/learning_rate": 1e-3}
    assert el.format_loss_metrics(0.2, "FFL Loss") == {"train/loss_FFL Loss": 0.2}
    t = el.format_test_metrics(1, 2, 3, 4)
    assert set(t) == {"test/loss", "test/PSNR", "test/SSIM", "test/epochTime"}
    el.log_train_metrics(m, epoch=2, batch_idx=1, trainloader_len=10)
    el.log_test_metrics(t)
    el.log_model_artifact(str(tmp_path), name="x")  # no wandb sink: no-op
    el.finish()
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert recs[0]["_step"] == 21  # epoch*len + batch (wandb_logger.py:34)
    assert recs[1]["test/PSNR"] == 2


def test_experiment_logger_evaluate_mode_suppresses(tmp_path):
    cfg = Config(use_wandb=False, evaluate=True)
    el = ExperimentLogger(cfg, save_dir=str(tmp_path))
    el.log_test_metrics({"test/loss": 1.0})
    el.finish()
    assert open(tmp_path / "metrics.jsonl").read() == ""


def test_save_from_array_conventions(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    arr = np.linspace(0, 1, 8 * 8 * 3, dtype=np.float32).reshape(1, 8, 8, 3)
    img = save_from_array("mydir", "name", arr)
    # reference saves under Images/<dir><name>.png (Visualiser.py:58-60)
    assert os.path.exists("Images/mydir/name.png")
    assert np.asarray(img).shape == (8, 8, 3)
    # clipping to [0,1] (values >1 saturate)
    save_from_array("mydir", "clip", arr * 4)


def test_step_timer_skips_warmup():
    t = StepTimer(skip_first=1)
    for _ in range(3):
        t.start()
        t.stop()
    assert t.count == 2 and t.mean >= 0.0


def test_profile_trace_writes_trace(tmp_path):
    import jax
    import jax.numpy as jnp

    from underwater_image_restoration_tpu.obs import profile_trace

    with profile_trace(str(tmp_path / "prof")):
        jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    files = list((tmp_path / "prof").rglob("*"))
    assert any(f.is_file() for f in files)
    with profile_trace(""):  # disabled: no-op
        pass

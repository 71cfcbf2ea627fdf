"""MetricsLogger: the always-on JSONL mirror of the reference's wandb/print
telemetry (reference optimize.py:427-443, main.py:206-208)."""

import json

import numpy as np

from stablekeypoints_tpu.utils.logging import MetricsLogger


def _lines(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def test_config_event_and_step_records(tmp_path):
    lg = MetricsLogger(str(tmp_path), config={"num_steps": 5, "sigma": 2.0})
    lg.log({"step": 0, "loss": np.float32(1.5), "iteration time": 0.1})
    lg.log({"event": "stage_artifact_reused", "artifact": "embedding"})
    lg.close()
    rows = _lines(tmp_path / "metrics.jsonl")
    assert rows[0]["event"] == "config" and rows[0]["num_steps"] == 5
    # device scalars coerce to plain floats; reference field names survive
    assert rows[1]["loss"] == 1.5 and isinstance(rows[1]["loss"], float)
    assert rows[1]["iteration time"] == 0.1
    assert rows[2]["artifact"] == "embedding"
    assert all("t" in r for r in rows)  # relative timestamp on every record


def test_append_across_logger_instances(tmp_path):
    """--resume reopens the same file: records must append, not truncate."""
    MetricsLogger(str(tmp_path)).log({"step": 1})
    lg = MetricsLogger(str(tmp_path))
    lg.log({"step": 2})
    lg.close()
    steps = [r.get("step") for r in _lines(tmp_path / "metrics.jsonl")]
    assert steps == [1, 2]


def test_wandb_unavailable_falls_back(tmp_path, monkeypatch):
    """use_wandb=True without the package must not break logging."""
    import builtins

    real_import = builtins.__import__

    def fake(name, *a, **k):
        if name == "wandb":
            raise ImportError("no wandb")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", fake)
    lg = MetricsLogger(str(tmp_path), use_wandb=True)
    lg.log({"loss": 0.5})
    lg.close()
    assert _lines(tmp_path / "metrics.jsonl")[-1]["loss"] == 0.5

"""Checkpoint/resume: a run killed mid-level resumes from the last complete
superstep and converges to identical labels and Q (north_star)."""

from __future__ import annotations

import numpy as np
import pytest

from vite_spark import fixtures as fx
from vite_spark.algos.louvain import louvain, louvain_phase, resume_phase
from vite_spark.config import EngineConfig
from vite_spark.runtime import checkpoint as ckpt


def _labels(df, nv):
    out = np.arange(nv, dtype=np.int64)
    for r in df.collect():
        out[r["id"]] = r[df.columns[1]]
    return out


def test_phase_resume_equals_uninterrupted(spark, tmp_path):
    s, d, w, nv, _ = fx.planted_partition()
    edges = fx.to_spark_edges(spark, (s, d, w, nv))

    # uninterrupted reference run
    ref = louvain_phase(spark, edges, threshold=1e-6)

    # interrupted run: kill after 3 supersteps (max_total_iterations acts
    # as the kill switch; checkpoints written every superstep)
    ck = str(tmp_path / "ck1")
    cfg_kill = EngineConfig(checkpoint_dir=ck, max_total_iterations=3)
    louvain_phase(spark, edges, threshold=1e-6, cfg=cfg_kill)
    latest = ckpt.latest_complete(ck)
    assert latest is not None and latest[1] == 3

    # resume and converge
    cfg_resume = EngineConfig(checkpoint_dir=ck)
    res = resume_phase(spark, edges, threshold=1e-6, cfg=cfg_resume)

    assert res.iters == ref.iters
    assert res.q == pytest.approx(ref.q, abs=1e-12)
    assert np.array_equal(_labels(res.assignment, nv), _labels(ref.assignment, nv))


class _Killed(RuntimeError):
    pass


class _KillAfter:
    """MetricsCollector stand-in that dies mid-flight after N supersteps —
    an honest simulated crash inside level 1."""

    def __init__(self, n):
        from vite_spark.runtime.metrics import MetricsCollector

        self._mc = MetricsCollector()
        self.n = n
        self.count = 0

    def record(self, **kw):
        out = self._mc.record(**kw)
        if kw.get("kind") == "superstep":
            self.count += 1
            if self.count >= self.n:
                raise _Killed(f"simulated crash at superstep {self.count}")
        return out

    def totals(self):
        return self._mc.totals()


def test_full_resume_across_levels(spark, tmp_path):
    s, d, w, nv, _ = fx.planted_partition()
    edges = fx.to_spark_edges(spark, (s, d, w, nv))

    ref = louvain(spark, edges)
    assert len(ref.iters_per_phase) >= 2

    # genuine mid-level-1 crash: kill 2 supersteps into phase 1
    ck = str(tmp_path / "ck2")
    cfg_kill = EngineConfig(checkpoint_dir=ck)
    with pytest.raises(_Killed):
        louvain(spark, edges, cfg_kill,
                metrics=_KillAfter(ref.iters_per_phase[0] + 2))
    latest = ckpt.latest_complete(ck)
    assert latest is not None and latest[0] == 1  # died inside level 1

    cfg_resume = EngineConfig(checkpoint_dir=ck)
    res = louvain(spark, edges, cfg_resume, resume=True)

    assert res.iters_per_phase == ref.iters_per_phase
    assert res.q_per_phase == pytest.approx(ref.q_per_phase, abs=1e-12)
    assert np.array_equal(_labels(res.labels, nv), _labels(ref.labels, nv))


@pytest.mark.parametrize("et", [1, 2])
def test_phase_resume_with_early_term(spark, tmp_path, et):
    """ET runs resume from checkpoint and converge IDENTICALLY to the
    uninterrupted trajectory: the activity state (active, frozen_cw, p) is
    persisted next to curr/past (r2 VERDICT next#7)."""
    s, d, w, nv, _ = fx.planted_partition()
    edges = fx.to_spark_edges(spark, (s, d, w, nv))

    ref = louvain_phase(spark, edges, threshold=1e-6,
                        cfg=EngineConfig(early_term=et))

    ck = str(tmp_path / f"ck_et{et}")
    cfg_kill = EngineConfig(checkpoint_dir=ck, max_total_iterations=3,
                            early_term=et)
    louvain_phase(spark, edges, threshold=1e-6, cfg=cfg_kill)
    assert ckpt.latest_complete(ck)[1] == 3

    res = resume_phase(spark, edges, threshold=1e-6,
                       cfg=EngineConfig(checkpoint_dir=ck, early_term=et))
    assert res.iters == ref.iters
    assert res.q == pytest.approx(ref.q, abs=1e-12)
    assert np.array_equal(_labels(res.assignment, nv),
                          _labels(ref.assignment, nv))


def test_resume_rejects_et_config_mismatch(spark, tmp_path):
    """A checkpoint written under one early_term mode refuses to resume
    under another (the freeze trajectory is config-dependent)."""
    s, d, w, nv, _ = fx.planted_partition()
    edges = fx.to_spark_edges(spark, (s, d, w, nv))
    ck = str(tmp_path / "ck_mismatch")
    louvain_phase(spark, edges, threshold=1e-6,
                  cfg=EngineConfig(checkpoint_dir=ck, max_total_iterations=2))
    with pytest.raises(ValueError, match="early_term"):
        resume_phase(spark, edges, threshold=1e-6,
                     cfg=EngineConfig(checkpoint_dir=ck, early_term=1))

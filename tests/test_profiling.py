import pytest
"""Tests for the tracing/profiling utilities."""

import jax.numpy as jnp

from deephisto_tpu.profiling import StageTimer, annotate, trace


@pytest.mark.smoke
def test_stage_timer_accumulates_and_reports():
    t = StageTimer()
    for _ in range(3):
        with t.stage("work", items=10):
            sum(range(1000))
    with t.stage("other"):
        pass
    rep = t.report()
    assert "work" in rep and "items/s" in rep and "3 calls" in rep
    assert t.items["work"] == 30


def test_trace_writes_logs(tmp_path):
    with trace(str(tmp_path)):
        with annotate("region"):
            x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
            x.block_until_ready()
    # a plugins/profile dir with at least one capture should exist
    captures = list(tmp_path.rglob("*.xplane.pb"))
    assert captures, list(tmp_path.rglob("*"))

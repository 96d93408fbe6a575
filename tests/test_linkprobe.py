"""Transport auto-tuning (host/linkprobe.py): env forcing and the auto
decision on a fast (in-process CPU) link."""

import numpy as np

from fqtool_tpu.host import linkprobe


def test_env_forces(monkeypatch):
    monkeypatch.setenv("FQTOOL_TPU_PACKED", "1")
    assert linkprobe.use_packed() is True
    monkeypatch.setenv("FQTOOL_TPU_PACKED", "0")
    assert linkprobe.use_packed() is False


def test_auto_fast_link_disables(monkeypatch):
    monkeypatch.delenv("FQTOOL_TPU_PACKED", raising=False)
    monkeypatch.setattr(linkprobe, "_cached", None)
    # in-process CPU "transfers" run at memcpy speed, far above the threshold
    assert linkprobe.use_packed() is False
    assert linkprobe._cached is False


def test_auto_slow_link_enables(monkeypatch):
    monkeypatch.delenv("FQTOOL_TPU_PACKED", raising=False)
    monkeypatch.setattr(linkprobe, "_cached", None)
    monkeypatch.setattr(linkprobe, "_probe_mbps", lambda: 50.0)
    assert linkprobe.use_packed() is True


def test_probe_measures_something():
    assert linkprobe._probe_mbps() > 0.0

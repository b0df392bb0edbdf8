"""Link-aware auto backend policy (utils/device.py round 5).

The decision logic is pure and testable without hardware: a degraded
accelerator link (tunneled TPU: tens-of-ms RTT / tens-of-MB/s) routes the
pipeline to host XLA; an attached-silicon link keeps the device path.
"""

from svim_tpu.utils.device import link_prefers_host


def test_probe_failure_prefers_host():
    # unreachable / stalling accelerator is the worst possible link
    assert link_prefers_host(None)


def test_cpu_platform_never_flips():
    assert not link_prefers_host({"platform": "cpu"})


def test_attached_silicon_keeps_device():
    metrics = {"platform": "tpu", "rtt_ms": 0.4,
               "up_mbps": 8000.0, "down_mbps": 6000.0}
    assert not link_prefers_host(metrics)


def test_tunneled_rtt_prefers_host():
    # the measured 2026-08-20 tunnel: 17.6 ms RTT, 85/18 MB/s
    metrics = {"platform": "tpu", "rtt_ms": 17.6,
               "up_mbps": 85.0, "down_mbps": 18.0}
    assert link_prefers_host(metrics)


def test_low_bandwidth_alone_prefers_host():
    metrics = {"platform": "tpu", "rtt_ms": 1.0,
               "up_mbps": 2000.0, "down_mbps": 40.0}
    assert link_prefers_host(metrics)

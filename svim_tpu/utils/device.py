"""Device/backend selection helpers.

The array path runs on whatever jax.devices() provides (TPU in production,
CPU in tests).  A persistent compilation cache keeps TPU compile times to the
first run only.
"""

from __future__ import annotations

import logging
import os

_CACHE_INITIALIZED = False


def setup_jax_cache(cache_dir: str = None):
    """Enable the persistent XLA compilation cache (idempotent)."""
    global _CACHE_INITIALIZED
    if _CACHE_INITIALIZED:
        return
    import jax
    cache_dir = cache_dir or os.path.join(os.path.expanduser("~"), ".svim_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _CACHE_INITIALIZED = True
    except Exception as error:  # older jax without the knobs
        logging.debug("could not enable jax compilation cache: %s", error)


# Host/device crossover policy for "auto": an ATTACHED accelerator talks
# over PCIe/ICI (sub-ms round trips, GB/s); a TUNNELED one (this repo's dev
# environment reaches its TPU over an RPC tunnel) can degrade to tens-of-ms
# round trips and tens-of-MB/s, where shipping COLLECT batches to the device
# costs more than the whole host-XLA pass (measured 2026-08-20: 17.6 ms RTT,
# ~85 MB/s up, ~18 MB/s down -> device collect 0.43-0.54 s vs host 0.14-0.17 s
# at 8192 reads; same decision class as the round-4 resident-INS revert).
_LINK_MAX_RTT_MS = 5.0
_LINK_MIN_MBPS = 150.0
_LINK_PROBE_CODE = """
import json, time
import numpy as np
import jax
devices = jax.devices()
if devices[0].platform == "cpu":
    print(json.dumps({"platform": "cpu"}))
    raise SystemExit
device = devices[0]
small = np.zeros(8, np.uint8)
jax.device_get(jax.device_put(small, device))  # attach + warm the path
t0 = time.perf_counter()
for _ in range(5):
    jax.device_get(jax.device_put(small, device))
rtt = (time.perf_counter() - t0) / 5
buffer = np.zeros(1 << 21, np.uint8)  # 2 MiB each way
jax.device_put(buffer, device).block_until_ready()
t0 = time.perf_counter()
staged = jax.device_put(buffer, device)
staged.block_until_ready()
up = time.perf_counter() - t0
t0 = time.perf_counter()
jax.device_get(staged)
down = time.perf_counter() - t0
print(json.dumps({
    "platform": device.platform, "rtt_ms": rtt * 1000,
    "up_mbps": 2.0 / max(up - rtt, 1e-9),
    "down_mbps": 2.0 / max(down - rtt, 1e-9)}))
"""


def probe_device_link(timeout_s: int = 240):
    """Measure the accelerator link from a SUBPROCESS (the platform must be
    pinned before this process's first jax computation, so the probe cannot
    run in-process).  Returns the metrics dict, or None when the probe
    failed/timed out (callers treat that as a degraded link)."""
    import json
    import subprocess
    import sys
    try:
        proc = subprocess.run([sys.executable, "-c", _LINK_PROBE_CODE],
                              capture_output=True, timeout=timeout_s,
                              text=True)
    except subprocess.TimeoutExpired:
        return None
    if proc.returncode != 0:
        return None
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return None


def link_prefers_host(metrics) -> bool:
    """True when the measured link is too slow for device batch shipping."""
    if metrics is None:
        return True   # unreachable / stalling accelerator is the worst link
    if metrics.get("platform") == "cpu":
        return False  # already on host
    return (metrics.get("rtt_ms", 0.0) > _LINK_MAX_RTT_MS
            or min(metrics.get("up_mbps", 0.0),
                   metrics.get("down_mbps", 0.0)) < _LINK_MIN_MBPS)


def select_backend(device_backend: str = "auto"):
    """Honor --device_backend before jax runs its first computation.

    "auto" measures the accelerator link first (subprocess probe) and runs
    the WHOLE pipeline on host XLA when the link is degraded — on a tunneled
    TPU every kernel family was measured faster on host (BENCH_NOTES.md
    rounds 4-5), while attached silicon keeps the device path.  Set
    SVIM_LINK_AUTO=0 to skip the probe and always take the device.

    Note: the axon TPU plugin ignores the JAX_PLATFORMS env var, so the
    platform is pinned through the config API.

    Returns the decision: "cpu" (pinned by flag), "host-auto" (degraded
    link measured, host XLA chosen), "device" (device path kept), or None
    (no choice was needed)."""
    import jax
    decision = None
    if device_backend == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        decision = "cpu"
    elif (device_backend == "auto"
          and os.environ.get("SVIM_LINK_AUTO") != "0"
          and os.environ.get("JAX_PLATFORMS", "") not in ("cpu",)):
        metrics = probe_device_link()
        if metrics is not None and metrics.get("platform") == "cpu":
            pass  # no accelerator present; nothing to choose
        elif link_prefers_host(metrics):
            logging.info(
                "Device link probe: %s -> running on host XLA "
                "(crossover: rtt > %.0f ms or bandwidth < %.0f MB/s)",
                metrics or "probe failed", _LINK_MAX_RTT_MS, _LINK_MIN_MBPS)
            os.environ["JAX_PLATFORMS"] = "cpu"
            jax.config.update("jax_platforms", "cpu")
            decision = "host-auto"
        else:
            logging.info("Device link probe: %s -> keeping the device path",
                         metrics)
            decision = "device"
    setup_jax_cache()
    return decision


def describe_devices() -> str:
    import jax
    return ", ".join(str(device) for device in jax.devices())

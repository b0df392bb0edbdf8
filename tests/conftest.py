"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding paths
compile and execute without TPU hardware (the environment variables must be
set before jax initializes).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var, so the
# platform must also be pinned through the config API before any computation.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

from svim_tpu.config import parse_arguments  # noqa: E402


@pytest.fixture
def default_options(tmp_path):
    """Options produced by the real argument parser, so defaults are covered
    (mirrors the reference test pattern, tests/test_clustering.py:34)."""
    genome = tmp_path / "genome.fa"
    genome.write_text(">chr1\n" + "A" * 100 + "C" * 100 + "\n")
    return parse_arguments(arguments=[
        "alignment", str(tmp_path), str(tmp_path / "reads.bam"), str(genome)])

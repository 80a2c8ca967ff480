"""Test configuration: CPU backend with 8 virtual devices + float64.

Sharding is tested without TPU hardware via XLA's host-platform device
splitting; float64 enables the strict parity mode against the reference's
golden values.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon environment pins jax_platforms to "axon,cpu" regardless of the
# JAX_PLATFORMS env var; override it after import so tests run on the
# 8-virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

FIXTURES = "/root/reference/audio"


def _require_fixtures():
    if not os.path.isdir(FIXTURES):
        pytest.skip("reference audio fixtures not available")
    return FIXTURES


@pytest.fixture(scope="session")
def fixture_dir():
    return _require_fixtures()


@pytest.fixture(scope="session")
def decoded_song():
    from bliss_tpu.io import decode

    return decode(os.path.join(_require_fixtures(), "song.flac"))


@pytest.fixture(scope="session")
def decoded_s32():
    from bliss_tpu.io import decode

    return decode(os.path.join(_require_fixtures(), "song_s32.flac"))


def synth_pcm(rng: np.random.RandomState, n: int, amp: int = 12000) -> np.ndarray:
    """Synthetic stereo-interleaved PCM with tonal + noise content and
    silent lead-in/out (to exercise the zero-trim)."""
    t = np.arange(n)
    sig = (
        amp * np.sin(2 * np.pi * t / 50.0)
        + 0.3 * amp * np.sin(2 * np.pi * t / 7.0)
        + rng.randn(n) * amp * 0.05
    )
    env = np.ones(n)
    lead = n // 50
    env[:lead] = 0.0
    env[-lead:] = 0.0
    out = np.clip(sig * env, -32768, 32767).astype(np.int16)
    return out

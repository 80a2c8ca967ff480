"""Multi-device sharding tests on the 8-way virtual CPU mesh.

Asserts the SPMD analysis (data x sequence sharding with psum / pmin/pmax /
ppermute halo / all_gather) equals the single-device result exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import synth_pcm
from bliss_tpu.config import AnalysisConfig
from bliss_tpu.features import PCMBatch, analyze_batch_jit
from bliss_tpu.parallel import (
    analysis_mesh,
    analyze_sharded,
    shard_batch,
    sharded_distance_topk,
)

# float64 with table-mode amplitude: the sharded path implements the table
# formulation (the iterative histogram replay is a parity-test-only mode).
CFG = AnalysisConfig(dtype="float64")


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(7)
    arrays = [synth_pcm(rng, 50_000 + 9_000 * i) for i in range(4)]
    return PCMBatch.from_arrays(
        [np.asarray(a) for a in arrays], [3, 4, 4, 5], pad_multiple=8 * 1024
    )


def test_device_count():
    assert jax.device_count() >= 8


@pytest.mark.parametrize("shape", [(8, 1), (1, 8), (4, 2), (2, 4)])
def test_sharded_analysis_matches_single_device(batch, shape):
    n_data, n_seq = shape
    mesh = analysis_mesh(n_data, n_seq)
    # analyze_sharded pads songs/PCM internally to divide the mesh axes.
    sharded = np.asarray(analyze_sharded(batch, mesh, CFG))
    single = np.asarray(analyze_batch_jit(batch, CFG))
    np.testing.assert_allclose(sharded, single, atol=2e-6)


def test_shard_batch_placement(batch):
    mesh = analysis_mesh(4, 2)
    placed = shard_batch(batch, mesh)  # B=4 divides 4; L divides 2
    sharded = np.asarray(analyze_sharded(placed, mesh, CFG))
    single = np.asarray(analyze_batch_jit(batch, CFG))
    np.testing.assert_allclose(sharded, single, atol=2e-6)


def test_sharded_distance_topk_matches_dense():
    rng = np.random.RandomState(9)
    f = jnp.asarray(rng.randn(37, 4) * 3)
    mesh = analysis_mesh(8, 1)
    d, idx = sharded_distance_topk(f, mesh, k=4)
    d, idx = np.asarray(d), np.asarray(idx)
    fnp = np.asarray(f)
    for i in range(37):
        brute = np.sqrt(((fnp - fnp[i]) ** 2).sum(1))
        brute[i] = np.inf
        order = np.argsort(brute)[:4]
        np.testing.assert_allclose(d[i], brute[order], rtol=1e-6)

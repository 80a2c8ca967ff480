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


def test_sharded_hybrid_matches_single_device_hybrid(batch):
    """tempo_finish='host' on the mesh: the all-gathered energies finish on
    the host in float64, so beat counts match the single-device hybrid path
    exactly (the guarantee a real float32 mesh needs)."""
    from bliss_tpu.features.analyze import analyze_batch_hybrid

    cfg = AnalysisConfig(
        dtype="float32", amplitude_mode="poly", tempo_finish="host"
    )
    mesh = analysis_mesh(2, 2, devices=jax.devices()[:4])
    sharded = np.asarray(analyze_sharded(batch, mesh, cfg))
    single = np.asarray(analyze_batch_hybrid(batch, cfg))
    np.testing.assert_array_equal(sharded[:, 0], single[:, 0])  # exact beats
    np.testing.assert_allclose(sharded, single, atol=1e-4)


def test_sharded_device_exact_matches_single_device(batch):
    """tempo_finish='device_exact' on the mesh: the double-single finish
    runs per-shard on the all-gathered energies; beats must equal the
    single-device device_exact path exactly (which itself equals the host
    float64 finish, tests/test_tempo_exact.py)."""
    cfg = AnalysisConfig(
        dtype="float32", amplitude_mode="poly", tempo_finish="device_exact"
    )
    mesh = analysis_mesh(2, 2, devices=jax.devices()[:4])
    sharded = np.asarray(analyze_sharded(batch, mesh, cfg))
    single = np.asarray(analyze_batch_jit(batch, cfg))
    np.testing.assert_array_equal(sharded[:, 0], single[:, 0])  # exact beats
    np.testing.assert_allclose(sharded, single, atol=1e-4)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_sharded_multiband_matches_single_device(batch, shape):
    """nb_bands=5 (the extended Klapuri front-end) under sequence sharding:
    per-band halo exchanges + gathered [B, NB, NBF] energies."""
    cfg = AnalysisConfig(dtype="float64", nb_bands=5)
    mesh = analysis_mesh(*shape)
    sharded = np.asarray(analyze_sharded(batch, mesh, cfg))
    single = np.asarray(analyze_batch_jit(batch, cfg))
    np.testing.assert_allclose(sharded, single, atol=2e-6)


def test_sharded_multiband_hybrid(batch):
    """Multi-band + host finish together on the mesh."""
    from bliss_tpu.features.analyze import analyze_batch_hybrid

    cfg = AnalysisConfig(dtype="float32", nb_bands=5, tempo_finish="host")
    mesh = analysis_mesh(2, 2, devices=jax.devices()[:4])
    sharded = np.asarray(analyze_sharded(batch, mesh, cfg))
    single = np.asarray(analyze_batch_hybrid(batch, cfg))
    np.testing.assert_array_equal(sharded[:, 0], single[:, 0])
    np.testing.assert_allclose(sharded, single, atol=1e-4)


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


def test_sharded_fused_matches_single_device():
    """Sequence-sharded fused Pallas path (interpret on CPU) == single-device
    fused path, including the cross-shard conv history and boundary window."""
    rng = np.random.RandomState(21)
    arrays = [synth_pcm(rng, 150_000), synth_pcm(rng, 140_000, amp=20000)]
    batch = PCMBatch.from_arrays(
        [np.asarray(a) for a in arrays], [7, 6], pad_multiple=1024 * 160
    )
    assert batch.samples.shape[1] >= 2 * 65536  # shards stay kernel-eligible
    cfg = AnalysisConfig(
        dtype="float32", amplitude_mode="poly", fused_kernel=True
    )
    mesh = analysis_mesh(2, 2, devices=jax.devices()[:4])
    sharded = np.asarray(analyze_sharded(batch, mesh, cfg))
    single = np.asarray(analyze_batch_jit(batch, cfg))
    # amplitude & frequency: identical reductions (f32 reorder noise only)
    np.testing.assert_allclose(sharded[:, 1:3], single[:, 1:3], atol=1e-4)
    # attack: float32 on-device envelope, small reorder sensitivity
    np.testing.assert_allclose(sharded[:, 3], single[:, 3], atol=5e-3)
    # tempo: the float32 device finish may flip epsilon-marginal peaks
    # (documented); allow a couple of beat quanta
    dur = np.array([7.0, 6.0])
    assert (np.abs(sharded[:, 0] - single[:, 0]) <= 2.5 * 4.0 / dur).all()


def test_sharded_fused_multiband(batch):
    """Sequence-sharded fused Pallas path with the reference 5-band
    filterbank (band grid dim + ring halos together)."""
    rng = np.random.RandomState(22)
    from conftest import synth_pcm as _sp

    arrays = [_sp(rng, 150_000), _sp(rng, 140_000, amp=20000)]
    b = PCMBatch.from_arrays(
        [np.asarray(a) for a in arrays], [7, 6], pad_multiple=1024 * 160
    )
    cfg_f = AnalysisConfig(
        dtype="float32", amplitude_mode="poly", fused_kernel=True,
        filterbank="reference5", tempo_finish="host",
    )
    cfg_x = AnalysisConfig(
        dtype="float32", amplitude_mode="poly",
        filterbank="reference5", tempo_finish="host",
    )
    from bliss_tpu.features.analyze import analyze_batch_hybrid

    mesh = analysis_mesh(2, 2, devices=jax.devices()[:4])
    sharded = np.asarray(analyze_sharded(b, mesh, cfg_f))
    single = np.asarray(analyze_batch_hybrid(b, cfg_x))
    np.testing.assert_allclose(sharded[:, 1:3], single[:, 1:3], atol=1e-4)
    # attack/tempo: f32 energy noise on attenuated bands; host finish keeps
    # beats within a quantum here
    np.testing.assert_allclose(sharded[:, 3], single[:, 3], rtol=2e-3)
    dur = np.array([7.0, 6.0])
    assert (np.abs(sharded[:, 0] - single[:, 0]) <= 1.5 * 4.0 / dur).all()


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_sharded_extended_matches_single_device(batch, shape):
    """Extended features computed SPMD (psum'd frame stats, ring-halo'd
    zero crossings, beat metrics from gathered energies) == single-device."""
    from bliss_tpu.features import extended_features_jit
    from bliss_tpu.parallel import analyze_sharded_async

    cfg = AnalysisConfig(dtype="float64")
    mesh = analysis_mesh(*shape)
    out = analyze_sharded_async(batch, mesh, cfg, extended=True)()
    single_core = np.asarray(analyze_batch_jit(batch, cfg))
    single_ext = np.asarray(extended_features_jit(batch, cfg))
    np.testing.assert_allclose(out[:, :4], single_core, atol=2e-6)
    np.testing.assert_allclose(out[:, 4:], single_ext, rtol=1e-6, atol=1e-5)


def test_sharded_extended_hybrid_fused(batch):
    """Extended + host finish + fused kernels together on the mesh."""
    from bliss_tpu.features import extended_features_jit
    from bliss_tpu.features.analyze import analyze_batch_hybrid
    from bliss_tpu.parallel import analyze_sharded_async

    cfg = AnalysisConfig(
        dtype="float32", amplitude_mode="poly", fused_kernel=True,
        tempo_finish="host",
    )
    mesh = analysis_mesh(2, 2, devices=jax.devices()[:4])
    out = analyze_sharded_async(batch, mesh, cfg, extended=True)()
    single_core = np.asarray(analyze_batch_hybrid(batch, cfg))
    single_ext = np.asarray(extended_features_jit(batch, cfg))
    np.testing.assert_array_equal(out[:, 0], single_core[:, 0])  # beats
    np.testing.assert_allclose(out[:, :4], single_core, atol=1e-4)
    # bpm counts beats on-device in f32: psum reordering may flip an
    # epsilon-marginal peak (one beat quantum = 60/duration)
    from bliss_tpu.features import EXTENDED_FEATURE_NAMES

    bpm_col = 4 + EXTENDED_FEATURE_NAMES.index("bpm")
    bl_col = 4 + EXTENDED_FEATURE_NAMES.index("beat_loudness")
    dur = np.array([3.0, 4.0, 4.0, 5.0])
    assert (
        np.abs(out[:, bpm_col] - single_ext[:, bpm_col - 4])
        <= 1.5 * 60.0 / dur
    ).all()
    # beat_loudness inherits the same marginal-peak flip
    np.testing.assert_allclose(
        out[:, bl_col], single_ext[:, bl_col - 4], rtol=0.1
    )
    keep = [
        i for i in range(out.shape[1] - 4)
        if i not in (bpm_col - 4, bl_col - 4)
    ]
    # f32 psum reorder noise on the frame statistics
    np.testing.assert_allclose(
        out[:, 4:][:, keep], single_ext[:, keep], rtol=2e-3, atol=1e-3
    )


def test_meshed_no_low_precision_f32_contractions():
    """The meshed shard_map program's FIR warm-up delta einsum (a separate
    code path from the batch/kernel ones) must run at Precision.HIGHEST:
    the TPU default truncates f32 dots to bf16 passes, breaking the
    history-tail cancellation at loud->silence window boundaries (see
    kernels/fused_all.py)."""
    from test_kernels import _collect_dot_generals
    from bliss_tpu.parallel.mesh import _build_sharded_fn

    mesh = analysis_mesh(2, 2, devices=jax.devices()[:4])
    cfg = AnalysisConfig.for_tpu()
    fn = _build_sharded_fn(mesh, cfg)
    # Ls = 16384/2 = 8192 < 65536 keeps the non-fused (einsum) branch
    s = jnp.zeros((2, 16384), jnp.int16)
    n = jnp.full((2,), 16384, jnp.int32)
    dur = jnp.ones((2,), jnp.int32)
    jaxpr = jax.make_jaxpr(fn)(s, n, dur)
    eqs = []
    _collect_dot_generals(jaxpr.jaxpr, eqs)
    assert eqs, "expected the warm-up delta contraction in the program"
    import numpy as _np
    for eq in eqs:
        dts = {x.aval.dtype for x in eq.invars}
        if dts == {_np.dtype("float32")}:
            assert eq.params.get("precision") == (
                jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST
            ), eq

"""Fused batched analysis: PCM batch -> [B, 4] force vectors.

The reference runs its three analyzers in pthreads per song
(reference: src/analyze.c:33-80); here they are branches of one jitted
program over the whole batch — XLA schedules them together and data
parallelism comes from the batch (and the device mesh, see parallel/).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bliss_tpu import constants as C
from bliss_tpu.config import AnalysisConfig, DEFAULT
from bliss_tpu.features.amplitude import amplitude_scores
from bliss_tpu.features.frequency import frequency_scores
from bliss_tpu.features.tempo import envelope_scores
from bliss_tpu.features.types import PCMBatch


def analyze_batch(batch: PCMBatch, cfg: AnalysisConfig = DEFAULT) -> jnp.ndarray:
    """[B, 4] float32 force vectors, ordered (tempo, amplitude, frequency,
    attack) like the reference force_vector_s (include/bliss.h:26-31)."""
    if _use_fused(batch, cfg):
        from bliss_tpu.features.tempo import envelope_scores_from_energies

        if cfg.single_pass:
            amplitude, frequency, fa = _single_pass_stage(batch, cfg)
        else:
            from bliss_tpu.kernels.pallas_stft import frequency_scores_fused

            amplitude, fa = _fused_amp_and_energies(batch, cfg)
            frequency = frequency_scores_fused(batch, cfg)
        tempo, attack = envelope_scores_from_energies(batch, fa, cfg)
        return jnp.stack([tempo, amplitude, frequency, attack], axis=1)
    amplitude = amplitude_scores(batch, cfg)
    frequency = frequency_scores(batch, cfg)
    tempo, attack = envelope_scores(batch, cfg)
    return jnp.stack([tempo, amplitude, frequency, attack], axis=1)


def _single_pass_stage(batch: PCMBatch, cfg: AnalysisConfig):
    """One-HBM-pass path: (amplitude, frequency, fa [B, NB, NBF])."""
    import jax as _jax

    from bliss_tpu import constants as Cn
    from bliss_tpu.kernels.fused_all import fused_all_stats
    from bliss_tpu.kernels.pallas_stft import frequency_scores_from_power

    amp_integral, energies, power = fused_all_stats(
        batch.samples,
        batch.n_samples,
        interpret=_jax.default_backend() == "cpu",
        nb_bands=cfg.nb_bands,
        band_taps=cfg.band_taps,
        filterbank=cfg.filterbank,
        stft_precise=cfg.stft_conv == "precise",
    )
    amplitude = (
        jnp.float32(Cn.AMPLITUDE_SCALE) * amp_integral.astype(jnp.float32)
        + jnp.float32(Cn.AMPLITUDE_BIAS)
    )
    frequency = frequency_scores_from_power(power, cfg)
    fa = _mask_energies(batch, energies, cfg)
    return amplitude, frequency, fa


def _mask_energies(batch: PCMBatch, energies, cfg: AnalysisConfig):
    """Zero window slots past each song's count; pad/trim to NBF."""
    from bliss_tpu import constants as Cn

    W, hop = Cn.WINDOW_SIZE, Cn.TEMPO_HOP
    n = batch.n_samples
    NBF = batch.samples.shape[1] // hop
    NW = energies.shape[-1]
    trunc_n = n - n % W
    n_windows = -((-(trunc_n - W)) // hop)
    wmask = (
        jnp.arange(NW, dtype=jnp.int32)[None, None, :]
        < n_windows[:, None, None]
    )
    fa = energies * wmask.astype(energies.dtype)
    if NW < NBF:
        fa = jnp.pad(fa, ((0, 0), (0, 0), (0, NBF - NW)))
    else:
        fa = fa[:, :, :NBF]
    return fa


def _use_fused(batch: PCMBatch, cfg: AnalysisConfig) -> bool:
    """The fused Pallas kernels cover the float32 configuration (any band
    count — the band runs as an inner grid dimension) on inputs long enough
    for their tile shapes (clips shorter than ~1.5 s fall back to the XLA
    path)."""
    return (
        cfg.fused_kernel
        and cfg.dtype == "float32"
        and cfg.band_taps <= 129
        and batch.samples.shape[1] >= 65536
    )


def _fused_amp_and_energies(batch: PCMBatch, cfg: AnalysisConfig):
    """Pallas fused path: amplitude score + masked window energies."""
    from bliss_tpu import constants as Cn
    from bliss_tpu.kernels import fused_sample_stats

    import jax as _jax

    amp_integral, energies = fused_sample_stats(
        batch.samples,
        batch.n_samples,
        interpret=_jax.default_backend() == "cpu",
        nb_bands=cfg.nb_bands,
        band_taps=cfg.band_taps,
        filterbank=cfg.filterbank,
        conv_mode=cfg.fused_conv,
    )
    amplitude = (
        jnp.float32(Cn.AMPLITUDE_SCALE) * amp_integral.astype(jnp.float32)
        + jnp.float32(Cn.AMPLITUDE_BIAS)
    )
    return amplitude, _mask_energies(batch, energies, cfg)  # [B, NB, NBF]


@functools.partial(jax.jit, static_argnames=("cfg",))
def analyze_batch_jit(batch: PCMBatch, cfg: AnalysisConfig = DEFAULT):
    return analyze_batch(batch, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _device_stage(batch: PCMBatch, cfg: AnalysisConfig):
    """Jitted heavy stage for the hybrid path: amplitude + frequency scores
    plus the tempo window energies."""
    if _use_fused(batch, cfg):
        if cfg.single_pass:
            return _single_pass_stage(batch, cfg)
        from bliss_tpu.kernels.pallas_stft import frequency_scores_fused

        amplitude, fa = _fused_amp_and_energies(batch, cfg)
        return amplitude, frequency_scores_fused(batch, cfg), fa

    from bliss_tpu.features.tempo import band_energies

    return (
        amplitude_scores(batch, cfg),
        frequency_scores(batch, cfg),
        band_energies(batch, cfg),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def analyze_batch_ext_jit(batch: PCMBatch, cfg: AnalysisConfig):
    """Device-finish core + extended ROADMAP features in ONE jitted
    program, sharing a single band-energy pass (the FLOP-heavy stage).
    Returns [B, 4 + n_ext] float32."""
    from bliss_tpu.features.extended import extended_features
    from bliss_tpu.features.tempo import envelope_scores_from_energies

    amplitude, frequency, fa = _device_stage(batch, cfg)
    # One envelope chain: the aux hands the core's beat detection to the
    # extended bpm/beat_loudness columns, so they can never disagree with
    # the tempo score in the same row (and the dd chain isn't run twice).
    tempo, attack, aux = envelope_scores_from_energies(
        batch, fa, cfg, return_aux=True
    )
    core = jnp.stack([tempo, amplitude, frequency, attack], axis=1)
    ext = extended_features(batch, cfg, fa=fa, beat_aux=aux)
    return jnp.concatenate([core.astype(jnp.float32), ext], axis=1)


@functools.partial(jax.jit, static_argnames=("cfg", "extended"))
def _device_stage_packed(
    batch: PCMBatch, cfg: AnalysisConfig, extended: bool = False
):
    """Hybrid device stage with every output packed into ONE array
    [B, 2 + NB*NBF (+ n_ext)] = (amplitude, frequency, flattened band
    energies, extended features) so a remote host pays a single fetch —
    this sandbox's TPU tunnel costs ~28 ms per round trip, and the
    unpacked variant paid it 3-4 times per batch."""
    amplitude, frequency, fa = _device_stage(batch, cfg)
    B, NB, NBF = fa.shape
    cols = [amplitude[:, None], frequency[:, None], fa.reshape(B, NB * NBF)]
    if extended:
        from bliss_tpu.features.extended import extended_features

        # host-finish callers (pipeline.py) overwrite bpm/beat_loudness
        # from the float64 host aux, so skip the device beat chain
        skip = "skip" if cfg.tempo_finish == "host" else None
        cols.append(extended_features(batch, cfg, fa=fa, beat_aux=skip))
    dt = fa.dtype
    return jnp.concatenate([c.astype(dt) for c in cols], axis=1)


def _unpack_stage(packed, cfg, L: int, extended: bool = False):
    """Split a fetched _device_stage_packed array back into
    (amplitude, frequency, fa [B, NB, NBF], extended | None)."""
    import numpy as np

    B = packed.shape[0]
    NB = cfg.nb_bands
    NBF = L // C.TEMPO_HOP
    amp = np.asarray(packed[:, 0], np.float32)
    freq = np.asarray(packed[:, 1], np.float32)
    fa = packed[:, 2 : 2 + NB * NBF].reshape(B, NB, NBF)
    ext = (
        np.asarray(packed[:, 2 + NB * NBF :], np.float32) if extended else None
    )
    return amp, freq, fa, ext


def analyze_batch_hybrid(batch: PCMBatch, cfg: AnalysisConfig = DEFAULT):
    """[B, 4] float32 force vectors with the tempo envelope finished on the
    host in float64 (exact beat-count parity on float32-only backends)."""
    import numpy as np

    from bliss_tpu.features.tempo import envelope_finish_host

    packed = np.asarray(_device_stage_packed(batch, cfg))
    amplitude, frequency, fa, _ = _unpack_stage(
        packed, cfg, batch.samples.shape[1]
    )
    tempo, attack = envelope_finish_host(
        fa, np.asarray(batch.n_samples), np.asarray(batch.durations)
    )
    return jnp.stack(
        [
            jnp.asarray(tempo),
            jnp.asarray(amplitude),
            jnp.asarray(frequency),
            jnp.asarray(attack),
        ],
        axis=1,
    )


def force_and_class(features: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Aggregate rating and LOUD/CALM/UNKNOWN class per song
    (reference: src/analyze.c:67-79)."""
    t, a, f, k = (features[:, i] for i in range(4))
    force = jnp.maximum(t, 0.0) + a + f + jnp.maximum(k, 0.0)
    cls = jnp.where(
        force > 0, C.BL_LOUD, jnp.where(force < 0, C.BL_CALM, C.BL_UNKNOWN)
    )
    return force, cls

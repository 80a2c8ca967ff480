"""Analysis configuration.

The reference has no config system — everything is a compile-time constant
(SURVEY.md §5). Here the full pipeline is parameterized by a frozen,
hashable dataclass usable as a jit static argument. Defaults reproduce the
reference's numerics; ``for_parity()`` selects the strictest mode used by the
golden-value tests, ``for_tpu()`` the fast production mode.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AnalysisConfig:
    # Compute dtype for the DSP pipeline. float64 requires jax_enable_x64
    # (CPU parity tests); float32 is the TPU production dtype.
    dtype: str = "float32"

    # Amplitude: "table" computes the smoothed-histogram integral as one
    # weighted reduction over sample values (exact linear collapse of the
    # 301-pass smoothing, via a gather); "poly" evaluates the same weight
    # with Chebyshev polynomials on the VPU (no gather — the fast TPU path,
    # ~2.5e-7 from the table); "iterative" replays the 301 float32 passes
    # like the reference binary does (bit-closest to the golden values).
    amplitude_mode: str = "table"

    # Frequency spectra: "matmul" uses the dense RDFT-as-matmul (MXU path),
    # "fft" uses jnp.fft.rfft.
    spectrum_mode: str = "matmul"

    # Tempo window energies: "parseval" avoids FFTs entirely (quadratic form
    # in the FIR output) and computes blockwise from the global convolution
    # with 16-tap warm-up corrections (no overlapped-window tensor);
    # "parseval_framed" is the explicit-window variant (cross-check);
    # "fft" computes the literal per-window spectrum sum; "fft_strict"
    # additionally replicates the reference's float32 accumulation order
    # (beat counts then match the reference bit-for-bit even on
    # epsilon-marginal peaks).
    tempo_energy_mode: str = "parseval"

    # Butterworth IIR: "blocked" uses the dense block recurrence (MXU,
    # seq_len/block sequential steps); "scan" is the literal per-sample
    # recurrence via lax.scan.
    iir_mode: str = "blocked"
    iir_block: int = 256

    # Replicate the reference's sequential float32 accumulation order where
    # the golden values can resolve it (amplitude integral). Slow scalar
    # scans — parity testing only.
    strict_accumulation: bool = False

    # Where the tempo envelope finish (log-compress -> Butterworth -> peak
    # count) runs: "device" keeps the whole pipeline in one jitted program
    # in the working dtype (float32 may flip epsilon-marginal beats);
    # "device_exact" also stays on device but runs the finish in
    # double-single arithmetic (features/tempo_exact.py) for float64-grade
    # beat exactness — the production mode; "host" fetches the energies and
    # finishes in float64 NumPy (the pre-round-3 hybrid, kept for
    # cross-validation and hosts where the fetch is free).
    tempo_finish: str = "device"

    # Use the fused Pallas sample-stats kernel (one HBM pass computes the
    # amplitude reduction + tempo convolution partials). float32 only;
    # other configurations fall back to the XLA path.
    fused_kernel: bool = False

    # Fused-kernel FIR matmul mode: "split" runs four single-pass bf16
    # matmuls on an exact integer split of the raw samples (~1e-5 relative,
    # MXU native rate — ~20% faster kernel); "exact" keeps the 6-pass f32
    # matmul (~1e-7, for when every epsilon-marginal beat must match the
    # all-f32 path).
    fused_conv: str = "split"

    # Fused-kernel STFT matrix precision: "precise" runs the 5-matmul
    # bf16-split DFT (~2^-23 absolute — the reference's own float32 FFT
    # noise floor; worst-case frequency-score deviation ~1e-3 on
    # pathological near-silent-band content); "fast" keeps the 3-matmul
    # form (~2^-16 absolute; quiet-bin dB can deviate up to ~0.1 on such
    # content — fine for loud music, measured round-3 fuzz).
    stft_conv: str = "precise"

    # Single-pass mode: ONE Pallas kernel computes amplitude + tempo + STFT
    # power from one HBM read of the PCM (kernels/fused_all.py) instead of
    # two kernels each streaming it. Requires fused_kernel; single-device
    # path only (the mesh keeps the two-kernel form for its halo logic).
    single_pass: bool = False

    # Tempo filterbank: 1 band with the reference's published 17-tap filter
    # is parity mode; nb_bands > 1 enables the extended multi-band Klapuri
    # front-end (tables.bandpass_filterbank) the reference cut for CPU cost.
    # None means "unset": resolved to the filterbank's own shape (or 1/17
    # for firwin) in __post_init__, so an EXPLICIT nb_bands that conflicts
    # with a fixed reference filterbank is detectable and rejected.
    nb_bands: int | None = None
    band_taps: int | None = None

    # Multi-band filterbank design: "firwin" designs a fresh log-spaced
    # scipy filterbank for any nb_bands; "reference5" / "reference36" select
    # the reference author's own commented-out 5x17 full-spectrum / 36x33
    # fine filterbanks (reference: include/bandpass_coeffs.h:9-49, :51-482)
    # — the only external ground truth for multi-band mode. Setting one of
    # them fills nb_bands/band_taps automatically.
    filterbank: str = "firwin"

    def __post_init__(self):
        if self.tempo_finish not in ("device", "device_exact", "host"):
            raise ValueError(
                f"unknown tempo_finish {self.tempo_finish!r}: use 'device', "
                "'device_exact', or 'host'"
            )
        if self.stft_conv not in ("precise", "fast"):
            raise ValueError(
                f"unknown stft_conv {self.stft_conv!r}: use 'precise' or "
                "'fast'"
            )
        if self.single_pass and self.fused_conv != "split":
            raise ValueError(
                "single_pass implements only the bf16-split FIR; use the "
                "two-kernel path (single_pass=False) with fused_conv='exact'"
            )
        shapes = {"reference5": (5, 17), "reference36": (36, 33)}
        if self.filterbank in shapes:
            nb, taps = shapes[self.filterbank]
            if self.nb_bands not in (None, nb) or self.band_taps not in (
                None,
                taps,
            ):
                raise ValueError(
                    f"filterbank={self.filterbank!r} is a fixed "
                    f"{nb}x{taps} design; leave nb_bands/band_taps unset "
                    "(None) or set them to match"
                )
            object.__setattr__(self, "nb_bands", nb)
            object.__setattr__(self, "band_taps", taps)
        elif self.filterbank == "firwin":
            if self.nb_bands is None:
                object.__setattr__(self, "nb_bands", 1)
            if self.band_taps is None:
                object.__setattr__(self, "band_taps", 17)
        else:
            raise ValueError(f"unknown filterbank {self.filterbank!r}")

    # Sequence padding multiple for batched analysis. Must be a multiple of
    # 1024 (stereo frequency frames of 512 per channel).
    pad_multiple: int = 1024

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @staticmethod
    def for_parity() -> "AnalysisConfig":
        """Strict parity vs the reference golden values (CPU, x64)."""
        return AnalysisConfig(
            dtype="float64",
            amplitude_mode="iterative",
            tempo_energy_mode="fft_strict",
            strict_accumulation=True,
        )

    @staticmethod
    def for_tpu() -> "AnalysisConfig":
        """Fast float32 production mode: the single-pass fused Pallas
        kernel (one HBM read computes all three analyzers) + the
        double-single envelope finish, all on device — beat-exact with no
        host float64 stage (validated beat-exact vs the reference binary on
        the differential fuzz, round 3), and the 5-matmul "precise" STFT
        (spectrum at the reference's own f32-FFT noise floor, ~2^-23).
        Measured 6.10 ms / 128-song batch on v5e-1 (~21.0k songs/s) vs
        6.67 ms for the two-kernel form; stft_conv="fast" trades the
        spectrum floor for 5.40 ms (~23.7k songs/s — fine for loud music,
        ~0.1 frequency-score error on near-silent-band content). (The mesh
        path keeps the two-kernel form for its halo logic; analyze_sharded
        ignores single_pass.)"""
        return AnalysisConfig(
            dtype="float32",
            amplitude_mode="poly",
            tempo_finish="device_exact",
            fused_kernel=True,
            single_pass=True,
        )

    @staticmethod
    def for_tpu_hybrid() -> "AnalysisConfig":
        """The pre-round-3 production mode: device heavy stages + host
        float64 envelope finish. Kept for cross-validation and for hosts
        where device dispatch is expensive relative to a fetch."""
        return AnalysisConfig(
            dtype="float32",
            amplitude_mode="poly",
            tempo_finish="host",
            fused_kernel=True,
        )


DEFAULT = AnalysisConfig()

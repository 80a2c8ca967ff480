"""User-facing API: Song objects and pairwise comparisons.

Mirrors the surface of the reference's Python bindings — ``bl_song``'s
dict-style Mapping access, decode/analyze methods and context-manager usage
(reference: python/bliss/bl_song.py), the module-level ``distance`` /
``cosine_similarity`` that accept filenames or loaded songs
(reference: python/bliss/distance.py:5-77), and the C-level entry points
``bl_analyze`` / ``bl_distance_file`` / ``bl_cosine_similarity_file``
(reference: src/analyze.c). Error signaling uses exceptions instead of the
reference's in-band BL_UNEXPECTED floats; thin ``*_file`` wrappers keep the
legacy status-code behavior for drop-in use.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Mapping
from typing import Any, Iterator

import numpy as np

import jax

from bliss_tpu import constants as C
from bliss_tpu.config import AnalysisConfig
from bliss_tpu.features import (
    PCMBatch,
    analyze_batch_hybrid,
    analyze_batch_jit,
    force_and_class,
)
from bliss_tpu.io import DecodedAudio, DecodeError, decode as _decode
from bliss_tpu.sim import distance as _distance_fn
from bliss_tpu.sim import cosine_similarity as _cosine_fn


# Songs longer than this (interleaved samples, ~3 min) analyze via the
# chunked streaming path — re-exported from the pipeline (the single
# definition) so Song.analyze and analyze_library can never disagree.
from bliss_tpu.pipeline import LONG_SONG_SAMPLES  # noqa: E402


def default_config() -> AnalysisConfig:
    """Best available accuracy on the current backend: float64 parity mode
    when x64 is enabled (CPU), float32 with the beat-exact double-single
    device finish otherwise (with the fused Pallas kernels on accelerator
    backends)."""
    if jax.config.read("jax_enable_x64"):
        return AnalysisConfig.for_parity()
    if jax.default_backend() == "cpu":
        # pallas only runs interpreted on CPU — far too slow for real use
        return AnalysisConfig(
            dtype="float32", amplitude_mode="poly", tempo_finish="device_exact"
        )
    return AnalysisConfig.for_tpu()


@dataclasses.dataclass
class ForceVector:
    """4-D perceptual feature vector (reference: include/bliss.h:26-31)."""

    tempo: float = 0.0
    amplitude: float = 0.0
    frequency: float = 0.0
    attack: float = 0.0

    def as_array(self) -> np.ndarray:
        return np.array(
            [self.tempo, self.amplitude, self.frequency, self.attack],
            np.float32,
        )

    def as_dict(self) -> dict[str, float]:
        return dataclasses.asdict(self)


class Song(Mapping):
    """A song: canonical PCM + metadata + analysis results.

    Field names match the reference struct bl_song (include/bliss.h:49-67);
    Mapping access (``song["force_vector"]``) matches the reference bindings'
    dict-style wrapper. Usable as a context manager for symmetry with the
    bindings' ``with bl_song(...)`` idiom (buffers are GC-managed here;
    ``free()`` just drops the PCM reference).
    """

    _FIELDS = (
        "force", "force_vector", "sample_array", "channels", "nSamples",
        "sample_rate", "bitrate", "nb_bytes_per_sample", "calm_or_loud",
        "resampled", "duration", "filename", "artist", "title", "album",
        "tracknumber", "genre",
    )

    def __init__(self, filename: str | None = None, initial_values: dict | None = None):
        self.force: float = 0.0
        self.force_vector = ForceVector()
        self.sample_array: np.ndarray | None = None
        self.channels: int = 0
        self.nSamples: int = 0
        self.sample_rate: int = 0
        self.bitrate: int = 0
        self.nb_bytes_per_sample: int = 0
        self.calm_or_loud: int = C.BL_UNKNOWN
        self.resampled: int = 0
        self.duration: int = 0
        self.filename: str | None = filename
        self.artist: str | None = None
        self.title: str | None = None
        self.album: str | None = None
        self.tracknumber: str | None = None
        self.genre: str | None = None
        if initial_values:
            for k, v in initial_values.items():
                self[k] = v
        if filename is not None:
            self.analyze(filename)

    # -- Mapping interface ---------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        if key not in self._FIELDS:
            raise KeyError(key)
        v = getattr(self, key)
        if key == "force_vector":
            return v.as_dict()
        return v

    def __setitem__(self, key: str, value: Any) -> None:
        if key not in self._FIELDS:
            raise KeyError(key)
        if key == "force_vector" and isinstance(value, dict):
            value = ForceVector(**value)
        setattr(self, key, value)

    def __iter__(self) -> Iterator[str]:
        return iter(self._FIELDS)

    def __len__(self) -> int:
        return len(self._FIELDS)

    def __enter__(self) -> "Song":
        return self

    def __exit__(self, *exc) -> None:
        self.free()

    def free(self) -> None:
        """Drop the PCM buffer (kept for API symmetry with bl_free_song,
        reference: src/helpers.c:3-13)."""
        self.sample_array = None

    # -- pipeline ------------------------------------------------------------
    def decode(self, filename: str | None = None) -> "Song":
        """Decode audio into the canonical PCM contract (no analysis)."""
        filename = filename or self.filename
        if filename is None:
            raise ValueError("no filename to decode")
        d: DecodedAudio = _decode(filename)
        self.sample_array = d.samples
        self.channels = d.channels
        self.nSamples = d.n_samples
        self.sample_rate = d.sample_rate
        self.bitrate = d.bitrate
        self.nb_bytes_per_sample = d.nb_bytes_per_sample
        self.resampled = d.resampled
        self.duration = d.duration
        self.filename = d.filename
        self.artist = d.artist
        self.title = d.title
        self.album = d.album
        self.tracknumber = d.tracknumber
        self.genre = d.genre
        return self

    def _batch(self, cfg: AnalysisConfig) -> PCMBatch:
        if self.sample_array is None:
            self.decode()
        return PCMBatch.from_arrays(
            [np.asarray(self.sample_array)],
            [self.duration],
            pad_multiple=cfg.pad_multiple,
        )

    def analyze(
        self, filename: str | None = None, cfg: AnalysisConfig | None = None
    ) -> int:
        """Decode + full analysis; returns the LOUD/CALM/UNKNOWN class
        (reference: src/analyze.c:33-80)."""
        if filename is not None:
            self.filename = filename
            self.sample_array = None
        cfg = cfg or default_config()
        if self.sample_array is None:
            self.decode()
        from bliss_tpu.features.streaming import streaming_supports

        n = int(np.asarray(self.sample_array).shape[0])
        if n > LONG_SONG_SAMPLES and streaming_supports(cfg):
            # very long song: chunked streaming — one fixed compiled shape
            # instead of a giant whole-song compile (features/streaming.py)
            from bliss_tpu.features.streaming import analyze_song_streaming

            feats = analyze_song_streaming(
                np.asarray(self.sample_array), self.duration, cfg
            )
        else:
            feats = analyze_features(self._batch(cfg), cfg)[0]
        self.force_vector = ForceVector(*map(float, feats))
        force, cls = force_and_class(feats[None, :])
        self.force = float(np.asarray(force)[0])
        self.calm_or_loud = int(np.asarray(cls)[0])
        return self.calm_or_loud

    def amplitude_analysis(self, cfg: AnalysisConfig | None = None) -> float:
        from bliss_tpu.features import amplitude_scores

        cfg = cfg or default_config()
        v = float(np.asarray(_jit_feature(amplitude_scores, self._batch(cfg), cfg))[0])
        self.force_vector.amplitude = v
        return v

    def frequency_analysis(self, cfg: AnalysisConfig | None = None) -> float:
        from bliss_tpu.features import frequency_scores

        cfg = cfg or default_config()
        v = float(np.asarray(_jit_feature(frequency_scores, self._batch(cfg), cfg))[0])
        self.force_vector.frequency = v
        return v

    def extended_analysis(
        self, cfg: AnalysisConfig | None = None
    ) -> dict[str, float]:
        """ROADMAP feature set (zero-crossing rate, loudness, spectral
        centroid/rolloff/flatness, MFCC mean+std) as a name->value dict."""
        from bliss_tpu.features import (
            EXTENDED_FEATURE_NAMES,
            extended_features_jit,
        )

        cfg = cfg or default_config()
        row = np.asarray(extended_features_jit(self._batch(cfg), cfg))[0]
        return dict(zip(EXTENDED_FEATURE_NAMES, map(float, row)))

    def envelope_analysis(self, cfg: AnalysisConfig | None = None) -> tuple[float, float]:
        from bliss_tpu.features import envelope_scores

        cfg = cfg or default_config()
        t, a = _jit_feature(envelope_scores, self._batch(cfg), cfg)
        t, a = float(np.asarray(t)[0]), float(np.asarray(a)[0])
        self.force_vector.tempo = t
        self.force_vector.attack = a
        return t, a


# One jit cache per feature function.
import functools as _functools


@_functools.lru_cache(maxsize=None)
def _jitted(fn):
    return jax.jit(fn, static_argnames=("cfg",))


def _jit_feature(fn, batch, cfg):
    return _jitted(fn)(batch, cfg=cfg)


def analyze_features(batch: PCMBatch, cfg: AnalysisConfig) -> np.ndarray:
    """[B, 4] force vectors for a PCM batch under the given config."""
    if cfg.tempo_finish == "host":
        return np.asarray(analyze_batch_hybrid(batch, cfg))
    return np.asarray(analyze_batch_jit(batch, cfg))


# --- module-level functions (reference: python/bliss/distance.py) -----------

def _as_vector(song_or_file) -> np.ndarray:
    if isinstance(song_or_file, (str,)):
        return Song(song_or_file).force_vector.as_array()
    if isinstance(song_or_file, Song):
        return song_or_file.force_vector.as_array()
    if isinstance(song_or_file, ForceVector):
        return song_or_file.as_array()
    return np.asarray(song_or_file, np.float32)


def analyze(filename: str, cfg: AnalysisConfig | None = None) -> Song:
    """Analyze one file; raises DecodeError on undecodable input."""
    s = Song()
    s.analyze(filename, cfg=cfg)
    return s


def distance(song1, song2) -> float:
    """Euclidean distance; args may be filenames, Songs, ForceVectors, or
    4-arrays (reference: python/bliss/distance.py:5-40)."""
    return float(np.asarray(_distance_fn(_as_vector(song1), _as_vector(song2))))


def cosine_similarity(song1, song2) -> float:
    """Cosine similarity with the same flexible arguments."""
    return float(np.asarray(_cosine_fn(_as_vector(song1), _as_vector(song2))))


def distance_file(filename1: str, filename2: str) -> float:
    """Legacy-compatible: returns BL_UNEXPECTED (-2.0) on decode failure
    instead of raising (reference: src/analyze.c:105-125)."""
    try:
        return distance(filename1, filename2)
    except DecodeError:
        return float(C.BL_UNEXPECTED)


def cosine_similarity_file(filename1: str, filename2: str) -> float:
    """Legacy-compatible variant of cosine_similarity
    (reference: src/analyze.c:145-167)."""
    try:
        return cosine_similarity(filename1, filename2)
    except DecodeError:
        return float(C.BL_UNEXPECTED)


def version() -> str:
    """Framework version (the reference prints and returns 1.2,
    reference: src/helpers.c:25-28)."""
    return C.VERSION

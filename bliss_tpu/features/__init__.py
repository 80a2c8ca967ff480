from bliss_tpu.features.types import PCMBatch
from bliss_tpu.features.amplitude import amplitude_scores
from bliss_tpu.features.frequency import frequency_scores
from bliss_tpu.features.tempo import (
    envelope_energies,
    envelope_finish_host,
    envelope_scores,
)
from bliss_tpu.features.extended import (
    EXTENDED_FEATURE_NAMES,
    extended_features,
    extended_features_jit,
)
from bliss_tpu.features.analyze import (
    analyze_batch,
    analyze_batch_hybrid,
    analyze_batch_jit,
    force_and_class,
)

__all__ = [
    "PCMBatch",
    "amplitude_scores",
    "frequency_scores",
    "envelope_scores",
    "envelope_energies",
    "envelope_finish_host",
    "analyze_batch",
    "analyze_batch_hybrid",
    "analyze_batch_jit",
    "force_and_class",
    "EXTENDED_FEATURE_NAMES",
    "extended_features",
    "extended_features_jit",
]

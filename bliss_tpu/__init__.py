"""bliss_tpu — a TPU-native music analysis and song-similarity framework.

Capabilities of Polochon-street/bliss, redesigned for TPU: host-side libav
decode feeding batched JAX/XLA analyzers (histogram-collapse amplitude,
MXU-matmul spectral analysis, Parseval tempo energies, blocked-IIR
envelopes), whole-library similarity as on-device matmuls, and sharded
multi-chip analysis over a ('data', 'seq') mesh.

See SURVEY.md for the reference's structure; parity oracles are enforced in
tests/ against the reference's golden values.
"""

from bliss_tpu.constants import (
    BL_CALM,
    BL_LOUD,
    BL_OK,
    BL_UNEXPECTED,
    BL_UNKNOWN,
)
from bliss_tpu.config import AnalysisConfig
from bliss_tpu.api import (
    ForceVector,
    Song,
    analyze,
    analyze_features,
    cosine_similarity,
    cosine_similarity_file,
    distance,
    distance_file,
    version,
)

__version__ = version()

__all__ = [
    "AnalysisConfig",
    "ForceVector",
    "Song",
    "analyze",
    "analyze_features",
    "cosine_similarity",
    "cosine_similarity_file",
    "distance",
    "distance_file",
    "version",
    "BL_LOUD",
    "BL_CALM",
    "BL_UNKNOWN",
    "BL_UNEXPECTED",
    "BL_OK",
]

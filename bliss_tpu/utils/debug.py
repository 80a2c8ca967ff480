"""Numerical debugging aids.

JAX's functional model removes the data races the reference's pthread design
had to reason about (SURVEY.md §5); what remains to guard is numerics. These
helpers wrap the standard JAX debug switches plus a feature-vector sanity
check used by the pipeline's validation mode.
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np


@contextlib.contextmanager
def nan_debugging():
    """Raise on any NaN produced inside jitted code (jax_debug_nans)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


# Plausible envelope of force-vector components for real audio; values far
# outside indicate decode corruption or masking bugs rather than unusual
# music (the affine score calibrations put typical songs in [-4, 4], see
# reference: src/amplitude_sort.c:76-79).
_COMPONENT_RANGE = (-200.0, 200.0)


def validate_features(features, files=None) -> list[str]:
    """Return a list of human-readable problems found in [N, 4] features."""
    features = np.asarray(features)
    problems = []
    lo, hi = _COMPONENT_RANGE
    for i, row in enumerate(features):
        name = files[i] if files is not None else f"row {i}"
        if np.isnan(row).any():
            problems.append(f"{name}: NaN feature (decode failure or silence)")
        elif not ((row >= lo) & (row <= hi)).all():
            problems.append(f"{name}: feature out of plausible range: {row}")
    return problems

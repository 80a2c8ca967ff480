"""Utility subsystem tests: logging, profiling, debug validators."""

import json
import logging

import numpy as np

from bliss_tpu.utils import (
    StageTimer,
    get_logger,
    log_event,
    nan_debugging,
    validate_features,
)


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2
    assert rep["b"]["count"] == 1
    assert rep["a"]["seconds"] >= 0


def test_structured_logging_json():
    import bliss_tpu.utils.logging as L

    logger = logging.getLogger("bliss_tpu.test_json")
    logger.handlers.clear()
    handler = logging.StreamHandler()
    handler.setFormatter(L._JsonFormatter())
    logger.addHandler(handler)
    logger.setLevel("INFO")
    logger.propagate = False

    import io

    buf = io.StringIO()
    handler.stream = buf
    log_event(logger, "hello", songs=3, stage="scan")
    rec = json.loads(buf.getvalue().strip())
    assert rec["msg"] == "hello"
    assert rec["songs"] == 3
    assert rec["stage"] == "scan"


def test_validate_features_flags_problems():
    feats = np.array(
        [
            [-8.9, -10.6, -10.1, -15.5],
            [np.nan, 0, 0, 0],
            [1e6, 0, 0, 0],
        ],
        np.float32,
    )
    problems = validate_features(feats, files=["good", "bad-nan", "bad-range"])
    assert len(problems) == 2
    assert any("bad-nan" in p for p in problems)
    assert any("bad-range" in p for p in problems)


def test_nan_debugging_context():
    import jax
    import jax.numpy as jnp

    prev = jax.config.jax_debug_nans
    with nan_debugging():
        assert jax.config.jax_debug_nans is True
        # healthy computation passes
        assert float(jnp.sqrt(jnp.float64(4.0))) == 2.0
    assert jax.config.jax_debug_nans == prev

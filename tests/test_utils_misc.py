"""Smoke tests for the small utility modules (logger, profiling) —
reference nnsvs/logger.py semantics and SURVEY.md §5.1 tracing."""

import logging
import os

import jax.numpy as jnp

from ensemble_svs_with_interactions_tpu.utils.logger import getLogger
from ensemble_svs_with_interactions_tpu.utils import profiling


def test_logger_verbose_levels():
    assert getLogger(verbose=100, name="t_dbg").level == logging.DEBUG
    assert getLogger(verbose=1, name="t_info").level == logging.INFO
    assert getLogger(verbose=0, name="t_warn").level == logging.WARN
    # repeated calls must not stack handlers
    a = getLogger(verbose=1, name="t_once")
    b = getLogger(verbose=1, name="t_once")
    assert a is b and len(a.handlers) == 1


def test_profiling_trace_noop_and_capture(tmp_path):
    # falsy dir -> no-op context
    with profiling.trace(""):
        pass
    # real capture produces profile artifacts
    log_dir = tmp_path / "trace"
    with profiling.trace(log_dir):
        (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    produced = [
        os.path.join(r, f) for r, _, fs in os.walk(log_dir) for f in fs
    ]
    assert produced, "trace wrote no profile files"


def test_profiling_annotate_context():
    with profiling.annotate("region"):
        (jnp.ones((4,)) + 1).block_until_ready()

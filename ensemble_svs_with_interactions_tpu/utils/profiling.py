"""Tracing / profiling helpers.

SURVEY.md §5.1: the reference has only wall-clock RTF logging; the TPU
build keeps RTF as the headline metric and adds xprof-style tracing via
``jax.profiler`` (viewable in XProf/TensorBoard or Perfetto).

Usage::

    from ensemble_svs_with_interactions_tpu.utils.profiling import trace

    with trace("/tmp/jax-trace"):          # no-op when dir is falsy
        engine.svs_ensemble(labels_list)

or annotate regions inside jitted code with
``jax.profiler.TraceAnnotation`` / name device work with
:func:`annotate`.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir, create_perfetto_link: bool = False):
    """Capture a device+host profile into ``log_dir`` (falsy -> no-op)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(
        str(log_dir), create_perfetto_link=create_perfetto_link
    )
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up on the xprof timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def enable_detect_anomaly():
    """NaN-debugging mode: fail loudly at the op that produced a NaN
    (the reference's torch.autograd.set_detect_anomaly equivalent,
    train_util.py:1424-1426).  Jitted code re-runs op-by-op on NaN."""
    import jax

    jax.config.update("jax_debug_nans", True)

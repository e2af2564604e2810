"""Tracing / profiling hooks (SURVEY.md §5).

The reference's observability is per-β wall-clock prints plus the
A/ME/FE/exitflag arrays [M]; those arrays are preserved per member
(LadderResult). This module adds the TPU-era layer: XProf/TensorBoard traces
around compiled ladders and named annotations that show up on the trace
timeline.

Usage::

    from varanneal_tpu import profiling
    with profiling.trace("/tmp/va_trace"):
        res = fn(xp0)
        jax.block_until_ready(res.A)
    # then: tensorboard --logdir /tmp/va_trace  (or xprof)

    with profiling.annotate("ladder-beta-chunk"):
        ...
"""

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a device trace for everything run inside the block."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the profiler timeline (host-side annotation)."""
    return jax.profiler.TraceAnnotation(name)


def ladder_stats(result) -> dict:
    """Summarize a LadderResult into the scalar observability record the
    reference prints per β (A/ME/FE/exit) plus iteration/eval counters."""
    import numpy as np
    nfev = np.asarray(result.nfev)
    niter = np.asarray(result.niter)
    status = np.asarray(result.status)
    return {
        "n_beta": int(np.shape(nfev)[-1]),
        "total_nfev": int(nfev.sum()),
        "total_niter": int(niter.sum()),
        "final_A": np.asarray(result.A)[..., -1],
        "n_converged": int(np.sum(status <= 1)),
        "n_maxiter": int(np.sum(status == 2)),
        "n_ls_fail": int(np.sum(status == 3)),
    }

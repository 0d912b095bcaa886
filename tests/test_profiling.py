"""Profiling helper tests (utils/profiling.py)."""

import time

import numpy as np

from rust_raytrace_tpu.utils.profiling import phase_timers, sync


def test_phase_timers():
    with phase_timers() as pt:
        with pt.phase("a"):
            time.sleep(0.01)
        with pt.phase("b"):
            time.sleep(0.02)
        with pt.phase("a"):
            time.sleep(0.01)
    r = pt.report()
    assert set(r) == {"a", "b"}
    assert r["a"] >= 0.02
    assert r["b"] >= 0.02


def test_sync_forces_completion():
    import jax.numpy as jnp

    x = jnp.ones((8, 8)) * 2.0
    sync(x)          # must not raise; tiny fetch path
    sync([x, x])     # list form
    assert float(np.asarray(x)[0, 0]) == 2.0

"""Measured device roofline: VPU fp32 peak and HBM stream bandwidth.

The per-config "intrinsic-bound" claims in docs/PERF.md are defended as
utilization numbers (VERDICT r3 next-item 3): predicate FLOPs/ray x rays/s
vs VPU peak.  The denominator is MEASURED here, on the same chip the bench
runs on, instead of quoted from a spec sheet — the chip sits behind a
tunnel and its clock/binning are not otherwise observable.

- VPU peak: NCHAINS independent FMA chains (one per loop-carry array) so
  the instruction scheduler can hide FMA latency across chains.  Each
  fori_loop iteration's fused body reads and writes each carry array once
  against `2 * UNROLL` flops per element — arithmetic intensity
  2*UNROLL/8 flops/byte (UNROLL=384 -> 96 flops/byte; the earlier
  "~100 flops/byte" claim here was miscomputed, ADVICE r4).  At the
  measured 287 GB/s the memory-bound ceiling (27.5 TFLOP/s) sits far
  above the measured plateau, so the plateau is compute-limited.  The
  (NCHAINS, UNROLL) defaults are the knee of the probe_r15c + r15f
  sweeps (chains 2..32 x unroll 12..384, recorded in docs/PERF.md):
  3.80 TFLOP/s at (32, 384) with <= ~8% gain per further doubling — the
  chip's attainable fp32 FMA rate for register-resident elementwise
  work, the right denominator for predicate MFU.  The round-4 figure
  (0.43 at chains 4 x unroll 24) was LATENCY-limited, not issue-limited
  (ADVICE r4 was right): every MFU it denominated was ~8.8x inflated.
- HBM bandwidth: a fori_loop whose body streams `x = x + y` over 256 MB
  arrays (read x, read y, write x = 3 passes/iteration).

Both run inside one jit and are synced by a tiny slice fetch (the
platform's block_until_ready returns early — docs/PERF.md finding 16).
"""

import time

import numpy as np

UNROLL = 384
NCHAINS = 32


def measure_vpu_peak(iters: int = 60, shape=(1024, 1024), nruns: int = 3,
                     nchains: int = NCHAINS, unroll: int = UNROLL):
    """Returns measured fp32 FMA throughput in FLOP/s (1 FMA = 2 FLOPs)."""
    import jax
    import jax.numpy as jnp

    a = 1.0000001
    b = 1e-12

    @jax.jit
    def loop(xs):
        def body(i, c):
            c = list(c)
            for _ in range(unroll):
                c = [x * a + b for x in c]
            return tuple(c)
        return jax.lax.fori_loop(0, iters, body, xs)

    xs = tuple(jnp.full(shape, 0.5 + 0.1 * k, dtype=jnp.float32)
               for k in range(nchains))
    out = loop(xs)
    np.asarray(out[0][:1, :1])                     # compile + warm
    flops = 2.0 * nchains * unroll * iters * shape[0] * shape[1]
    best = 0.0
    for _ in range(nruns):
        t0 = time.perf_counter()
        out = loop(xs)
        np.asarray(out[0][:1, :1])
        dt = time.perf_counter() - t0
        best = max(best, flops / dt)
    return best


def measure_hbm_bw(iters: int = 16, mb: int = 256, nruns: int = 3):
    """Returns measured HBM stream bandwidth in bytes/s."""
    import jax
    import jax.numpy as jnp

    n = mb * (1 << 20) // 4
    x = jnp.arange(n, dtype=jnp.float32) * 1e-9
    y = jnp.ones((n,), dtype=jnp.float32) * 1e-9

    @jax.jit
    def loop(x, y):
        def body(i, x):
            return x + y
        return jax.lax.fori_loop(0, iters, body, x)

    out = loop(x, y)
    np.asarray(out[:1])
    traffic = 3.0 * 4 * n * iters                  # read x, read y, write x
    best = 0.0
    for _ in range(nruns):
        t0 = time.perf_counter()
        out = loop(x, y)
        np.asarray(out[:1])
        dt = time.perf_counter() - t0
        best = max(best, traffic / dt)
    return best

"""Roofline anchors on the real chip (VERDICT r3 #3).

Two speed-of-light microbenchmarks that turn the per-config
"intrinsic-bound" claims into measurements against the hardware:

  vpu_peak    — chained-FMA Pallas kernel on VMEM-resident [512,128] f32
                tiles with FOUR independent accumulator chains (a single
                chain is latency-bound): the achievable VPU f32 FLOP rate
                on this chip (every predicate op is VPU elementwise work;
                the MXU is idle in the trace kernels by design — K=3
                matmuls lose, docs/PERF.md platform rule 4).
  pred_peak   — the production per-lane intersection predicate + winner
                update (verbatim math from intersect_perlane.predicate)
                run on a VMEM-RESIDENT page tile with no gather, no
                selection, no page DMA: the triangle-tests/s the VPU could
                sustain if traversal overheads were zero.

TIMING: each dispatch through the axon tunnel pays a fixed ~30-65 ms
round trip (CLAUDE.md platform gotchas) that would swamp the kernel work —
the first version of this probe measured "peaks" BELOW the production
kernel's own executed-test rate for exactly that reason.  Here each
quantity is timed at TWO grid sizes and the rate is computed from the
DIFFERENCE (work scales with the grid, the overhead doesn't).

Utilization per config = (executed triangle tests/s) / pred_peak, with
executed tests counted offline (probe_r12c -> utils/roofline.py).

Run: nohup python scripts/probe_r12b.py > /tmp/probe_r12b.log 2>&1 &
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

F32 = jnp.float32
P = 56          # production page size
N_INT = 17


def timeit(fn, *args, n=5):
    x = fn(*args)
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        x = fn(*args)
        np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def delta_rate(make_run, work_of, nb_small, nb_big):
    """work/s from the difference of two grid sizes (cancels the fixed
    dispatch+fetch tunnel overhead)."""
    dt_s = timeit(make_run(nb_small), *())
    dt_b = timeit(make_run(nb_big), *())
    dw = work_of(nb_big) - work_of(nb_small)
    ddt = dt_b - dt_s
    return dw / ddt, dt_s, dt_b


# ---------------------------------------------------------------- vpu peak
def vpu_peak():
    ROWS, LANES, K = 512, 128, 256

    def kern(x_ref, o_ref):
        x0 = x_ref[:]
        a = x0 * F32(1.0000001) + F32(1e-12)
        # 4 independent chains: dependency distance = 4 tiles x 64 vregs
        xs = [x0 * F32(1.0 + 1e-7 * i) for i in range(4)]
        for _ in range(K):
            xs = [x * a + F32(1e-12) for x in xs]
        o_ref[:] = xs[0] + xs[1] + xs[2] + xs[3]

    x = jnp.ones((ROWS, LANES), F32) * 0.5

    def make_run(nb):
        @jax.jit
        def run():
            f = pl.pallas_call(
                kern,
                grid=(nb,),
                in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((ROWS, LANES), F32),
            )
            return f(x)
        return run

    def work_of(nb):
        return 2.0 * 4 * K * ROWS * LANES * nb      # 4 chains x K FMAs

    rate, dt_s, dt_b = delta_rate(make_run, work_of, 64, 512)
    print(f"vpu_peak: {rate / 1e12:.3f} TFLOP/s f32 "
          f"(K={K}x4 chains, dt {dt_s * 1e3:.1f} -> {dt_b * 1e3:.1f} ms)",
          flush=True)
    return rate


# ----------------------------------------------------------- predicate SOL
def pred_peak():
    """Production predicate on a resident [N_INT*P, 128] tile, K reps.

    Math lifted verbatim from intersect_perlane's `predicate` +
    `test_page`'s winner update.  The rep-dependent origin perturbation
    makes reps non-foldable.
    """
    K = 64

    def kern(g_ref, ray_ref, o_ref):
        G = g_ref[:]
        o0, o1, o2 = (ray_ref[k:k + 1, :] for k in range(3))
        d0, d1, d2 = (ray_ref[k:k + 1, :] for k in range(3, 6))

        def feat(f):
            return G[f * P:(f + 1) * P, :]

        def dot3(f0, r0, r1, r2):
            return feat(f0) * r0 + feat(f0 + 1) * r1 + feat(f0 + 2) * r2

        best_t = jnp.full((1, 128), jnp.inf, F32)
        best_id = jnp.zeros((1, 128), F32)
        for k in range(K):
            # rep-dependent rays, NON-vanishing (1e-30 is below ulp of an
            # N(0,1) value and CSE folded all reps into one — first run of
            # this probe measured an impossible 190 Gtests/s), on ALL SIX
            # ray components (perturbing only component 0 left feat*o1,
            # feat*o2, feat*d1, feat*d2 products k-invariant and hoistable
            # across reps — measured another impossible 86.6 Gtests/s =
            # 6x the chip's own instruction rate).  In production the PAGE
            # changes every step, so no product is hoistable there; this
            # makes the microbenchmark's marginal work match.
            ok_ = [r + F32(0.001) * k for r in (o0, o1, o2)]
            dk_ = [r + F32(0.001) * k for r in (d0, d1, d2)]
            md_n = dot3(0, *dk_)
            t = (feat(12) - dot3(0, *ok_)) / md_n
            dv0 = dot3(3, *ok_) + t * dot3(3, *dk_) - feat(13)
            dv1 = dot3(6, *ok_) + t * dot3(6, *dk_) - feat(14)
            dv2 = dot3(9, *ok_) + t * dot3(9, *dk_) - feat(15)
            ids = feat(16)
            ok = (t >= 0.0) & (dv0 <= 1.0) & (dv1 <= 1.0) & (dv2 <= 1.0)
            tt = jnp.where(ok, t, jnp.inf)
            pmin = jnp.min(tt, axis=0, keepdims=True)
            pid = jnp.min(jnp.where(tt == pmin, ids, jnp.inf), axis=0,
                          keepdims=True)
            upd = (pmin < best_t) | ((pmin == best_t) & ~jnp.isinf(pmin)
                                     & (pid < best_id))
            best_t = jnp.where(upd, pmin, best_t)
            best_id = jnp.where(upd, pid, best_id)
        o_ref[0:1, :] = best_t
        o_ref[1:2, :] = best_id

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((N_INT * P, 128)), F32)
    ray = jnp.asarray(rng.standard_normal((8, 128)), F32)

    def make_run(nb):
        @jax.jit
        def run():
            f = pl.pallas_call(
                kern,
                grid=(nb,),
                in_specs=[pl.BlockSpec((N_INT * P, 128), lambda i: (0, 0)),
                          pl.BlockSpec((8, 128), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), F32),
            )
            return f(g, ray)
        return run

    def work_of(nb):
        return float(K) * P * 128 * nb

    rate, dt_s, dt_b = delta_rate(make_run, work_of, 512, 4096)
    # flop count per test, from the source above: md_n 5, t 7 (incl div),
    # dv 13x3, ok 5 cmp + 3 and, tt/pmin/pid/upd winner ~7 -> ~66 VPU ops
    OPS = 66
    print(f"pred_peak: {rate / 1e9:.2f} Gtests/s "
          f"({rate * OPS / 1e12:.3f} TVPUop/s at {OPS} ops/test, "
          f"dt {dt_s * 1e3:.1f} -> {dt_b * 1e3:.1f} ms)", flush=True)
    return rate


def main():
    print("device:", jax.devices()[0], flush=True)
    v = vpu_peak()
    p = pred_peak()
    print(f"RESULT vpu_peak_tflops={v / 1e12:.3f} "
          f"pred_peak_gtests={p / 1e9:.2f}", flush=True)


if __name__ == "__main__":
    main()

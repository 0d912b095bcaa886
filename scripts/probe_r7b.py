"""Round-7 probe B (chip): pipelined segment DMA + full-chunk fast paths
in compact/expand.

Changes under test (ops/compact.py):
  - compact's segment writes START and are waited by the NEXT user of the
    scratch buffer (cross-grid-step pipelining; descriptors ride an SMEM
    pend scratch) — the old form stalled on start+wait inline every chunk;
  - expand's segment reads start BEFORE the rank matmul;
  - full-alive / full-dead chunks (interior / sky tiles) skip the
    ranks/one-hot/srcidx/gather machinery entirely (identity permutation).

Measures:
  1. isolated compact+expand x16 in-jit loop at boundary-0-like occupancy
     (12288 chunks, ~33% alive / 55% chunk-level sky) — the budget said
     compact 12.9 ms + expand 6.2;
  2. devbench teapot_2k headline (recorded: 104.2 ms / 58.7 Mrays/s).

Run: nohup python scripts/probe_r7b.py > /tmp/probe_r7b.log 2>&1 &
(serialize: nothing else may use the tunnel)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rust_raytrace_tpu.ops import compact as C

    F32 = jnp.float32
    cb = 512
    R = 512 * 12288                      # teapot_2k-scale lane count
    rng = np.random.default_rng(0)

    # boundary-0-like occupancy: per-chunk classes — 45% sky (all dead),
    # 10% interior (all alive), 45% mixed (random ~50/50 alive/dead/gap)
    NC = R // cb
    cls = rng.choice(3, size=NC, p=[0.45, 0.10, 0.45])
    alive = np.zeros(R, bool)
    dead = np.zeros(R, bool)
    for c in range(NC):
        sl = slice(c * cb, (c + 1) * cb)
        if cls[c] == 0:
            dead[sl] = True
        elif cls[c] == 1:
            alive[sl] = True
        else:
            u = rng.random(cb)
            alive[sl] = u < 0.4
            dead[sl] = (u >= 0.4) & (u < 0.8)
    st = rng.random((C.STATE_ROWS, R), dtype=np.float32)
    st[C.ROW_ALIVE] = alive
    st[C.ROW_DEAD] = dead
    st[:, ~(alive | dead)] = 0.0

    st_j = jnp.asarray(st)
    dead_arr = jnp.zeros((8, C.dead_capacity(R)), F32)

    @jax.jit
    def loop(st0):
        def body(i, carry):
            s, acc = carry
            meta, total_a, _, dead_end = C.compact_meta(
                s[C.ROW_ALIVE], s[C.ROW_DEAD], cb, jnp.int32(0), R)
            ns, nd = C.compact_pallas(s, dead_arr, meta, cb=cb)
            y = ns[C.ROW_ACC:C.ROW_ACC + 4]
            masks = jnp.stack([s[C.ROW_ALIVE], s[C.ROW_DEAD]])
            out = C.expand_pallas(y, nd, masks, meta, cb=cb)
            # perturbation keeps the loop body unfoldable; renders stay
            # identical numerically at f32
            s = s.at[0, 0].add(out[0, 0] * F32(1e-30) + F32(1e-30))
            return (s, acc + out[0, 1])
        return jax.lax.fori_loop(0, 16, body, (st0, F32(0.0)))

    out = loop(st_j)
    np.asarray(out[1])                    # compile + warm
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(st_j)
        np.asarray(out[1])
        dt = (time.perf_counter() - t0) / 16
        print(f"compact+expand x16: {dt * 1e3:.3f} ms/iter")

    # correctness spot check on chip vs oracle
    meta, *_ = C.compact_meta(st_j[C.ROW_ALIVE], st_j[C.ROW_DEAD], cb,
                              jnp.int32(0), R)
    ns, nd = C.compact_pallas(st_j, dead_arr, meta, cb=cb)
    exp_state, exp_dead, *_ = C.compact_oracle(st, np.zeros((8, C.dead_capacity(R)), np.float32), cb, 0)
    err = np.abs(np.asarray(ns) - exp_state).max()
    errd = np.abs(np.asarray(nd) - exp_dead).max()
    print(f"forward max|diff| vs oracle: state {err} dead {errd}")
    assert err == 0.0 and errd == 0.0

    # headline
    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu.models import teapot
    from rust_raytrace_tpu.utils.devbench import device_metric

    scene, vp = teapot.build(resolution="2k")
    eng = Engine(scene)
    mr, dt, rays = device_metric(eng, vp, nruns=3)
    print(f"teapot_2k: {dt * 1e3:.1f} ms {mr:.1f} Mrays/s")


if __name__ == "__main__":
    main()

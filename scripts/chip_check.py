"""On-chip validation: cull kernel, trace tie-break, compact/expand kernels.

Run: nohup python scripts/chip_check.py > /tmp/chip_check.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

F32 = np.float32


def main():
    print("device:", jax.devices()[0], flush=True)

    # 1. compact/expand kernels vs oracle on REAL hardware
    from rust_raytrace_tpu.ops import compact as C

    rng = np.random.default_rng(11)
    cb, R = 512, 512 * 40
    st = np.zeros((C.STATE_ROWS, R), dtype=F32)
    u = rng.random(R)
    alive = u < 0.35
    dead = (u >= 0.35) & (u < 0.65)
    bits = rng.integers(0, 2**32, size=(C.STATE_ROWS, R), dtype=np.uint32)
    vals = bits.view(np.float32)
    vals[~np.isfinite(vals)] = 1.25e-7
    st[:] = vals
    st[C.ROW_ALIVE] = alive.astype(F32)
    st[C.ROW_DEAD] = dead.astype(F32)
    st[:, ~(alive | dead)] = 0.0

    dead_arr = np.zeros((8, C.dead_capacity(R)), dtype=F32)
    exp_state, exp_dead, exp_meta, total_a, overflow, dead_end = \
        C.compact_oracle(st, dead_arr, cb, 0)
    meta, *_ = C.compact_meta(jnp.asarray(st[C.ROW_ALIVE]),
                              jnp.asarray(st[C.ROW_DEAD]), cb, jnp.int32(0), R)
    np.testing.assert_array_equal(np.asarray(meta), exp_meta)
    t0 = time.perf_counter()
    new_state, new_dead = C.compact_pallas(jnp.asarray(st),
                                           jnp.asarray(dead_arr), meta, cb=cb)
    ns = np.asarray(new_state)
    print(f"compact compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    np.testing.assert_array_equal(ns, exp_state)
    np.testing.assert_array_equal(np.asarray(new_dead), exp_dead)
    print("compact_pallas on chip: BIT-EXACT", flush=True)

    y = ns[C.ROW_ACC:C.ROW_ACC + 8]
    masks = jnp.asarray(np.stack([st[C.ROW_ALIVE], st[C.ROW_DEAD]]))
    t0 = time.perf_counter()
    out = np.asarray(C.expand_pallas(jnp.asarray(y), new_dead, masks, meta,
                                     cb=cb))
    print(f"expand compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    exp = C.expand_oracle(y, np.asarray(new_dead), st[C.ROW_ALIVE],
                          st[C.ROW_DEAD], np.asarray(exp_meta), cb)
    np.testing.assert_array_equal(out, exp)
    print("expand_pallas on chip: BIT-EXACT", flush=True)

    # timing: compact 7200 chunks of mixed aliveness (the wave-2 shape)
    cb2, R2 = 512, 3686400
    st2 = np.zeros((C.STATE_ROWS, R2), dtype=F32)
    u2 = rng.random(R2)
    st2[C.ROW_ALIVE] = (u2 < 0.3).astype(F32)
    st2[C.ROW_DEAD] = ((u2 >= 0.3) & (u2 < 0.9)).astype(F32)
    st2[0] = 1.0
    da2 = jnp.zeros((8, C.dead_capacity(R2)), dtype=jnp.float32)
    stj = jnp.asarray(st2)
    am = jnp.asarray(st2[C.ROW_ALIVE])
    dm = jnp.asarray(st2[C.ROW_DEAD])

    @jax.jit
    def full(stj, da2):
        meta2, total_a, overflow, dead_end = C.compact_meta(
            stj[C.ROW_ALIVE], stj[C.ROW_DEAD], cb2, jnp.int32(0), R2)
        ns2, nd2 = C.compact_pallas(stj, da2, meta2, cb=cb2)
        return ns2, nd2, meta2

    ns2, nd2, meta2 = full(stj, da2)
    np.asarray(ns2[:1, :1])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        ns2b, nd2b, _ = full(stj, da2)
        np.asarray(ns2b[:1, :1])
        ts.append(time.perf_counter() - t0)
    print(f"compact_pallas [16,{R2}] cb={cb2} (meta+kernel, wall incl "
          f"~30ms tunnel): {min(ts)*1e3:.1f} ms", flush=True)

    @jax.jit
    def inv(ns2, nd2, am, dm, meta2):
        y2 = ns2[C.ROW_ACC:C.ROW_ACC + 8]
        m2 = jnp.stack([am, dm])
        return C.expand_pallas(y2, nd2, m2, meta2, cb=cb2)

    o2 = inv(ns2, nd2, am, dm, meta2)
    np.asarray(o2[:1, :1])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        o2b = inv(ns2, nd2, am, dm, meta2)
        np.asarray(o2b[:1, :1])
        ts.append(time.perf_counter() - t0)
    print(f"expand_pallas [8,{R2}]: {min(ts)*1e3:.1f} ms", flush=True)

    # 2. small teapot render on chip vs oracle (cull kernel + tie-break path)
    from rust_raytrace_tpu import oracle
    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu.models import teapot

    scene, vp = teapot.build(resolution=(64, 64), maxdepth=3)
    img_o = oracle.render(scene.tris, vp, rng=oracle.FixedRng())
    eng = Engine(scene, page_size=64, ray_chunk=256)
    res = eng.render(vp, fixed_rng=True, quantize=False)
    diff = np.abs(res.image - img_o)
    print(f"teapot64 engine-vs-oracle max|diff|: {diff.max():.2e}  "
          f"mismatched px: {(diff.max(axis=-1) > 1/255).mean()*100:.3f}%",
          flush=True)


if __name__ == "__main__":
    main()

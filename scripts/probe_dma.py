"""Probe: which dynamic-offset DMA forms does Mosaic accept on this chip?

A: dst [16, R] 2-D, lane slice at dynamic 128-mult offset      (failed before)
B: dst viewed [16, NT, 128], middle-dim dynamic slice, minor full
C: dst viewed [NT, 16, 128], leading-dim dynamic slice (PK pattern)
D: read-side equivalents of B/C
"""

import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def probe_b():
    R, CB = 16 * 128 * 8, 512
    NT = R // 128
    CBT = CB // 128

    def kernel(zeros_in, out_hbm, scr, sem):
        i = pl.program_id(0)
        for t in range(CBT):
            scr[:, t, :] = jnp.full((16, 128), i * 100 + t, F32)
        off_t = i * CBT + 1  # deliberately unaligned-to-chunk tile offset
        k = 2

        @pl.when(i < 7)
        def _():
            cp = pltpu.make_async_copy(
                scr.at[:, 0:k, :], out_hbm.at[:, pl.ds(off_t, k), :], sem)
            cp.start()
            cp.wait()

    zeros = jnp.zeros((16, NT, 128), F32)
    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((16, NT, 128), F32),
        scratch_shapes=[pltpu.VMEM((16, CBT, 128), F32),
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={0: 0},
    )(zeros)
    o = np.asarray(out)
    ok = True
    for i in range(4):
        for t in range(2):
            ok &= (o[:, i * CBT + 1 + t, :] == i * 100 + t).all()
    print("B (middle-dim dynamic write):", "OK" if ok else "WRONG", flush=True)


def probe_c():
    R, CB = 16 * 128 * 8, 512
    NT = R // 128
    CBT = CB // 128

    def kernel(zeros_in, out_hbm, scr, sem):
        i = pl.program_id(0)
        for t in range(CBT):
            scr[t, :, :] = jnp.full((16, 128), i * 100 + t, F32)
        off_t = i * CBT + 1
        k = 2

        @pl.when(i < 7)
        def _():
            cp = pltpu.make_async_copy(
                scr.at[0:k], out_hbm.at[pl.ds(off_t, k)], sem)
            cp.start()
            cp.wait()

    zeros = jnp.zeros((NT, 16, 128), F32)
    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((NT, 16, 128), F32),
        scratch_shapes=[pltpu.VMEM((CBT, 16, 128), F32),
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={0: 0},
    )(zeros)
    o = np.asarray(out)
    ok = True
    for i in range(4):
        for t in range(2):
            ok &= (o[i * CBT + 1 + t] == i * 100 + t).all()
    print("C (leading-dim dynamic write):", "OK" if ok else "WRONG", flush=True)


def probe_b_read():
    R = 16 * 128 * 8
    NT = R // 128

    def kernel(src_hbm, out_ref, scr, sem):
        i = pl.program_id(0)
        k = 2
        cp = pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(i * 2 + 1, k), :], scr.at[:, 0:k, :], sem)
        cp.start()
        cp.wait()
        out_ref[:, 0:1, 0:1] = jnp.sum(scr[:, 0:k, :], axis=(1, 2),
                                       keepdims=True)

    src = jnp.arange(16 * NT * 128, dtype=F32).reshape(16, NT, 128)
    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((16, 1, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 4, 128), F32),
        scratch_shapes=[pltpu.VMEM((16, 2, 128), F32),
                        pltpu.SemaphoreType.DMA],
    )(src)
    o = np.asarray(out)
    s = np.asarray(src)
    ok = all(np.allclose(o[:, i, 0], s[:, i*2+1:i*2+3, :].sum(axis=(1, 2)))
             for i in range(4))
    print("B-read (middle-dim dynamic read):", "OK" if ok else "WRONG",
          flush=True)


def probe_a_row8():
    # 2-D form but with only 8 rows (one sublane tile): does it lower?
    R = 128 * 64

    def kernel(zeros_in, out_hbm, scr, sem):
        i = pl.program_id(0)
        scr[:, :] = jnp.full((8, 256), 7.0 + i, F32)
        off = i * 256 + 128

        @pl.when(i < 7)
        def _():
            cp = pltpu.make_async_copy(
                scr.at[:, 0:256], out_hbm.at[:, pl.ds(off, 256)], sem)
            cp.start()
            cp.wait()

    zeros = jnp.zeros((8, R), F32)
    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((8, R), F32),
        scratch_shapes=[pltpu.VMEM((8, 256), F32),
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={0: 0},
    )(zeros)
    o = np.asarray(out)
    ok = all((o[:, i * 256 + 128:i * 256 + 384] == 7.0 + i).all()
             for i in range(4))
    print("A8 (2-D 8-row lane-dynamic write):", "OK" if ok else "WRONG",
          flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    for name, fn in [("B", probe_b), ("C", probe_c), ("B-read", probe_b_read),
                     ("A8", probe_a_row8)]:
        try:
            fn()
        except Exception as e:
            msg = str(e)
            key = [l for l in msg.splitlines() if "Not implemented" in l
                   or "error:" in l.lower()][:2]
            print(f"{name}: FAILED — {' | '.join(key) if key else msg[:200]}",
                  flush=True)

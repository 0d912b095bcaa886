"""Bisect the fused sorted-cull slowdown: which block costs 40ms/wave?"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_raytrace_tpu.engine import Engine, _camera_rays_tiled
from rust_raytrace_tpu.models import teapot

F32 = jnp.float32
BIG = 1e30
BIGT = 3.0e38


def make_kernel(mode):
    def _kernel(flags_ref, o_ref, d_ref, v_ref, lo_ref, hi_ref,
                cnt_ref, plist_ref, ptmin_ref):
        row = jax.lax.rem(pl.program_id(0), 8)
        npad = plist_ref.shape[1]

        @pl.when(flags_ref[row, 0] != 0)
        def _live():
            valid = v_ref[0:1, :] != 0.0
            tlo = None
            thi = None
            for k in range(3):
                o_k = o_ref[k:k + 1, :]
                d_k = d_ref[k:k + 1, :]
                inv = jnp.where(d_k != 0.0, 1.0 / d_k,
                                jnp.where(d_k >= 0.0, F32(BIG), F32(-BIG)))
                lo_k = lo_ref[:, k:k + 1]
                hi_k = hi_ref[:, k:k + 1]
                t1 = (lo_k - o_k) * inv
                t2 = (hi_k - o_k) * inv
                alo = jnp.minimum(t1, t2)
                ahi = jnp.maximum(t1, t2)
                tlo = alo if tlo is None else jnp.maximum(tlo, alo)
                thi = ahi if thi is None else jnp.minimum(thi, ahi)

            page_ok = lo_ref[:, 3:4] != 0.0
            hit = (tlo <= thi) & (thi >= 0.0) & valid & page_ok
            entry = jnp.where(hit, jnp.maximum(tlo, 0.0), F32(BIGT))

            if mode == "base":
                # old-kernel equivalent: two lane-vector reductions
                hit_l = jnp.max(hit.astype(F32), axis=1)
                key_l = jnp.min(entry, axis=1)
                cnt_ref[row, :] = jnp.zeros((cnt_ref.shape[1],), F32)
                plist_ref[row, :] = hit_l
                ptmin_ref[row, :] = key_l
                return

            hit_s = jnp.max(hit.astype(F32), axis=1, keepdims=True)
            key_s = jnp.min(entry, axis=1, keepdims=True)
            key_s = jnp.where(hit_s != 0.0, key_s, F32(BIGT))
            cnt_ref[row, :] = jnp.broadcast_to(jnp.sum(hit_s),
                                               (cnt_ref.shape[1],))
            if mode == "reduce2":
                # + keepdims reductions and count, no sort
                plist_ref[row, :] = jnp.max(hit.astype(F32), axis=1)
                ptmin_ref[row, :] = jnp.min(entry, axis=1)
                return

            key_l = jnp.min(entry, axis=1)[None, :]
            hit_l = jnp.max(hit.astype(F32), axis=1)[None, :]
            key_l = jnp.where(hit_l != 0.0, key_l, F32(BIGT))
            sub_i = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 0)
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
            kb_l = jnp.broadcast_to(key_l, (npad, npad))
            kb_s = jnp.broadcast_to(key_s, (npad, npad))
            less = (kb_l < kb_s) | ((kb_l == kb_s) & (lane_i < sub_i))
            rank_s = jnp.sum(less.astype(F32), axis=1, keepdims=True)
            if mode == "rank":
                plist_ref[row, :] = jnp.max(rank_s, axis=1)
                ptmin_ref[row, :] = jnp.min(entry, axis=1)
                return

            onehot = (jnp.broadcast_to(rank_s, (npad, npad))
                      == lane_i.astype(F32))
            page_f = sub_i.astype(F32)
            plist_ref[row, :] = jnp.sum(jnp.where(onehot, page_f, 0.0),
                                        axis=0)
            ptmin_ref[row, :] = jnp.sum(
                jnp.where(onehot, jnp.broadcast_to(key_s, (npad, npad)), 0.0),
                axis=0)
    return _kernel


def main():
    print("device:", jax.devices()[0], flush=True)
    scene, vp = teapot.build(resolution="2k")
    eng = Engine(scene, page_size=64, ray_chunk=1024)
    rb = 1024
    R0 = vp.height * vp.width
    R = -(-R0 // rb) * rb
    NC = R // rb
    key = jax.random.PRNGKey(0)
    o, d = _camera_rays_tiled(
        jnp.asarray(vp.orig), jnp.asarray(vp.cam), jnp.asarray(vp.vu),
        jnp.asarray(vp.vv), key, width=vp.width, height=vp.height,
        spp=1, tile=32, n_pad=R)
    alive = jnp.arange(R) < R0
    blo, bhi = eng.aabb_lo, eng.aabb_hi
    NP = blo.shape[0]
    NPpad = -(-NP // 128) * 128

    lo = jnp.zeros((NPpad, 128), F32).at[:NP, 0:3].set(blo.astype(F32))
    hi = jnp.zeros((NPpad, 128), F32).at[:NP, 0:3].set(bhi.astype(F32))
    lo = lo.at[:NP, 3].set(1.0)
    NC8 = -(-NC // 8) * 8
    flags = jnp.ones((NC8, 128), jnp.int32)
    vrow = alive.astype(F32)[None, :]

    def run(mode):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(NC,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (i // 8, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((3, rb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, rb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NPpad, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NPpad, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((8, 128), lambda i: (i // 8, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, NPpad), lambda i: (i // 8, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, NPpad), lambda i: (i // 8, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        f = jax.jit(lambda o_, d_, v_: pl.pallas_call(
            make_kernel(mode), grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((NC8, 128), F32),
                       jax.ShapeDtypeStruct((NC8, NPpad), F32),
                       jax.ShapeDtypeStruct((NC8, NPpad), F32)],
        )(flags, o_, d_, v_, lo, hi))
        out = f(o, d, vrow)
        np.asarray(out[0][:1, :1])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = f(o, d, vrow)
            np.asarray(out[0][:1, :1])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for mode in ("base", "reduce2", "rank", "full"):
        print(f"{mode}: {run(mode)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

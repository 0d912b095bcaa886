"""Round-5 probe r16d (chip): isolate WHICH fused-streamed invocations eat
586 ms on synthetic_1m.

probe_r16b's op budget (757.9 ms program): the four fused kernels cost
94.0 / 61.0 / 256.2 / 330.0 ms while compact+expand is ~10 ms total — but
wave 1 is 800 compacted chunks (818k rays; the raw trace kernel on that
batch is 28.4 ms, probe_r16a) and waves 2+ hold ~178 rays.  Two of the
four invocations have no business costing 0.25-0.33 s.  This probe times
trace_shade_streamed_pallas directly on controlled shapes built from the
REAL wave-1 batch:

  A. wave-1 shape: 818k alive in an 800-chunk prefix of the full 3600-chunk
     state, grid_live=800                         (expected ~tens of ms)
  B. same state, grid_live=None, chunk_live= 800 ones + 2800 zeros
     (full grid, dead tail skipped in-kernel)     (dead-chunk copy cost)
  C. near-dead wave: 178 alive in chunk 0, grid_live=1
  D. near-dead wave on a STALE 800-chunk prefix: 178 alive scattered in
     the first 800 chunks, grid_live=800, chunk_live 1s (the shape waves
     2-4 take if liveness refresh failed)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

import jax
import jax.numpy as jnp
import numpy as np

from rust_raytrace_tpu import math3d as m3
from rust_raytrace_tpu.camera import create_viewport
from rust_raytrace_tpu.engine import Engine, _camera_rays_tiled, pick_tile
from rust_raytrace_tpu.geometry import make_sphere
from rust_raytrace_tpu.materials import matte
from rust_raytrace_tpu.scene import assemble
from rust_raytrace_tpu.ops.compact import STATE_ROWS
from rust_raytrace_tpu.ops.intersect_streamed import (
    trace_shade_streamed_pallas, trace_streamed_pallas)

VMEM_OPT = {"xla_tpu_scoped_vmem_limit_kib": "65536"}
RB = 1024
F32 = np.float32


def sphere_scene(nseg, maxdepth=5):
    s = make_sphere((0.0, 0.0, 10.0), 4.0, (nseg, nseg),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    vpc = create_viewport((2560, 1440), (1.6, 0.9), (0.0, 0.0, 0.0),
                          m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0,
                          maxdepth, 1)
    return assemble([s]), vpc


sc, vp = sphere_scene(708)
eng = Engine(sc)
P = eng.page_size
print(f"P={P} NB={eng.slt_i.shape[0]}", flush=True)

key = jax.random.PRNGKey(0)
R0 = vp.height * vp.width
R = -(-R0 // RB) * RB
NC = R // RB
tile = pick_tile(vp.width, vp.height)
o, d = _camera_rays_tiled(
    jnp.asarray(vp.orig), jnp.asarray(vp.cam), jnp.asarray(vp.vu),
    jnp.asarray(vp.vv), key, width=vp.width, height=vp.height, spp=1,
    tile=tile, n_pad=R)
alive = (jnp.arange(R) < R0).astype(jnp.float32)
ob = jnp.broadcast_to(jnp.asarray(vp.cam)[:, None], o.shape)


@jax.jit
def w0(o_, d_, a_):
    out = trace_streamed_pallas(o_, d_, a_, eng.slt_i, eng.slt_s, eng.s_ab,
                                eng.s_bank_ab, P, RB)
    return out[0:5]

w0c = w0.lower(ob, d, alive).compile(compiler_options=VMEM_OPT)
rows = np.asarray(w0c(ob, d, alive))
t0r, hid = rows[0], rows[1]
hit = (hid != 0) & np.isfinite(t0r)
Oh = np.asarray(ob).T[hit]
Dh = np.asarray(d).T[hit]
th = t0r[hit]
n = rows[2:5].T[hit]
pid = hid[hit]
pback = np.einsum("rc,rc->r", n, Dh) > 0
n = np.where(pback[:, None], -n, n)
pnt = Oh + th[:, None] * Dh
rng = np.random.default_rng(7)
u = rng.normal(size=pnt.shape).astype(F32)
u /= np.linalg.norm(u, axis=1, keepdims=True)
d2 = n + u
nz = np.linalg.norm(d2, axis=1, keepdims=True)
d2 = np.where(nz > 1e-6, d2 / np.maximum(nz, 1e-6), n).astype(F32)
o2 = (pnt + 1e-4 * n).astype(F32)
R1r = o2.shape[0]
print(f"wave-1 batch: {R1r} rays", flush=True)

seedj = jnp.asarray([123, 456], jnp.uint32)


def make_state(osel, dsel, nalive, spread_chunks):
    """Full-size [STATE_ROWS, R] state with `nalive` rays placed in the
    first `spread_chunks` chunks (cyclic fill), rest dead."""
    st = np.zeros((STATE_ROWS, R), F32)
    idx = (np.arange(nalive) % spread_chunks) * RB \
        + (np.arange(nalive) // spread_chunks)
    st[0:3, idx] = osel[:nalive].T
    st[3:6, idx] = dsel[:nalive].T
    st[6, idx] = 1.0
    st[7, idx] = 1.0
    return jnp.asarray(st)


@jax.jit
def fused(st_, cl_, gl_):
    def body(i, c):
        out = trace_shade_streamed_pallas(
            st_ + c * jnp.float32(1e-30), eng.slt_i, eng.slt_s, eng.s_ab,
            eng.s_bank_ab, seedj, P, RB, fixed_rng=False,
            weight_cutoff=1 / 512, chunk_live=cl_, interpret=False,
            grid_live=gl_)
        return out[0, 0]
    return jax.lax.fori_loop(0, 4, body, jnp.float32(0.0))


cases = {}
cl_full = np.zeros((NC,), np.int32); cl_full[:800] = 1
cases["A_wave1_gl800"] = (make_state(o2, d2, R1r, 800),
                          jnp.asarray(cl_full), jnp.int32(800))
cases["B_wave1_fullgrid"] = (cases["A_wave1_gl800"][0],
                             jnp.asarray(cl_full), None)
cl_one = np.zeros((NC,), np.int32); cl_one[0] = 1
cases["C_dead_gl1"] = (make_state(o2, d2, 178, 1), jnp.asarray(cl_one),
                       jnp.int32(1))
cases["D_dead_stale800"] = (make_state(o2, d2, 178, 800),
                            jnp.asarray(cl_full), jnp.int32(800))

compiled = {}
for name, (st_, cl_, gl_) in cases.items():
    sig = (gl_ is None)
    if sig not in compiled:
        compiled[sig] = fused.lower(st_, cl_, gl_).compile(
            compiler_options=VMEM_OPT)
    fc = compiled[sig]
    x = fc(st_, cl_, gl_); np.asarray(x)
    best = np.inf
    for _ in range(2):
        tA = time.perf_counter()
        x = fc(st_, cl_, gl_); np.asarray(x)
        best = min(best, (time.perf_counter() - tA) / 4)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)

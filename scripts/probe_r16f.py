"""Round-5 probe r16f (chip): the reworked bank-major sweep (quad banks +
extraction-in-sweep) vs probe_r16e's baselines, then the full engine
render with bank_major bounce waves.

r16e baselines (old kernel): worklist coherent 86.2 / decoherent 224.8;
bankmajor coherent 73.6 / decoherent 193.4 ms — per-visit overhead bound.
The rework shares one row round trip across BANKS_PER_STEP=4 banks and
extracts payload in-sweep (no finish-phase table DMA).
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
    trace_shade_bankmajor_pallas, trace_streamed_pallas)
from rust_raytrace_tpu.utils.devbench import device_metric

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
NC_FULL = 3600
print(f"P={P} NB={eng.slt_i.shape[0]}", flush=True)

key = jax.random.PRNGKey(0)
R0 = vp.height * vp.width
R = -(-R0 // RB) * RB
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
NC1 = -(-R1r // RB)
print(f"bounce batch: {R1r} rays, {NC1} live chunks", flush=True)

seedj = jnp.asarray([123, 456], jnp.uint32)


def make_state(osel, dsel, nalive, decoherent):
    st = np.zeros((STATE_ROWS, R), F32)
    if decoherent:
        idx = (np.arange(nalive) % NC1) * RB + (np.arange(nalive) // NC1)
    else:
        idx = np.arange(nalive)
    st[0:3, idx] = osel[:nalive].T
    st[3:6, idx] = dsel[:nalive].T
    st[6, idx] = 1.0
    st[7, idx] = 1.0
    return jnp.asarray(st)


@jax.jit
def loop(s_, c_, g_):
    def body(i, c):
        out = trace_shade_bankmajor_pallas(
            s_ + c * jnp.float32(1e-30), eng.slt_i, eng.slt_s, eng.s_ab,
            eng.s_bank_ab, seedj, P, RB, fixed_rng=False,
            weight_cutoff=1 / 512, chunk_live=c_, interpret=False,
            grid_live=g_)
        return out[0, 0]
    return jax.lax.fori_loop(0, 4, body, jnp.float32(0.0))


cl = np.zeros((NC_FULL,), np.int32); cl[:NC1] = 1
cl = jnp.asarray(cl)
gl = jnp.int32(NC1)
lc = None
for decoh in (False, True):
    st = make_state(o2, d2, R1r, decoh)
    if lc is None:
        lc = loop.lower(st, cl, gl).compile(compiler_options=VMEM_OPT)
    x = lc(st, cl, gl); np.asarray(x)
    best = np.inf
    for _ in range(2):
        tA = time.perf_counter()
        x = lc(st, cl, gl); np.asarray(x)
        best = min(best, (time.perf_counter() - tA) / 4)
    tag = "decoherent" if decoh else "coherent"
    print(f"bankmajor-v2 {tag}: {best*1e3:.1f} ms", flush=True)

# full engine render, bank-major bounce waves
eng2 = Engine(sc, bank_major=True)
runs = []
mr, dt, rays = device_metric(eng2, vp, ND=4, nruns=3,
                             compiler_options=VMEM_OPT, runs_out=runs)
print(f"engine bank_major=True: {mr:.3f} Mrays/s ({dt*1e3:.1f} ms) runs "
      f"{' '.join(f'{m:.2f}' for m, _ in runs)} rays {rays}", flush=True)

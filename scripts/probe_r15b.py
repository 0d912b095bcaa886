"""Round-5 probe B: per-phase budget for the streamed-bank kernel on
synthetic_1m (VERDICT r4 missing #2: the round-4 flagship kernel shipped
with no chip profile).

Decomposition measured here:
  1. full render (maxdepth 5) vs maxdepth 1 -> wave-0 vs bounce split;
  2. bank-visit counts per chunk (stats=True channel, row 11) on the real
     wave-0 camera rays -> total bank-DMA bytes per wave vs the measured
     273.5 GB/s HBM bandwidth (is the kernel DMA-bound?);
  3. per-visit cost: kernel time / total visits, vs the DMA floor
     (bank tables = (17+7)*P*128*4 B per visit).
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
from rust_raytrace_tpu.utils.devbench import device_metric

VMEM_OPT = {"xla_tpu_scoped_vmem_limit_kib": "65536"}
RB = 1024


def sphere_scene(nseg, maxdepth=5):
    s = make_sphere((0.0, 0.0, 10.0), 4.0, (nseg, nseg),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    vpc = create_viewport((2560, 1440), (1.6, 0.9), (0.0, 0.0, 0.0),
                          m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0,
                          maxdepth, 1)
    return assemble([s]), vpc


sc, vp = sphere_scene(708)
eng = Engine(sc)
assert eng.streamed, "expected the streamed regime"
P = eng.page_size
NB = eng.slt_i.shape[0]
bank_bytes = (17 + 7) * P * 128 * 4
print(f"P={P} NP={eng.pages.num_pages} NB={NB} "
      f"bank_bytes={bank_bytes/1e6:.3f} MB", flush=True)

# --- 1. full vs wave-0-only ---
mr, dt, rays = device_metric(eng, vp, ND=4, nruns=2,
                             compiler_options=VMEM_OPT)
print(f"full maxdepth5: {mr:.3f} Mrays/s ({dt*1e3:.1f} ms, rays {rays})",
      flush=True)
_, vp1 = sphere_scene(708, maxdepth=1)
mr1, dt1, rays1 = device_metric(eng, vp1, ND=4, nruns=2,
                                compiler_options=VMEM_OPT)
print(f"wave0 maxdepth1: {mr1:.3f} Mrays/s ({dt1*1e3:.1f} ms, "
      f"rays {rays1}) -> bounce share ~{(dt-dt1)*1e3:.1f} ms", flush=True)

# --- 2. bank-visit stats on the real wave-0 rays ---
key = jax.random.PRNGKey(0)
R0 = vp.height * vp.width
R = -(-R0 // RB) * RB
NC = R // RB
tile = pick_tile(vp.width, vp.height)
o, d = _camera_rays_tiled(
    jnp.asarray(vp.orig), jnp.asarray(vp.cam), jnp.asarray(vp.vu),
    jnp.asarray(vp.vv), key, width=vp.width, height=vp.height, spp=1,
    tile=tile, n_pad=R)
alive = (jnp.arange(R) < R0)
ob = jnp.broadcast_to(jnp.asarray(vp.cam)[:, None], o.shape)

from rust_raytrace_tpu.ops.intersect_streamed import trace_streamed_pallas


@jax.jit
def w0_stats(o_, d_, a_):
    out = trace_streamed_pallas(o_, d_, a_, eng.slt_i, eng.slt_s, eng.s_ab,
                                eng.s_bank_ab, P, RB, stats=True)
    visits = out[11].reshape(NC, RB)[:, 0]
    return visits, out[1]

w0c = w0_stats.lower(ob, d, alive.astype(jnp.float32)).compile(
    compiler_options=VMEM_OPT)
visits, ids = w0c(ob, d, alive.astype(jnp.float32))
v = np.asarray(visits)
hits = int(np.asarray((ids != 0).sum()))
tot = float(v.sum())
gb = tot * bank_bytes / 1e9
print(f"wave0 visits: total {tot:.0f} over {NC} chunks "
      f"(mean {v.mean():.2f}, max {v.max():.0f}, zero-chunks "
      f"{(v==0).sum()}), hits {hits}", flush=True)
print(f"wave0 bank DMA: {gb:.2f} GB -> {gb/273.5*1e3:.1f} ms at HBM peak",
      flush=True)

# --- 3. timed unfused wave-0 kernel (in-jit x4) -> per-visit cost ---
@jax.jit
def w0_loop(o_):
    def body(i, c):
        out = trace_streamed_pallas(o_ + c * jnp.float32(1e-30), d,
                                    alive.astype(jnp.float32), eng.slt_i,
                                    eng.slt_s, eng.s_ab, eng.s_bank_ab, P,
                                    RB)
        return out[0, 0]
    return jax.lax.fori_loop(0, 4, body, jnp.float32(0.0))

w0l = w0_loop.lower(ob).compile(compiler_options=VMEM_OPT)
x = w0l(ob); np.asarray(x)
for i in range(2):
    t0 = time.perf_counter()
    x = w0l(ob); np.asarray(x)
    dtk = (time.perf_counter() - t0) / 4
    per_visit = dtk / max(tot, 1) * 1e6
    print(f"wave0 unfused kernel: {dtk*1e3:.1f} ms "
          f"({per_visit:.2f} us/visit vs DMA floor "
          f"{bank_bytes/273.5e9*1e6:.2f} us)", flush=True)

"""Round-5 probe r16a: decompose the streamed BOUNCE cost on synthetic_1m
at the new defaults (P=224, worklist kernel + guess prefetch).

probe_r15b measured the r4 kernel at P=56: 974 ms = 93 wave0 + 881 bounce,
with ~820k wave-0 hits -> the bounce waves are ~1.07 us/bounce-ray, ~10x
the resident regime's per-ray cost, despite eff_bounce = 1.86 pages/ray.
The money is therefore per-(bank-visit) and per-(group-pass) fixed costs,
not predicate math.  This probe measures, on a REAL wave-1 batch:

  1. full vs maxdepth-1 render split at the new defaults;
  2. the wave-1 scattered batch's bank-visit count (stats row 11) AND
     live group-pass count (stats row 12, added for this probe);
  3. kernel time for three lane orders of the SAME batch:
       a. hit order (== production compaction order),
       b. globally sorted by primary-bank key,
       c. globally sorted by (primary bank, direction octant);
     (b)/(c) bound what a cross-chunk bank sort could buy: if the sorted
     orders collapse visits/passes and the time follows, a global bank
     ordering pass is the structural fix; if time does NOT follow the
     counts, the cost is per-visit bookkeeping, not passes.
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
from rust_raytrace_tpu.ops.intersect_streamed import trace_streamed_pallas

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
assert eng.streamed and not eng.bank_major
P = eng.page_size
NB = eng.slt_i.shape[0]
print(f"defaults: P={P} NP={eng.pages.num_pages} NB={NB}", flush=True)

# --- 1. full vs wave0 split at the new defaults ---
mr, dt, rays = device_metric(eng, vp, ND=4, nruns=2,
                             compiler_options=VMEM_OPT)
print(f"full maxdepth5: {mr:.3f} Mrays/s ({dt*1e3:.1f} ms)", flush=True)
_, vp1 = sphere_scene(708, maxdepth=1)
mr1, dt1, _ = device_metric(eng, vp1, ND=4, nruns=2,
                            compiler_options=VMEM_OPT)
print(f"wave0 maxdepth1: {dt1*1e3:.1f} ms -> bounce ~{(dt-dt1)*1e3:.1f} ms",
      flush=True)

# --- 2. wave-0 rows on chip -> host scatter construction ---
key = jax.random.PRNGKey(0)
R0 = vp.height * vp.width
R = -(-R0 // RB) * RB
NC0 = R // RB
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
    return out[0:5]                          # t, id, norm xyz

w0c = w0.lower(ob, d, alive).compile(compiler_options=VMEM_OPT)
rows = np.asarray(w0c(ob, d, alive))         # [5, R] d2h (~74 MB)
t0r, hid = rows[0], rows[1]
hit = (hid != 0) & np.isfinite(t0r)
On = np.asarray(o).T[hit[:R0][: R0].nonzero()[0]] if False else None
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
R1 = -(-R1r // RB) * RB
NC1 = R1 // RB
print(f"bounce batch: {R1r} rays -> {NC1} chunks", flush=True)

# host primary-bank key (same definition as _primary_bank_sort: nearest
# entering bank's index; no entry -> NB8)
bab = np.asarray(eng.s_bank_ab)              # [NB8, 128] packed
NB8 = bab.shape[0]
lo = bab[:, 0:3][None]                       # [1, NB8, 3]
hi = bab[:, 3:6][None]
okb = bab[:, 6][None] > 0
with np.errstate(divide="ignore", invalid="ignore"):
    inv = 1.0 / d2[:, None, :]
    inv = np.where(np.isfinite(inv), inv,
                   np.where(d2[:, None, :] >= 0, 1e30, -1e30))
    t1 = (lo - o2[:, None, :]) * inv
    t2 = (hi - o2[:, None, :]) * inv
btlo = np.minimum(t1, t2).max(axis=2)
bthi = np.maximum(t1, t2).min(axis=2)
bhit = (btlo <= bthi) & (bthi >= 0) & okb
ent = np.where(bhit, btlo, np.inf)
bankkey = np.where(np.isfinite(ent.min(axis=1)), ent.argmin(axis=1), NB8)
demand = bhit.sum(axis=1)
print(f"per-ray bank demand: mean {demand.mean():.2f} max {demand.max()}",
      flush=True)

octant = ((d2[:, 0] >= 0) * 4 + (d2[:, 1] >= 0) * 2
          + (d2[:, 2] >= 0)).astype(np.int64)
orders = {
    "hitorder": np.arange(R1r),
    "banksort": np.argsort(bankkey, kind="stable"),
    "bank+oct": np.argsort(bankkey * 8 + octant, kind="stable"),
}


def pad_to(dev, n):
    out = np.zeros((3, n), F32)
    out[:, :dev.shape[0]] = dev.T
    return out


@jax.jit
def tr_stats(o_, d_, a_, e_):
    out = trace_streamed_pallas(o_, d_, a_, eng.slt_i, eng.slt_s, eng.s_ab,
                                eng.s_bank_ab, P, RB, excl=e_, stats=True)
    vis = out[11].reshape(NC1, RB)[:, 0]
    pas = out[12].reshape(NC1, RB)[:, 0]
    return vis, pas, out[1]


@jax.jit
def tr_loop(o_, d_, a_, e_):
    def body(i, c):
        out = trace_streamed_pallas(o_ + c * jnp.float32(1e-30), d_, a_,
                                    eng.slt_i, eng.slt_s, eng.s_ab,
                                    eng.s_bank_ab, P, RB, excl=e_)
        return out[0, 0]
    return jax.lax.fori_loop(0, 4, body, jnp.float32(0.0))


sc_ = None
tc = None
for name, idx in orders.items():
    O_ = jnp.asarray(pad_to(o2[idx], R1))
    D_ = jnp.asarray(pad_to(d2[idx], R1))
    A_ = jnp.asarray((np.arange(R1) < R1r).astype(F32))
    E_ = jnp.asarray(np.pad(pid[idx].astype(F32), (0, R1 - R1r))[None, :])
    if sc_ is None:
        sc_ = tr_stats.lower(O_, D_, A_, E_).compile(
            compiler_options=VMEM_OPT)
        tc = tr_loop.lower(O_, D_, A_, E_).compile(
            compiler_options=VMEM_OPT)
    vis, pas, ids = sc_(O_, D_, A_, E_)
    vis = np.asarray(vis); pas = np.asarray(pas)
    hits1 = int((np.asarray(ids) != 0).sum())
    x = tc(O_, D_, A_, E_); np.asarray(x)
    best = np.inf
    for _ in range(2):
        tA = time.perf_counter()
        x = tc(O_, D_, A_, E_); np.asarray(x)
        best = min(best, (time.perf_counter() - tA) / 4)
    print(f"{name}: visits {vis.sum():.0f} (mean/chunk {vis.mean():.1f}) "
          f"passes {pas.sum():.0f} kernel {best*1e3:.1f} ms "
          f"hits {hits1}", flush=True)

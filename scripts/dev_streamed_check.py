"""Dev check: streamed-bank kernel == resident per-lane kernel, bitwise.

Small random sphere scene at a tiny page size so it spans several banks;
interpret mode on CPU.  Compares nearest-hit rows, any_hit/excl occlusion,
and the fused trace+shade state update.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "1")

import jax
import jax.numpy as jnp
import numpy as np

from rust_raytrace_tpu import math3d as m3
from rust_raytrace_tpu.geometry import make_sphere
from rust_raytrace_tpu.materials import matte
from rust_raytrace_tpu.ops.compact import STATE_ROWS
from rust_raytrace_tpu.ops.intersect_perlane import (
    build_perlane_tables, trace_perlane_pallas, trace_shade_perlane_pallas)
from rust_raytrace_tpu.ops.intersect_streamed import (
    build_streamed_tables, trace_shade_streamed_pallas,
    trace_streamed_pallas)
from rust_raytrace_tpu.ops.pages import build_pages_kd
from rust_raytrace_tpu.scene import assemble

F32 = jnp.float32


def main():
    cpus = jax.local_devices(backend="cpu")
    jax.config.update("jax_default_device", cpus[0])

    s = make_sphere((0.0, 0.0, 6.0), 2.5, (40, 40),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    scene = assemble([s])
    P = 8
    pages = build_pages_kd(scene.tris, page_size=P)
    NP = pages.num_pages
    NB = -(-NP // 128)
    print(f"tris {len(scene.tris) - 1}  P={P} NP={NP} banks={NB}")
    assert NB >= 3, "need a multi-bank scene for this check"

    plt_i, plt_s, ab = build_perlane_tables(pages)
    si, ss, sab, sbab = build_streamed_tables(pages)
    plt_i, plt_s, ab = map(jnp.asarray, (plt_i, plt_s, ab))
    si, ss, sab, sbab = map(jnp.asarray, (si, ss, sab, sbab))

    rng = np.random.default_rng(0)
    R = 512
    RB = 256
    o = rng.normal(size=(3, R)).astype(np.float32) * 0.5
    d = rng.normal(size=(3, R)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    # aim roughly at the sphere so many rays hit
    d = d * 0.6 + np.array([[0.0], [0.0], [1.0]], np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    alive = (rng.random(R) > 0.1).astype(np.float32)
    o, d, alive = jnp.asarray(o), jnp.asarray(d), jnp.asarray(alive)

    # --- nearest hit ---
    ref = trace_perlane_pallas(o, d, alive, plt_i, plt_s, ab, P, RB,
                               interpret=True)
    got = trace_streamed_pallas(o, d, alive, si, ss, sab, sbab, P, RB,
                                interpret=True)
    ref, got = np.asarray(ref), np.asarray(got)
    bad = ~((ref == got) | (np.isnan(ref) & np.isnan(got)))
    print("nearest: rows x lanes differing:", bad.sum(),
          "of", ref.size)
    if bad.any():
        r, c = np.argwhere(bad)[0]
        print("  first diff row", r, "lane", c, ref[:, c], got[:, c])
        sys.exit(1)

    # --- any_hit with exclusion (the shadow feeler contract: ROW_ID only)
    hid = ref[1]
    excl = jnp.asarray(hid[None, :])
    refA = trace_perlane_pallas(o, d, alive, plt_i, plt_s, ab, P, RB,
                                interpret=True, excl=excl, any_hit=True)
    gotA = trace_streamed_pallas(o, d, alive, si, ss, sab, sbab, P, RB,
                                 interpret=True, excl=excl, any_hit=True)
    occ_r = (np.asarray(refA)[1] != 0.0)
    occ_g = (np.asarray(gotA)[1] != 0.0)
    print("any_hit: occlusion bit differing:", (occ_r != occ_g).sum())
    if (occ_r != occ_g).any():
        sys.exit(1)

    # --- fused trace+shade ---
    arow = alive[None, :]
    state = jnp.concatenate(
        [o, d, arow, arow, jnp.zeros((STATE_ROWS - 8, R), F32)], axis=0)
    seed = jnp.asarray([123, 456], jnp.uint32)
    for fixed in (True, False):
        refF = trace_shade_perlane_pallas(
            state, plt_i, plt_s, ab, seed, P, RB, fixed_rng=fixed,
            weight_cutoff=0.0, interpret=True)
        gotF = trace_shade_streamed_pallas(
            state, si, ss, sab, sbab, seed, P, RB, fixed_rng=fixed,
            weight_cutoff=0.0, interpret=True)
        rF, gF = np.asarray(refF), np.asarray(gotF)
        dF = ~((rF == gF) | (np.isnan(rF) & np.isnan(gF)))
        print(f"fused fixed_rng={fixed}: differing:", dF.sum())
        if dF.any():
            r, c = np.argwhere(dF)[0]
            print("  first diff row", r, "lane", c,
                  np.asarray(refF)[:, c], np.asarray(gotF)[:, c])
            sys.exit(1)

    # --- chunk_live / grid_live skipping ---
    cl = jnp.asarray([1, 0], jnp.int32)
    refC = trace_shade_perlane_pallas(
        state, plt_i, plt_s, ab, seed, P, RB, fixed_rng=True,
        weight_cutoff=0.0, interpret=True, chunk_live=cl)
    gotC = trace_shade_streamed_pallas(
        state, si, ss, sab, sbab, seed, P, RB, fixed_rng=True,
        weight_cutoff=0.0, interpret=True, chunk_live=cl)
    rC, gC = np.asarray(refC), np.asarray(gotC)
    dC = ~((rC == gC) | (np.isnan(rC) & np.isnan(gC)))
    print("chunk_live: differing:", dC.sum())
    if dC.any():
        sys.exit(1)

    print("OK: streamed == resident per-lane, bitwise")


if __name__ == "__main__":
    main()

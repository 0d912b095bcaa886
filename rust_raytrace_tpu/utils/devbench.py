"""Amortized device-only throughput measurement (shared by bench.py and the
on-chip probes).

The chip sits behind a network tunnel: a single dispatch+fetch pays a ~30 ms
round trip no on-prem deployment sees (profiler-verified, docs/PERF.md
finding 16), and `jax.block_until_ready` returns early.  So the device
metric is measured as ND renders inside ONE jit (lax.fori_loop) synced by a
tiny fetch: the XLA program's own sustained per-render time.  The loop carry
perturbs the origin by 1e-30 (vanishes in f32: renders stay bit-identical)
so the body cannot be folded, and accumulates the wave counts so the
rays-numerator comes from the same keys as the timed work.
"""

import time

import numpy as np


def device_metric(eng, vp, ND: int = 8, nruns: int = 2, spp: int = 1,
                  compiler_options=None, cb=None, runs_out=None,
                  wave0_skippable: bool = False,
                  wave0_fused_lights: bool = False):
    """Returns (mrays_per_sec, seconds_per_render, rays_per_render) for the
    compacted production engine on the real chip.

    compiler_options: optional dict forwarded to the XLA compile (e.g.
    {"xla_tpu_scoped_vmem_limit_kib": "65536"} for scenes whose per-lane
    tables exceed the default 16 MiB scoped-vmem budget).  On a directly
    attached TPU the same flags can ride XLA_FLAGS; through the axon
    tunnel only per-compile options reach the server-side compiler.

    runs_out: optional list — every run's (mrays, seconds) is appended so
    callers can report run-to-run variance, not just the best
    (VERDICT r4: drift claims must be auditable).  wave0_skippable: probe
    knob reproducing the round-4 wave-0 kernel shape (engine docstring)."""
    import jax
    import jax.numpy as jnp

    from ..engine import _camera_rays_tiled, _render_device_compact, pick_tile

    if getattr(eng, "_auto_schedule", False) \
            and jax.default_backend() == "tpu":
        # one full render autotunes the compaction-boundary schedule from
        # the measured wave decay before the timed loop compiles against it
        eng.render(vp, key=jax.random.PRNGKey(7))
    key = jax.random.PRNGKey(0)
    rb = eng.ray_chunk
    R0 = vp.height * vp.width * spp
    quantum = max(rb, 128)
    R = -(-R0 // quantum) * quantum
    tile = pick_tile(vp.width, vp.height)
    o, d = _camera_rays_tiled(
        jnp.asarray(vp.orig), jnp.asarray(vp.cam), jnp.asarray(vp.vu),
        jnp.asarray(vp.vv), key, width=vp.width, height=vp.height,
        spp=spp, tile=tile, n_pad=R)
    alive = jnp.arange(R) < R0
    ob = jnp.broadcast_to(jnp.asarray(vp.cam)[:, None], o.shape)
    cam_key = tuple(np.asarray(vp.cam, dtype=np.float32).tolist())
    pk0 = eng._pk0_cache.get(cam_key)
    lights = eng.scene.lights
    F32 = jnp.float32

    @jax.jit
    def dev_loop(key0, o_):
        def body(i, c):
            pert, rays = c
            img, wc = _render_device_compact(
                eng.tensors, eng.aabb_lo, eng.aabb_hi,
                o_ + pert * F32(1e-30), d, alive,
                jax.random.fold_in(key0, i),
                maxdepth=vp.maxdepth, ray_chunk=rb,
                page_size=eng.page_size, fixed_rng=False, interpret=False,
                want_primary=False, quantize=True,
                has_lights=lights is not None,
                light_orig=(jnp.asarray(lights.orig, dtype=F32)
                            if lights is not None else None),
                light_len2=(jnp.asarray(lights.len2, dtype=F32)
                            if lights is not None else None),
                weight_cutoff=eng.weight_cutoff, pk0=pk0, nbuf=eng.nbuf,
                plt_i=eng.plt_i, plt_s=eng.plt_s, ab_tab=eng.ab_tab,
                slt_i=eng.slt_i, slt_s=eng.slt_s, s_ab=eng.s_ab,
                s_bank_ab=eng.s_bank_ab,
                ncompact=eng.ncompact, bounce_rb=eng.bounce_chunk,
                gate_frac=eng.gate_frac, bank_major=eng.bank_major,
                wave0_skippable=wave0_skippable,
                wave0_fused_lights=wave0_fused_lights,
                **({} if cb is None else {"cb": cb}))[:2]
            return (img[0, 0].astype(F32),
                    rays + jnp.sum(wc, dtype=jnp.int32))
        return jax.lax.fori_loop(0, ND, body, (F32(0.0), jnp.int32(0)))

    if compiler_options is not None:
        dev_loop = dev_loop.lower(key, ob).compile(
            compiler_options=compiler_options)
    x, _ = dev_loop(key, ob)
    np.asarray(x)                            # compile + warm
    best = None
    for i in range(nruns):
        t0 = time.perf_counter()
        x, rays_tot = dev_loop(jax.random.PRNGKey(100 + i), ob)
        np.asarray(x)
        dt = (time.perf_counter() - t0) / ND
        rays = int(np.asarray(rays_tot)) // ND
        mr = rays / dt / 1e6
        if runs_out is not None:
            runs_out.append((mr, dt))
        if best is None or mr > best[0]:
            best = (mr, dt, rays)
    return best

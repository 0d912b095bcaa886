"""Production render engine: culled, fully-on-device, gather-free wavefront.

This is the full TPU translation of the reference's GPU workqueue architecture
(cuda_raytrace_lib/src/cuda_raytrace.rs:277-515), generalized to all shading
depths:

  reference (per ray)                      this engine (per 1024-ray chunk)
  -----------------------------------     --------------------------------------
  get_all_objects_for_ray: host octree     packet cull: device interval test of
  walk -> ordered leaf tri lists           chunk bounds vs KD-page AABBs
  BTreeMap ordered by box tmin             per-chunk page list argsorted by
  (raytrace.rs:1052-1077)                  conservative entry distance
  cycles of <=512 rays, best-hit carry     trace megakernel: per chunk, double-
  (cuda_raytrace.rs:340-504)               buffered page DMA + running winner
                                           STATE (t, id, normal, material) via
                                           in-kernel masked reductions
  front-to-back early exit (disabled by    chunk-granular early exit on the
  `|| true`, cuda_raytrace.rs:441)         next page's entry bound (enabled!)
  per-cycle SoA repack + H2D upload        scene resident in HBM

Hard-won platform constraints that shaped this design (single v5e via a
network tunnel):
  - host<->device round trips cost 30-65 ms  -> per-wave scheduling state
    (page lists) lives on device; a render is ONE dispatch chain;
  - XLA gathers/scatters at 3.7M rays cost 0.5-75 s -> the kernel RETURNS the
    winner's full shading state, shading is pure elementwise math, and there
    is no active-ray compaction (dead SIMD lanes are free; the packet cull
    sees only live rays via the valid mask, so dead rays never add pages).

Primary rays are EMITTED in square-tile order (computed by index arithmetic,
not permutation gathers) so chunk direction cones stay tight for the packet
cull; the final image is un-permuted once on the host in numpy.
"""

import functools
import math
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import math3d as m3
from .camera import Viewport
from .ops.cull import (chunk_bounds, chunk_bounds_octants, cull_mask_tmin,
                       cull_mask_tmin_octants)
from .ops.cull_pallas import cull_mask_exact_pallas
from .ops.compact import (DEFAULT_CB, ROW_ACC, ROW_ALIVE, ROW_DEAD, ROW_W,
                          STATE_ROWS, compact_meta, compact_pallas,
                          expand_pallas, make_dead_array)
from .ops.intersect_pallas import (ROW_ALPHA, ROW_COLOR, ROW_ENC, ROW_ID,
                                   ROW_NORM, ROW_SCAT, ROW_T,
                                   TRACE_ROWS as TRACE_ROWS_TOTAL,
                                   fold_pages_origin, trace_chunks_pallas,
                                   trace_shade_chunks_pallas)
from .ops.intersect_perlane import (build_perlane_tables,
                                    trace_perlane_pallas,
                                    trace_shade_perlane_pallas)
from .ops.intersect_streamed import (build_streamed_tables,
                                     trace_shade_bankmajor_pallas,
                                     trace_shade_streamed_pallas,
                                     trace_streamed_pallas)
from .ops.pages import build_pages_kd
from .ops.shade import shade_pallas
from .render import (KIND_MATTE, KIND_REFLECTIVE, RayCaster, RenderResult,
                     SceneTensors, _unit, upload_scene)
from .scene import Scene

F32 = jnp.float32

SKY = jnp.asarray(m3.make_color((128, 180, 255)))


def pick_tile(width: int, height: int) -> int:
    for t in (32, 16, 8):
        if width % t == 0 and height % t == 0:
            return t
    return 1


def tile_permutation(height: int, width: int, spp: int, tile: int) -> np.ndarray:
    """perm[q] = row-major ray index of tile-major position q (host side)."""
    rows = np.arange(height)
    cols = np.arange(width)
    order = []
    for tr in range(0, height, tile):
        for tc in range(0, width, tile):
            rr, cc = np.meshgrid(rows[tr:tr + tile], cols[tc:tc + tile],
                                 indexing="ij")
            order.append((rr * width + cc).reshape(-1))
    order = np.concatenate(order)
    if spp > 1:
        order = (order[:, None] * spp + np.arange(spp)[None, :]).reshape(-1)
    return order.astype(np.int64)


def _unit_rows(v):
    """Normalize [3, R] column vectors."""
    return v * jax.lax.rsqrt(jnp.sum(v * v, axis=0, keepdims=True))


def _random_unit_rows(key, r):
    """`random_vec` (raytrace.rs:188-192) as [3, R] columns."""
    v = jax.random.uniform(key, (3, r), dtype=F32) - F32(0.5)
    return _unit_rows(v)


def _threefry2x32(k0, k1, x0, x1):
    """Threefry-2x32 (20 rounds; Salmon et al., SC'11) on uint32 vectors.

    A counter-based PRNG evaluated per element: the output depends only on
    (key, counter), never on array shape or slicing — which is exactly what
    position-keyed camera jitter needs (see _pos_uniform).  Returns the
    first output word.
    """
    rot = (13, 15, 26, 6, 17, 29, 16, 24)
    k2 = k0 ^ k1 ^ jnp.uint32(0x1BD11BDA)
    ks = (k0, k1, k2)
    x0 = x0 + k0
    x1 = x1 + k1

    def rotl(v, r):
        return (v << jnp.uint32(r)) | (v >> jnp.uint32(32 - r))

    for block in range(5):
        for r in range(4):
            x0 = x0 + x1
            x1 = rotl(x1, rot[(block % 2) * 4 + r])
            x1 = x1 ^ x0
        x0 = x0 + ks[(block + 1) % 3]
        x1 = x1 + ks[(block + 2) % 3] + jnp.uint32(block + 1)
    return x0


def _pos_uniform(key, q, salt: int):
    """Uniform [0,1) f32 keyed by ABSOLUTE stream position q (uint32 vector).

    jax.random.uniform(key, (n,)) seeds its counter at the array's own
    index 0, so a band/shard drawing its slice of jitter would get values
    that depend on where the slice starts — banded renders could never be
    bit-equal to the full render at spp > 1 (raytrace.rs:1374-1394 draws
    jitter per pixel_ray call, which the row queue replays identically for
    any row split; this is the TPU analog of that property).  Hashing the
    absolute position through a counter-based threefry makes the draw a
    pure function of (key, salt, q): any window of the stream reproduces
    the full render's values bitwise.
    """
    kd = jax.random.key_data(jax.random.fold_in(key, salt))
    kd = kd.reshape(-1).astype(jnp.uint32)
    bits = _threefry2x32(kd[0], kd[1], q.astype(jnp.uint32),
                         jnp.zeros_like(q, dtype=jnp.uint32))
    # 24 high bits -> multiples of 2^-24 in [0, 1)
    return (bits >> jnp.uint32(8)).astype(F32) * F32(1.0 / (1 << 24))


@functools.partial(jax.jit, static_argnames=("width", "height", "spp", "tile",
                                             "n_pad", "q_base"))
def _camera_rays_tiled(orig, cam, vu, vv, key, *, width: int, height: int,
                       spp: int, tile: int, n_pad: int, q_base: int = 0):
    """Primary rays emitted directly in tile-major order (pixel_ray semantics,
    raytrace.rs:1374-1394) — index arithmetic only, no permutation gathers.

    Returns (o, d) as [3, n_pad] xyz-major columns ([R, 3] arrays lane-pad
    42x on TPU); positions beyond height*width*spp have d = 0 (invalid lanes).
    q_base: tile-major stream offset — rays for positions q_base..q_base+n_pad
    of the FULL image's stream (banded rendering: the same index arithmetic
    on absolute positions makes a band's rays bitwise identical to the full
    render's).
    """
    R0 = height * width * spp
    q = jnp.arange(n_pad) + q_base
    pix = q // spp if spp > 1 else q
    T = tile
    tpr = width // T
    tile_id = pix // (T * T)
    within = pix % (T * T)
    row = ((tile_id // tpr) * T + within // T).astype(F32)
    col = ((tile_id % tpr) * T + within % T).astype(F32)

    if spp == 1:
        u_off = v_off = F32(0.5)          # raytrace.rs:1382-1386
    else:
        # position-keyed jitter: a pure function of (key, absolute stream
        # position), so any band/shard window of the stream draws the SAME
        # values the full render does (bit-exact banding at spp > 1)
        u_off = _pos_uniform(key, q, 1_000_001)
        v_off = _pos_uniform(key, q, 1_000_002)

    vu_delta = vu * (F32(1.0) / F32(width))
    vv_delta = vv * (F32(1.0) / F32(height))
    px_u = (orig[:, None] + vu_delta[:, None] * (col + u_off)[None, :]
            + vv_delta[:, None] * (row + v_off)[None, :])       # [3, n_pad]
    d = _unit_rows(px_u - cam[:, None])
    live = (q < R0)[None, :]
    return jnp.where(live, px_u, 0.0), jnp.where(live, d, 0.0)


def _shade_rows(rows, o, d, weight, valid, rv, shadowed=None):
    """Elementwise shading from trace-kernel winner rows ([16, R]).

    Same color algebra as render.shade_active (project_ray/color_ray,
    raytrace.rs:1199-1295) but with all winner data inline — no gathers.
    o, d, rv: [3, R] columns.  `shadowed` ([R] bool) blacks out the surface
    color term (the commented shadow design, raytrace.rs:1203-1224).
    Returns (contrib [3, R], weight', alive', o', d').
    """
    t = rows[ROW_T:ROW_T + 1]                       # [1, R]
    miss = rows[ROW_ID:ROW_ID + 1] == 0.0
    norm = rows[ROW_NORM:ROW_NORM + 3]              # [3, R]
    enc = rows[ROW_ENC:ROW_ENC + 1]
    kind = jnp.mod(enc, 4.0)
    edge = jnp.mod(jnp.floor(enc / 4.0), 2.0) == 1.0
    back = enc >= 8.0
    color = rows[ROW_COLOR:ROW_COLOR + 3]           # [3, R]
    if shadowed is not None:
        color = jnp.where(shadowed[None, :], 0.0, color)
    alpha = rows[ROW_ALPHA:ROW_ALPHA + 1]
    scat = rows[ROW_SCAT:ROW_SCAT + 1]
    valid = valid[None, :]                          # [1, R]

    norm_f = jnp.where(back, -norm, norm)
    is_scatter = (~miss) & (~edge) & ((kind == KIND_MATTE) |
                                      (kind == KIND_REFLECTIVE))
    is_terminal = valid & ~is_scatter
    scatter_live = valid & is_scatter

    surf_color = jnp.where(edge, 0.0, color)
    term_color = jnp.where(miss, SKY[:, None], surf_color)
    w = weight[None, :]
    contrib = jnp.where(is_terminal, w * term_color, 0.0)
    contrib = contrib + jnp.where(scatter_live,
                                  w * color * (F32(1.0) - alpha), 0.0)
    weight = jnp.where(scatter_live[0], weight * alpha[0], weight)

    point = o + t * d
    matte_dir = _unit_rows(norm_f + rv)
    matte_orig = point + rv * F32(0.001)
    ddot = jnp.abs(jnp.sum(d * norm_f, axis=0, keepdims=True))
    refl_dir = _unit_rows(d + 2.0 * norm_f * ddot + rv * scat)
    refl_orig = point + refl_dir * F32(0.001)

    is_matte = kind == KIND_MATTE
    new_o = jnp.where(is_matte, matte_orig, refl_orig)
    new_d = jnp.where(is_matte, matte_dir, refl_dir)

    o = jnp.where(scatter_live, new_o, o)
    d = jnp.where(scatter_live, new_d, d)
    return contrib, weight, scatter_live[0], o, d


@functools.partial(jax.jit,
                   static_argnames=("maxdepth", "ray_chunk", "page_size",
                                    "fixed_rng", "interpret", "want_primary",
                                    "quantize", "spp", "has_lights",
                                    "weight_cutoff", "bounce_chunk",
                                    "nbuf", "exact_cull"))
def _render_device(st: SceneTensors, aabb_lo, aabb_hi, o, d, alive0, key,
                   maxdepth: int, ray_chunk: int, page_size: int,
                   fixed_rng: bool, interpret: bool, want_primary: bool,
                   quantize: bool, spp: int, has_lights: bool = False,
                   light_orig=None, light_len2=None,
                   weight_cutoff: float = 0.0, bounce_chunk: int = 0,
                   pk0=None, nbuf: int = 2, exact_cull: bool = False):
    """Full multi-wave render on padded tile-order rays ([3, R], R % RB == 0).

    Returns (img [3, R or R/spp] in tile order, wave_counts [maxdepth],
    primary rows [2, R] = (t, id) or None when !want_primary).  With
    `quantize`, samples are box-filter averaged (raytrace.rs:1426) and
    quantized to u8 ON DEVICE with the PNG writer's exact `(c*255) as u8`
    semantics (raytrace.rs:1470-1472) — a 4x smaller device->host transfer,
    which dominates wall time on a tunneled TPU.
    """
    R = o.shape[1]
    RB = ray_chunk
    accum = jnp.zeros((3, R), dtype=F32)
    weight = jnp.ones((R,), dtype=F32)
    alive = alive0

    wave_counts = []
    primary = None

    for wave in range(maxdepth):
        # Bounce waves may use a smaller chunk (tighter bounds around sparse
        # surviving rays -> fewer pages per chunk); chunking is just a view.
        rb_w = RB if wave == 0 or not bounce_chunk else bounce_chunk
        wave_counts.append(jnp.sum(alive, dtype=jnp.int32))
        o_m = jnp.where(alive[None, :], o, 0.0)
        d_m = jnp.where(alive[None, :], d, 0.0)

        if exact_cull:
            # exact per-ray slab tests, chunk-reduced (tightest page lists);
            # one Pallas kernel — the lax.map XLA form costs ~37 ms/wave in
            # map scheduling alone (ops/cull_pallas.py)
            mask, tmin = cull_mask_exact_pallas(o_m, d_m, alive, aabb_lo,
                                                aabb_hi, rb_w,
                                                interpret=interpret)
        elif wave == 0:
            # primary chunks are coherent tiles: one bound suffices
            olo, ohi, dlo, dhi = chunk_bounds(o_m, d_m, alive, rb_w)
            mask, tmin = cull_mask_tmin(olo, ohi, dlo, dhi, aabb_lo, aabb_hi)
        else:
            # bounce chunks mix scatter directions: split by octant
            b8 = chunk_bounds_octants(o_m, d_m, alive, rb_w)
            mask, tmin = cull_mask_tmin_octants(*b8, aabb_lo, aabb_hi)
        counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
        plist = jnp.argsort(tmin, axis=1, stable=True).astype(jnp.int32)
        # sorted VALUES via a second sort, not a gather: take_along_axis at
        # [NC, NP] is an XLA gather (~67 ms at NP=1784, probe_r3j/k);
        # jnp.sort yields identical f32 values for ~3 ms
        ptmin = jnp.sort(tmin, axis=1)

        if wave == 0 and pk0 is not None:
            # pinhole primaries: origin folded into page scalars (half the
            # per-pair dot products; see fold_pages_origin)
            rows = trace_chunks_pallas(o_m, d_m, pk0, counts, plist, ptmin,
                                       page_size, rb_w, interpret=interpret,
                                       zero_origin=True, nbuf=nbuf)
        else:
            rows = trace_chunks_pallas(o_m, d_m, st.PK, counts, plist, ptmin,
                                       page_size, rb_w, interpret=interpret,
                                       nbuf=nbuf)
        if wave == 0 and want_primary:
            primary = rows[ROW_T:ROW_ID + 1]

        if fixed_rng:
            rv = jnp.broadcast_to(
                _unit(jnp.asarray([0.36, 0.48, 0.8], dtype=F32))[:, None],
                (3, R))
        else:
            rv = _random_unit_rows(jax.random.fold_in(key, wave), R)

        shadowed = None
        if has_lights:
            # Shadow-ray pass (commented reference design, raytrace.rs:
            # 600-610, 1203-1224): jittered ray to the light from each hit;
            # shadowed if any OTHER triangle intersects it.
            hid = rows[ROW_ID:ROW_ID + 1]
            hit_mask = alive[None, :] & (hid != 0.0)
            t_row = rows[ROW_T:ROW_T + 1]
            point = o_m + jnp.where(hit_mask, t_row, 0.0) * d_m
            nrm = rows[ROW_NORM:ROW_NORM + 3]
            back = rows[ROW_ENC:ROW_ENC + 1] >= 8.0
            norm_f = jnp.where(back, -nrm, nrm)
            skey = jax.random.fold_in(key, 7_000_000 + wave)
            if fixed_rng:
                u3 = jnp.full((3, R), 0.5, F32)
                u1 = jnp.full((1, R), 0.5, F32)
            else:
                u3 = jax.random.uniform(jax.random.fold_in(skey, 0), (3, R),
                                        dtype=F32)
                u1 = jax.random.uniform(jax.random.fold_in(skey, 1), (1, R),
                                        dtype=F32)
            adj = light_orig[:, None] + u3 * light_len2
            sd = _unit_rows(adj - point)
            so = point + norm_f * (F32(0.005) * (u1 + F32(1.0)))
            so_m = jnp.where(hit_mask, so, 0.0)
            sd_m = jnp.where(hit_mask, sd, 0.0)
            sb8 = chunk_bounds_octants(so_m, sd_m, hit_mask[0], rb_w)
            smask, stmin = cull_mask_tmin_octants(*sb8, aabb_lo, aabb_hi)
            scounts = jnp.sum(smask, axis=1, dtype=jnp.int32)
            splist = jnp.argsort(stmin, axis=1, stable=True).astype(jnp.int32)
            sptmin = jnp.sort(stmin, axis=1)
            # Any-other-occluder semantics (oracle.is_shadowed, the commented
            # design at raytrace.rs:1204-1224): the origin triangle is
            # excluded IN-KERNEL so a farther real occluder behind a backlit
            # self-hit is still found.
            sexcl = jnp.where(hit_mask, hid, 0.0)
            srows = trace_chunks_pallas(so_m, sd_m, st.PK, scounts, splist,
                                        sptmin, page_size, rb_w,
                                        interpret=interpret, nbuf=nbuf,
                                        excl=sexcl)
            sid = srows[ROW_ID:ROW_ID + 1]
            shadowed = (hit_mask & (sid != 0.0))[0]

        contrib, weight, alive, o, d = _shade_rows(rows, o_m, d_m, weight,
                                                   alive, rv, shadowed)
        accum = accum + contrib
        if weight_cutoff > 0.0:
            # A ray's entire remaining contribution is bounded by its weight
            # (colors <= 1), so terminating below ~1/2 of a u8 quantization
            # step is visually lossless; 0.0 disables (bit-exact mode).
            alive = alive & (weight > weight_cutoff)

    img = accum
    if quantize:
        if spp > 1:
            img = _box_filter(img, R, spp)
        x = jnp.nan_to_num(img * F32(255.0), nan=0.0, posinf=255.0,
                           neginf=0.0)
        img = jnp.clip(jnp.trunc(x), 0.0, 255.0).astype(jnp.uint8)
    return img, jnp.stack(wave_counts), primary


def _quantize_u8(img):
    """PNG writer's exact `(c*255) as u8` semantics (raytrace.rs:1470-1472)."""
    x = jnp.nan_to_num(img * F32(255.0), nan=0.0, posinf=255.0, neginf=0.0)
    return jnp.clip(jnp.trunc(x), 0.0, 255.0).astype(jnp.uint8)


def _device_quantizable(spp: int) -> bool:
    """True when on-device quantization is provably byte-equal to host
    quantization of the float render (the repo's PNG-semantics contract:
    u8 images == utils.png.quantize_u8(float image) always).

    Two float hazards make this spp-dependent:
      - division: XLA may compile _box_filter's `acc / spp` as a
        reciprocal multiply; 1/spp is exact in f32 only for powers of two
        (spp=3 measured a 1-step flip where mean*255 lands on an integer —
        ADVICE r3: host 164.99998 -> 164 vs device 165.0 -> 165);
      - association: the host float path averages with np.mean, whose
        summation is sequential only below numpy's 8-element unroll;
        _box_filter's explicit left-to-right chain matches it for spp < 8.
    Both hold exactly for spp in {1, 2, 4}; anything else renders float on
    device and quantizes on host (quantize=True still always returns u8).
    """
    return spp in (1, 2, 4)


def _box_filter(img, R: int, spp: int):
    """On-device box-filter sample average (raytrace.rs:1426) with an
    EXPLICIT left-to-right add chain instead of a reduce: XLA's `reduce`
    association order is implementation-defined and was observed to differ
    between the compact and legacy programs (round-10 soak, seed 741 —
    a pixel whose mean*255 lands exactly on a quantization boundary
    flipped by 1 u8 step).  A fixed add chain makes the filter bit-equal
    across programs AND matches np.mean's sequential summation order on
    the host float path for spp < 8 (numpy unrolls to 8 accumulators at
    8+).  The division is only exact for power-of-two spp (XLA may emit a
    reciprocal multiply) — _device_quantizable gates device quantization
    to spp where BOTH properties hold."""
    s = img.reshape(3, R // spp, spp)
    acc = s[..., 0]
    for i in range(1, spp):
        acc = acc + s[..., i]
    return acc / F32(spp)


def _shadow_mask(st: SceneTensors, aabb_lo, aabb_hi, o_m, d_m, alive, rows,
                 key, wave, fixed_rng, light_orig, light_len2, page_size,
                 ray_chunk, interpret, nbuf, plt_i=None, plt_s=None,
                 ab_tab=None, slt_i=None, slt_s=None, s_ab=None,
                 s_bank_ab=None):
    """Shadow-ray pass (commented reference design, raytrace.rs:600-610,
    1203-1224): jittered ray to the light from each hit; shadowed if any
    OTHER triangle intersects it (origin triangle excluded in-kernel)."""
    R = o_m.shape[1]
    hid = rows[ROW_ID:ROW_ID + 1]
    hit_mask = alive[None, :] & (hid != 0.0)
    t_row = rows[ROW_T:ROW_T + 1]
    point = o_m + jnp.where(hit_mask, t_row, 0.0) * d_m
    nrm = rows[ROW_NORM:ROW_NORM + 3]
    back = rows[ROW_ENC:ROW_ENC + 1] >= 8.0
    norm_f = jnp.where(back, -nrm, nrm)
    skey = jax.random.fold_in(key, 7_000_000 + wave)
    if fixed_rng:
        u3 = jnp.full((3, R), 0.5, F32)
        u1 = jnp.full((1, R), 0.5, F32)
    else:
        u3 = jax.random.uniform(jax.random.fold_in(skey, 0), (3, R),
                                dtype=F32)
        u1 = jax.random.uniform(jax.random.fold_in(skey, 1), (1, R),
                                dtype=F32)
    adj = light_orig[:, None] + u3 * light_len2
    sd = _unit_rows(adj - point)
    so = point + norm_f * (F32(0.005) * (u1 + F32(1.0)))
    so_m = jnp.where(hit_mask, so, 0.0)
    sd_m = jnp.where(hit_mask, sd, 0.0)
    sexcl = jnp.where(hit_mask, hid, 0.0)
    if slt_i is not None:
        # streamed regime: any_hit over the HBM bank worklist (lanes stop
        # demanding banks at their first occluder)
        srows = trace_streamed_pallas(so_m, sd_m, hit_mask[0], slt_i, slt_s,
                                      s_ab, s_bank_ab, page_size, ray_chunk,
                                      interpret=interpret, excl=sexcl,
                                      any_hit=True)
    elif plt_i is not None:
        # shadow rays are maximally scattered — per-lane traversal, no cull;
        # occlusion needs ANY other hit, not the nearest (any_hit)
        srows = trace_perlane_pallas(so_m, sd_m, hit_mask[0], plt_i, plt_s,
                                     ab_tab, page_size, ray_chunk,
                                     interpret=interpret, excl=sexcl,
                                     any_hit=True)
    else:
        smask, stmin = cull_mask_exact_pallas(so_m, sd_m, hit_mask[0],
                                              aabb_lo, aabb_hi, ray_chunk,
                                              interpret=interpret)
        scounts = jnp.sum(smask, axis=1, dtype=jnp.int32)
        splist = jnp.argsort(stmin, axis=1, stable=True).astype(jnp.int32)
        sptmin = jnp.sort(stmin, axis=1)
        srows = trace_chunks_pallas(so_m, sd_m, st.PK, scounts, splist,
                                    sptmin, page_size, ray_chunk,
                                    interpret=interpret, nbuf=nbuf,
                                    excl=sexcl)
    sid = srows[ROW_ID:ROW_ID + 1]
    return (hit_mask & (sid != 0.0))[0]


@functools.partial(jax.jit,
                   static_argnames=("maxdepth", "ray_chunk", "page_size",
                                    "fixed_rng", "interpret", "want_primary",
                                    "quantize", "has_lights", "weight_cutoff",
                                    "nbuf", "cb", "bounce_rb",
                                    "profile_skip", "ncompact", "spp",
                                    "gate_frac", "wave0_skippable",
                                    "wave0_fused_lights", "bank_major"))
def _render_device_compact(st: SceneTensors, aabb_lo, aabb_hi, o, d, alive0,
                           key, maxdepth: int, ray_chunk: int,
                           page_size: int, fixed_rng: bool, interpret: bool,
                           want_primary: bool, quantize: bool,
                           has_lights: bool = False, light_orig=None,
                           light_len2=None, weight_cutoff: float = 0.0,
                           pk0=None, nbuf: int = 2, cb: int = DEFAULT_CB,
                           bounce_rb: int = 0, plt_i=None, plt_s=None,
                           ab_tab=None, profile_skip: tuple = (),
                           ncompact: int = -1, spp: int = 1,
                           gate_frac=None, slt_i=None, slt_s=None,
                           s_ab=None, s_bank_ab=None,
                           wave0_skippable: bool = False,
                           wave0_fused_lights: bool = False,
                           bank_major: bool = False):
    """Compacted multi-wave render (spp == 1): the production path.

    The reference workqueue retires finished rays and requeues survivors to
    keep cycles full (cuda_raytrace.rs:346-366, 444-456); here each wave's
    survivors are permuted to a prefix of the state array (ops/compact.py),
    so bounce waves run on a few hundred dense chunks instead of thousands of
    sparse ones — both the cull and the trace skip the dead tail entirely.
    Retired rays' accumulated colors are harvested to a dead array and the
    final image is reassembled by reversing the per-wave permutations on
    device (no ray-scale gathers, no host bookkeeping).

    Returns (img [3, R] u8/f32 in ORIGINAL tile order, wave_counts, primary,
    cull0 — the wave-0 (counts, plist) candidate buffers when want_primary).

    ncompact: number of leading wave boundaries that MAY compact (-1 = all,
    i.e. maxdepth-1).  Skipped boundaries keep the previous survivor prefix
    and chunk_live flags, and dead lanes simply ride along (the per-lane
    kernel's count sort parks them in the zero-page class).  gate_frac:
    when set, every eligible boundary additionally SELF-GATES at runtime —
    it compacts only if the padded survivor count is <= gate_frac times the
    current content prefix (see compact_meta; the skip is a traced in-kernel
    identity pass-through costing ~0.1 ms).  Bit-exact for any setting —
    compaction is a reversed permutation either way.
    """
    R = o.shape[1]
    RB = ray_chunk
    NC = R // RB
    # compaction chunk must divide R and be a multiple of the 128-lane
    # DMA alignment; shrink it for small/odd ray counts
    assert R % 128 == 0, f"ray count {R} must be a multiple of 128"
    while R % cb:
        cb //= 2
    cb = max(cb, 128)

    alive_row = alive0.astype(F32)[None, :]
    state = jnp.concatenate(
        [o.astype(F32), d.astype(F32), alive_row, alive_row,
         jnp.zeros((STATE_ROWS - ROW_ACC, R), F32)], axis=0)

    dead_arr = make_dead_array(R)
    dead_base = jnp.int32(0)
    chunk_live = None    # None = all chunks live (cull kernel default)
    grid_live = None     # traced survivor-prefix chunk count (dynamic grid)

    wave_counts = []
    primary = None
    cull0 = None
    prev_alive = None
    metas, masks_list = [], []
    prefix_lanes = None      # traced content extent of state (None = R)
    prefixes = []            # extent BEFORE each boundary (expand grids)

    for wave in range(maxdepth):
        # Bounce waves run on smaller chunks: compaction packs survivors
        # densely, and with scattered directions the per-ray triangle-test
        # count is the chunk's page-union size — smaller chunks mean tighter
        # unions (chunking is only a reshape view of the state array).
        rb_w = RB if (wave == 0 or not bounce_rb) else bounce_rb
        o_w = state[0:3]
        d_w = state[3:6]
        alive = state[ROW_ALIVE] != 0.0
        if wave > 0:
            # refresh chunk liveness EVERY wave (one cheap [NC]-chunk
            # reduce), not just at compaction boundaries: after the last
            # boundary the prefix goes stale, and chunks whose rays have
            # all retired still paid the full per-chunk fixed cost — on
            # the banked per-lane kernel (7 banks: ~56 count slabs + a
            # 112-class sort per chunk) a fully-dead late wave measured
            # 31.6 ms that this flag refresh turns into pass-through
            # copies (synthetic_100k, probe_r6a/r6f).  The kernels'
            # chunk_live skip is the proven boundary mechanism; the flags
            # only ever drop chunks with ZERO live lanes, so this is
            # bit-exact by the same argument.
            chunk_live = jnp.any(alive.reshape(R // rb_w, rb_w),
                                 axis=1).astype(jnp.int32)
        # ray counters (the reference's "Rays" stat, raytrace.rs:1275-1278):
        # waves >= 1 reuse the compaction meta's per-chunk alive counts — a
        # [NC] reduce instead of a fresh full-R reduce every wave
        if wave == 0 or prev_alive is None:
            wave_counts.append(jnp.sum(alive, dtype=jnp.int32))
        else:
            wave_counts.append(prev_alive)
            prev_alive = None    # consumed; recompute unless a compaction
                                 # boundary refreshes it below

        streamed = slt_i is not None
        # wave0_fused_lights routes lights wave 0 through the FUSED
        # per-lane kernel (trace + feeler + shade in one kernel) instead
        # of the unfused chain.  MEASURED SLOWER and off by default:
        # teapot_2k_shadows 227.6 vs 178.6 ms (probe_r15g, 3 same-process
        # reps) — the per-lane traversal of 3.7M tile-coherent camera
        # rays costs far more than the union kernel's shared page stream
        # saves in chain overhead (cull + argsort + any_hit union +
        # standalone shade ~27 ms).  Both shapes are bit-exact equal
        # (dryrun lights checksum byte-identical; test_shadows green on
        # either).  Kept as the measured-out A/B knob.
        perlane = plt_i is not None and (
            wave > 0 or (has_lights and wave0_fused_lights
                         and not want_primary
                         and "trace" not in profile_skip))
        kw = jax.random.fold_in(key, wave)
        seed = (kw if kw.ndim == 1 else jax.random.key_data(kw)) \
            .astype(jnp.uint32)
        if streamed and "trace" not in profile_skip:
            # Streamed regime (scene beyond the resident-table budget):
            # EVERY wave rides the HBM-streamed banked per-lane traversal
            # (ops/intersect_streamed.py) — there is no packet cull or
            # page argsort at all (a [NC, NP] sort at NP ~ 18k would cost
            # more than the trace; each chunk's bank worklist plays the
            # cull's role).  Wave 0 loses the union kernel's shared page
            # stream (~2x on primary rays — tile-coherent groups make the
            # per-lane loop short), bounce waves gain fine-page economics
            # at ANY scene size.  Lights/debug waves run the unfused rows
            # variant + the shared shadow/shade path below.
            if not has_lights and not (wave == 0 and want_primary):
                # DEEP bounce waves (>= 2) ride the BANK-MAJOR sweep: one
                # table DMA per bank per wave + in-sweep winner
                # extraction.  Wave-2+ origins are hit points of
                # SCATTERED rays, so their chunks are spatially
                # DECOHERENT and demand ~30 of the scene's 35 banks each
                # (probe_r16b/d): the worklist kernel re-DMAs ~2.75 MB of
                # tables per (chunk, bank) visit there (256 + 330 ms of
                # synthetic_1m's 767, probe_r16b).  Waves 0-1 keep the
                # worklist kernel: camera chunks are tile-coherent and
                # wave-1 origins (wave-0 hit points) are still
                # image-coherent — 1.7 / 6.9 bank visits per chunk, and
                # the front-to-back cut retires most early (94 / 61 ms).
                # Bit-exact either way (test_streamed.py pins bank-major
                # == worklist on every surface).
                if wave > 1 and bank_major:
                    state = trace_shade_bankmajor_pallas(
                        state, slt_i, slt_s, s_ab, s_bank_ab, seed,
                        page_size, rb_w, fixed_rng=fixed_rng,
                        weight_cutoff=weight_cutoff,
                        chunk_live=chunk_live, interpret=interpret,
                        grid_live=grid_live)
                else:
                    state = trace_shade_streamed_pallas(
                        state, slt_i, slt_s, s_ab, s_bank_ab, seed,
                        page_size, rb_w, fixed_rng=fixed_rng,
                        weight_cutoff=weight_cutoff,
                        chunk_live=chunk_live, interpret=interpret,
                        grid_live=grid_live)
                rows = None
            else:
                rows = trace_streamed_pallas(
                    o_w, d_w, alive, slt_i, slt_s, s_ab, s_bank_ab,
                    page_size, rb_w, chunk_live=chunk_live,
                    interpret=interpret)
        elif perlane and "trace" not in profile_skip:
            # Bounce waves: per-lane traversal (each ray tests only its OWN
            # slab-selected pages — no packet cull or page sort) FUSED with
            # the wave's shade/scatter/state update: the winner rows never
            # leave VMEM (the standalone shade kernel costs ~5 ms/wave in
            # block DMA alone).  Lights configs additionally fuse the
            # SHADOW FEELER between trace and shade (any_hit per-lane
            # traversal on the winner rows while they are still in VMEM —
            # the unfused chain paid a second full trace kernel per wave).
            light4 = None
            if has_lights:
                light4 = jnp.concatenate(
                    [light_orig.reshape(3),
                     jnp.reshape(light_len2, (1,))]).astype(F32)
            state = trace_shade_perlane_pallas(
                state, plt_i, plt_s, ab_tab, seed, page_size, rb_w,
                fixed_rng=fixed_rng, weight_cutoff=weight_cutoff,
                chunk_live=chunk_live, interpret=interpret, light=light4,
                grid_live=grid_live)
            rows = None
        elif "trace" in profile_skip:
            rows = jnp.zeros((TRACE_ROWS_TOTAL, R), F32)
        else:
            # wave 0 (and NP > 128 fallback): coherent chunks + packet cull
            # + XLA argsort (~4 ms; the fused in-kernel rank-sort variant
            # measured ~40 ms/wave slower — see cull_sorted_pallas)
            mask, tmin = cull_mask_exact_pallas(o_w, d_w, alive, aabb_lo,
                                                aabb_hi, rb_w,
                                                chunk_live=chunk_live,
                                                interpret=interpret)
            counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
            plist = jnp.argsort(tmin, axis=1, stable=True).astype(jnp.int32)
            # sorted VALUES via a second sort, not a gather (see wave-0
            # comment above)
            ptmin = jnp.sort(tmin, axis=1)
            zo = wave == 0 and pk0 is not None
            pk_use = pk0 if zo else st.PK
            if not has_lights and not (wave == 0 and want_primary):
                # fused union trace + shade (same fusion rationale as the
                # per-lane bounce path; shade reads the TRUE origin from
                # state rows 0..2 even when the trace runs zero_origin).
                # Fallback bounce waves (plt tables absent) skip retired
                # chunks and the dead tail exactly like the per-lane path.
                # wave 0 compiles the straight-line (non-skippable) kernel
                # shape: all chunks are live by construction, and the
                # always-skippable round-4 shape measured the headline
                # 64.3 -> 60.8 Mrays/s (probe_r15a A/B).  wave0_skippable
                # is the probe knob reproducing the regression shape.
                cl0 = (jnp.ones((R // rb_w,), jnp.int32)
                       if wave0_skippable else None)
                state = trace_shade_chunks_pallas(
                    state, pk_use, counts, plist, ptmin, seed, page_size,
                    rb_w, fixed_rng=fixed_rng, weight_cutoff=weight_cutoff,
                    interpret=interpret, zero_origin=zo, nbuf=nbuf,
                    chunk_live=chunk_live if wave > 0 else cl0,
                    grid_live=grid_live if wave > 0 else None)
                rows = None
            else:
                rows = trace_chunks_pallas(o_w, d_w, pk_use, counts, plist,
                                           ptmin, page_size, rb_w,
                                           interpret=interpret,
                                           zero_origin=zo, nbuf=nbuf)
        if wave == 0 and want_primary:
            primary = rows[ROW_T:ROW_ID + 1]
            if not streamed and "trace" not in profile_skip:
                # primary candidate sets for the ray differ
                # (debug.rs:180-205): each chunk's surviving page list.
                # The streamed regime has no culled page lists (bank
                # worklists play that role in-kernel) — the differ's hit
                # comparison still works, its candidate-set classification
                # degrades gracefully (raydebug handles cull0=None).
                cull0 = (counts, plist)

        if rows is not None:
            shadowed = None
            if has_lights:
                # Wave-0 shadow feelers all point at the same light from
                # tile-coherent hit points — the packet-culled union kernel
                # beats per-lane any_hit on coherent rays (the same reason
                # wave-0 TRACE uses it); bounce waves' shadow passes ride
                # the fused per-lane kernel above.
                shadowed = _shadow_mask(st, aabb_lo, aabb_hi, o_w, d_w,
                                        alive, rows, key, wave, fixed_rng,
                                        light_orig, light_len2, page_size,
                                        rb_w, interpret, nbuf,
                                        plt_i=None if wave == 0 else plt_i,
                                        plt_s=plt_s, ab_tab=ab_tab,
                                        slt_i=slt_i, slt_s=slt_s,
                                        s_ab=s_ab, s_bank_ab=s_bank_ab)

            # Shade + scatter RNG + state update: one chunk-skipping Pallas
            # kernel instead of threefry + ~60 XLA elementwise passes at
            # full R every wave (ops/shade.py).
            state = shade_pallas(
                state, rows, seed, rb=rb_w,
                fixed_rng=fixed_rng, weight_cutoff=weight_cutoff,
                chunk_live=chunk_live,
                shadowed=None if shadowed is None else shadowed[None, :],
                interpret=interpret)

        if isinstance(ncompact, tuple):
            # explicit per-boundary schedule (boundary w = after wave w;
            # auto-planned from measured wave decay, see plan_boundaries —
            # unlike an int prefix it can express skip-then-compact
            # schedules like synthetic_100k's optimal {0,1,3})
            eligible = wave < len(ncompact) and bool(ncompact[wave])
        else:
            nc_lim = (maxdepth - 1) if ncompact < 0 else ncompact
            eligible = wave < nc_lim
        if wave < maxdepth - 1 and eligible \
                and "compact" not in profile_skip:
            # No lax.cond here: a cond around the [16, R] state + dead-array
            # operands costs ~3 ms/wave in XLA branch copies (profiler);
            # both the rare overflow case (>~87% survivors) and the
            # SELF-GATED not-worth-it case (survivors > gate_frac of the
            # current prefix — see compact_meta) ride meta's M_IDENT flag
            # and become in-kernel identity pass-throughs, so the
            # keep-or-compact decision is traced per render at no host
            # sync: the boundary schedule adapts to the scene's actual
            # wave decay instead of a static ncompact.
            meta, total_a, skip, dead_end = compact_meta(
                state[ROW_ALIVE], state[ROW_DEAD], cb, dead_base, R,
                prefix=prefix_lanes, gate_frac=gate_frac)
            masks2 = jnp.stack([state[ROW_ALIVE], state[ROW_DEAD]])
            state, dead_arr = compact_pallas(state, dead_arr, meta, cb=cb,
                                             interpret=interpret,
                                             grid_live=prefix_lanes)
            prefixes.append(prefix_lanes)
            prefix_lanes = jnp.where(
                skip,
                jnp.int32(R) if prefix_lanes is None else prefix_lanes,
                total_a).astype(jnp.int32)
            prev_alive = jnp.sum(meta[:, 0], dtype=jnp.int32)
            dead_base = jnp.where(skip, dead_base, dead_end)
            rb_next = bounce_rb if bounce_rb else RB
            nc_next = R // rb_next
            old_live_nc = jnp.int32(nc_next) if grid_live is None \
                else grid_live
            live_nc = jnp.where(
                skip, old_live_nc,
                jnp.minimum((total_a + rb_next - 1) // rb_next,
                            nc_next)).astype(jnp.int32)
            chunk_live = (jnp.arange(nc_next, dtype=jnp.int32)
                          < live_nc).astype(jnp.int32)
            grid_live = live_nc
            metas.append(meta)
            masks_list.append(masks2)

    # Reassemble: walk the permutations backward so accum lands back in
    # original tile order.  Only rows 8..11 (accum + dead flag) matter for
    # the image — half the expansion payload of the full 8-row harvest.
    # 4 rows (accum + dead flag) even though only accum is consumed: a
    # 3-row expansion payload measured ~1 ms SLOWER on chip (probe_r3i —
    # sub-8-sublane blocks pad back to 8 anyway and lose layout affinity).
    y = state[ROW_ACC:ROW_ACC + 4]
    if "expand" not in profile_skip:
        for w in range(len(metas) - 1, -1, -1):
            # each step's output only needs the prefix the rays lived in
            # BEFORE boundary w (the next step reads nothing past it);
            # boundary 0's prefix is None -> full grid, whole image written
            y = expand_pallas(y, dead_arr, masks_list[w], metas[w],
                              cb=cb, interpret=interpret,
                              grid_live=prefixes[w])

    img = y[0:3]
    if quantize:
        if spp > 1:
            # box-filter sample average (raytrace.rs:1426): a pixel's spp
            # samples ride adjacent lanes in tile order (tile_permutation),
            # so the fold is a reshape — the per-ray pipeline above is
            # sample-count agnostic (samples are just rays).
            img = _box_filter(img, R, spp)
        img = _quantize_u8(img)
    return img, jnp.stack(wave_counts), primary, cull0





def plan_boundaries(wave_rays, tau_mid: float = 0.65,
                    tau_last: float = 0.0):
    """Static compaction-boundary schedule from measured wave decay.

    wave_rays: live-ray count at the START of each wave (a render's
    wave_rays output).  Boundary w (after wave w) pays iff the survivor
    ratio against the CURRENT content prefix is below a threshold that
    shrinks with the number of waves left to amortize the compaction:
    tau_mid when >= 2 waves remain, tau_last (default: NEVER) before the
    final wave.  Thresholds fitted to the chip sweeps (probe_r5b/r6b-r6f,
    docs/PERF.md): teapot live decay [3.69M, 1.24M, 600k, 465k, 120k] ->
    {0,1} (the measured optimum, 104.7 ms with the per-wave chunk-flag
    refresh; b3 ratio 0.78 loses and even b4 at ratio 0.20 measured
    105.4 -> 107.6 when compacted); synthetic_100k [3.69M, 818k, 410k,
    409k, 0] -> {0,1} (its old nc=4 win is superseded by the flag
    refresh: the fully-dead wave 4 costs pass-through copies instead of
    31.6 ms, and compacting b4 on top measured 231.4 -> 234.7); multi
    [3.69M, 2.35M, 1.09M, 731k, 252k] -> {0,1} (243.8 vs 245.6 with b4);
    lights b4 is a wash (185.3/185.2).  A traced self-gating variant
    (compact_meta gate_frac) measured ~4.7 ms WORSE on teapot at ANY
    threshold: launching ident-able compact/expand kernels at every
    boundary costs more than the decisions save, so the schedule is
    planned host-side from the previous render and baked in statically
    (probe_r6c).

    Returns a per-boundary bool tuple (len = maxdepth-1) for Engine's
    ncompact.
    """
    n = len(wave_rays)
    sched = []
    prefix = max(float(wave_rays[0]), 1.0)
    for b in range(1, n):
        surv = float(wave_rays[b])
        tau = tau_last if n - b == 1 else tau_mid
        if tau > 0.0 and surv <= tau * prefix:
            sched.append(True)
            prefix = max(surv, 1.0)
        else:
            sched.append(False)
    return tuple(sched)


def auto_page_size(n_tris: int, page_size: int = 56) -> int:
    """Scene-adaptive page size for the banked per-lane traversal.

    Per-lane bounce traversal gathers pages along lanes within BANKS of one
    vreg = 128 pages (ops/intersect_perlane: banked two-level traversal, up
    to MAX_BANKS banks — the scale-free range).  Two regimes grow the page
    beyond the 1-bank optimum of 56 (multiples of 8: sublane alignment):

    - many-bank scenes: per-bank fixed costs (count slabs, bank-loop
      entries, wave-0 cull width) make >8 banks lose to fewer, larger
      pages.  Chip sweep on a 99.9k-tri sphere (probe_r4g/h): P=56
      (14 banks) 399 ms, P=96 (9) 358, P=112 (7) 334.9, P=128 (7) 359,
      P=144 (6) 351, P=224 (4) 366 — target ~7 banks, i.e. the smallest
      multiple of 8 that fits the scene in 7 banks.  Few-bank scenes must
      NOT grow: multi (19.9k tris, 3 banks) measured 250.6 ms at P=56 vs
      255.5 at P=80 and 284.8 at P=112 (probe_r4g).
    - beyond MAX_BANKS*128 pages (~115k tris at P=56): growth is forced
      to keep the page table addressable at all.
    """
    from .ops.intersect_perlane import GROUP, MAX_BANKS

    def cdiv(a, b):
        return -(-a // b)

    if cdiv(cdiv(n_tris, page_size), GROUP) > 8:
        target = min(7, MAX_BANKS)
        page_size = cdiv(cdiv(n_tris, target * GROUP), 8) * 8
    while cdiv(n_tris, page_size) > MAX_BANKS * GROUP:
        page_size += 8
    return page_size


def _assemble_host_image(img_dev, v: Viewport, perm: np.ndarray, spp: int,
                         dev_quant: bool, want_u8: bool = False) -> np.ndarray:
    """Un-permute a device framebuffer (tile order, [3, R] or [3, R//spp])
    into the [height, width, 3] image — host numpy fancy indexing (~ms;
    device gathers are 1000x slower on this platform).

    dev_quant: the device already box-filtered + quantized (u8 input).
    want_u8: quantize=True was requested but the device rendered float
    (non-power-of-two spp, where device quantization is not byte-equal to
    the host contract — _device_quantizable): average + quantize here.
    """
    if dev_quant:
        P0 = v.height * v.width
        data = np.asarray(img_dev).T[:P0]            # [P0, 3] u8
        pixperm = perm[::spp] // spp if spp > 1 else perm
        img = np.empty((P0, 3), dtype=np.uint8)
        img[pixperm] = data
        return img.reshape(v.height, v.width, 3)
    R0 = v.height * v.width * spp
    data = np.asarray(img_dev, dtype=np.float32).T[:R0]
    img = np.empty((R0, 3), dtype=np.float32)
    img[perm] = data
    if spp > 1:
        img = img.reshape(v.height, v.width, spp, 3).mean(axis=2)
    else:
        img = img.reshape(v.height, v.width, 3)
    if want_u8:
        from .utils.png import quantize_u8
        img = quantize_u8(img)
    return img


class Engine(RayCaster):
    """Culled wavefront renderer (the performance path).

    Produces the same image as render.WavefrontRenderer (the cull is
    conservative, the early exit only skips pages that cannot improve any
    ray, and the shading algebra is shared); differs only in wave scheduling.
    """

    def __init__(self, scene: Scene, page_size: int = 56,
                 ray_chunk: int = 1024, interpret: bool = False,
                 pinhole_origin: bool = True, weight_cutoff: float = 1 / 512,
                 bounce_chunk: int = 0, nbuf: int = 4,
                 exact_cull: bool = True, compact: bool = True,
                 auto_pages: bool = True, ncompact: Optional[int] = None,
                 gate_frac: Optional[float] = None,
                 streamed: Optional[bool] = None,
                 table_slot_cap: int = 262144,
                 bank_major: bool = False):
        self.exact_cull = exact_cull
        self.compact = compact
        self._auto_schedule = False
        if ncompact is None:
            # Start from the universal chip optimum (compact after waves 0
            # and 1 — probe_r5b/r5c), then AUTOTUNE: the first TPU render's
            # measured wave decay plans a per-boundary static schedule
            # (plan_boundaries) that later renders compile against.  The
            # traced self-gating alternative (gate_frac) measured ~4.7 ms
            # of program-shape overhead on teapot at any threshold
            # (probe_r6c), so adaptivity lives host-side.
            ncompact = 2
            self._auto_schedule = True
        elif isinstance(ncompact, (list, tuple)):
            ncompact = tuple(bool(b) for b in ncompact)
        self.ncompact = ncompact
        self.gate_frac = gate_frac
        n_tris = max(len(scene.tris) - 1, 1)
        if auto_pages and n_tris <= table_slot_cap:
            # slots >= n_tris at ANY page size, so a scene past the cap can
            # never hold resident per-lane tables — don't grow the page for
            # a bank budget it can't meet; the streamed regime below keeps
            # fine-page economics instead (ops/intersect_streamed.py)
            page_size = auto_page_size(n_tris, page_size)
        elif auto_pages:
            # STREAMED regime page optimum, measured on a 1M-tri sphere
            # (probe_r15e2/r15d chip sweep, worklist kernel + guess
            # prefetch): P=56 5.80, P=112 6.76, P=224 6.94, P=448 3.19
            # Mrays/s — larger pages amortize the per-bank-visit fixed
            # cost (~7.1 us vs the 2.5 us DMA floor, probe_r15b) until
            # the per-visit table block exceeds the double buffer's VMEM
            # budget at 448.
            page_size = max(page_size, 224)
        self.pinhole_origin = pinhole_origin
        self.weight_cutoff = weight_cutoff
        # streamed-regime bounce traversal: per-chunk bank worklist with
        # guess-prefetch (default) vs the bank-major sweep (one table DMA
        # per bank per wave); bit-exact either way.  Bank-major measured
        # SLOWER at every page size on the 1M-tri chip sweep (probe_r15h:
        # 6.02/5.68/5.01 vs the worklist's 6.94/6.76/5.80 Mrays/s at
        # P=224/112/56) — saved table bytes don't pay for the per-visit
        # ray/winner row round trips once prefetch hides the table DMA.
        self.bank_major = bank_major
        self.bounce_chunk = bounce_chunk
        self.nbuf = nbuf
        # KD median-split pages: ~2.3x fewer slab-hit pages per ray than the
        # Morton layout (tighter AABBs — see ops.pages.kd_order), which
        # multiplies through the cull, the per-lane step counts, and the
        # provable-miss shortcut.
        self.pages = build_pages_kd(scene.tris, page_size=page_size)
        self.tensors = upload_scene(scene, pages=self.pages)
        self.aabb_lo = jnp.asarray(self.pages.aabb_lo)
        self.aabb_hi = jnp.asarray(self.pages.aabb_hi)
        # per-lane traversal tables (bounce waves): banked, up to
        # MAX_BANKS * 128 pages.  The VMEM-resident tables cost ~96 B per
        # TRIANGLE SLOT regardless of page size, so beyond the slot cap
        # the tables move to HBM and the STREAMED kernel DMAs them one
        # bank at a time (ops/intersect_streamed.py — the round-4 regime
        # that replaced the round-3 union-kernel fallback; unbounded scene
        # size at fine-page economics).
        from .ops.intersect_perlane import GROUP as _G, MAX_BANKS as _MB
        slots = self.pages.num_pages * self.pages.page_size
        # Slot cap: tables cost ~96 B/slot; at 262144 slots (~25 MB) they
        # fit the 64 MiB per-compile scoped-VMEM limit with ~20 MB of sort
        # scratch + block headroom.  (The old 131072 cap predates the AOT
        # scoped-vmem raise, when the hard limit was XLA's default 16 MiB.)
        fits_resident = (self.pages.num_pages <= _MB * _G
                         and slots <= table_slot_cap)
        self.streamed = (not fits_resident) if streamed is None \
            else bool(streamed)
        self.plt_i = self.plt_s = self.ab_tab = None
        self.slt_i = self.slt_s = self.s_ab = self.s_bank_ab = None
        tables_mb = 0.0
        if self.streamed:
            si, ss, sab, sbab = build_streamed_tables(self.pages)
            self.slt_i = jnp.asarray(si)        # [NB, 17P, 128] HBM-streamed
            self.slt_s = jnp.asarray(ss)        # [NB, 7P, 128]
            self.s_ab = jnp.asarray(sab)        # fine page AABBs, resident
            self.s_bank_ab = jnp.asarray(sbab)  # bank AABBs, resident
            # resident footprint = fine ab + bank ab + scratch; always
            # raise the scoped-VMEM limit (the sort scratch alone is ~6 MB)
            tables_mb = 64.0
        elif fits_resident:
            plt_i, plt_s, ab = build_perlane_tables(self.pages)
            self.plt_i = jnp.asarray(plt_i)
            self.plt_s = jnp.asarray(plt_s)
            self.ab_tab = jnp.asarray(ab)
            tables_mb = (plt_i.size + plt_s.size + ab.size) * 4 / 2**20
        # Scenes beyond ~60k tris carry per-lane tables big enough that the
        # Mosaic kernel's scoped-VMEM stack (tables + the [RB, RB] sort
        # scratch + block buffers, ~11 MB of non-table overhead at RB=1024)
        # exceeds XLA's default 16 MiB limit; raise it per-compile (the
        # XLA_FLAGS route crashes the local axon CPU client — docs/PERF.md).
        # render() routes through an AOT lower/compile cache when set.
        self._scoped_vmem_opts = (
            {"xla_tpu_scoped_vmem_limit_kib": "65536"}
            if tables_mb > 4.0 else None)
        self._aot_cache = {}
        self.page_size = page_size
        self.ray_chunk = ray_chunk
        self.interpret = interpret
        self.scene = scene
        self._perm_cache = {}
        self._pk0_cache = {}

    def _perm(self, v: Viewport, tile: int) -> np.ndarray:
        key = (v.height, v.width, v.samples_per_pixel, tile)
        if key not in self._perm_cache:
            self._perm_cache[key] = tile_permutation(
                v.height, v.width, v.samples_per_pixel, tile)
        return self._perm_cache[key]

    def _call_compact(self, pos, dyn, statics):
        """Invoke _render_device_compact, routing through an AOT
        lower/compile cache when the per-lane tables need a raised
        scoped-VMEM limit (per-compile compiler_options are the only way
        to reach the tunnel-side TPU compiler — docs/PERF.md)."""
        opts = self._scoped_vmem_opts
        if opts is None or self.interpret or \
                jax.default_backend() != "tpu":
            return _render_device_compact(*pos, **dyn, **statics)
        dyn_keys = tuple(k for k in sorted(dyn) if dyn[k] is not None)
        dyn_vals = [dyn[k] for k in dyn_keys]
        sig = (tuple(sorted(statics.items())), dyn_keys,
               tuple((a.shape, str(a.dtype))
                     for a in jax.tree_util.tree_leaves((pos, dyn_vals))))
        fn = self._aot_cache.get(sig)
        if fn is None:
            none_kw = {k: None for k in dyn if dyn[k] is None}

            @jax.jit
            def run(pos_a, dyn_a):
                kw = dict(zip(dyn_keys, dyn_a))
                return _render_device_compact(*pos_a, **kw, **none_kw,
                                              **statics)

            fn = run.lower(pos, dyn_vals).compile(compiler_options=opts)
            self._aot_cache[sig] = fn
        return fn(pos, dyn_vals)

    def _use_compact(self, R: int, spp: int) -> bool:
        # spp > 1: samples are just rays to the compacted pipeline; the
        # only spp-aware op is the final on-device box-filter average
        return self.compact and self.exact_cull \
            and (spp == 1 or R % spp == 0)

    def _dispatch_device(self, v: Viewport, o, d, alive0, key, *,
                         fixed_rng: bool, debug: bool, quant: bool,
                         spp: int, pk0):
        """Run the device render program on prepared ray arrays.

        Returns (img_dev, wave_counts, primary, cull0).  Shared by
        render() (full-image arrays) and render_banded() (per-band
        slices of the same tile-major stream)."""
        R = o.shape[1]
        RB = self.ray_chunk
        lights = self.scene.lights
        use_compact = self._use_compact(R, spp)
        cull0 = None
        if use_compact:
            statics = dict(
                maxdepth=v.maxdepth, ray_chunk=RB, page_size=self.page_size,
                fixed_rng=fixed_rng, interpret=self.interpret,
                want_primary=debug, quantize=quant,
                has_lights=lights is not None,
                weight_cutoff=0.0 if fixed_rng else self.weight_cutoff,
                nbuf=self.nbuf, bounce_rb=self.bounce_chunk,
                ncompact=self.ncompact, spp=spp,
                gate_frac=self.gate_frac, bank_major=self.bank_major)
            dyn = dict(
                light_orig=(jnp.asarray(lights.orig, dtype=F32)
                            if lights is not None else None),
                light_len2=(jnp.asarray(lights.len2, dtype=F32)
                            if lights is not None else None),
                pk0=pk0, plt_i=self.plt_i, plt_s=self.plt_s,
                ab_tab=self.ab_tab, slt_i=self.slt_i, slt_s=self.slt_s,
                s_ab=self.s_ab, s_bank_ab=self.s_bank_ab)
            img_dev, wave_counts, primary, cull0 = self._call_compact(
                (self.tensors, self.aabb_lo, self.aabb_hi, o, d, alive0,
                 key), dyn, statics)
        else:
            img_dev, wave_counts, primary = _render_device(
                self.tensors, self.aabb_lo, self.aabb_hi, o, d, alive0, key,
                maxdepth=v.maxdepth, ray_chunk=RB, page_size=self.page_size,
                fixed_rng=fixed_rng, interpret=self.interpret,
                want_primary=debug, quantize=quant, spp=spp,
                has_lights=lights is not None,
                light_orig=(jnp.asarray(lights.orig, dtype=F32)
                            if lights is not None else None),
                light_len2=(jnp.asarray(lights.len2, dtype=F32)
                            if lights is not None else None),
                weight_cutoff=0.0 if fixed_rng else self.weight_cutoff,
                bounce_chunk=self.bounce_chunk, pk0=pk0, nbuf=self.nbuf,
                exact_cull=self.exact_cull)
        return img_dev, wave_counts, primary, cull0

    def _pinhole_fold(self, v: Viewport, o):
        """Pinhole-origin rewrite + cached page-scalar fold (see render()
        for the rationale).  Returns (o, pk0)."""
        if not self.pinhole_origin:
            return o, None
        o = jnp.broadcast_to(jnp.asarray(v.cam)[:, None], o.shape)
        cam_key = tuple(np.asarray(v.cam, dtype=np.float32).tolist())
        if cam_key not in self._pk0_cache:
            self._pk0_cache[cam_key] = fold_pages_origin(
                self.tensors.PK, jnp.asarray(v.cam, dtype=F32))
        return o, self._pk0_cache[cam_key]

    def render(self, v: Viewport, key: Optional[jax.Array] = None,
               fixed_rng: bool = False, progress=None, debug: bool = False,
               quantize: bool = True) -> RenderResult:
        """Render.  `debug` additionally returns the per-pixel primary hit
        id/t buffers (the debug.rs trace buffers) at the cost of an extra
        29 MB device->host transfer; `quantize` returns a u8 image quantized
        on device (exact PNG semantics, 4x smaller transfer) — pass False for
        float images (oracle comparisons, custom tone mapping).
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        RB = self.ray_chunk
        spp = v.samples_per_pixel
        t0 = time.perf_counter()

        tile = pick_tile(v.width, v.height)
        R0 = v.height * v.width * spp
        # pad to the chunk size AND the 128-lane DMA alignment (compaction);
        # keep the padding spp-divisible so sample groups stay intact — an
        # odd spp must not silently drop the compact path.  lcm, not *spp:
        # spp=48 at RB=1024 would otherwise pad to 49k-ray quanta and trace
        # up to ~46k dead rays per render (ADVICE r3)
        quantum = max(RB, 128)
        quantum = quantum * spp // math.gcd(quantum, spp)
        R = -(-R0 // quantum) * quantum
        # device quantization only when byte-equal to the host contract
        quant = quantize and _device_quantizable(spp)

        o, d = _camera_rays_tiled(
            jnp.asarray(v.orig), jnp.asarray(v.cam), jnp.asarray(v.vu),
            jnp.asarray(v.vv), key, width=v.width, height=v.height, spp=spp,
            tile=tile, n_pad=R)
        # Primary rays re-anchored at the pinhole: same geometric lines
        # (d = unit(px_u - cam)), but chunk origin bounds collapse to a
        # point, which sharpens the packet cull's t intervals and the
        # front-to-back early exit, and the origin folds into the page
        # scalars (fold_pages_origin) so the wave-0 kernel skips half its
        # dot products.  Only differs from the reference's image-plane
        # origins (raytrace.rs:1391-1393) for geometry inside the
        # 0.5-unit pinhole->plane wedge, where the reference would
        # reject the hit (t < 0); no shipped scene has such geometry.
        o, pk0 = self._pinhole_fold(v, o)
        alive0 = jnp.arange(R) < R0

        img_dev, wave_counts, primary, cull0 = self._dispatch_device(
            v, o, d, alive0, key, fixed_rng=fixed_rng, debug=debug,
            quant=quant, spp=spp, pk0=pk0)

        # Host-side un-permute (numpy fancy indexing ~ms; device gathers are
        # 1000x slower on this platform).
        perm = self._perm(v, tile)
        img = _assemble_host_image(img_dev, v, perm, spp, quant,
                                   want_u8=quantize and not quant)

        pt = pid = primary_chunk = chunk_tris = None
        if debug:
            primary_h = np.asarray(primary)[:, :R0]
            pt = np.empty(R0, dtype=np.float32)
            pid = np.empty(R0, dtype=np.int32)
            pt[perm] = primary_h[0]
            pid[perm] = primary_h[1].astype(np.int32)
            shape = (v.height, v.width, spp) if spp > 1 else (v.height, v.width)
            pt = pt.reshape(shape)
            pid = pid.reshape(shape)
            if cull0 is not None and spp == 1:
                # per-pixel candidate sets: pixel -> primary chunk ->
                # surviving pages -> triangle ids (the reference records the
                # same sets inside its traversal, raytrace.rs:1018-1021)
                counts_h = np.asarray(cull0[0])
                plist_h = np.asarray(cull0[1])
                from .ops.pages import LANE_ID
                page_ids = self.pages.PK[:, :, LANE_ID].astype(np.int64)
                chunk_tris = []
                for c in range(counts_h.shape[0]):
                    pgs = plist_h[c, :counts_h[c]]
                    ids = page_ids[pgs].ravel()
                    chunk_tris.append(np.unique(ids[ids > 0]))
                qpos = np.empty(R0, dtype=np.int64)
                qpos[perm] = np.arange(R0)
                primary_chunk = (qpos // RB).reshape(v.height, v.width)

        wave_counts = np.asarray(wave_counts)
        if self._auto_schedule and self._use_compact(R, spp) \
                and not self.interpret \
                and jax.default_backend() == "tpu":
            # Autotune the compaction-boundary schedule from this render's
            # measured wave decay (one recompile on the next render; any
            # schedule is bit-exact, so only performance changes).  ONE
            # SHOT: wave decay is RNG-jittered, so replanning every render
            # could flip a near-threshold boundary back and forth and
            # recompile each time.
            planned = plan_boundaries(wave_counts.tolist())
            self._auto_schedule = False
            if planned != self.ncompact:
                self.ncompact = planned
        seconds = time.perf_counter() - t0
        result = RenderResult(
            image=img, rays_traced=int(wave_counts.sum()),
            wave_rays=wave_counts, primary_t=pt, primary_id=pid,
            seconds=seconds, primary_chunk=primary_chunk,
            chunk_tris=chunk_tris)
        if progress is not None:
            progress.update_wavefront(result)
        return result

    def render_sharded(self, v: Viewport, mesh=None,
                       n_devices: Optional[int] = None,
                       key: Optional[jax.Array] = None,
                       fixed_rng: bool = False, progress=None,
                       debug: bool = False,
                       quantize: bool = True) -> RenderResult:
        """Multi-chip render: the exact per-chip production program of
        render(), data-parallel over an image-tile device mesh
        (parallel/sharding.engine_render_sharded) — the TPU-native analog
        of the reference's N-worker row queue (raytrace.rs:1181-1191).
        Under `fixed_rng` the assembled image is BIT-EXACT equal to
        render()'s (tests/test_sharding.py pins this); with live RNG each
        chip folds its mesh position into the key for a decorrelated
        stream.  Lights and spp>1 follow the scene/viewport exactly as in
        render().  `debug` returns the per-pixel primary hit t/id buffers
        (each shard records its wave-0 slice; assembled here exactly like
        render()'s) so `cli diff` works on multi-chip renders — the
        reference's differential methodology (debug.rs:150-222).
        """
        from jax.sharding import NamedSharding, PartitionSpec
        from .parallel.sharding import (TILE_AXIS, engine_render_sharded,
                                        make_mesh)

        if mesh is None:
            mesh = make_mesh(n_devices)
        n = mesh.shape[TILE_AXIS]
        key = key if key is not None else jax.random.PRNGKey(0)
        RB = self.ray_chunk
        spp = v.samples_per_pixel
        t0 = time.perf_counter()

        tile = pick_tile(v.width, v.height)
        R0 = v.height * v.width * spp
        # per-shard rays must cover whole chunks, meet the 128-lane DMA
        # alignment, and hold whole sample groups (lcm: see render())
        qn = max(RB, 128)
        qn = qn * spp // math.gcd(qn, spp)
        quantum = n * qn
        R = -(-R0 // quantum) * quantum
        quant = quantize and _device_quantizable(spp)

        o, d = _camera_rays_tiled(
            jnp.asarray(v.orig), jnp.asarray(v.cam), jnp.asarray(v.vu),
            jnp.asarray(v.vv), key, width=v.width, height=v.height, spp=spp,
            tile=tile, n_pad=R)
        o, pk0 = self._pinhole_fold(v, o)
        alive0 = jnp.arange(R) < R0

        sh = NamedSharding(mesh, PartitionSpec(None, TILE_AXIS))
        out = engine_render_sharded(
            self, jax.device_put(o, sh), jax.device_put(d, sh),
            jax.device_put(alive0,
                           NamedSharding(mesh, PartitionSpec(TILE_AXIS))),
            key, mesh, maxdepth=v.maxdepth, interpret=self.interpret,
            fixed_rng=fixed_rng, compact=self.compact and self.exact_cull,
            spp=spp, pk0=pk0, quantize=quant, want_primary=debug)
        img_dev, wave_counts = out[0], out[1]

        perm = self._perm(v, tile)
        img = _assemble_host_image(img_dev, v, perm, spp, quant,
                                   want_u8=quantize and not quant)
        pt = pid = None
        if debug:
            primary_h = np.asarray(out[2])[:, :R0]
            pt = np.empty(R0, dtype=np.float32)
            pid = np.empty(R0, dtype=np.int32)
            pt[perm] = primary_h[0]
            pid[perm] = primary_h[1].astype(np.int32)
            shape = (v.height, v.width, spp) if spp > 1 \
                else (v.height, v.width)
            pt = pt.reshape(shape)
            pid = pid.reshape(shape)
        wave_counts = np.asarray(wave_counts)
        result = RenderResult(
            image=img, rays_traced=int(wave_counts.sum()),
            wave_rays=wave_counts, primary_t=pt, primary_id=pid,
            seconds=time.perf_counter() - t0)
        if progress is not None:
            progress.update_wavefront(result)
        return result

    def render_banded(self, v: Viewport, key: Optional[jax.Array] = None,
                      fixed_rng: bool = False, band_rows: Optional[int] = None,
                      max_band_rays: int = 4_194_304, progress=None,
                      quantize: bool = True) -> RenderResult:
        """Render in horizontal bands so device memory is bounded by the
        band, not the image — the TPU analog of the reference's row work
        queue (raytrace.rs:1181-1191), which streams rows and never holds
        the full ray set.  The full-image render() materializes all
        H*W*spp rays (state alone is 64 B/ray), capping resolution at a
        few hundred megapixels on one chip; banding removes the cap.

        Each band's rays are the SAME tile-major stream positions the full
        render would emit (index arithmetic on absolute positions —
        _camera_rays_tiled q_base; at spp > 1 the camera jitter is
        position-keyed the same way, _pos_uniform), so under fixed_rng the
        banded image is BIT-EXACT equal to render()'s for any band split
        at ANY spp (tests/test_render.py pins this).  With live RNG each
        band folds its index into the SCATTER key (decorrelated bounce
        streams, same as render_sharded's per-chip fold) while the camera
        jitter still matches the full render's.  Bands of equal padded
        size share one compiled executable.

        band_rows: rows per band (multiple of the pixel tile); default
        sizes bands to <= max_band_rays rays each.
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        RB = self.ray_chunk
        spp = v.samples_per_pixel
        t0 = time.perf_counter()

        tile = pick_tile(v.width, v.height)
        rays_per_row = v.width * spp
        if band_rows is None:
            band_rows = max(max_band_rays // rays_per_row, tile)
            band_rows -= band_rows % tile
        assert band_rows % tile == 0 and band_rows > 0, \
            f"band_rows must be a positive multiple of the {tile}-px tile"
        band_rows = min(band_rows, v.height)

        # spp-divisible padding quantum: every band's Rpad keeps sample
        # groups intact, so quantize=True always yields u8 (same lcm rule
        # as render(); bands start at q0 = r0*W*spp, also spp-divisible)
        quantum = max(RB, 128)
        quantum = quantum * spp // math.gcd(quantum, spp)
        quant = quantize and _device_quantizable(spp)
        perm_full = self._perm(v, tile)
        out = np.empty((v.height, v.width, 3),
                       dtype=np.uint8 if quantize else np.float32)
        wave_counts = None
        rays = 0
        for bi, r0 in enumerate(range(0, v.height, band_rows)):
            bh = min(band_rows, v.height - r0)
            q0 = r0 * rays_per_row
            Rb0 = bh * rays_per_row
            Rpad = -(-Rb0 // quantum) * quantum
            # scatter key: per-band fold (live-RNG decorrelation; inert
            # under fixed_rng).  Camera jitter uses the BASE key — it is
            # position-keyed (_pos_uniform), so every band draws exactly
            # the full render's values for its stream window.
            kb = jax.random.fold_in(key, bi)
            o, d = _camera_rays_tiled(
                jnp.asarray(v.orig), jnp.asarray(v.cam), jnp.asarray(v.vu),
                jnp.asarray(v.vv), key, width=v.width, height=v.height,
                spp=spp, tile=tile, n_pad=Rpad, q_base=q0)
            o, pk0 = self._pinhole_fold(v, o)
            alive0 = jnp.arange(Rpad) < Rb0
            img_dev, wc, _, _ = self._dispatch_device(
                v, o, d, alive0, kb, fixed_rng=fixed_rng, debug=False,
                quant=quant, spp=spp, pk0=pk0)
            band_view = type("BandView", (), {"height": bh,
                                              "width": v.width})()
            perm_local = perm_full[q0:q0 + Rb0] - q0
            out[r0:r0 + bh] = _assemble_host_image(
                img_dev, band_view, perm_local, spp, quant,
                want_u8=quantize and not quant)
            wc = np.asarray(wc)
            wave_counts = wc if wave_counts is None else wave_counts + wc
            rays += int(wc.sum())
            if progress is not None:
                # per-band progress report, like the reference's per-row
                # worker flushes (raytrace.rs:1411-1429)
                progress.update(bh * v.width, {"Rays": int(wc.sum())})

        result = RenderResult(
            image=out, rays_traced=rays, wave_rays=wave_counts,
            primary_t=None, primary_id=None,
            seconds=time.perf_counter() - t0)
        if progress is not None:
            for i, n in enumerate(wave_counts):
                progress._stat(f"Wave{i}Rays", "count").add(int(n))
        return result

    def walk_one_ray(self, v: Viewport, px,
                     key: Optional[jax.Array] = None,
                     fixed_rng: bool = True) -> RenderResult:
        """Single-pixel probe (Viewport::walk_one_ray, raytrace.rs:1442-1455;
        the CUDA cast_one_ray analog) through the PRODUCTION pipeline: the
        one ray rides lane 0 of a 128-lane chunk through the same cull,
        trace, shade, and compaction code as a full render — INCLUDING the
        scene's shadow feelers when lights are set, so the probe is valid
        on every scene class the engine renders.  Under fixed_rng (the
        default) the probed pixel equals render()'s bitwise (per-ray
        values are independent of chunk grouping; tests/test_shadows.py
        pins the lights case).  With live RNG the probe is a valid
        independent sample (the in-kernel scatter RNG is seeded by lane
        position, which differs from the ray's position in a full render).
        """
        from .camera import pixel_rays

        row, col = px
        key = key if key is not None else jax.random.PRNGKey(0)
        lights = self.scene.lights
        o_np, d_np = pixel_rays(v, np.asarray(row), np.asarray(col))
        R = 128
        o = jnp.zeros((3, R), F32).at[:, 0].set(jnp.asarray(o_np, dtype=F32))
        d = jnp.zeros((3, R), F32).at[:, 0].set(jnp.asarray(d_np, dtype=F32))
        alive0 = jnp.arange(R) < 1
        statics = dict(
            maxdepth=v.maxdepth, ray_chunk=R, page_size=self.page_size,
            fixed_rng=fixed_rng, interpret=self.interpret,
            want_primary=True, quantize=False,
            has_lights=lights is not None,
            weight_cutoff=0.0 if fixed_rng else self.weight_cutoff)
        dyn = dict(
            light_orig=(jnp.asarray(lights.orig, dtype=F32)
                        if lights is not None else None),
            light_len2=(jnp.asarray(lights.len2, dtype=F32)
                        if lights is not None else None),
            plt_i=self.plt_i, plt_s=self.plt_s, ab_tab=self.ab_tab,
            slt_i=self.slt_i, slt_s=self.slt_s, s_ab=self.s_ab,
            s_bank_ab=self.s_bank_ab)
        img, wave_counts, primary, _ = self._call_compact(
            (self.tensors, self.aabb_lo, self.aabb_hi, o, d, alive0, key),
            dyn, statics)
        wave_rays = np.asarray(wave_counts)
        primary_h = np.asarray(primary)
        return RenderResult(
            image=np.asarray(img)[:, 0].reshape(1, 1, 3),
            rays_traced=int(wave_rays.sum()), wave_rays=wave_rays,
            primary_t=primary_h[0, 0].reshape(1, 1),
            primary_id=primary_h[1, 0].astype(np.int32).reshape(1, 1))

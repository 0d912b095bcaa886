"""Multi-chip image-tile data parallelism (Mesh + shard_map).

The reference parallelizes over image rows with a mutex-guarded work queue and
N CPU threads (raytrace.rs:1181-1191).  Rays are independent, so the TPU-native
scale-out is pure data parallelism over a 1-D device mesh: the ray batch is
sharded on a "tiles" axis, the scene tables are replicated (they are small —
the teapot scene is ~2 MB), and each chip runs the identical wavefront program
on its shard.  The only collectives are a `psum` of the per-wave ray counters
(the "Rays" stat, raytrace.rs:1278) and the implicit all-gather when the
sharded framebuffer is assembled on the host — both ride ICI.

Multi-host (DCN) needs nothing extra: jax.distributed initialization plus the
same mesh spanning all processes.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render import SceneTensors, trace_rays

TILE_AXIS = "tiles"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (TILE_AXIS,))


def trace_rays_sharded(st: SceneTensors, o, d, key, mesh: Mesh,
                       maxdepth: int, backend: str = "xla",
                       ray_chunk: int = 256, fixed_rng: bool = False):
    """One full wavefront render step, sharded over image tiles.

    o, d: [R, 3] with R divisible by mesh size.  Returns (colors [R, 3],
    wave_rays [maxdepth]) where wave_rays is the psum across chips.
    """
    n = mesh.shape[TILE_AXIS]
    R = o.shape[0]
    assert R % n == 0, f"ray count {R} not divisible by mesh size {n}"

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(TILE_AXIS), P(TILE_AXIS), P()),
        out_specs=(P(TILE_AXIS), P()),
    )
    def step(st_rep, o_sh, d_sh, key_rep):
        colors, aux = trace_rays(st_rep, o_sh, d_sh, key_rep,
                                 maxdepth=maxdepth, backend=backend,
                                 ray_chunk=ray_chunk, fixed_rng=fixed_rng)
        # Collective: global per-wave ray counts over ICI (progress stats).
        wave_rays = jax.lax.psum(aux["wave_rays"], TILE_AXIS)
        return colors, wave_rays

    return step(st, o, d, key)


def shard_rays(o, d, mesh: Mesh):
    """Place ray arrays with tile sharding (device_put with NamedSharding)."""
    sharding = NamedSharding(mesh, P(TILE_AXIS))
    return jax.device_put(o, sharding), jax.device_put(d, sharding)

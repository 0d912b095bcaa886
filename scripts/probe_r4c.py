import glob, gzip, json, os, sys
from collections import defaultdict
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_rt"))
import numpy as np
LOGDIR = "/tmp/jaxprof_r4c"
def main():
    import jax, jax.numpy as jnp
    from rust_raytrace_tpu.engine import Engine, _camera_rays_tiled, _render_device_compact
    from rust_raytrace_tpu.models import teapot
    scene, vp = teapot.build(resolution="2k")
    eng = Engine(scene)
    rb = eng.ray_chunk
    R0 = vp.height*vp.width; R = -(-R0//rb)*rb
    key = jax.random.PRNGKey(0)
    o, d = _camera_rays_tiled(jnp.asarray(vp.orig), jnp.asarray(vp.cam), jnp.asarray(vp.vu),
        jnp.asarray(vp.vv), key, width=vp.width, height=vp.height, spp=1, tile=32, n_pad=R)
    alive = jnp.arange(R) < R0
    ob = jnp.broadcast_to(jnp.asarray(vp.cam)[:, None], o.shape)
    pk0 = eng._pk0_cache.get(tuple(np.asarray(vp.cam, dtype=np.float32).tolist()))
    def f(k):
        img, wc, _, _ = _render_device_compact(
            eng.tensors, eng.aabb_lo, eng.aabb_hi, ob, d, alive, k,
            maxdepth=vp.maxdepth, ray_chunk=rb, page_size=eng.page_size,
            fixed_rng=False, interpret=False, want_primary=False, quantize=True,
            weight_cutoff=eng.weight_cutoff, pk0=pk0, nbuf=eng.nbuf,
            plt_i=eng.plt_i, plt_s=eng.plt_s, ab_tab=eng.ab_tab, ncompact=eng.ncompact)
        return img
    img = f(key); np.asarray(img[:1,:8])
    os.system(f"rm -rf {LOGDIR}")
    with jax.profiler.trace(LOGDIR, create_perfetto_trace=True):
        img = f(jax.random.PRNGKey(1)); np.asarray(img[:1,:8])
    paths = glob.glob(f"{LOGDIR}/**/*.json.gz", recursive=True)
    with gzip.open(paths[0], "rt") as fh: trace = json.load(fh)
    by = defaultdict(float); cnt = defaultdict(int)
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            by[e.get("name","?")] += e["dur"]; cnt[e.get("name","?")] += 1
    for name, dur in sorted(by.items(), key=lambda kv:-kv[1])[:22]:
        print(f"{dur/1e3:9.2f} ms x{cnt[name]:<4d} {name[:80]}", flush=True)
main()

"""Quantify the on-chip engine-vs-xla divergence and test whether
per-compile xla_allow_excess_precision=false restores bit-exactness."""
import os, sys, functools
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_rt"))
import jax, numpy as np
from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu.render import WavefrontRenderer
from rust_raytrace_tpu.models import teapot

s, vp = teapot.build(resolution=(512, 288))
key = jax.random.PRNGKey(11)
ei = Engine(s).render(vp, key=key, fixed_rng=True, quantize=False).image
xi = WavefrontRenderer(s, backend="xla").render(vp, key=key, fixed_rng=True).image
d = np.abs(ei.astype(np.float64) - xi.astype(np.float64))
bad = (d.max(axis=-1) > 0)
ys, xs = np.nonzero(bad)
print(f"pixels differing: {bad.sum()} of {bad.size} "
      f"({100*bad.sum()/bad.size:.4f}%), max {d.max()}", flush=True)
print("first few:", list(zip(ys[:6].tolist(), xs[:6].tolist())), flush=True)
# Histogram of per-pixel max diffs
dm = d.max(axis=-1)[bad]
if dm.size:
    print("diff quantiles:", np.quantile(dm, [0.5, 0.9, 1.0]).tolist(), flush=True)
# ULP-scale or hit-flip? Count pixels where one side is sky (exact sky color)
sky = np.array([128/255, 180/255, 255/255], dtype=np.float64)
e_sky = np.all(np.abs(ei[bad] - sky) < 1e-6, axis=-1)
x_sky = np.all(np.abs(xi[bad] - sky) < 1e-6, axis=-1)
print(f"among differing: engine-sky {e_sky.sum()}, xla-sky {x_sky.sum()}", flush=True)
# quantized-u8 comparison (what the PNG actually ships)
from rust_raytrace_tpu.utils.png import quantize_u8
qd = np.abs(quantize_u8(ei).astype(int) - quantize_u8(xi).astype(int))
print(f"quantized u8: differing pixels {int((qd.max(axis=-1) > 0).sum())}, "
      f"max {int(qd.max())}", flush=True)

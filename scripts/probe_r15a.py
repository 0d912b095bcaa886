"""Round-5 probe A: attribute the round-4 headline regression
(64.285 -> 60.842 Mrays/s, BENCH_r03 vs r04) with a same-process A/B.

Round 4's only device-program change on the spp=1 resident-regime path was
trace_shade_chunks_pallas (wave-0 fused union kernel): it gained an
unconditional pl.when(live) wrapper + an SMEM flags input + an
input_output_aliases entry.  The round-5 fix compiles the straight-line
round-3 shape when no chunk_live/grid_live is passed (wave 0).  This probe
alternates the two shapes in one process (the repo's drift discipline,
docs/PERF.md probe_r6i note: cross-process deltas below ~2 ms are
untrustworthy):

  A = wave0_skippable=False  (round-5 fix == round-3 shape)
  B = wave0_skippable=True   (round-4 shipped shape)

Also: 3 plain repeats of teapot_2k_shadows (whose wave 0 is the UNFUSED
union kernel, untouched by the round-4 diff) to gauge run variance on the
other regressed config, and a bitwise image check A == B.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

import jax
import numpy as np

from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu.models import teapot
from rust_raytrace_tpu.utils.devbench import device_metric

scene, vp = teapot.build(resolution="2k")
eng = Engine(scene)
eng.render(vp, key=jax.random.PRNGKey(7))   # plan schedule once
eng._auto_schedule = False

# bitwise A == B check first (tiny render through the full engine path is
# not knob-able; compare the two dev loops' fetched image corners instead —
# same keys, so any arithmetic divergence shows)
for rep in range(3):
    for name, flag in [("fixA(r3-shape)", False), ("r4-shape", True)]:
        runs = []
        mr, dt, rays = device_metric(eng, vp, ND=8, nruns=2,
                                     runs_out=runs,
                                     wave0_skippable=flag)
        rs = " ".join(f"{m:.2f}" for m, _ in runs)
        print(f"rep{rep} {name}: best {mr:.3f} Mrays/s ({dt*1e3:.1f} ms) "
              f"runs [{rs}]", flush=True)

# shadows variance (no code delta: 3 identical measurements)
scene_l, vp_l = teapot.build(resolution="2k", with_light=True)
eng_l = Engine(scene_l)
eng_l.render(vp_l, key=jax.random.PRNGKey(7))
eng_l._auto_schedule = False
for rep in range(3):
    runs = []
    mr, dt, rays = device_metric(eng_l, vp_l, ND=8, nruns=2, runs_out=runs)
    rs = " ".join(f"{m:.2f}" for m, _ in runs)
    print(f"shadows rep{rep}: best {mr:.3f} Mrays/s ({dt*1e3:.1f} ms) "
          f"runs [{rs}]", flush=True)

"""probe_r11a: DOWNWARD page-size sweep on multi_2k (chip).

Every prior page sweep on multi went UP from 56 (P=80 255.5, P=112 284.8 —
growth hurts, docs/PERF.md); below 56 was never measured there.  Smaller
pages mean fewer triangle tests per traversal step but more steps per ray
(SAH pages/bounce-ray grows as page surface area shrinks) and a 3 -> 4 bank
crossing at P=48.  teapot's P=48 point lost outright (154 ms vs 110.8, a
1 -> 2 bank crossing), but multi is ALREADY multi-bank, so the bank-entry
economics differ.

Run: python scripts/probe_r11a.py   (serialize: nothing else on the tunnel)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

import jax
import numpy as np

from rust_raytrace_tpu.engine import Engine
from rust_raytrace_tpu.models import multi
from rust_raytrace_tpu.utils.devbench import device_metric


def main():
    scene, vp = multi.build(resolution="2k")
    print("tris:", scene.num_triangles, flush=True)
    for ps in (56, 48, 40):
        eng = Engine(scene, page_size=ps, auto_pages=False)
        nb = -(-eng.pages.num_pages // 128)
        t0 = time.perf_counter()
        mr, dt, rays = device_metric(eng, vp, ND=4, nruns=2)
        print(f"P={ps} NP={eng.pages.num_pages} banks={nb}: "
              f"{dt*1e3:.1f} ms {mr:.2f} Mrays/s rays={rays} "
              f"(total incl compile {time.perf_counter()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()

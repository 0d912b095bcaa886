"""Round-7 probe C (chip): re-sweep compaction schedules + cb under the
pipelined-DMA compact/expand kernels (probe_r7b).

plan_boundaries' tau_mid=0.65 / tau_last=0 thresholds were fitted when a
boundary cost ~5 ms of fixed compact+expand work; the pipelined kernels
roughly halved that, so later boundaries (and smaller cb) may now pay.

Run: nohup python scripts/probe_r7c.py > /tmp/probe_r7c.log 2>&1 &
(serialize: nothing else may use the tunnel)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

import numpy as np

SCHEDS = {
    "{0,1}": (True, True, False, False),
    "{0,1,2}": (True, True, True, False),
    "{0,1,2,3}": (True, True, True, True),
}

VMEM_OPT = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def synthetic_100k():
    from rust_raytrace_tpu import math3d as m3
    from rust_raytrace_tpu.camera import create_viewport
    from rust_raytrace_tpu.geometry import make_sphere
    from rust_raytrace_tpu.materials import matte
    from rust_raytrace_tpu.scene import assemble

    s = make_sphere((0.0, 0.0, 10.0), 4.0, (224, 224),
                    matte(m3.make_color((252, 119, 0)), 0.2), 0.0)
    vp = create_viewport((2560, 1440), (1.6, 0.9), (0.0, 0.0, 0.0),
                         m3.unit(m3.vec(0.0, 0.0, 1.0)), 90.0, 0.0, 5, 1)
    return assemble([s]), vp


def main():
    from rust_raytrace_tpu.engine import Engine
    from rust_raytrace_tpu.models import multi, teapot
    from rust_raytrace_tpu.utils.devbench import device_metric

    def run(tag, build, scheds, copts=None, cb=None):
        for sname in scheds:
            scene, vp = build()
            eng = Engine(scene, ncompact=SCHEDS[sname])
            mr, dt, rays = device_metric(eng, vp, ND=4, nruns=2,
                                         compiler_options=copts, cb=cb)
            cbs = f" cb={cb}" if cb else ""
            print(f"{tag} {sname}{cbs}: {dt * 1e3:.1f} ms {mr:.1f} Mrays/s",
                  flush=True)

    t2k = lambda: teapot.build(resolution="2k")
    run("teapot_2k", t2k, ["{0,1}", "{0,1,2}", "{0,1,2,3}"])
    run("teapot_2k", t2k, ["{0,1}"], cb=256)
    run("teapot_2k", t2k, ["{0,1}"], cb=1024)
    run("multi_2k", lambda: multi.build(resolution="2k"),
        ["{0,1}", "{0,1,2}"])
    run("synthetic_100k", synthetic_100k, ["{0,1}", "{0,1,2}"],
        copts=VMEM_OPT)
    run("lights_2k",
        lambda: teapot.build(resolution="2k", with_light=True),
        ["{0,1}", "{0,1,2}"])


if __name__ == "__main__":
    main()

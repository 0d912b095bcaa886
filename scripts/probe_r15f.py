"""Round-5 probe F: extend the VPU fp32 peak sweep to an actual plateau.

probe_r15c's grid topped out at (chains 16, unroll 96) = 2.788 TFLOP/s and
was still RISING along both axes — the round-4 "peak" (0.43, at chains 4 x
unroll 24) was latency/overhead-limited, not issue-limited (ADVICE r4).
Keep doubling until the gain per doubling falls under ~5%; that knee is
the attainable fp32 FMA rate for register-resident elementwise work.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

from rust_raytrace_tpu.utils.roofline import measure_vpu_peak

best = (0.0, None)
for nchains in (16, 24, 32):
    for unroll in (96, 192, 384):
        p = measure_vpu_peak(nchains=nchains, unroll=unroll)
        print(f"chains {nchains:2d} unroll {unroll:3d}: "
              f"{p/1e12:.3f} TFLOP/s", flush=True)
        if p > best[0]:
            best = (p, (nchains, unroll))
print(f"plateau: {best[0]/1e12:.3f} TFLOP/s at chains/unroll {best[1]}",
      flush=True)

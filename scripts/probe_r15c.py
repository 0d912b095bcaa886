"""Round-5 probe C: validate the VPU fp32 peak measurement (ADVICE r4).

The round-4 peak (0.43 TFLOP/s) came from 4 FMA chains x UNROLL 24 — if
that configuration was latency-limited rather than issue-limited, every
predicate MFU it denominates is inflated.  Sweep chains x unroll until
throughput plateaus; the plateau is the attainable fp32 FMA rate.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))

from rust_raytrace_tpu.utils.roofline import measure_hbm_bw, measure_vpu_peak

best = (0.0, None)
for nchains in (2, 4, 8, 12, 16):
    for unroll in (12, 24, 48, 96):
        p = measure_vpu_peak(nchains=nchains, unroll=unroll)
        print(f"chains {nchains:2d} unroll {unroll:2d}: "
              f"{p/1e12:.3f} TFLOP/s", flush=True)
        if p > best[0]:
            best = (p, (nchains, unroll))
print(f"plateau: {best[0]/1e12:.3f} TFLOP/s at chains/unroll {best[1]}",
      flush=True)
print(f"hbm: {measure_hbm_bw()/1e9:.1f} GB/s", flush=True)

"""Chip roofline microbench (round 4): VPU fp32 peak + HBM stream bandwidth.

Denominators for the per-config predicate-MFU numbers (VERDICT r3
next-item 3).  Measurement lives in rust_raytrace_tpu/utils/roofline.py
(bench.py runs the same functions live).

Run: nohup python scripts/probe_r14a.py > /tmp/probe_r14a.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_rt"))


def main():
    import jax

    from rust_raytrace_tpu.utils.roofline import (measure_hbm_bw,
                                                  measure_vpu_peak)

    print("device:", jax.devices()[0], flush=True)
    peak = measure_vpu_peak()
    print(f"VPU fp32 peak: {peak / 1e12:.3f} TFLOP/s", flush=True)
    bw = measure_hbm_bw()
    print(f"HBM stream bandwidth: {bw / 1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()

"""rust_raytrace_tpu — a TPU-native ray tracing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
Rust/CUDA ray tracer `gerikkub/rust_raytrace` (read-only checkout expected at
$RUST_RAYTRACE_REF, default /root/reference).  The compute path is a wavefront
renderer: camera rays are generated as SoA batches, streamed through a
triangle-intersection kernel page-by-page with a running min-hit reduction, and
secondary (bounce) rays are re-dispatched as new wavefronts with active-ray
compaction — the structural template is the reference's CUDA workqueue backend
(cuda_raytrace_lib/src/cuda_raytrace.rs:277-515), not its recursive CPU path.

Layout:
  math3d / geometry / materials / obj_parser / camera / scene / octree
      host-side scene pipeline (numpy f32, optional C++ native fast path)
  ops/        intersection kernels: numpy oracle model, pure-XLA, Pallas TPU
  render      the wavefront integrator (jit; single chip)
  parallel/   multi-chip image-tile data parallelism (Mesh + shard_map)
  models/     scene families (teapot presets, circles, multi-object)
  utils/      png writer, progress/stats, per-ray differential debugger
  oracle      slow recursive numpy reference renderer (differential oracle)
"""

__version__ = "0.1.0"

"""Extended randomized-differential soak: 30 fresh seeds through the
test_fuzz contract (engine==xla bitwise + <=1 ULP of oracle), varied
scene shapes, schedules, and chunk sizes."""
import os, sys, traceback
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")
import jax
jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])
import numpy as np
import test_fuzz as TF

ok = bad = 0
for seed in range(231, 261):
    rng = np.random.default_rng(seed)
    try:
        spheres = [(int(rng.integers(3, 8)) * 2,
            int(rng.integers(6, 16)))] if seed % 2 else []
        disks = [int(rng.integers(6, 24))] if seed % 3 == 0 else []
        scene = TF._rand_scene(rng, n_soup=int(rng.integers(2, 5)),
                               spheres=spheres, disks=disks)
        vp = TF._rand_viewport(rng, (48, 32), maxdepth=int(rng.integers(3, 6)))
        ps = int(rng.choice([16, 24, 40, 56]))
        rc = int(rng.choice([128, 256]))
        TF._assert_contract(scene, vp, ps, rc)
        ok += 1
        print(f"seed {seed}: OK (tris={len(scene.tris)} ps={ps} rc={rc})",
              flush=True)
    except Exception:
        bad += 1
        print(f"seed {seed}: FAILED\n{traceback.format_exc()[-1200:]}",
              flush=True)
print(f"soak done: {ok} ok, {bad} failed", flush=True)

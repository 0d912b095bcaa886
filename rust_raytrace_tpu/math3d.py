"""3-vector math for host-side scene precompute.

TPU-native rethink of the reference's SIMD Vec3 core
(`raytrace_lib/src/raytrace.rs:22-173`).  The reference wraps a 4-lane f32 SIMD
register per vector and threads scalar Vec3 values through every call; on TPU
there is no scalar-SIMD type — vectors are rows of `[..., 3]` float32 arrays and
the 8x128 VPU vectorizes across the batch dimension instead of across xyz.  All
functions here are shape-polymorphic over leading dimensions and are used both
by numpy (host precompute, test oracle) and by jax.numpy inside jit (they only
use ufuncs common to both).

Semantics matched to the reference (all f32):
  - dot/cross/len/len2/unit:       raytrace.rs:65-96
  - orthogonal:                    raytrace.rs:98-108
  - basis:                         raytrace.rs:110-115
  - change_basis (row-matrix mul): raytrace.rs:117-121
"""

import numpy as np

__all__ = [
    "vec", "dot", "cross", "len2", "length", "unit",
    "orthogonal", "basis", "change_basis", "make_color", "mix_color",
]

F32 = np.float32


def vec(x, y, z, xp=np):
    """Build a single f32 3-vector (reference `make_vec`, raytrace.rs:29-33)."""
    return xp.asarray([x, y, z], dtype=F32)


def dot(a, b, xp=np):
    """Row-wise dot product over the last axis (raytrace.rs:75-77)."""
    return xp.sum(a * b, axis=-1)


def cross(a, b, xp=np):
    """Row-wise cross product (raytrace.rs:80-90, SIMD swizzle form)."""
    a1 = xp.stack([a[..., 1], a[..., 2], a[..., 0]], axis=-1)
    a2 = xp.stack([a[..., 2], a[..., 0], a[..., 1]], axis=-1)
    b1 = xp.stack([b[..., 1], b[..., 2], b[..., 0]], axis=-1)
    b2 = xp.stack([b[..., 2], b[..., 0], b[..., 1]], axis=-1)
    return a1 * b2 - a2 * b1


def len2(a, xp=np):
    return xp.sum(a * a, axis=-1)


def length(a, xp=np):
    return xp.sqrt(xp.sum(a * a, axis=-1))


def unit(a, xp=np):
    """`v * (1/|v|)` exactly as raytrace.rs:92-96 (mult by reciprocal length).

    A zero vector yields inf/nan, matching the reference's behavior.
    """
    inv = F32(1.0) / length(a, xp)
    return a * inv[..., None]


def orthogonal(a, xp=np):
    """Deterministic orthogonal vector (raytrace.rs:98-108).

    Single-vector only (the reference recurses on near-zero input; that branch
    can only loop forever for the zero vector, so we don't reproduce it).
    """
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    if a.ndim == 1:
        if abs(float(ax)) > 0.1:
            return unit(xp.stack([-(ay + az) / ax, F32(1.0), F32(1.0)], axis=-1), xp)
        if abs(float(ay)) > 0.1:
            return unit(xp.stack([F32(1.0), -(ax + az) / ay, F32(1.0)], axis=-1), xp)
        if abs(float(az)) > 0.1:
            return unit(xp.stack([F32(1.0), F32(1.0), -(ax + ay) / az], axis=-1), xp)
        return orthogonal(unit(a, xp), xp)
    # Branchless batched form (used by batched shading paths).  Unselected
    # candidates get a safe denominator so zero components can't produce
    # inf/NaN temporaries (only the branch with |component| > 0.1 is kept).
    one = xp.ones_like(ax)
    use_x = xp.abs(ax) > 0.1
    use_y = xp.abs(ay) > 0.1
    use_z = xp.abs(az) > 0.1
    sx = xp.where(use_x, ax, one)
    sy = xp.where(use_y, ay, one)
    sz = xp.where(use_z, az, one)
    cand_x = xp.stack([-(ay + az) / sx, one, one], axis=-1)
    cand_y = xp.stack([one, -(ax + az) / sy, one], axis=-1)
    cand_z = xp.stack([one, one, -(ax + ay) / sz], axis=-1)
    out = xp.where(use_x[..., None], cand_x,
                   xp.where(use_y[..., None], cand_y, cand_z))
    return unit(out, xp)


def basis(a, xp=np):
    """Orthonormal frame (bx, by, n) with n = unit(a) (raytrace.rs:110-115)."""
    n = unit(a, xp)
    bx = orthogonal(n, xp)
    by = cross(n, bx, xp)
    return bx, by, n


def change_basis(v, b, xp=np):
    """Project `v` onto frame rows (b0, b1, b2) (raytrace.rs:117-121).

    Returns [b0.v, b1.v, b2.v]; i.e. multiplication by the row matrix [b0;b1;b2].
    `v` may be batched [..., 3]; each b_i is a single 3-vector.
    """
    b0, b1, b2 = b
    return xp.stack([dot(v, b0, xp), dot(v, b1, xp), dot(v, b2, xp)], axis=-1)


def make_color(rgb):
    """8-bit color tuple -> f32 color in [0,1] (raytrace.rs:176-180)."""
    r, g, b = rgb
    return np.asarray([r / 255.0, g / 255.0, b / 255.0], dtype=F32)


def mix_color(c1, c2, a, xp=np):
    """Lerp c1*(1-a) + c2*a (raytrace.rs:299-301). `a` scalar or [...]-shaped."""
    a = xp.asarray(a, dtype=F32)
    return c1 * (F32(1.0) - a)[..., None] + c2 * a[..., None]

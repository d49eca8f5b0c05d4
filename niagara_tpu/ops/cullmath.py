"""Device-side culling/shading math (jnp, float32).

JAX ports of the reference's GLSL helper library (src/shaders/math.h).  All
functions are shape-polymorphic over leading batch dimensions and are designed
to be fused by XLA into the culling kernels.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotate_quat(v: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """v + 2*cross(q.xyz, cross(q.xyz, v) + q.w*v)  (reference math.h:46-49)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = jnp.cross(qv, v) + qw * v
    return v + 2.0 * jnp.cross(qv, t)


def project_sphere(c: jnp.ndarray, r: jnp.ndarray, znear, p00, p11):
    """Mara-McGuire 2D bounds of a projected sphere (reference math.h:1-22).

    c: [...,3] camera-space center, r: [...] radius.
    Returns (valid [...], aabb [...,4] in UV space [minx,miny,maxx,maxy]).
    Invalid entries (sphere crossing the near plane) have undefined aabb.
    """
    cx, cy, cz = c[..., 0], c[..., 1], c[..., 2]
    valid = cz >= r + znear

    czr2 = cz * cz - r * r
    # guard sqrt of negative for invalid entries
    vx = jnp.sqrt(jnp.maximum(cx * cx + czr2, 0.0))
    minx = (vx * cx - cz * r) / (vx * cz + cx * r)
    maxx = (vx * cx + cz * r) / (vx * cz - cx * r)

    vy = jnp.sqrt(jnp.maximum(cy * cy + czr2, 0.0))
    miny = (vy * cy - cz * r) / (vy * cz + cy * r)
    maxy = (vy * cy + cz * r) / (vy * cz - cy * r)

    # clip space -> uv space: aabb.xwzy * (0.5,-0.5,0.5,-0.5) + 0.5
    aabb = jnp.stack(
        [
            minx * p00 * 0.5 + 0.5,
            maxy * p11 * -0.5 + 0.5,
            maxx * p00 * 0.5 + 0.5,
            miny * p11 * -0.5 + 0.5,
        ],
        axis=-1,
    )
    return valid, aabb


def occlusion_mip(aabb: jnp.ndarray, pyramid_width, pyramid_height) -> jnp.ndarray:
    """Mip level selection for the 2x2 min-sampled occlusion test
    (reference math.h:24-39), including the free finer-mip refinement."""
    size_x = (aabb[..., 2] - aabb[..., 0]) * pyramid_width
    size_y = (aabb[..., 3] - aabb[..., 1]) * pyramid_height
    level = jnp.ceil(jnp.log2(jnp.maximum(jnp.maximum(size_x, size_y), 1e-12)))

    fmip_w = pyramid_width * jnp.exp2(1.0 - level)
    fmip_h = pyramid_height * jnp.exp2(1.0 - level)
    fx = aabb[..., 0] * fmip_w
    fy = aabb[..., 1] * fmip_h
    fits = jnp.logical_and(
        (fx - jnp.floor(fx)) + (aabb[..., 2] - aabb[..., 0]) * fmip_w <= 2.0,
        (fy - jnp.floor(fy)) + (aabb[..., 3] - aabb[..., 1]) * fmip_h <= 2.0,
    )
    level = level - fits.astype(level.dtype)
    return jnp.maximum(level, 0.0)


def cone_cull(center, radius, cone_axis, cone_cutoff, camera_position):
    """True when the whole meshlet faces away (reference math.h:41-44)."""
    d = center - camera_position
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
    return jnp.sum(d * cone_axis, axis=-1) >= cone_cutoff * dist + radius


def frustum_visible(center, radius, frustum, znear, zfar):
    """Symmetric-plane frustum test on camera-space spheres
    (reference drawcull.comp.glsl:78-82)."""
    cx, cy, cz = center[..., 0], center[..., 1], center[..., 2]
    vis = cz * frustum[1] - jnp.abs(cx) * frustum[0] > -radius
    vis &= cz * frustum[3] - jnp.abs(cy) * frustum[2] > -radius
    vis &= (cz + radius > znear) & (cz - radius < zfar)
    return vis


def sample_pyramid_min(pyramid_atlas: jnp.ndarray, uv: jnp.ndarray, level: jnp.ndarray, base_w: int, base_h: int):
    """Emulates textureLod on a min-reduction sampler: min of the 2x2 bilinear
    footprint at `uv` in mip `level` of the pyramid atlas.

    pyramid_atlas: [L, base_h, base_w] built by ops.pyramid.build_pyramid,
    whose texels are already 2x2-footprint-filtered — so the footprint min is
    a single gather of the footprint's top-left texel.
    uv: [...,2] in [0,1]; level: [...] float mip index.
    """
    lvl = level.astype(jnp.int32)
    mip_w = jnp.maximum(base_w >> lvl, 1).astype(jnp.float32)
    mip_h = jnp.maximum(base_h >> lvl, 1).astype(jnp.float32)

    # top-left texel of the bilinear footprint
    x0 = jnp.floor(uv[..., 0] * mip_w - 0.5).astype(jnp.int32)
    y0 = jnp.floor(uv[..., 1] * mip_h - 0.5).astype(jnp.int32)

    flat = pyramid_atlas.reshape(-1)
    xc = jnp.clip(x0, 0, jnp.maximum(mip_w.astype(jnp.int32) - 1, 0))
    yc = jnp.clip(y0, 0, jnp.maximum(mip_h.astype(jnp.int32) - 1, 0))
    return flat[(lvl * base_h + yc) * base_w + xc]


# --- shading helpers (used by ops/shade.py) ---


def oct_encode(v: jnp.ndarray) -> jnp.ndarray:
    # guarded: a degenerate (zero) normal encodes to (0,0) instead of NaN —
    # NaN here would survive the validity select and poison the composite
    denom = jnp.abs(v[..., 0]) + jnp.abs(v[..., 1]) + jnp.abs(v[..., 2])
    p = v[..., :2] / jnp.maximum(denom[..., None], 1e-20)
    s = jnp.where(v[..., :2] >= 0, 1.0, -1.0)
    r = jnp.where((v[..., 2] <= 0)[..., None], (1.0 - jnp.abs(p[..., ::-1])) * s, p)
    return r


def oct_decode(e: jnp.ndarray) -> jnp.ndarray:
    vz = 1.0 - jnp.abs(e[..., 0]) - jnp.abs(e[..., 1])
    t = jnp.maximum(-vz, 0.0)
    vx = e[..., 0] + jnp.where(e[..., 0] >= 0, -t, t)
    vy = e[..., 1] + jnp.where(e[..., 1] >= 0, -t, t)
    v = jnp.stack([vx, vy, vz], axis=-1)
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / jnp.maximum(n, 1e-20)


def to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(jnp.maximum(c, 0.0), 1.0 / 2.2)


def from_srgb(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(jnp.maximum(c, 0.0), 2.2)


def tonemap(c: jnp.ndarray) -> jnp.ndarray:
    """Hejl/Burgess-Dawson filmic operator (reference math.h:89-95)."""
    x = jnp.maximum(0.0, c - 0.004)
    return (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)


def gradient_noise(uv: jnp.ndarray) -> jnp.ndarray:
    """Jimenez interleaved gradient noise (reference math.h:97-102)."""
    f = 52.9829189 * jnp.modf(uv[..., 0] * 0.06711056 + uv[..., 1] * 0.00583715)[0]
    return jnp.modf(f)[0]

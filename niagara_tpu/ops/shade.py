"""Deferred shading over the visibility buffer.

Two dense per-pixel passes, mirroring the reference's split between the
fragment shader's G-buffer write (mesh.frag.glsl) and the deferred composite
(final.comp.glsl):

1. `shade_gbuffer` — resolve each visible fragment's triangle, interpolate
   attributes perspective-correctly, sample the material, and produce the two
   G-buffer planes with the reference's exact encodings (srgb albedo +
   log2 emissive scale; octahedral normal + gloss).
2. `composite` — decode the G-buffer, apply sun N·L + Blinn-Phong + ambient +
   shadow + emissive + bloom, filmic tonemap and deband noise.

Both are pure VPU work: the visibility-buffer design pushes all the
irregularity into the raster scatter, so shading is fully dense.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import MESH_MAXTRI
from . import cullmath
from .raster import INVALID_FRAG


def shade_gbuffer(fb, tc, setup, scene, width, height, textures=None):
    """Visibility buffer -> G-buffer planes [H,W,4] x2 (reference
    mesh.frag.glsl:55-95 semantics).

    Fragment ids are compacted-triangle slots; setup['tri_k'/'tri_t'] map
    them back to (cluster, local tri).  `textures` (render.textures
    .TextureTable) enables albedo/normal/specular/emissive sampling with
    per-fragment mip selection; alpha-tested draws (postPass>0) discard
    below 0.5 alpha at shade time (a visibility-buffer approximation of the
    reference's fragment discard, mesh.frag.glsl:88-89)."""
    frag = fb.vis
    valid = frag != INVALID_FRAG
    f = jnp.where(valid, frag, 0)

    # ONE row gather per pixel: the packed per-triangle shading record
    # (corner screen pos + viewz + world normal + uv, vertex/draw/material
    # ids) built by compact_setup.  Per-element gathers cost ~20ns each on
    # this TPU, so folding ~15 of them into one 120B row fetch is the
    # difference between ~400ms and ~70ms of shading at 1080p.
    rec = setup["shade_rec"][f]  # [H,W,30]

    def corner(c):
        o = c * 8
        return rec[..., o], rec[..., o + 1], rec[..., o + 2], rec[..., o + 3 : o + 6], rec[..., o + 6 : o + 8]

    x0c, y0c, vz0, n0, uv0 = corner(0)
    x1c, y1c, vz1, n1, uv1 = corner(1)
    x2c, y2c, vz2, n2, uv2 = corner(2)
    sx = [x0c, x1c, x2c]
    sy = [y0c, y1c, y2c]
    vids = [rec[..., 24].astype(jnp.int32), rec[..., 25].astype(jnp.int32), rec[..., 26].astype(jnp.int32)]
    draw_id = rec[..., 27].astype(jnp.int32)
    mat = rec[..., 28].astype(jnp.int32)
    post = rec[..., 29].astype(jnp.int32)

    # screen-space barycentrics at the pixel center
    px = jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5

    def edge_at(axp, ayp, bxp, byp):
        return (px - axp) * (byp - ayp) - (py - ayp) * (bxp - axp)

    w0 = edge_at(x1c, y1c, x2c, y2c)  # opposite corner 0
    w1 = edge_at(x2c, y2c, x0c, y0c)
    w2 = edge_at(x0c, y0c, x1c, y1c)
    wsum = w0 + w1 + w2
    inv = jnp.where(jnp.abs(wsum) < 1e-20, 0.0, 1.0 / wsum)
    b0, b1, b2 = w0 * inv, w1 * inv, w2 * inv

    # perspective correction: weights divided by view-space z
    pw0 = b0 / jnp.maximum(vz0, 1e-12)
    pw1 = b1 / jnp.maximum(vz1, 1e-12)
    pw2 = b2 / jnp.maximum(vz2, 1e-12)
    pws = pw0 + pw1 + pw2
    pinv = jnp.where(jnp.abs(pws) < 1e-20, 0.0, 1.0 / pws)

    def interp3(a0, a1, a2):
        return (pw0[..., None] * a0 + pw1[..., None] * a1 + pw2[..., None] * a2) * pinv[..., None]

    normal = interp3(n0, n1, n2)  # world space (rotated at transform time)
    uv = interp3(uv0, uv1, uv2)

    nlen = jnp.sqrt(jnp.sum(normal * normal, axis=-1, keepdims=True))
    normal = normal / jnp.maximum(nlen, 1e-20)

    nrm = normal

    if textures is not None:
        # per-fragment mip from the triangle's texel/pixel area ratio
        u0, u1, u2 = uv0, uv1, uv2
        uv_area = jnp.abs(
            (u1[..., 0] - u0[..., 0]) * (u2[..., 1] - u0[..., 1])
            - (u1[..., 1] - u0[..., 1]) * (u2[..., 0] - u0[..., 0])
        )
        px_area = jnp.abs(
            (sx[1] - sx[0]) * (sy[2] - sy[0]) - (sy[1] - sy[0]) * (sx[2] - sx[0])
        )
        duv = uv_area / jnp.maximum(px_area, 1e-6)
        albedo, specgloss, emissive, nmap, tex_ids = _sample_materials(
            scene, textures, mat, uv, duv
        )

        if nmap is not None:
            # TBN from interpolated vertex tangents (reference mesh.frag.
            # glsl:78-80); tangents fetched lazily: 3 row gathers
            q = scene.draw_orientation[draw_id]
            tangent = interp3(scene.tangents[vids[0]], scene.tangents[vids[1]], scene.tangents[vids[2]])
            tangent_xyz = cullmath.rotate_quat(tangent[..., :3], q)
            tlen = jnp.sqrt(jnp.sum(tangent_xyz * tangent_xyz, axis=-1, keepdims=True))
            tdir = tangent_xyz / jnp.maximum(tlen, 1e-20)
            bitangent = jnp.cross(nrm, tdir) * tangent[..., 3:4]
            mapped = nmap[..., 0:1] * tdir + nmap[..., 1:2] * bitangent + nmap[..., 2:3] * nrm
            mlen = jnp.sqrt(jnp.sum(mapped * mapped, axis=-1, keepdims=True))
            mapped = mapped / jnp.maximum(mlen, 1e-20)
            nrm = jnp.where((tex_ids[..., 1] > 0)[..., None], mapped, nrm)

        # alpha test for postPass>0 draws (shade-time discard)
        valid = valid & ~((post > 0) & (albedo[..., 3] < 0.5))
    else:
        # material factors only (reference untextured OBJ mode): one
        # megarow fetch instead of three per-table gathers
        row = _mat_rows(scene.mat_row, mat)
        albedo = row[..., 0:4]
        specgloss = row[..., 4:8]
        emissive = row[..., 8:11]

    lum = jnp.array([0.3, 0.6, 0.1], dtype=jnp.float32)
    emissivef = jnp.sum(emissive * lum, axis=-1) / (jnp.sum(albedo[..., :3] * lum, axis=-1) + 1e-3)

    g0 = jnp.concatenate(
        [
            cullmath.to_srgb(albedo[..., :3]),
            (jnp.log2(1.0 + emissivef) / 5.0)[..., None],
        ],
        axis=-1,
    )
    g1 = jnp.concatenate(
        [
            cullmath.oct_encode(nrm) * 0.5 + 0.5,
            specgloss[..., 3:4],
            jnp.zeros_like(specgloss[..., :1]),
        ],
        axis=-1,
    )

    valid4 = valid[..., None]
    g0 = jnp.where(valid4, g0, 0.0)
    g1 = jnp.where(valid4, g1, 0.0)
    return g0, g1, valid


def _mat_rows(mat_row, mat):
    """Per-pixel material megarows.  Small material tables (<= 16 entries)
    use an unrolled masked-sum select — a fused dense chain XLA streams at
    memory rate — instead of a per-pixel gather (~12 ns/px latency-bound on
    this chip: one full [1080p] gather plane saved)."""
    nm = mat_row.shape[0]
    if nm > 16:
        return mat_row[mat]
    acc = jnp.where((mat == 0)[..., None], mat_row[0], 0.0)
    for i in range(1, nm):
        acc = acc + jnp.where((mat == i)[..., None], mat_row[i], 0.0)
    return acc


def _sample_materials(scene, textures, mat, uv, duv):
    """Material fetch + texture sampling shared by both shading paths
    (reference mesh.frag.glsl:62-80), written to the chip's gather cost
    model: per-pixel gathers run ~13-20ms per 1080p plane regardless of row
    width, so everything per-material rides ONE mat_row fetch (factors,
    tex ids, albedo mip-0 area + analytic addressing metadata) and each
    USED texture slot costs one quad-footprint gather (+ one mip-row
    gather for slots without analytic metadata).  Unused slots (static
    scene.texture_slots) are skipped at trace time.

    Returns (albedo, specgloss, emissive, nmap-or-None, tex_ids)."""
    from ..render import textures as tex_mod

    row = _mat_rows(scene.mat_row, mat)  # [H,W,20]: all material data
    albedo = row[..., 0:4]
    specgloss = row[..., 4:8]
    emissive = row[..., 8:11]
    tex_ids = row[..., 11:15].astype(jnp.int32)
    # albedo mip-0 texel area baked into the row at upload (needs the
    # texture table there); falls back to a mip-rows gather when absent
    area = row[..., 15]
    mip = tex_mod.select_mip_from_area(duv, jnp.maximum(area, 1.0))

    # analytic mip addressing for the albedo slot (textures.sample meta
    # path): exact only while pool offsets fit f32 (< 2^24 texels)
    meta0 = None
    if (getattr(scene, "has_texture_meta", False)
            and row.shape[-1] >= 20 and textures.texels.shape[0] < (1 << 24)):
        meta0 = tuple(row[..., 16 + i].astype(jnp.int32) for i in range(4))

    def tex(idx, meta=None):
        return tex_mod.sample(textures, tex_ids[..., idx], uv, mip, meta=meta)

    slots = scene.texture_slots
    if slots[0]:
        albedo_t = tex(0, meta=meta0)
        albedo = albedo * jnp.where(
            (tex_ids[..., 0] > 0)[..., None],
            jnp.concatenate([cullmath.from_srgb(albedo_t[..., :3]), albedo_t[..., 3:]], axis=-1),
            1.0,
        )
    nmap = tex(1)[..., :3] * 2.0 - 1.0 if slots[1] else None
    if slots[2]:
        specgloss_t = cullmath.from_srgb(tex(2))
        specgloss = specgloss * jnp.where((tex_ids[..., 2] > 0)[..., None], specgloss_t, 1.0)
    if slots[3]:
        emissive_t = cullmath.from_srgb(tex(3)[..., :3])
        emissive = emissive * jnp.where((tex_ids[..., 3] > 0)[..., None], emissive_t, 1.0)
    return albedo, specgloss, emissive, nmap, tex_ids


def _screen_space_tbn(wpos, uv, nrm):
    """Tangent frame from screen-space finite differences of world position
    and uv (Schüler, "Normal Mapping Without Precomputed Tangents").

    The dense fast path has no per-pixel vertex-tangent gather (that gather
    is exactly the cost it exists to avoid), so normal maps use derivative
    tangents — the same quantities a GPU fragment quad would produce with
    dFdx/dFdy.  Differs from the reference's precomputed vertex tangents by
    design; interiors of triangles agree to ~1e-2 on continuous uv charts
    (tests/test_textured_fast.py), silhouette/boundary pixels may not."""
    def ddx(a):
        d = a[:, 1:] - a[:, :-1]
        return jnp.concatenate([d, d[:, -1:]], axis=1)

    def ddy(a):
        # upward difference: image rows run top-down, but the tangent-frame
        # convention wants derivatives in a y-up screen space (otherwise the
        # computed tangent flips sign)
        d = a[:-1, :] - a[1:, :]
        return jnp.concatenate([d, d[-1:, :]], axis=0)

    dp1, dp2 = ddx(wpos), ddy(wpos)
    du1, dv1 = ddx(uv[..., 0]), ddx(uv[..., 1])
    du2, dv2 = ddy(uv[..., 0]), ddy(uv[..., 1])
    dp2perp = jnp.cross(dp2, nrm)
    dp1perp = jnp.cross(nrm, dp1)
    t = dp2perp * du1[..., None] + dp1perp * du2[..., None]
    b = dp2perp * dv1[..., None] + dp1perp * dv2[..., None]
    inv = jax.lax.rsqrt(
        jnp.maximum(
            jnp.maximum(jnp.sum(t * t, axis=-1), jnp.sum(b * b, axis=-1)), 1e-20
        )
    )[..., None]
    return t * inv, b * inv


def gbuffer_from_attrs(attrs_img, valid, scene, textures=None, *, depth=None,
                       inverse_view_projection=None):
    """Dense G-buffer encode from per-pixel attribute planes produced by the
    Pallas shade kernel (ops/raster_tile.shade_tiles) — no per-pixel record
    gather.  Channel layout: 0-2 world normal, 3-4 uv, 5 viewz, 6 draw id,
    7 material, 8 postPass, 9-11 corner vertex ids, 12 uv-derivative ratio.

    With `textures`, samples albedo/specular/emissive and alpha-tests
    postPass>0 pixels exactly like shade_gbuffer (channel 12 carries the
    per-triangle uv derivative, so mip picks are bit-identical).  Normal
    maps additionally need `depth` + `inverse_view_projection` for the
    screen-space tangent frame (_screen_space_tbn) — pass them when any
    material carries a normal map."""
    normal = attrs_img[..., 0:3]
    mat = attrs_img[..., 7].astype(jnp.int32)

    nlen = jnp.sqrt(jnp.sum(normal * normal, axis=-1, keepdims=True))
    nrm = normal / jnp.maximum(nlen, 1e-20)

    if textures is None:
        nm = scene.mat_diffuse.shape[0]
        if nm == 1:
            albedo = jnp.broadcast_to(scene.mat_diffuse[0], nrm.shape[:-1] + (4,))
            specgloss = jnp.broadcast_to(scene.mat_specular[0], nrm.shape[:-1] + (4,))
            emissive = jnp.broadcast_to(scene.mat_emissive[0], nrm.shape[:-1] + (3,))
        else:
            row = _mat_rows(scene.mat_row, mat)  # one megarow fetch
            albedo = row[..., 0:4]
            specgloss = row[..., 4:8]
            emissive = row[..., 8:11]
    else:
        uv = attrs_img[..., 3:5]
        duv = attrs_img[..., 12]
        post = attrs_img[..., 8].astype(jnp.int32)
        albedo, specgloss, emissive, nmap, tex_ids = _sample_materials(
            scene, textures, mat, uv, duv
        )
        if nmap is not None and depth is not None and inverse_view_projection is not None:
            h, w = depth.shape
            px = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) / w
            py = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5) / h
            clip = jnp.stack(
                [
                    jnp.broadcast_to(px * 2.0 - 1.0, depth.shape),
                    jnp.broadcast_to(1.0 - py * 2.0, depth.shape),
                    depth,
                    jnp.ones_like(depth),
                ],
                axis=-1,
            )
            wposh = clip @ inverse_view_projection.T
            wpos = wposh[..., :3] / jnp.where(
                jnp.abs(wposh[..., 3:]) < 1e-20, 1e-20, wposh[..., 3:]
            )
            tdir, bdir = _screen_space_tbn(wpos, uv, nrm)
            mapped = nmap[..., 0:1] * tdir + nmap[..., 1:2] * bdir + nmap[..., 2:3] * nrm
            mlen = jnp.sqrt(jnp.sum(mapped * mapped, axis=-1, keepdims=True))
            mapped = mapped / jnp.maximum(mlen, 1e-20)
            nrm = jnp.where((tex_ids[..., 1] > 0)[..., None], mapped, nrm)
        valid = valid & ~((post > 0) & (albedo[..., 3] < 0.5))

    lum = jnp.array([0.3, 0.6, 0.1], dtype=jnp.float32)
    emissivef = jnp.sum(emissive * lum, axis=-1) / (jnp.sum(albedo[..., :3] * lum, axis=-1) + 1e-3)

    g0 = jnp.concatenate(
        [cullmath.to_srgb(albedo[..., :3]), (jnp.log2(1.0 + emissivef) / 5.0)[..., None]],
        axis=-1,
    )
    g1 = jnp.concatenate(
        [
            cullmath.oct_encode(nrm) * 0.5 + 0.5,
            specgloss[..., 3:4],
            jnp.zeros_like(specgloss[..., :1]),
        ],
        axis=-1,
    )
    valid4 = valid[..., None]
    return jnp.where(valid4, g0, 0.0), jnp.where(valid4, g1, 0.0), valid


def pack_gbuffer(g0, g1, valid):
    """Quantize the G-buffer planes to the reference's actual storage
    encodings — g0 as rgba8, g1 as 10/10/10+2 (reference mesh.frag.glsl:85-86
    writes rgba8 albedo/emissive and a2bgr10 octahedral normal+gloss) — and
    pack each into ONE i32 plane.  All channels are in [0,1] by
    construction (srgb albedo, log-encoded emissive, oct*0.5+0.5 normal,
    gloss); g1's unused 4th channel yields 2 spare bits, bit 30 of which
    carries `valid`.

    Invalid pixels pack to exactly 0, so a psum of disjoint owner planes
    reconstructs the owner's packed value bit-exactly — the multi-chip
    sort-last composite reduces 2 i32 planes (8 B/px) instead of 8 f32
    channels + a valid plane (36 B/px).  Returns (p0, p1) i32 [H, W]."""
    q0 = jnp.round(jnp.clip(g0, 0.0, 1.0) * 255.0).astype(jnp.uint32)
    p0 = q0[..., 0] | (q0[..., 1] << 8) | (q0[..., 2] << 16) | (q0[..., 3] << 24)
    q1 = jnp.round(jnp.clip(g1[..., :3], 0.0, 1.0) * 1023.0).astype(jnp.uint32)
    p1 = (q1[..., 0] | (q1[..., 1] << 10) | (q1[..., 2] << 20)
          | (valid.astype(jnp.uint32) << 30))
    v = valid  # invalid pixels must contribute 0 to the psum union
    return (jnp.where(v, p0, 0).astype(jnp.int32),
            jnp.where(v, p1, 0).astype(jnp.int32))


def unpack_gbuffer(p0, p1):
    """Inverse of pack_gbuffer: (p0, p1) i32 -> (g0 [H,W,4], g1 [H,W,4],
    valid [H,W] bool).  g1's 4th channel is restored as zero (it is zero by
    construction in the shade path)."""
    p0 = p0.astype(jnp.uint32)
    p1 = p1.astype(jnp.uint32)
    g0 = jnp.stack(
        [((p0 >> s) & 255).astype(jnp.float32) * (1.0 / 255.0) for s in (0, 8, 16, 24)],
        axis=-1,
    )
    c1 = [((p1 >> s) & 1023).astype(jnp.float32) * (1.0 / 1023.0) for s in (0, 10, 20)]
    g1 = jnp.stack(c1 + [jnp.zeros_like(c1[0])], axis=-1)
    return g0, g1, ((p1 >> 30) & 1) > 0


def _lit_color(g0, g1, depth, *, camera_position, sun_direction,
               inverse_view_projection, shadow_term, width: int, height: int):
    """Decode one G-buffer layer and light it (the shared core of the
    reference's final.comp.glsl:42-76: N·L sun + Blinn-Phong + ambient +
    shadow + emissive)."""
    albedo = cullmath.from_srgb(g0[..., :3])
    emissive = albedo * (jnp.exp2(g0[..., 3] * 5.0) - 1.0)[..., None]
    normal = cullmath.oct_decode(g1[..., :2] * 2.0 - 1.0)

    ndotl = jnp.maximum(jnp.sum(normal * sun_direction, axis=-1), 0.0)

    # world position from depth (reference final.comp.glsl:52-54)
    px = (jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5) / width
    py = (jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5) / height
    ndc_x = px * 2.0 - 1.0
    ndc_y = 1.0 - py * 2.0
    clip = jnp.stack(
        [jnp.broadcast_to(ndc_x, depth.shape), jnp.broadcast_to(ndc_y, depth.shape), depth, jnp.ones_like(depth)],
        axis=-1,
    )
    wposh = clip @ inverse_view_projection.T
    wpos = wposh[..., :3] / jnp.where(jnp.abs(wposh[..., 3:]) < 1e-20, 1e-20, wposh[..., 3:])

    view = camera_position - wpos
    vlen = jnp.sqrt(jnp.sum(view * view, axis=-1, keepdims=True))
    view = view / jnp.maximum(vlen, 1e-20)
    halfv = view + sun_direction
    hlen = jnp.sqrt(jnp.sum(halfv * halfv, axis=-1, keepdims=True))
    halfv = halfv / jnp.maximum(hlen, 1e-20)
    ndoth = jnp.maximum(jnp.sum(normal * halfv, axis=-1), 0.0)
    gloss = g1[..., 2]
    specular = jnp.power(jnp.maximum(ndoth, 1e-6), 1.0 + 63.0 * gloss) * gloss

    ambient = 0.07
    shadow_ambient = 0.05
    sun_intensity = 2.5

    color = albedo * (ndotl * jnp.minimum(shadow_term + shadow_ambient, 1.0) * sun_intensity + ambient)[..., None]
    color = color + (specular * shadow_term)[..., None] * sun_intensity
    return color + emissive


def composite(
    g0,
    g1,
    depth,
    valid,
    *,
    camera_position,
    sun_direction,
    inverse_view_projection,
    shadow=None,
    bloom=None,
    width: int,
    height: int,
    transmission=None,
):
    """G-buffer -> tonemapped image [H,W,3] (reference final.comp.glsl:37-80).

    `transmission` = (g0t, g1t, depth_t, valid_t): the transmission draw
    class's own shaded layer (reference postPass=2 classification,
    scene.cpp:584-588 — the reference classifies these draws but never
    rasterizes them; this engine defines their semantics as a depth-tested
    50/50 blend: where the front-most transmission surface is nearer than
    the opaque depth, the lit transmission color mixes equally with what is
    behind it — light passes through, tinted)."""
    shadow_term = shadow if shadow is not None else jnp.ones_like(depth)
    color = _lit_color(
        g0, g1, depth,
        camera_position=camera_position, sun_direction=sun_direction,
        inverse_view_projection=inverse_view_projection, shadow_term=shadow_term,
        width=width, height=height,
    )
    if bloom is not None:
        color = color + bloom * 0.1

    # background stays black where nothing was rasterized
    color = jnp.where(valid[..., None], color, 0.0)

    if transmission is not None:
        g0t, g1t, depth_t, valid_t = transmission
        tcol = _lit_color(
            g0t, g1t, depth_t,
            camera_position=camera_position, sun_direction=sun_direction,
            inverse_view_projection=inverse_view_projection,
            shadow_term=jnp.ones_like(depth_t),
            width=width, height=height,
        )
        # visible where in front of the opaque surface (reverse-Z: greater
        # = nearer) or over empty background
        t_front = valid_t & ((depth_t > depth) | ~valid)
        color = jnp.where(t_front[..., None], color * 0.5 + tcol * 0.5, color)

    xy = jnp.stack(
        [
            jnp.broadcast_to(jnp.arange(width, dtype=jnp.float32)[None, :], depth.shape),
            jnp.broadcast_to(jnp.arange(height, dtype=jnp.float32)[:, None], depth.shape),
        ],
        axis=-1,
    )
    deband = cullmath.gradient_noise(xy) * 2.0 - 1.0
    return cullmath.tonemap(color) + (deband * (0.5 / 255.0))[..., None]


def _hash_color(h):
    """Integer hash -> rgb in [0,1] (reference meshlet.mesh.glsl:74-83 hash)."""
    h = (h + 0x7ED55D16) + (h << 12)
    h = (h ^ 0xC761C23C) ^ (h >> 19)
    h = (h + 0x165667B1) + (h << 5)
    h = (h + 0xD3A2646C) ^ (h << 9)
    h = (h + 0xFD7046C5) + (h << 3)
    h = (h ^ 0xB55A4F09) ^ (h >> 16)
    return jnp.stack(
        [
            (h & 255).astype(jnp.float32) / 255.0,
            ((h >> 8) & 255).astype(jnp.float32) / 255.0,
            ((h >> 16) & 255).astype(jnp.float32) / 255.0,
        ],
        axis=-1,
    )


def debug_visualize(fb, tc, setup, mode: str = "meshlet"):
    """Debug color modes (reference DEBUG paths meshlet.mesh.glsl:118-121,
    mesh.frag.glsl:91-94): 'meshlet' hashes the meshlet id, 'draw' hashes the
    draw id, 'depth' shows the reverse-Z depth buffer."""
    frag = fb.vis
    valid = frag != INVALID_FRAG
    if mode == "depth":
        d = fb.depth / jnp.maximum(fb.depth.max(), 1e-8)
        return jnp.where(valid[..., None], jnp.stack([d, d, d], axis=-1), 0.0)
    f = jnp.where(valid, frag, 0)
    k = setup["tri_k"][f]
    if mode == "draw":
        key = tc["draw_id"][k]
    else:
        key = tc["mi"][k]
    color = _hash_color(key.astype(jnp.uint32))
    return jnp.where(valid[..., None], color, 0.0)

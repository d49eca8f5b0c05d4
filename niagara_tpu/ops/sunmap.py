"""Rasterized sun shadow map — the TPU-native fast path for sun shadows.

The reference traces sun shadows through a two-level BVH on RT cores
(shadow.comp.glsl, scenert.cpp).  `ops/shadow.py` reimplements that
faithfully, but serial BVH walks on VPU lanes are the one workload this
hardware has no silicon for: at 1M instances a diagonal 0.5M-ray trace
pierces hundreds of instance boxes per ray (~4000 walk steps, tens of
seconds).  The rasterizer, by contrast, is the fastest thing we have — so
the production path renders the scene from the sun with the SAME meshlet
cull + fused-setup + tile-raster pipeline into an orthographic depth map
and resolves shadows with a depth compare (+ PCF).  The RT path remains for
parity, alpha-tested any-hit, and small scenes.

Pipeline reuse: sun_cull/sun_cluster_cull are plane-free box tests in sun
space; triangle setup and rasterization go through the standard Olano-Greer
path with w == 1 (homogeneous edges reduce to exact 2D edge equations — the
comment in raster.compact_setup's cross_rows applies literally).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TASK_WGSIZE, TILE_H, TILE_W
from . import raster, raster_tile, stream_compact
from .cull import TaskCommands, build_task_commands


def fit_sun(sun_direction, scene_min, scene_max):
    """Orthographic sun frame fit to a world AABB.

    Returns a dict of static-shaped arrays: rows [3,3] (world -> sun basis:
    u, v along the map, w toward the scene i.e. -sun), lo/hi [3] extents in
    that basis.  Host-side (numpy) — the frame is per-scene/per-sun, not
    per-pixel."""
    L = -np.asarray(sun_direction, np.float32)
    L = L / np.linalg.norm(L)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    if abs(float(L @ up)) > 0.99:
        up = np.array([1.0, 0.0, 0.0], np.float32)
    u = np.cross(up, L)
    u /= np.linalg.norm(u)
    v = np.cross(L, u)
    rows = np.stack([u, v, L], axis=0).astype(np.float32)  # [3,3]

    mn = np.asarray(scene_min, np.float32)
    mx = np.asarray(scene_max, np.float32)
    corners = np.array(
        [[mn[0] if sx else mx[0], mn[1] if sy else mx[1], mn[2] if sz else mx[2]]
         for sx in (0, 1) for sy in (0, 1) for sz in (0, 1)], np.float32)
    sc = corners @ rows.T
    lo = sc.min(axis=0) - 1e-3
    hi = sc.max(axis=0) + 1e-3
    return dict(rows=jnp.asarray(rows), lo=jnp.asarray(lo), hi=jnp.asarray(hi))


def _to_sun(sf, p):
    """world [..,3] -> sun-basis coords."""
    return p @ sf["rows"].T


def fit_sun_to_draws(sun_direction, draws, margin: float = 8.0):
    """Data-driven sun frame: world AABB of all instance positions plus a
    margin for mesh radii (host-side)."""
    p = np.asarray(draws.position, np.float32)
    return fit_sun(sun_direction, p.min(axis=0) - margin, p.max(axis=0) + margin)


def sun_cull(scene, sf, camera_position, lod_target, lod_enabled, lod_bias: float = 4.0,
             texel_world: float | None = None, draw_range=None):
    """Per-draw cull for the sun map: world bounding sphere vs the sun
    ortho box (always-inside by construction when fit to the scene AABB,
    but draws outside a receiver-fit box drop out) + the reference's LOD
    rule evaluated with the MAIN camera distance (shadow detail follows
    the viewer, not the light).  Returns (emit [D] bool, lod [D] i32)."""
    from . import cullmath

    row = scene.draw_mesh_row  # [D, 5+MAX_LODS]: local center, radius, lod_count, errors
    center = (
        cullmath.rotate_quat(row[:, 0:3], scene.draw_orientation) * scene.draw_scale[:, None]
        + scene.draw_position
    )
    radius = row[:, 3] * scene.draw_scale

    cs = _to_sun(sf, center)
    inside = jnp.all((cs + radius[:, None] >= sf["lo"]) & (cs - radius[:, None] <= sf["hi"]), axis=1)
    # transmission draws (postPass=2) don't cast shadows — the reference
    # gives them a null BLAS in the RT instance list (scenert.cpp:515-517)
    inside = inside & (scene.draw_post_pass != 2)
    if draw_range is not None:
        # batched static-map build: each host-loop batch renders one id range
        d = jnp.arange(center.shape[0], dtype=jnp.int32)
        inside = inside & (d >= draw_range[0]) & (d < draw_range[1])

    if texel_world is not None:
        # camera-independent LOD for a CACHED map: the map texel, not the
        # screen pixel, bounds useful caster detail — pick the coarsest LOD
        # whose simplification error stays under one texel in world units
        threshold = jnp.full_like(scene.draw_scale, texel_world) / scene.draw_scale
    else:
        dist = jnp.maximum(
            jnp.sqrt(jnp.sum((center - camera_position[None, :]) ** 2, axis=-1)) - radius, 0.0
        )
        # lod_bias coarsens shadow casters relative to the main view
        threshold = dist * lod_target * lod_bias / scene.draw_scale
    lod_count = row[:, 4].astype(jnp.int32)
    errors = row[:, 5:]
    idxs = jnp.arange(errors.shape[1])[None, :]
    lod_valid = idxs < lod_count[:, None]
    passes = (errors < threshold[:, None]) & lod_valid
    lod = jnp.max(jnp.where(passes & (idxs > 0), idxs, 0), axis=1)
    lod = jnp.where(lod_enabled == 1, lod, 0)
    return inside, lod.astype(jnp.int32)


def sun_cluster_cull(scene, sf, cmds: TaskCommands, cluster_capacity: int):
    """Per-meshlet sun-box cull at [C,64] + segmented compaction."""
    C = cmds.draw_id.shape[0]
    lanes = jnp.arange(TASK_WGSIZE, dtype=jnp.int32)[None, :]
    valid = lanes < cmds.task_count[:, None]

    xf = scene.draw_xform_row[cmds.draw_id]  # [C,8]
    position = xf[:, None, 0:3]
    scale = xf[:, None, 3]
    orientation = xf[:, None, 4:8]

    off_safe = jnp.clip(cmds.task_offset, 0, scene.meshlet_cull_blocks.shape[0] - 1)
    blocks = scene.meshlet_cull_blocks[off_safe].astype(jnp.float32)  # [C,512]
    bch = lambda c: blocks[:, c * TASK_WGSIZE : (c + 1) * TASK_WGSIZE]
    center_local = jnp.stack([bch(0), bch(1), bch(2)], axis=-1)
    radius = bch(3) * scale

    from . import cullmath

    world = cullmath.rotate_quat(center_local, orientation) * scale[..., None] + position
    cs = world @ sf["rows"].T  # [C,64,3]
    inside = jnp.all(
        (cs + radius[..., None] >= sf["lo"]) & (cs - radius[..., None] <= sf["hi"]), axis=-1
    )
    emit2d = valid & inside
    lo, hi = stream_compact.pack_bits64(emit2d)
    pc = jnp.sum(emit2d, axis=1, dtype=jnp.int32)
    ccmd, clane, _, count = stream_compact.expand_segments(lo, hi, pc, cluster_capacity)
    overflow = jnp.maximum(count - cluster_capacity, 0).astype(jnp.int32)
    return ccmd, clane, jnp.minimum(count, cluster_capacity).astype(jnp.int32), overflow


def transform_sun(scene, sf, ccmd, clane, ccount, cmds, map_w: int, map_h: int):
    """Cluster-vertex transform into sun-map pixel space, shaped for
    raster.compact_setup: hx/hy are homogeneous pixel coords with w == 1
    (orthographic), zw is reverse depth in (0,1] (1 = nearest to the sun).
    """
    K = ccmd.shape[0]
    k = jnp.arange(K, dtype=jnp.int32)
    live = k < ccount

    draw_id = cmds.draw_id[ccmd]
    mi = jnp.clip(cmds.task_offset[ccmd] + clane, 0, scene.meshlet_vertices.shape[0] - 1)

    vid = scene.meshlet_vertices[mi]
    tri = scene.meshlet_tris[mi]
    tri_count = scene.meshlet_triangle_count[mi]

    vdata = scene.meshlet_vdata[mi]  # [K,64,8]
    pos = vdata[..., 0:3]
    xf = scene.draw_xform_row[draw_id]
    q = xf[:, None, 4:8]
    s = xf[:, None, None, 3]
    t = xf[:, None, 0:3]
    qv = q[..., :3]
    qw = q[..., 3:4]
    tmp = jnp.cross(qv, pos) + qw * pos
    world = (pos + 2.0 * jnp.cross(qv, tmp)) * s + t

    sc = world @ sf["rows"].T  # [K,64,3] sun-basis
    ext = sf["hi"] - sf["lo"]
    px = (sc[..., 0] - sf["lo"][0]) / ext[0] * map_w
    py = (sc[..., 1] - sf["lo"][1]) / ext[1] * map_h
    # reverse depth: near the sun (small w-coord) -> 1, far -> ~0+
    d01 = (sc[..., 2] - sf["lo"][2]) / ext[2]
    zw = 1.0 - 0.998 * d01

    one = jnp.ones_like(px)
    tri_valid = (
        live[:, None]
        & (jnp.arange(tri.shape[1])[None, :] < tri_count[:, None])
    )
    out = dict(
        tri_valid=tri_valid,
        vid=vid,
        hx=px,  # w == 1: homogeneous == screen coords
        hy=py,
        zw=zw,
        viewz=one,
        tri=tri,
        draw_id=draw_id,
        mi=mi,
        count=jnp.reshape(ccount, (1,)),
        # post-class casters render double-sided (backface flip in
        # compact_setup) and alpha-test against their opacity masks —
        # foliage casts cutout shadows (reference shadow.comp.glsl:78-123)
        post_pass=scene.draw_post_pass[draw_id],
    )
    if getattr(scene, "has_alpha_masks", False):
        out["alpha"] = scene.meshlet_alpha[mi]
        out["uv"] = vdata[..., 6:8]  # the raster-time test maps uv -> cell
    return out


def render_sun_map(scene, sf, *, camera_position=None, lod_target=None, lod_enabled=1,
                   map_w: int = 2048, map_h: int = 2048,
                   cmd_capacity: int = 1 << 16, cluster_capacity: int = 1 << 16,
                   tri_capacity: int = 1 << 19, pair_capacity: int = 1 << 20,
                   max_groups: int = 8, lod_bias: float = 4.0,
                   texel_world: float | None = None, draw_range=None,
                   depth_tiles=None, interpret: bool = False,
                   row_window: tuple[int, int] | None = None):
    """Depth-only render of the scene (or one draw-id batch) from the sun.

    Returns ([map_h, map_w] reverse-depth image, depth tiles, drop count).
    Pass `depth_tiles` from a previous batch to accumulate (reverse depth
    merges by max — the role of the depth test across batches).

    `row_window=(row0, n_rows)`: render only that tile-row band of the map
    (depth_tiles must then be the band slice and the returned image/tiles
    cover the band only) — the dirty-row incremental update path.  Coverage
    arithmetic is full-map, so band rows are bit-identical to a full render
    (raster_tile.rasterize_tiles row_window)."""
    emit, lod = sun_cull(
        scene, sf, camera_position, lod_target, lod_enabled,
        lod_bias=lod_bias, texel_world=texel_world, draw_range=draw_range,
    )
    dvb = jnp.ones(scene.num_draws, dtype=jnp.int32)
    cmds = build_task_commands(scene, emit, lod, dvb, max_groups=max_groups, capacity=cmd_capacity)
    ccmd, clane, ccount, coverflow = sun_cluster_cull(scene, sf, cmds, cluster_capacity)
    tc = transform_sun(scene, sf, ccmd, clane, ccount, cmds, map_w, map_h)
    st = raster.compact_setup(tc, map_w, map_h, 1e-3, tri_capacity)

    tiles_x = map_w // TILE_W
    tiles_y = map_h // TILE_H
    band_rows = row_window[1] if row_window is not None else tiles_y
    band_h = band_rows * TILE_H
    n_tiles = tiles_x * band_rows
    if depth_tiles is None:
        depth_tiles = jnp.zeros((n_tiles, TILE_H, TILE_W), jnp.float32)
    vis_t = jnp.full((n_tiles, TILE_H, TILE_W), raster.INVALID_FRAG, jnp.int32)
    depth_tiles, vis_t, rst = raster_tile.rasterize_tiles(
        st, depth_tiles, vis_t, tiles_x=tiles_x, tiles_y=tiles_y,
        pair_capacity=pair_capacity, interpret=interpret,
        row_window=row_window,
        # alpha-test casters against their baked opacity masks so cutouts
        # (foliage) cast holed shadows; static variant — opaque-only scenes
        # pay nothing
        alpha_test=bool(getattr(scene, "has_alpha_masks", False)),
    )
    dropped = cmds.dropped + coverflow + st["dropped"] + rst["huge_dropped"]
    return raster_tile.tiles_to_image(depth_tiles, band_h, map_w), depth_tiles, dropped


_STEP_CACHE: dict = {}


def build_static_sun_map(scene, sf, *, map_w: int = 2048, map_h: int = 2048,
                         batch: int = 1 << 14, cmd_capacity: int = 1 << 16,
                         cluster_capacity: int = 1 << 16, tri_capacity: int = 1 << 19,
                         pair_capacity: int = 1 << 20, max_groups: int = 8,
                         texel_world: float | None = None, interpret: bool = False,
                         num_draws: int | None = None, return_tiles: bool = False):
    """Cached sun map for static scenes: host loop over draw-id batches so a
    1M-instance scene (1 command per draw — the sun sees everything) never
    overflows the per-pass command or cluster capacities (batch defaults to
    16K draws: ~4 texel-LOD meshlets per draw headroom at 64K clusters).
    LOD is texel-based, so the result is camera-independent and reusable
    every frame; animated draws belong in a per-frame `update_sun_map`
    overlay instead (cap the static build with `num_draws` when animated
    draws occupy the tail id range).
    Returns ([map_h, map_w] map, total drop count — must be 0 for a
    complete map; shrink `batch` if not), plus the raw depth tiles when
    `return_tiles` (the cached input of update_sun_map)."""
    import functools

    if texel_world is None:
        ext = np.asarray(jax.device_get(sf["hi"] - sf["lo"]))
        texel_world = float(max(ext[0] / map_w, ext[1] / map_h))
    D = int(scene.num_draws) if num_draws is None else int(num_draws)
    n_batches = -(-D // batch)

    key = (map_w, map_h, cmd_capacity, cluster_capacity, tri_capacity,
           pair_capacity, max_groups, round(texel_world, 9), interpret)
    step = _STEP_CACHE.get(key)
    if step is None:
        step = jax.jit(functools.partial(
            render_sun_map, map_w=map_w, map_h=map_h, cmd_capacity=cmd_capacity,
            cluster_capacity=cluster_capacity, tri_capacity=tri_capacity,
            pair_capacity=pair_capacity, max_groups=max_groups,
            texel_world=texel_world, interpret=interpret,
        ))
        _STEP_CACHE[key] = step

    tiles = None
    dropped = jnp.int32(0)
    img = None
    for b in range(n_batches):
        rng = (jnp.int32(b * batch), jnp.int32(min((b + 1) * batch, D)))
        img, tiles, drop_b = step(scene, sf, draw_range=rng, depth_tiles=tiles)
        dropped = dropped + drop_b
    if return_tiles:
        return img, dropped, tiles
    return img, dropped


def update_sun_map(scene, sf, static_tiles, draw_range, *, map_w: int = 2048,
                   map_h: int = 2048, texel_world: float | None = None,
                   row_window: tuple[int, int] | None = None, **kw):
    """Per-frame sun-map update for animated scenes: rasterize only the
    animated draw-id range onto the CACHED static depth tiles (the
    static/dynamic shadow-map split; reference re-traces every frame on RT
    cores, niagara.cpp:1792-1855 — here the static 99% of the scene is
    amortized and the animated tail costs one small raster pass).

    `static_tiles` comes from build_static_sun_map(..., num_draws=first
    animated id, return_tiles=True).  Reverse depth merges by max, which is
    order-independent, so the result is identical to a full rebuild at the
    animated draws' current transforms.  `scene` must carry the CURRENT
    transforms (render.animation.apply_to_draws).  Jit-friendly: wrap in
    jax.jit with static capacities for per-frame use.

    `row_window=(row0, n_rows)` (from dirty_tile_rows): raster + return only
    that tile-row band — the returned image/tiles cover the band and the
    static tiles outside it are untouched by construction, so callers merge
    with pack_band/dynamic slicing (VERDICT r4 #4: the full-map update
    re-rasterized 4096 tiles and repacked a [4M,4] table for a tail that
    touches a handful of tile rows).  Band output is bit-identical to the
    matching rows of a full update; casters outside a too-small window show
    up in the drop count.

    Returns ([band_h, map_w] map, band depth tiles, drop count)."""
    if texel_world is None:
        ext = np.asarray(jax.device_get(sf["hi"] - sf["lo"]))
        texel_world = float(max(ext[0] / map_w, ext[1] / map_h))
    if row_window is not None:
        tiles_x = map_w // TILE_W
        row0, n_rows = row_window
        static_tiles = jax.lax.slice_in_dim(
            static_tiles, row0 * tiles_x, (row0 + n_rows) * tiles_x, axis=0)
    return render_sun_map(
        scene, sf, map_w=map_w, map_h=map_h, texel_world=texel_world,
        draw_range=draw_range, depth_tiles=static_tiles,
        row_window=row_window, **kw,
    )


def dirty_tile_rows(sf, positions, radius, map_h: int, *, margin: float = 0.0,
                    pad_rows: int = 1):
    """Conservative tile-row window covering world spheres (host-side).

    positions [N,3] world centers (numpy or device), radius scalar or [N]
    bounding radii, margin extra world units (e.g. the animation's maximum
    displacement) — returns (row0, n_rows) static ints for
    update_sun_map(row_window=...).  Conservative: every caster whose
    sphere + margin fits the window rasters entirely inside it."""
    rows = np.asarray(jax.device_get(sf["rows"]))
    lo = np.asarray(jax.device_get(sf["lo"])); hi = np.asarray(jax.device_get(sf["hi"]))
    p = np.asarray(jax.device_get(positions), np.float32)
    r = np.broadcast_to(np.asarray(radius, np.float32), (p.shape[0],)) + margin
    sy = p @ rows[1]
    scale = map_h / (hi[1] - lo[1])
    py0 = (sy - r - lo[1]) * scale
    py1 = (sy + r - lo[1]) * scale
    tiles_y = map_h // TILE_H
    r0 = int(np.floor(py0.min() / TILE_H)) - pad_rows
    r1 = int(np.ceil(py1.max() / TILE_H)) + pad_rows
    r0 = max(r0, 0)
    r1 = min(max(r1, r0 + 1), tiles_y)
    return r0, r1 - r0


def pack_band(packed_static, band_img, row0_px: int, map_h: int,
              row_above=None, row_below=None):
    """Splice a dirty band's quads into a cached pack_sun_map table.

    band_img [bh, W] holds map rows [row0_px, row0_px+bh) after the band
    update.  A quad row y reads map rows y and y+1, so rows
    [row0_px-1, row0_px+bh) of the table change: `row_above` must be the
    STATIC map row row0_px-1 (omit when the band starts at 0) and
    `row_below` the STATIC row row0_px+bh (omit when the band ends at
    map_h — pack_sun_map's edge clamp then applies).  Both are unchanged by
    the update, so callers slice them from the cached static map once.
    Returns the updated [map_h*W, 4] table (bit-identical to
    pack_sun_map(full updated map))."""
    bh, w = band_img.shape
    parts = []
    above = row_above is not None and row0_px > 0
    if above:
        parts.append(jnp.reshape(row_above, (1, w)))
    parts.append(band_img)
    if row0_px + bh < map_h:
        assert row_below is not None, "interior band needs the static row below"
        parts.append(jnp.reshape(row_below, (1, w)))
    ext = jnp.concatenate(parts, axis=0)
    q = pack_sun_map(ext)
    n_q = (1 if above else 0) + bh  # quads for rows [row0_px-above, row0_px+bh)
    q = q[: n_q * w]
    start = (row0_px - (1 if above else 0)) * w
    return jax.lax.dynamic_update_slice(packed_static, q, (start, 0))


def pack_sun_map(sun_map):
    """Quad-pack the map for the resolve: row (y*W + x) holds the 2x2 PCF
    footprint [z(x,y), z(x+1,y), z(x,y+1), z(x+1,y+1)] (edge-clamped) so one
    16-byte row gather replaces four element gathers.  Gathers on this chip
    are latency-bound (~11-15ns/row regardless of width, tools/bwprobe.py),
    so the packed resolve runs ~4x the unpacked one.  Build is dense (cheap);
    rebuild whenever the map changes."""
    h, w = sun_map.shape
    zx = jnp.concatenate([sun_map[:, 1:], sun_map[:, -1:]], axis=1)
    zy = jnp.concatenate([sun_map[1:, :], sun_map[-1:, :]], axis=0)
    zxy = jnp.concatenate([zx[1:, :], zx[-1:, :]], axis=0)
    return jnp.stack([sun_map, zx, zy, zxy], axis=-1).reshape(h * w, 4)


def sample_shadow_packed(packed, map_h, map_w, sf, wpos, *, bias_texels: float = 1.5):
    """sample_shadow against a pack_sun_map row table — bit-identical
    decisions (the clamped-tap algebra reduces to fx/fy zeroing, verified in
    tests/test_sunmap.py), one gather per position."""
    sc = wpos @ sf["rows"].T
    ext = sf["hi"] - sf["lo"]
    px = (sc[..., 0] - sf["lo"][0]) / ext[0] * map_w - 0.5
    py = (sc[..., 1] - sf["lo"][1]) / ext[1] * map_h - 0.5
    d01 = (sc[..., 2] - sf["lo"][2]) / ext[2]
    z_here = 1.0 - 0.998 * d01
    texel_world = jnp.maximum(ext[0] / map_w, ext[1] / map_h)
    bias = 0.998 * bias_texels * texel_world / ext[2]

    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    # out-of-range base indices clamp to the border row with the matching
    # fractional weight zeroed: identical to clamping each tap separately
    fx = jnp.where(x0 < 0, 0.0, px - x0)
    fy = jnp.where(y0 < 0, 0.0, py - y0)
    x0 = jnp.clip(x0, 0, map_w - 1)
    y0 = jnp.clip(y0, 0, map_h - 1)
    quad = packed[y0 * map_w + x0]  # [..., 4]
    lit = jnp.where(quad <= (z_here + bias)[..., None], 1.0, 0.0)
    return (
        lit[..., 0] * (1 - fx) * (1 - fy)
        + lit[..., 1] * fx * (1 - fy)
        + lit[..., 2] * (1 - fx) * fy
        + lit[..., 3] * fx * fy
    )


def sample_shadow(sun_map, sf, wpos, *, bias_texels: float = 1.5):
    """Shadow term in [0,1] for world positions [..,3]: 2x2 PCF depth
    compare against the sun map (role of the traced occlusion bit +
    reconstruction in the RT path).

    Bias is expressed in map texels of WORLD distance and applied as an
    offset toward the sun (u, v are unchanged since they're orthogonal to
    the light): scale-free acne suppression for receivers sloped up to
    ~bias_texels, while casters thicker than that many texels still
    self-shadow — a fixed reverse-depth epsilon would be scene-extent
    dependent (acne on small scenes, missed thin casters on big ones)."""
    map_h, map_w = sun_map.shape
    sc = wpos @ sf["rows"].T
    ext = sf["hi"] - sf["lo"]
    px = (sc[..., 0] - sf["lo"][0]) / ext[0] * map_w - 0.5
    py = (sc[..., 1] - sf["lo"][1]) / ext[1] * map_h - 0.5
    d01 = (sc[..., 2] - sf["lo"][2]) / ext[2]
    z_here = 1.0 - 0.998 * d01
    texel_world = jnp.maximum(ext[0] / map_w, ext[1] / map_h)
    bias = 0.998 * bias_texels * texel_world / ext[2]

    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = px - x0
    fy = py - y0

    def tap(dx, dy):
        xi = jnp.clip(x0 + dx, 0, map_w - 1)
        yi = jnp.clip(y0 + dy, 0, map_h - 1)
        zm = sun_map[yi, xi]
        # lit when nothing in the map is meaningfully nearer the sun
        return jnp.where(zm <= z_here + bias, 1.0, 0.0)

    s00, s10 = tap(0, 0), tap(1, 0)
    s01, s11 = tap(0, 1), tap(1, 1)
    return (
        s00 * (1 - fx) * (1 - fy)
        + s10 * fx * (1 - fy)
        + s01 * (1 - fx) * fy
        + s11 * fx * fy
    )


def shadow_map_pass(depth, sf, sun_map, *, inverse_view_projection, width: int, height: int,
                    bias_texels: float = 1.5, scale: int = 2, packed=None,
                    map_shape=None, blur: bool = False, znear=0.1):
    """Shadow term from the camera depth buffer: reconstruct world
    positions, PCF-sample the sun map (analog of ops/shadow.py's
    shadow_pass output contract).  Like the RT path, the term is computed
    at 1/scale resolution and upsampled — the per-pixel map gathers are the
    cost (element gathers run ~100M/s on this chip), not the math.  Pass
    `packed` (pack_sun_map) to fold the 4 PCF taps into one row gather
    (sun_map may then be None; give map_shape).  `blur` applies the RT
    path's depth-aware bilateral (ops/shadow.shadow_blur, the reference's
    shadowblur.comp) at the small resolution before upsampling, hiding the
    1/scale blockiness at shadow edges."""
    sw, sh = width // scale, height // scale
    d_small = depth[::scale, ::scale][:sh, :sw]
    px = (jnp.arange(sw, dtype=jnp.float32) + 0.5) / sw
    py = (jnp.arange(sh, dtype=jnp.float32) + 0.5) / sh
    ndc_x = px[None, :] * 2 - 1
    ndc_y = 1 - py[:, None] * 2
    clip = jnp.stack(
        [
            jnp.broadcast_to(ndc_x, (sh, sw)),
            jnp.broadcast_to(ndc_y, (sh, sw)),
            d_small,
            jnp.ones((sh, sw), jnp.float32),
        ],
        axis=-1,
    )
    wposh = clip @ inverse_view_projection.T
    wpos = wposh[..., :3] / jnp.where(jnp.abs(wposh[..., 3:]) < 1e-20, 1e-20, wposh[..., 3:])
    if packed is not None:
        mh, mw = map_shape if map_shape is not None else sun_map.shape
        term = sample_shadow_packed(packed, mh, mw, sf, wpos, bias_texels=bias_texels)
    else:
        term = sample_shadow(sun_map, sf, wpos, bias_texels=bias_texels)
    term = jnp.where(d_small > 0.0, term, 1.0)
    if blur:
        from . import shadow as shadow_mod

        term = shadow_mod.shadow_blur(term, d_small, jnp.float32(znear))
    if scale == 1:
        return term
    full = jnp.repeat(jnp.repeat(term, scale, axis=0), scale, axis=1)
    return full[:height, :width]

"""Bindless-style texture table.

Role of the reference's descriptor-indexed texture array
(`textures[nonuniformEXT(id)]`, mesh.frag.glsl:40-42, populated
niagara.cpp:921-944).  On TPU there are no samplers: every texture's RGBA8
mip chain is decoded at load (cooker/native/textures.cpp) and packed into one
flat texel buffer; sampling is address arithmetic + gathers, fully uniform
over the [H,W] shading grid.

Mip selection happens per fragment from the triangle's uv-vs-screen area
ratio (the visibility buffer has no hardware derivatives)."""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

MAX_MIPS = 14


@jax.tree_util.register_dataclass
@dataclass
class TextureTable:
    texels: Any  # u8 [N, 4] flat texel pool (all textures, all mips)
    mip_offset: Any  # i32 [NT, MAX_MIPS]
    mip_w: Any  # i32 [NT, MAX_MIPS]
    mip_h: Any  # i32 [NT, MAX_MIPS]
    mip_count: Any  # i32 [NT]
    # gather-count optimizations (per-pixel gathers are ~13-20ms/[1080p]
    # each on this chip, flat in row width — so sampling cost is the NUMBER
    # of gathers, not bytes):
    # mip_rows [NT*MAX_MIPS, 4] i32 (offset, w, h, 0): one row gather
    # replaces the 3 separate offset/w/h table lookups
    mip_rows: Any = None
    # texels_quad [N, 16] u8: texel i's 2x2 bilinear footprint (wrap-aware)
    # as one row — one gather per bilinear sample instead of four.  Costs
    # 4x pool HBM; built only while the pool stays under the quad budget.
    texels_quad: Any = None

    @property
    def count(self):
        return self.mip_count.shape[0]


def load_texture_mips(paths: list[str], base_dir: str = "", max_dim: int | None = None) -> list:
    """Decode each DDS into its RGBA8 mip list (missing/unsupported files
    fall back to 1x1 magenta).  The list feeds both `build_texture_table`
    and the opacity bake (cooker/opacity.py)."""
    from ..cooker import bindings

    out = []
    for p in paths:
        full = os.path.join(base_dir, p) if base_dir else p
        try:
            mips, _fmt = bindings.load_dds(full)
        except Exception as e:
            import sys

            print(f"[textures] WARNING: {full}: {e} — using 1x1 magenta", file=sys.stderr)
            mips = [np.tile(np.array([255, 0, 255, 255], np.uint8), (1, 1, 1))]
        if max_dim is not None:
            mips = [m for m in mips if max(m.shape[0], m.shape[1]) <= max_dim] or [mips[-1]]
        out.append(mips[:MAX_MIPS])
    return out


def build_texture_table(
    paths: list[str] | None = None,
    base_dir: str = "",
    max_dim: int | None = None,
    budget_bytes: int | None = 2 << 30,
    mips: list | None = None,
    quad_budget_bytes: int | None = 6 << 30,
) -> TextureTable:
    """Load DDS textures into one table.  Texture 0 is a 1x1 white dummy
    (the reference reserves id 0 as 'no texture'); missing/unsupported files
    fall back to 1x1 magenta.  Pass pre-decoded `mips` (load_texture_mips)
    to skip loading.

    `budget_bytes` bounds the HBM texel pool (the RGBA8 pool is ~1.3-4x the
    BC source size, so a Bistro-class set would otherwise be unbounded): if
    the full-resolution pool exceeds the budget, every texture's finest mips
    are dropped uniformly (one level at a time) until it fits — the texture
    equivalent of the capacity-drop discipline elsewhere."""
    if mips is None:
        mips = load_texture_mips(paths or [], base_dir, max_dim)
    texture_mips = [[np.full((1, 1, 4), 255, np.uint8)]] + [list(m) for m in mips]

    # enforce floor-halving chains (the DDS convention): every kept mip's
    # dims must equal max(prev >> 1, 1).  Together with the consecutive
    # pool layout this makes (offset, w, h) of ANY mip computable from the
    # mip-0 metadata alone — the `meta` fast path in sample().  Oddly-sized
    # ceil-halving chains (e.g. numpy [::2] pyramids) are truncated at the
    # first non-conforming level; the mip clamp covers the tail.
    def _conforming(chain):
        out = [chain[0]]
        for m in chain[1:]:
            ph, pw = out[-1].shape[:2]
            if m.shape[0] == max(ph // 2, 1) and m.shape[1] == max(pw // 2, 1):
                out.append(m)
            else:
                break
        return out

    texture_mips = [_conforming(c) for c in texture_mips]

    if budget_bytes is not None:
        def pool_size(tm):
            return sum(m.shape[0] * m.shape[1] * 4 for mips in tm for m in mips)

        while pool_size(texture_mips) > budget_bytes and any(len(m) > 1 for m in texture_mips):
            biggest = max(len(m) for m in texture_mips)
            texture_mips = [m[1:] if len(m) == biggest and len(m) > 1 else m for m in texture_mips]

    nt = len(texture_mips)
    mip_offset = np.zeros((nt, MAX_MIPS), np.int32)
    mip_w = np.ones((nt, MAX_MIPS), np.int32)
    mip_h = np.ones((nt, MAX_MIPS), np.int32)
    mip_count = np.zeros(nt, np.int32)

    chunks = []
    offset = 0
    for t, mips in enumerate(texture_mips):
        mip_count[t] = len(mips)
        for m, img in enumerate(mips):
            h, w = img.shape[:2]
            mip_offset[t, m] = offset
            mip_w[t, m] = w
            mip_h[t, m] = h
            chunks.append(img.reshape(-1, 4))
            offset += w * h
        # clamp out-of-range mip lookups to the coarsest mip
        for m in range(len(mips), MAX_MIPS):
            mip_offset[t, m] = mip_offset[t, len(mips) - 1]
            mip_w[t, m] = mip_w[t, len(mips) - 1]
            mip_h[t, m] = mip_h[t, len(mips) - 1]

    texels = np.concatenate(chunks, axis=0) if chunks else np.zeros((1, 4), np.uint8)

    # (texture, mip) -> one 16B row: offset, w, h (one gather instead of 3)
    mip_rows = np.stack(
        [mip_offset, mip_w, mip_h, np.zeros_like(mip_w)], axis=-1
    ).reshape(nt * MAX_MIPS, 4).astype(np.int32)

    # quad-packed pool: texel (x, y) row = its wrap-aware 2x2 bilinear
    # footprint [p(x,y), p(x+1,y), p(x,y+1), p(x+1,y+1)] — one 16-byte row
    # gather per bilinear sample instead of four element gathers.  4x HBM;
    # skipped for pools past the quad budget (sample() then falls back).
    texels_quad = None
    if quad_budget_bytes is None or len(texels) * 16 <= quad_budget_bytes:
        qchunks = []
        for t, mips in enumerate(texture_mips):
            for m, img in enumerate(mips):
                h, w = img.shape[:2]
                xr = np.concatenate([img[:, 1:], img[:, :1]], axis=1)
                yr = np.concatenate([img[1:, :], img[:1, :]], axis=0)
                xyr = np.concatenate([xr[1:, :], xr[:1, :]], axis=0)
                quad = np.concatenate([img, xr, yr, xyr], axis=-1)  # [h,w,16]
                qchunks.append(quad.reshape(-1, 16))
        texels_quad = (
            np.concatenate(qchunks, axis=0) if qchunks else np.zeros((1, 16), np.uint8)
        )

    return TextureTable(
        texels=texels,
        mip_offset=mip_offset,
        mip_w=mip_w,
        mip_h=mip_h,
        mip_count=mip_count,
        mip_rows=mip_rows,
        texels_quad=texels_quad,
    )


def sample(table: TextureTable, tex_id, uv, mip, *, bilinear: bool = True,
           meta=None):
    """Sample [H,W] pixels: tex_id i32 (0 = white), uv f32 [...,2] (repeat
    wrap), mip i32.  Returns f32 [...,4] in [0,1].

    Gather budget (the cost model on this chip — per-pixel gathers are
    latency-bound at ~13-20ms per 1080p plane regardless of row width):
    one mip_rows gather for (offset, w, h) + one quad-row gather for the
    whole 2x2 bilinear footprint = 2 gathers per sample.

    `meta` = per-pixel i32 (mip0_offset, mip0_w, mip0_h, mip_count) —
    usually riding the material megarow (scene._albedo_meta_columns) —
    computes the mip's (offset, w, h) ANALYTICALLY instead: the pool lays a
    texture's mips out consecutively and every chain floor-halves (both
    guaranteed by build_texture_table), so offset_m = offset_0 +
    sum_{k<m} max(w0>>k,1)*max(h0>>k,1) — dense shift math, removing the
    mip_rows gather entirely (1 gather per sample).  Only valid while pool
    offsets stay f32-exact (< 2^24 texels; callers gate on that)."""
    tid = jnp.clip(tex_id, 0, table.mip_count.shape[0] - 1)
    m = jnp.clip(mip, 0, MAX_MIPS - 1)

    if meta is not None:
        off0, w0, h0, cnt = meta
        m = jnp.minimum(m, jnp.maximum(cnt - 1, 0))
        w = jnp.maximum(w0 >> m, 1)
        h = jnp.maximum(h0 >> m, 1)
        off = off0
        for k in range(MAX_MIPS - 1):
            off = off + jnp.where(
                m > k, jnp.maximum(w0 >> k, 1) * jnp.maximum(h0 >> k, 1), 0
            )
    elif table.mip_rows is not None:
        row = table.mip_rows[tid * MAX_MIPS + m]  # one 16B row gather
        off, w, h = row[..., 0], row[..., 1], row[..., 2]
    else:
        off = table.mip_offset[tid, m]
        w = table.mip_w[tid, m]
        h = table.mip_h[tid, m]
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    # repeat wrap in uv space
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])

    def fetch(xi, yi):
        x = jnp.remainder(xi, w)
        y = jnp.remainder(yi, h)
        return table.texels[off + y * w + x].astype(jnp.float32) / 255.0

    if not bilinear:
        x0 = jnp.clip((u * wf).astype(jnp.int32), 0, w - 1)
        y0 = jnp.clip((v * hf).astype(jnp.int32), 0, h - 1)
        return fetch(x0, y0)

    x = u * wf - 0.5
    y = v * hf - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    if table.texels_quad is not None:
        # the quad row holds the wrap-aware 2x2 footprint of (x0, y0)
        xw = jnp.remainder(x0, w)
        yw = jnp.remainder(y0, h)
        q = table.texels_quad[off + yw * w + xw].astype(jnp.float32) / 255.0
        top = q[..., 0:4] * (1 - fx) + q[..., 4:8] * fx
        bot = q[..., 8:12] * (1 - fx) + q[..., 12:16] * fx
        return top * (1 - fy) + bot * fy

    top = fetch(x0, y0) * (1 - fx) + fetch(x0 + 1, y0) * fx
    bot = fetch(x0, y0 + 1) * (1 - fx) + fetch(x0 + 1, y0 + 1) * fx
    return top * (1 - fy) + bot * fy


def select_mip_from_area(duv, area):
    """Mip level from the uv-to-pixel ratio and the texture's mip-0 texel
    AREA (tex_w * tex_h, e.g. baked into the material megarow)."""
    ratio = duv * area
    return jnp.clip(0.5 * jnp.log2(jnp.maximum(ratio, 1.0)), 0, MAX_MIPS - 1).astype(jnp.int32)


def select_mip_from_ratio(duv, tex_w, tex_h):
    """Mip level from the triangle's uv-to-pixel area ratio `duv` (before
    texture dimensions).  Shared by the record-gather path (select_mip) and
    the dense attrs fast path (the Pallas shade kernel emits duv as an
    attribute channel), so both pick bit-identical mips."""
    ratio = duv * tex_w.astype(jnp.float32) * tex_h.astype(jnp.float32)
    return jnp.clip(0.5 * jnp.log2(jnp.maximum(ratio, 1.0)), 0, MAX_MIPS - 1).astype(jnp.int32)


def select_mip(uv0, uv1, uv2, p0x, p0y, p1x, p1y, p2x, p2y, tex_w, tex_h):
    """Per-fragment mip from the triangle's texel-to-pixel area ratio (the
    visibility-buffer replacement for hardware uv derivatives)."""
    uv_area = jnp.abs(
        (uv1[..., 0] - uv0[..., 0]) * (uv2[..., 1] - uv0[..., 1])
        - (uv1[..., 1] - uv0[..., 1]) * (uv2[..., 0] - uv0[..., 0])
    )
    px_area = jnp.abs((p1x - p0x) * (p2y - p0y) - (p1y - p0y) * (p2x - p0x))
    duv = uv_area / jnp.maximum(px_area, 1e-6)
    return select_mip_from_ratio(duv, tex_w, tex_h)

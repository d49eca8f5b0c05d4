"""Pallas tile rasterizer — the hot raster path on TPU.

Design (replaces the scatter-merge in ops/raster.py for the frame loop):

1. **Pair emission + sort (XLA):** each surviving triangle emits
   (tile_id, tri) pairs for the 8x128-pixel tiles its AABB touches (bounded
   footprint; larger triangles via a compacted mid path; huge ones dropped
   with a counter).  Pairs are sorted by tile id — XLA sort is cheap on TPU —
   and per-tile ranges come from searchsorted.
2. **Tile kernel (Pallas):** one grid step per ROW of tiles (the sort makes
   a row's records one contiguous span, so the whole row shares one
   double-buffered 128-record chunk-DMA sequence — per-tile steps paid
   ~28 us of fixed latency each).  Per chunk and touching tile, the kernel
   narrows each 128-record chunk to the x-BANDS its records' AABBs span
   (8 bands of 16 px per tile; records carry x0/x1 in rows 12/14) and
   evaluates edge functions + depth planes per band as dense
   [BAND_PX=128, 128] VPU broadcasts with lane reductions
   (see _raster_kernel).  Under a 1 px-error LOD most triangles span 1-2
   bands, so banding cuts the dominant coverage-eval cost ~4-6x versus the
   whole-tile [1024, 128] form.  No per-record scalar loop, no global
   scatter anywhere.
3. Ties break to the smaller fragment id — chunk-internally via a lane
   arg-min over the max-depth records, across chunks/passes via the carry
   merge — so output is bit-stable and matches the scatter-merge
   rasterizer's resolve rule exactly.

The framebuffer lives in tile-major layout [n_tiles, 8, 128] inside the
frame loop, in BAND-MAJOR pixel order: element [t, b, y*16+xb] is pixel
(tile_y*8 + y, tile_x*128 + b*16 + xb) — each of the 8 sublane rows holds
one 8x16-px band so the kernel's band slices are 128-lane aligned.
`tiles_to_image`/`image_to_tiles`/`attr_tiles_to_image` convert at the
boundaries (pure XLA transposes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TILE_H, TILE_W
from . import stream_compact
from .raster import INVALID_FRAG, _compact
from .setup_fused import REC, split3

# records are stored transposed [REC, R] and DMA'd in lane-aligned chunks of
# 128 (Mosaic requires 128-lane-aligned HBM slices); chunk windows start at
# the aligned offset below each tile's range and mask out-of-range records
REC_CHUNK = 128
# chunk-DMA pipeline depth: most chunks carry few live (tile, band) visits,
# so with double buffering the wait for chunk c+1 stalls on DMA latency
# (~2-3 us) nearly every iteration; 4 buffers hide it under 3 chunks of
# compute for 16-84 KB of VMEM
NBUF = 4

# f32-operand kernel dots carry explicit HIGHEST precision: compiled Mosaic
# lowers f32 matmuls exactly; interpret mode turns them into XLA dots whose
# TPU default is a single bf16 pass (see setup_fused._PX)
_PX = jax.lax.Precision.HIGHEST

# pair-emission footprint classes (in tiles).  Triangles touching <= 2 tiles
# (the vast majority once LOD keeps screen sizes small) emit densely from
# [T, 2]; the larger classes are compacted first so their dense emission
# grids stay tiny.  Sort cost scales with total emitted slots, so the class
# split cuts it ~3x vs a single dense footprint.
SMALL_TX, SMALL_TY = 2, 3  # up to 256 x 24 px
MIDA_TX, MIDA_TY = 5, 8  # up to 640 x 64 px
MID_TX, MID_TY = 15, 32  # up to 1920 x 256 px

# x-band geometry: a tile's 8x128 px split into 8 bands of 8x16 px, each
# band = 128 pixels = one 128-lane slice of the band-major tile layout
BAND_W = 16
NBANDS = TILE_W // BAND_W  # 8
BAND_PX = TILE_H * BAND_W  # 128


def image_to_tiles(img, height, width):
    """[H,W,...] -> [n_tiles, TILE_H, TILE_W, ...] tiles in BAND-MAJOR pixel
    order: out[t, b, y*BAND_W + xb] = img[ty*8 + y, tx*128 + b*16 + xb]."""
    ty, tx = height // TILE_H, width // TILE_W
    rest = img.shape[2:]
    t = img.reshape((ty, TILE_H, tx, NBANDS, BAND_W) + rest)
    t = jnp.transpose(t, (0, 2, 3, 1, 4) + tuple(5 + i for i in range(len(rest))))
    return t.reshape((ty * tx, TILE_H, TILE_W) + rest)


def tiles_to_image(tiles, height, width):
    ty, tx = height // TILE_H, width // TILE_W
    rest = tiles.shape[3:]
    t = tiles.reshape((ty, tx, NBANDS, TILE_H, BAND_W) + rest)
    t = jnp.transpose(t, (0, 3, 1, 2, 4) + tuple(5 + i for i in range(len(rest))))
    return t.reshape((height, width) + rest)


def emit_pairs(setup, *, tiles_x: int, tiles_y: int, pair_capacity: int,
               mid_capacity: int | None = None, small_capacity: int | None = None,
               midb_capacity: int | None = None, giant_capacity: int = 64,
               tiny2_capacity: int | None = None,
               row_window: tuple[int, int] | None = None):
    """(tile, tri) pair list sorted by tile.

    Pairs are packed as single u32 keys (tile << tri_bits | tri) so the sort
    moves one array instead of a (key, value) pair — measured 2.5x cheaper —
    and the sorted value doubles as the triangle id.

    `row_window=(row0, n_rows)`: restrict output to the tile rows
    [row0, row0+n_rows) and renumber tiles band-locally (tile ids in
    [0, n_rows*tiles_x)) — the dirty-row incremental sun-map update renders
    only the band the animated casters touch (ops/sunmap.update_sun_map).
    Tile ids stay FULL-GRID during emission, so footprint classes and
    coverage arithmetic are bit-identical to the unwindowed call; live
    pairs falling outside the window count as dropped (a too-small window
    is a caller bug the counters must surface, folded into drop_vec[5]).

    Returns (pair_tri [P] i32 sorted, tile_start [n_tiles+1] i32, pair_count,
    dropped — triangles lost to class-capacity overflow or the final sort
    truncation, drop_vec [6] i32 — the same losses split per class
    (tiny2, small, midA, midB, giant, sort-truncation) so a nonzero bench
    counter names the overflowing budget, VERDICT r4 weak #1)."""
    n_tiles = tiles_x * tiles_y
    valid = setup["valid"]
    T = valid.shape[0]
    # per-class compaction capacities scale with the triangle budget so big
    # scenes don't silently overflow a class (drops are still counted).
    # Larger classes emit more slots each, so their caps shrink faster —
    # total sorted slots stay ~3x the tiny-class baseline.  Sizing is
    # steady-state-measured on the 1M-draw bench scene (tests/test_bench_caps
    # pins the zero-drop contract): midA demand converges near T/112, so its
    # old T/128 cap overflowed by ~650 once visibility converged (VERDICT r4
    # weak #1 — the drop only appeared after frame 2).
    if small_capacity is None:
        small_capacity = max(1 << 15, T // 8)
    if mid_capacity is None:
        # floor halved from 8192: late passes (T = 256K) pay 40 sort slots
        # per midA cap entry, and the worst-case late demand is 1,352
        # (tests/test_bench_pairs.py) — 4096 keeps 3x headroom there while
        # big-T passes stay governed by the T//64 term
        mid_capacity = max(4096, T // 64)
    if midb_capacity is None:
        # measured worst-case demand at the 1M-draw bench shape is T/3600
        # (tests/test_bench_pairs.py prints the class demand vector)
        midb_capacity = max(512, T // 1024)
    tri_bits = max(T - 1, 1).bit_length()
    assert tri_bits + (n_tiles).bit_length() <= 32, (
        "packed pair key overflows u32; lower tri_capacity or tile count"
    )

    tx0 = setup["x0"] // TILE_W
    ty0 = setup["y0"] // TILE_H
    txs = (setup["x1"] - 1) // TILE_W - tx0 + 1
    tys = (setup["y1"] - 1) // TILE_H - ty0 + 1

    is_tiny = valid & (txs * tys <= 2)  # 1x1, 2x1, 1x2 — the common case
    fits_small = (txs <= SMALL_TX) & (tys <= SMALL_TY)
    fits_mida = (txs <= MIDA_TX) & (tys <= MIDA_TY)
    fits_midb = (txs <= MID_TX) & (tys <= MID_TY)
    is_small = valid & ~is_tiny & fits_small
    is_mida = valid & ~is_tiny & ~fits_small & fits_mida
    is_midb = valid & ~is_tiny & ~fits_small & ~fits_mida & fits_midb
    # giant class: up to the whole screen (near-plane straddlers get a
    # conservative full-screen AABB in compact_setup); rare, tiny capacity
    is_giant = valid & ~is_tiny & ~fits_small & ~fits_mida & ~fits_midb
    dropped = jnp.int32(0)

    def compact_idx(mask, cap):
        """Compact the indices where mask is set (segmented, no [T]-scale
        scatter — see stream_compact.py); per-triangle fields are then
        fetched with cap-sized gathers."""
        return stream_compact.compact_mask_indices(mask, cap)

    def emit(tri_idx, sel, tx0s, ty0s, txss, tyss, cap_x, cap_y):
        """Dense [N, cap_x*cap_y] (tile, tri) emission; returns flat arrays."""
        s = jnp.arange(cap_x * cap_y, dtype=jnp.int32)[None, :]
        sx = s % cap_x
        sy = s // cap_x
        live = sel[:, None] & (sx < txss[:, None]) & (sy < tyss[:, None])
        tile = (ty0s[:, None] + sy) * tiles_x + (tx0s[:, None] + sx)
        tile = jnp.where(live, tile, n_tiles)
        tri = jnp.broadcast_to(tri_idx[:, None], tile.shape)
        return tile.reshape(-1), tri.reshape(-1)

    def emit_compacted(mask, cap, cap_x, cap_y):
        idx, n, over = compact_idx(mask, cap)
        sel = jnp.arange(cap, dtype=jnp.int32) < n
        t, r = emit(idx, sel, tx0[idx], ty0[idx], txs[idx], tys[idx], cap_x, cap_y)
        return t, r, over

    # tiny1 (one tile, the dominant case at high draw counts): ONE dense
    # slot per triangle — sort length is the emit_pairs cost driver, and
    # giving every tiny triangle 2 dense slots added T/2 dead keys.
    # tiny2 (exactly two tiles) goes through the segmented compactor at
    # T//3 capacity (expected ~25-30% of tris; overflow is drop-counted).
    tri_idx = jnp.arange(T, dtype=jnp.int32)
    is_tiny1 = is_tiny & ((txs * tys) == 1)
    tile_t = jnp.where(is_tiny1, ty0 * tiles_x + tx0, n_tiles)[:, None]
    tri_t = tri_idx[:, None]

    is_tiny2 = is_tiny & ~is_tiny1
    # tiny2 worst-case demand is T/2.4 at the 1M-draw bench shape with
    # EVERYTHING visible (the everything-was-visible-last-frame early pass;
    # tests/test_bench_pairs.py measured 268K at T=640K) — the old T/3 cap
    # dropped ~50K pairs in exactly the frame the bench's loss-free
    # contract covers
    if tiny2_capacity is None:
        tiny2_capacity = max(T // 2, 256)
    idx2, n2, over2 = compact_idx(is_tiny2, tiny2_capacity)
    sel2 = jnp.arange(idx2.shape[0], dtype=jnp.int32) < n2
    s2 = jnp.arange(2, dtype=jnp.int32)[None, :]
    dx2 = jnp.where(txs[idx2][:, None] == 2, s2, 0)
    dy2 = jnp.where(tys[idx2][:, None] == 2, s2, 0)
    tile_t2 = jnp.where(
        sel2[:, None], (ty0[idx2][:, None] + dy2) * tiles_x + tx0[idx2][:, None] + dx2, n_tiles
    )
    tri_t2 = jnp.broadcast_to(idx2[:, None], tile_t2.shape)
    dropped = dropped + over2

    tile_s, tri_s, over_s = emit_compacted(is_small, small_capacity, SMALL_TX, SMALL_TY)
    tile_a, tri_a, over_a = emit_compacted(is_mida, mid_capacity, MIDA_TX, MIDA_TY)
    tile_b, tri_b, over_b = emit_compacted(is_midb, midb_capacity, MID_TX, MID_TY)
    tile_g, tri_g, over_g = emit_compacted(is_giant, giant_capacity, tiles_x, tiles_y)
    dropped = dropped + over_s + over_a + over_b + over_g

    tiles_all = jnp.concatenate(
        [tile_t.reshape(-1), tile_t2.reshape(-1), tile_s, tile_a, tile_b, tile_g]
    )
    tris_all = jnp.concatenate(
        [tri_t.reshape(-1), tri_t2.reshape(-1), tri_s, tri_a, tri_b, tri_g]
    )

    out_of_window = jnp.int32(0)
    if row_window is not None:
        row0, n_rows = row_window
        base = row0 * tiles_x
        band = n_rows * tiles_x
        live_full = tiles_all < n_tiles
        in_band = live_full & (tiles_all >= base) & (tiles_all < base + band)
        out_of_window = jnp.sum(live_full & ~in_band).astype(jnp.int32)
        tiles_all = jnp.where(in_band, tiles_all - base, band)
        n_tiles = band

    # pack (tile, tri) into one u32 and sort; dead pairs (tile == n_tiles)
    # sort to the end.  Key order (tile, tri) is total, so the result is
    # deterministic regardless of emission order.
    packed = (tiles_all.astype(jnp.uint32) << tri_bits) | tris_all.astype(jnp.uint32)
    (packed_sorted,) = jax.lax.sort((packed,), num_keys=1)

    pair_count = jnp.sum(tiles_all < n_tiles).astype(jnp.int32)
    # pairs sorted past pair_capacity are truncated below — count them as
    # dropped (they would otherwise vanish silently while the per-class
    # overflow counters read 0).  Out-of-window live pairs (see row_window
    # above) are folded in here too.
    trunc = jnp.maximum(pair_count - pair_capacity, 0) + out_of_window
    dropped = dropped + trunc
    packed_sorted = packed_sorted[:pair_capacity]
    pair_tri = (packed_sorted & jnp.uint32((1 << tri_bits) - 1)).astype(jnp.int32)

    bounds = (jnp.arange(n_tiles + 1, dtype=jnp.uint32) << tri_bits)
    tile_start = jnp.searchsorted(packed_sorted, bounds, side="left")
    drop_vec = jnp.stack([over2, over_s, over_a, over_b, over_g, trunc]).astype(jnp.int32)
    # per-class live demand (tiny1, tiny2, small, midA, midB, giant) — the
    # numbers the class capacities above must exceed; tools read these to
    # retune caps from measurement instead of guesses
    demand_vec = jnp.stack([
        jnp.sum(is_tiny1), jnp.sum(is_tiny2), jnp.sum(is_small),
        jnp.sum(is_mida), jnp.sum(is_midb), jnp.sum(is_giant),
    ]).astype(jnp.int32)
    return (pair_tri, tile_start.astype(jnp.int32),
            jnp.minimum(pair_count, pair_capacity), dropped, drop_vec, demand_vec)


# id sentinel for "no covering record" inside the kernel's f32 id math:
# real fragment ids stay < 2^24 (capacity-bounded), so 2^30 never collides
# and stays exactly representable in both f32 and i32
_NOID = float(1 << 30)


def _raster_kernel(tile_start_ref, off_ref, recs_ref, depth_in_ref, vis_in_ref,
                   depth_out_ref, vis_out_ref, recs_vmem, sems, *, tiles_x,
                   rows_per_step: int = 1, alpha_test: bool = False,
                   rec_rows: int = REC, row0: int = 0):
    """Banded tile raster: one grid step per GROUP of `rows_per_step` tile
    rows (rows_per_step * tiles_x tiles), pixels along SUBLANES
    [BAND_PX, 1], records along LANES [1, 128].

    Grouping tile rows into one step is the latency fix: with one step per
    TILE the kernel paid ~28 us of fixed cost (grid step + one tiny
    un-overlapped chunk DMA) per tile — 2025 steps ~ 57 ms at 1080p even
    with 6 pairs/tile.  Pairs are tile-sorted, so a row GROUP's records are
    ONE contiguous chunk span: the group shares a single double-buffered
    DMA sequence (chunks fetched once, not once per touching tile) and the
    step count drops to tiles_y / rows_per_step (15 at 1080p).  Tile
    buffers cross the boundary as [G, 8, 128] blocks — exactly one f32
    tile per sublane tile, so multi-row blocks stay unpadded (the earlier
    [G, 1, 1024] form padded 1 -> 8 sublanes, 8x the VMEM).

    Per chunk, a monotone TILE CURSOR (tile_start is sorted, chunk spans
    only advance) finds the tiles the chunk's records touch — O(chunks +
    live tiles) scalar work per step instead of the old chunks x tiles_x
    guard scan, which at multi-row grouping would have scanned every tile
    of the group per chunk.

    Per (chunk, tile) visit the kernel first reduces the chunk's live
    records' x-AABBs (record rows 12/14) to the contiguous x-BAND range
    they span, then evaluates only those bands: edge functions + the depth
    plane as [BAND_PX, 128] VPU broadcasts (a*fx + b*fy + c — the same op
    order the XLA oracle uses, so coverage is bit-identical), coverage and
    resolve as dense VPU ops with lane reductions.  A whole-tile [1024,
    128] evaluation paid 8x the VPU work for triangles that span 1-2 of
    the 8 bands — the dominant case under a 1 px-error LOD.

    Resolve: within a chunk the max depth wins and equal-depth ties go to
    the smallest fragment id (zmax + lane arg-min); across chunks and
    passes the (depth, id) carry merges with the same rule.  Per tile the
    chunk order stays ascending and bands partition the pixels, so the
    output is bit-identical to the per-row, unbanded whole-tile kernel.
    """
    i = pl.program_id(0)  # row-group index
    gt = rows_per_step * tiles_x  # tiles per grid step
    t0 = i * gt
    g_start = tile_start_ref[t0]
    g_end = tile_start_ref[t0 + gt]

    # chunk window covering the whole group's [g_start, g_end); the stream
    # is chunk-major [NC, REC, 128] so every chunk is ONE contiguous DMA
    # block (the earlier [REC, P] layout made each chunk 56 strided 512B
    # reads — measured DMA rate ~1GB/s; contiguous blocks stream at full
    # rate)
    a0c = g_start // REC_CHUNK
    a0_off = a0c * REC_CHUNK
    n_chunks = (g_end - a0_off + REC_CHUNK - 1) // REC_CHUNK
    ncmax = recs_ref.shape[0] - 1

    # band-local pixel centers [BAND_PX, 1]: sublane s is band pixel
    # (y = s // BAND_W, xb = s % BAND_W); fxb gets ox + band*BAND_W added
    # inside the band loop, fyb gets the tile's oy
    s_sub = jax.lax.broadcasted_iota(jnp.int32, (BAND_PX, 1), 0)
    fxb = (s_sub % BAND_W).astype(jnp.float32) + jnp.float32(0.5)
    fyb = (s_sub // BAND_W).astype(jnp.float32) + jnp.float32(0.5)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, REC_CHUNK), 1)

    def dma(slot, c):
        ci = jnp.minimum(a0c + c, ncmax)
        # opaque passes copy only the edge/depth/bbox/id rows of each chunk
        # (rec_rows = 16 of REC = 56: 8 KB instead of 28 KB — the stream
        # DMA is this kernel's bandwidth floor); the alpha variant needs
        # the uv + opacity-mask rows too and copies all.  Fragment ids
        # ride in record row 13 (exact in f32: ids < 2^24), so there is
        # no second id stream to fetch.
        return pltpu.make_async_copy(
            recs_ref.at[ci, pl.ds(0, rec_rows)], recs_vmem.at[slot], sems.at[slot]
        )

    # the group's carry lives in the output block (init from the input
    # once; per-(tile, chunk, band) updates read-modify-write the band's
    # slice) — a register carry would need 2*gt live [PX, 1] arrays
    depth_out_ref[...] = depth_in_ref[...]
    vis_out_ref[...] = vis_in_ref[...]

    for j in range(NBUF - 1):  # warm the pipeline NBUF-1 chunks deep
        @pl.when(j < n_chunks)
        def _(j=j):
            dma(j % NBUF, j).start()

    def chunk_body(c, tcur):
        slot = c % NBUF

        @pl.when(c + NBUF - 1 < n_chunks)
        def _():
            dma((c + NBUF - 1) % NBUF, c + NBUF - 1).start()

        dma(slot, c).wait()

        recs = recs_vmem[slot]  # [rec_rows, 128] f32
        r = lambda k: recs[k : k + 1, :]  # record attr k as a [1, 128] row
        c_lo = a0_off + c * REC_CHUNK
        gidx = c_lo + lane  # [1, 128] global pair index

        def tile_body(g):
            start = tile_start_ref[t0 + g]
            end = tile_start_ref[t0 + g + 1]

            if True:  # (indentation kept from the old pl.when guard form —
                # the cursor's visit set IS the old guard's condition)
                gg = t0 + g
                ox = ((gg % tiles_x) * TILE_W).astype(jnp.float32)
                # row0: band-local tile index -> GLOBAL pixel row (dirty-row
                # sun-map updates render a tile-row band with full-map
                # coverage arithmetic — bit-identical to the full grid)
                oy = ((gg // tiles_x + row0) * TILE_H).astype(jnp.float32)
                fy = fyb + oy
                live = (gidx >= start) & (gidx < end)  # [1, 128]

                # x-band range of the chunk's live records for THIS tile:
                # rows 12/14 carry the setup AABB's x0/x1 (screen px).
                # Dead-lane sentinels make an empty range (lo > hi) when no
                # record is live, so no band evaluates.
                x0r = jnp.where(live, r(12), jnp.float32(1e9))
                x1r = jnp.where(live, r(14), jnp.float32(-1e9))
                xmin = jnp.min(x0r, axis=1, keepdims=True)[0, 0] - ox
                xmax = jnp.max(x1r, axis=1, keepdims=True)[0, 0] - ox
                b_lo = jnp.clip(
                    jnp.floor(xmin * (1.0 / BAND_W)).astype(jnp.int32), 0, NBANDS - 1
                ) + jnp.where(xmin >= jnp.float32(TILE_W), NBANDS, 0)
                b_hi = jnp.clip(
                    jnp.floor((xmax - 1.0) * (1.0 / BAND_W)).astype(jnp.int32),
                    0, NBANDS - 1,
                ) - jnp.where(xmax <= 0.0, NBANDS, 0)

                # per-record [1, 128] top-left flags (fill rule, see
                # raster.py `cov` / tests/raster_oracle.py), hoisted out of
                # the band loop
                def tl(ka, kb):
                    return (r(ka) > 0.0) | ((r(ka) == 0.0) & (r(kb) > 0.0))

                tl0, tl1, tl2 = tl(0, 1), tl(3, 4), tl(6, 7)

                for b in range(NBANDS):
                    @pl.when((b >= b_lo) & (b <= b_hi))
                    def _(b=b):
                        fx = fxb + (ox + jnp.float32(b * BAND_W))  # [BAND_PX, 1]
                        # a*fx + b*fy + c as VPU broadcasts — [1,128] row x
                        # [BAND_PX,1] column -> [BAND_PX, 128]; op order
                        # matches the scatter-merge oracle bit-for-bit
                        E0 = r(0) * fx + r(1) * fy + r(2)
                        E1 = r(3) * fx + r(4) * fy + r(5)
                        E2 = r(6) * fx + r(7) * fy + r(8)
                        Z = r(9) * fx + r(10) * fy + r(11)

                        cover = (
                            ((E0 > 0.0) | (tl0 & (E0 == 0.0)))
                            & ((E1 > 0.0) | (tl1 & (E1 == 0.0)))
                            & ((E2 > 0.0) | (tl2 & (E2 == 0.0)))
                            & (Z > 0.0) & (Z <= 1.0) & live
                        )

                        if alpha_test:
                            # raster-time alpha test (reference
                            # mesh.frag.glsl:88-89 `discard`): alpha-tested
                            # records carry an 8x8 uv-space opacity bitmask
                            # (cols 48-55, cooker/opacity.py).  This is a
                            # STATIC kernel variant used only by post
                            # passes — the reference's specialization-
                            # constant POST pipelines — so opaque passes
                            # pay nothing.  Opaque records in a merged
                            # stream carry idu == 0 and pass untouched.
                            idu = r(54)
                            wsum = E0 + E1 + E2
                            inv = jnp.where(jnp.abs(wsum) < 1e-20, 0.0, 1.0 / wsum)
                            # Olano-Greer: edge values are the perspective
                            # weights (e1 -> A, e2 -> B, e0 -> C)
                            u = (E1 * r(22) + E2 * r(30) + E0 * r(38)) * inv
                            v = (E1 * r(23) + E2 * r(31) + E0 * r(39)) * inv
                            gx = jnp.clip(jnp.floor((u - r(52)) * idu), 0.0, 7.0)
                            gy = jnp.clip(jnp.floor((v - r(53)) * r(55)), 0.0, 7.0)
                            bb = gy * 8.0 + gx
                            half = jnp.where(
                                bb < 16.0, r(48),
                                jnp.where(bb < 32.0, r(49), jnp.where(bb < 48.0, r(50), r(51))),
                            )
                            # bit extract in f32 (mask halves are exact
                            # 16-bit ints): floor(half / 2^(b mod 16)) mod 2
                            t = jnp.floor(half * jnp.exp2(-jnp.mod(bb, 16.0)))
                            bit = t - 2.0 * jnp.floor(t * 0.5)
                            cover = cover & ((idu <= 0.0) | (bit > 0.5))

                        # chunk resolve: max depth, ties to the smallest
                        # fragment id
                        zm = jnp.where(cover, Z, 0.0)  # covered z is > 0
                        zmax = jnp.max(zm, axis=1, keepdims=True)  # [BAND_PX, 1]
                        # fragment ids = record row 13 (the record's own
                        # compacted index, baked at setup) + the pass's
                        # frag offset — exact in f32 (ids < 2^24)
                        fragf = r(13) + off_ref[0].astype(jnp.float32)
                        idm = jnp.where(cover & (zm == zmax), fragf, _NOID)
                        idmin = jnp.min(idm, axis=1, keepdims=True).astype(jnp.int32)

                        # merge with the band's carry (in the output block,
                        # tile g's band b is the [1, 128] sublane row
                        # [g, b, :]) under the same rule (zmax > 0 == any
                        # cover); [1, BAND_PX] <-> [BAND_PX, 1] transposes
                        depth = depth_out_ref[pl.ds(g, 1), b, :].T
                        vis = vis_out_ref[pl.ds(g, 1), b, :].T
                        closer = zmax > depth
                        tie = (zmax > 0.0) & (zmax == depth) & (idmin < vis)
                        new_depth = jnp.where(closer, zmax, depth)
                        new_vis = jnp.where(closer | tie, idmin, vis)
                        depth_out_ref[pl.ds(g, 1), b, :] = new_depth.T
                        vis_out_ref[pl.ds(g, 1), b, :] = new_vis.T

        # tile cursor: advance past tiles that end at or before this chunk
        # (tile_start is sorted and chunk windows only move forward, so the
        # cursor is monotone across the chunk loop), then visit every tile
        # whose range starts before the chunk's end — exactly the tiles
        # with records in this chunk, O(chunks + visits) scalar work.
        tcur = jax.lax.while_loop(
            lambda t: (t < gt) & (tile_start_ref[t0 + t + 1] <= c_lo),
            lambda t: t + 1,
            tcur,
        )

        def visit(t):
            tile_body(t)
            return t + 1

        jax.lax.while_loop(
            lambda t: (t < gt) & (tile_start_ref[t0 + t] < c_lo + REC_CHUNK),
            visit,
            tcur,
        )
        return tcur

    jax.lax.fori_loop(0, n_chunks, chunk_body, jnp.int32(0))


def rasterize_tiles(setup, depth_tiles, vis_tiles, *, tiles_x: int, tiles_y: int,
                    pair_capacity: int, frag_offset=0, interpret: bool = False,
                    alpha_test: bool = False, giant_capacity: int = 64,
                    class_caps: tuple | None = None,
                    row_window: tuple[int, int] | None = None):
    """Rasterize set-up triangles into tile-major depth/vis buffers.

    depth_tiles/vis_tiles: [n_tiles, TILE_H, TILE_W] prior contents (cleared
    or the early pass's output for the late pass).

    `row_window=(row0, n_rows)`: render ONLY the tile rows [row0,
    row0+n_rows) of the tiles_x x tiles_y grid — depth_tiles/vis_tiles must
    then be the [n_rows*tiles_x, ...] band slice, and the returned tiles
    cover the band.  Coverage math runs in full-grid pixel coordinates, so
    band output is bit-identical to the matching rows of a full render
    (dirty-row sun-map updates, ops/sunmap.update_sun_map).
    Returns (depth_tiles, vis_tiles, stats dict).
    """
    row0, tiles_y_full = 0, tiles_y
    if row_window is not None:
        row0, tiles_y = row_window  # grid below runs over the band only
    n_tiles = tiles_x * tiles_y
    assert depth_tiles.shape[0] == n_tiles and vis_tiles.shape[0] == n_tiles
    cc = dict(zip(("tiny2_capacity", "small_capacity", "mid_capacity",
                   "midb_capacity"), class_caps)) if class_caps else {}
    pair_tri, tile_start, pair_count, huge_dropped, drop_vec, demand_vec = emit_pairs(
        setup, tiles_x=tiles_x, tiles_y=tiles_y_full,
        pair_capacity=pair_capacity, giant_capacity=giant_capacity,
        row_window=row_window, **cc,
    )

    # per-pair records: ONE row gather of the packed REC-float record
    # (element-wise column gathers cost ~10ns/element on this chip — 12 of
    # them at pair capacity was the single largest frame cost), then
    # transpose to [REC, P]: HBM chunk DMAs slice 128 lanes at a time, which
    # Mosaic requires to be lane-dim slices.  The rows carry both the
    # raster coefficients (rows 0-15) and the shading attributes (rows
    # 16-47), so the same stream feeds the raster and shade kernels.
    baked_ids = "rec48" in setup
    if baked_ids:
        # the fused setup kernel stores 128-wide rows (DMA alignment); the
        # post-gather slice keeps only the REC live columns and fuses into
        # the gather.  Record col 13 already carries the compacted index
        # (= pair_tri), so no id-column rewrite is needed — the kernels add
        # the pass's frag offset themselves (a [P, REC] column set cost a
        # measured ~7 ms/pass at headline capacity: a full re-write of the
        # gathered stream).
        rows = setup["rec48"][pair_tri][:, :REC]  # [P, REC]
    else:
        a0, b0, c0 = setup["e"][0]
        a1, b1, c1 = setup["e"][1]
        a2, b2, c2 = setup["e"][2]
        cols = [
            a0, b0, c0, a1, b1, c1, a2, b2, c2,
            setup["za"], setup["zb"], setup["zc"],
            setup["x0"].astype(a0.dtype), jnp.zeros_like(a0),
            setup["x1"].astype(a0.dtype), jnp.zeros_like(a0),
        ]
        rows = jnp.stack(cols + [jnp.zeros_like(a0)] * (REC - 16), axis=-1)[pair_tri]
    if not baked_ids:
        # fragment id into record column 13 (the bbox y0 slot — the kernels
        # need x0/x1 in columns 12/14 for the band-range reduction but
        # never read y0/y1); offset added in-kernel like the baked path
        rows = rows.at[:, 13].set(pair_tri.astype(rows.dtype))
    # chunk-major stream [NC, REC, 128]: each 128-record chunk is one
    # contiguous DMA block for the kernels (see _raster_kernel)
    P = rows.shape[0]
    nc = -(-P // REC_CHUNK) + 1  # +1 slack chunk for the tail window
    rows = jnp.concatenate(
        [rows, jnp.zeros((nc * REC_CHUNK - P, REC), rows.dtype)], axis=0
    )
    recs = jnp.swapaxes(rows.reshape(nc, REC_CHUNK, REC), 1, 2)  # [NC, REC, 128]

    rec_rows = REC if alpha_test else 16
    # rows of tiles per grid step: the largest divisor of tiles_y whose
    # depth/vis blocks (in + out, double-buffered by the pipeline) stay
    # within a ~4.5 MB VMEM budget — 9 rows at 1080p (15 steps), 8 at a
    # 2048^2 sun map.  Tiles cross the boundary as [gt, TILE_H, TILE_W]
    # blocks: one f32 sublane tile per 8x128 image tile, no padding (the
    # earlier [gt, 1, PX] form padded its singleton 1 -> 8 sublanes).
    # per tile: depth+vis x in+out x pipeline double-buffer x 4B = 32 KB
    tile_bytes = 4 * 2 * (TILE_H * TILE_W * 4)
    max_tiles = max(4_500_000 // tile_bytes, tiles_x)
    rows_per_step = 1
    for r in range(1, tiles_y + 1):
        if tiles_y % r == 0 and r * tiles_x <= max_tiles:
            rows_per_step = r
    gt = rows_per_step * tiles_x
    kernel = functools.partial(
        _raster_kernel, tiles_x=tiles_x, rows_per_step=rows_per_step,
        alpha_test=alpha_test, rec_rows=rec_rows, row0=row0,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles_y // rows_per_step,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # recs [NC, REC, 128]
            pl.BlockSpec((gt, TILE_H, TILE_W), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((gt, TILE_H, TILE_W), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((gt, TILE_H, TILE_W), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((gt, TILE_H, TILE_W), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, rec_rows, REC_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )

    # scalar-prefetch offset works for both static ints and traced values
    # (multi-chip compositing derives it from the device index)
    frag_off = jnp.reshape(jnp.asarray(frag_offset, jnp.int32), (1,))
    depth_out, vis_out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_start, frag_off, recs, depth_tiles, vis_tiles)

    stream = dict(tile_start=tile_start, recs=recs, frag_off=frag_off)
    return depth_out, vis_out, dict(
        pair_count=pair_count, huge_dropped=huge_dropped, drop_vec=drop_vec,
        demand_vec=demand_vec, stream=stream,
    )


# attribute-plane channel layout produced by the shade kernel
# channel 12 (duv) is the triangle's uv-to-pixel area ratio before texture
# dimensions — the visibility-buffer stand-in for hardware uv derivatives
# (render/textures.select_mip consumes duv * tex_w * tex_h), which lets the
# dense G-buffer fast path pick mips without any per-pixel record gather
ATTR_CHANNELS = 13  # nx ny nz u v vz draw mat post vid0 vid1 vid2 duv


# shading touches record rows 0-45 (edges + attribute blocks); the chunk
# DMA copies rows [0, 48) and leaves the opacity rows in HBM
_SHADE_ROWS = 48


def _shade_kernel(*refs, tiles_x, n_streams, rows_per_step=1, interpret=False):
    """Winners-only attribute interpolation over the visibility buffer.

    Streams the same per-tile record chunks as the raster kernel — for EVERY
    pass's stream in one invocation (the attribute planes stay in VMEM
    between streams instead of round-tripping [n_tiles, 12, 8, 128] through
    HBM per pass), with the same multi-row grouping and monotone tile
    cursor per grid step (see _raster_kernel: per-tile steps paid ~28 us of
    fixed latency each; a row group shares one chunk-DMA sequence and the
    cursor makes per-chunk tile lookup O(1) amortized).

    MXU gather formulation: a per-record scalar loop costs ~90 VPU
    cycles/record (measured; the interpolation itself, after the winner-test
    branch was already removed).  Instead, each 128-record chunk builds a
    one-hot winner matrix OH[rec, px] = (frag[rec] == vis[px]) and gathers
    the WINNING record's whole coefficient column to every pixel with
    [_SHADE_ROWS,128] x [128, BAND_PX] matmuls (3 bf16 splits reconstruct
    f32 exactly — each pixel column selects a single record).  The gather
    runs per 128-px x-BAND, restricted to the bands the chunk's records'
    AABBs span (record rows 12/14, same narrowing as _raster_kernel) and
    gated on the band actually containing a winner — under the x-sorted
    cluster order most chunks span 1-2 of a tile's 8 bands, which cuts the
    dominant MXU cost ~4-6x versus the whole-tile [128, 1024] form.
    Interpolation then runs once per PIXEL per visited band on the gathered
    coefficients; non-winning chunks/bands contribute exact zeros (empty
    one-hot column -> wsum 0 -> masked inverse 0), so per-chunk results
    simply SUM across chunks and streams and the band skip is exact."""
    tile_starts = refs[:n_streams]
    off_refs = refs[n_streams : 2 * n_streams]  # per-stream frag offsets
    recs_refs = refs[2 * n_streams : 3 * n_streams]
    vis_ref, attr_out_ref, recs_vmem, sems = refs[3 * n_streams :]

    i = pl.program_id(0)  # row-group index (same grouping as _raster_kernel)
    gt = rows_per_step * tiles_x
    t0 = i * gt

    # band-local pixel centers [1, BAND_PX] lane-major (lane = y*BAND_W + xb
    # within a band, matching the raster kernel's band-major tile layout);
    # fx gets ox + band*BAND_W added inside the band loop, fyb the tile's oy
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, BAND_PX), 1)
    fxb0 = (lane % BAND_W).astype(jnp.float32) + jnp.float32(0.5)
    fyb = (lane // BAND_W).astype(jnp.float32) + jnp.float32(0.5)

    sub128 = jax.lax.broadcasted_iota(jnp.int32, (REC_CHUNK, 1), 0)
    dn_k1 = (((1,), (0,)), ((), ()))

    # per-tile accumulators live in the output block (zero-init — the attr
    # planes always start empty; per-chunk contributions are exact-zero off
    # the winning chunk, so read-add-write per (tile, chunk) equals the
    # register accumulation)
    attr_out_ref[...] = jnp.zeros(attr_out_ref.shape, attr_out_ref.dtype)

    for s in range(n_streams):
        g_start = tile_starts[s][t0]
        g_end = tile_starts[s][t0 + gt]
        recs_ref = recs_refs[s]
        # stream's fragment-id offset (ids = record col 13 + offset, exact
        # in f32: ids < 2^24)
        off_f = off_refs[s][0].astype(jnp.float32)

        a0c = g_start // REC_CHUNK
        a0_off = a0c * REC_CHUNK
        n_chunks = (g_end - a0_off + REC_CHUNK - 1) // REC_CHUNK
        ncmax = recs_ref.shape[0] - 1

        def dma(slot, c, recs_ref=recs_ref, a0c=a0c, ncmax=ncmax):
            ci = jnp.minimum(a0c + c, ncmax)
            # shading reads rows 0-45 only — skip the opacity-mask rows
            # (48-55) in the chunk DMA; fragment ids ride record row 13
            return pltpu.make_async_copy(
                recs_ref.at[ci, pl.ds(0, _SHADE_ROWS)], recs_vmem.at[slot], sems.at[slot]
            )

        for j in range(NBUF - 1):  # warm the pipeline NBUF-1 chunks deep
            @pl.when(j < n_chunks)
            def _(j=j, dma=dma):
                dma(j % NBUF, j).start()

        def chunk_body(c, tcur, dma=dma, n_chunks=n_chunks, a0_off=a0_off,
                       tile_start_ref=tile_starts[s]):
            slot = c % NBUF

            @pl.when(c + NBUF - 1 < n_chunks)
            def _():
                dma((c + NBUF - 1) % NBUF, c + NBUF - 1).start()

            dma(slot, c).wait()
            c_lo = a0_off + c * REC_CHUNK

            def tile_body(g):
                start = tile_start_ref[t0 + g]
                end = tile_start_ref[t0 + g + 1]

                if True:  # (indentation kept from the old pl.when guard —
                    # the cursor's visit set IS the old guard's condition)
                    gg = t0 + g
                    ox = ((gg % tiles_x) * TILE_W).astype(jnp.float32)
                    oy = ((gg // tiles_x) * TILE_H).astype(jnp.float32)
                    fy = fyb + oy
                    live = ((c_lo + sub128) >= start) & ((c_lo + sub128) < end)  # [128,1]

                    # x-band range of the chunk's live records for THIS tile
                    # (record rows 12/14 carry the setup AABB x0/x1, same
                    # reduction as _raster_kernel): the one-hot gather dots
                    # below run per 128-px BAND instead of the whole 1024-px
                    # tile — under the x-sorted cluster order a chunk's
                    # records span 1-2 of the 8 bands, a ~4-6x MXU cut on
                    # the kernel's dominant cost.
                    # lane-major live mask built from its own iota — a
                    # jnp.transpose(live) of the bool column lowers to a
                    # tpu.transpose on an i1 vector, which Mosaic cannot
                    # legalize
                    laneR = jax.lax.broadcasted_iota(jnp.int32, (1, REC_CHUNK), 1)
                    liveR = ((c_lo + laneR) >= start) & ((c_lo + laneR) < end)  # [1, 128]
                    x0r = jnp.where(liveR, recs_vmem[slot, 12:13, :], jnp.float32(1e9))
                    x1r = jnp.where(liveR, recs_vmem[slot, 14:15, :], jnp.float32(-1e9))
                    xmin = jnp.min(x0r, axis=1, keepdims=True)[0, 0] - ox
                    xmax = jnp.max(x1r, axis=1, keepdims=True)[0, 0] - ox
                    b_lo = jnp.clip(
                        jnp.floor(xmin * (1.0 / BAND_W)).astype(jnp.int32), 0, NBANDS - 1
                    ) + jnp.where(xmin >= jnp.float32(TILE_W), NBANDS, 0)
                    b_hi = jnp.clip(
                        jnp.floor((xmax - 1.0) * (1.0 / BAND_W)).astype(jnp.int32),
                        0, NBANDS - 1,
                    ) - jnp.where(xmax <= 0.0, NBANDS, 0)

                    fragT = jnp.transpose(recs_vmem[slot, 13:14, :]) + off_f  # [128, 1]
                    # live frag-id range of the chunk, for the band winner
                    # pre-test below (ids are triangle ids, not contiguous,
                    # so the range test can false-positive — that only
                    # costs a wasted dot, never a missed winner)
                    fmin = jnp.min(
                        jnp.where(liveR, recs_vmem[slot, 13:14, :] + off_f,
                                  jnp.float32(_NOID)),
                        axis=1, keepdims=True)[0, 0]
                    fmax = jnp.max(
                        jnp.where(liveR, recs_vmem[slot, 13:14, :] + off_f,
                                  jnp.float32(-1.0)),
                        axis=1, keepdims=True)[0, 0]
                    recs = recs_vmem[slot]  # [_SHADE_ROWS, 128] f32
                    if not interpret:
                        rs1, rs2, rs3 = split3(recs)

                    for b in range(NBANDS):
                        @pl.when((b >= b_lo) & (b <= b_hi))
                        def _(b=b):
                            visv = vis_ref[pl.ds(g, 1), b, :].astype(
                                jnp.float32
                            )  # [1, BAND_PX]; ids < 2^24 exact

                            # bands none of whose pixels resolve to this
                            # chunk contribute exact zeros — skip the dots
                            # (occluded chunks cost only this compare).
                            # The gate is a lane reduce of an f32 mask (a
                            # full [128,128] i1 reduce lowers to a bool
                            # transpose Mosaic can't legalize): a winner
                            # pixel's id necessarily lies in the chunk's
                            # live id range [fmin, fmax].
                            hit = jnp.where(
                                (visv >= fmin) & (visv <= fmax), 1.0, 0.0
                            )  # [1, BAND_PX]

                            @pl.when(jnp.max(hit, axis=1, keepdims=True)[0, 0] > 0.0)
                            def _():
                                # one-hot winner matrix [128 rec, 128 px]:
                                # frag ids as a sublane column vs the band's
                                # winner row; records outside this tile's
                                # [start, end) range masked off
                                ohb = (fragT == visv) & live  # [128, BAND_PX]
                                oh = ohb.astype(jnp.bfloat16)
                                # gather the winning record's coefficients
                                # to each pixel: 3 exact bf16 splits, f32
                                # accumulation (one-hot contraction).
                                # Interpret mode uses a single f32 HIGHEST
                                # dot instead: XLA's HLO cleanup collapses
                                # the manual split trio to one bf16 pass
                                # (see setup_fused.split3), while HIGHEST
                                # one-hot dots are exact and honored by the
                                # optimizer.
                                if interpret:
                                    C = jax.lax.dot_general(
                                        recs, oh.astype(jnp.float32), dn_k1,
                                        preferred_element_type=jnp.float32, precision=_PX)
                                else:
                                    C = jax.lax.dot_general(rs1, oh, dn_k1, preferred_element_type=jnp.float32)
                                    C = C + jax.lax.dot_general(rs2, oh, dn_k1, preferred_element_type=jnp.float32)
                                    C = C + jax.lax.dot_general(rs3, oh, dn_k1, preferred_element_type=jnp.float32)
                                # C [_SHADE_ROWS, BAND_PX]: per-pixel
                                # winning coefficients

                                r = lambda k: C[k : k + 1, :]  # [1, BAND_PX]
                                fx = fxb0 + (ox + jnp.float32(b * BAND_W))
                                # Olano-Greer: the homogeneous edge
                                # functions ARE the perspective-correct
                                # interpolation weights — attr(p) =
                                # sum_j f_j u_j / sum u_j, no per-vertex
                                # division.  e0 is through (A,B) -> weight
                                # of C; e1 (B,C) -> A; e2 (C,A) -> B (see
                                # compact_setup edge order).
                                e0 = r(0) * fx + r(1) * fy + r(2)
                                e1 = r(3) * fx + r(4) * fy + r(5)
                                e2 = r(6) * fx + r(7) * fy + r(8)
                                wsum = e0 + e1 + e2
                                inv = jnp.where(jnp.abs(wsum) < 1e-20, 0.0, 1.0 / wsum)
                                pw0 = e1 * inv
                                pw1 = e2 * inv
                                pw2 = e0 * inv

                                def interp(o):
                                    return pw0 * r(16 + o) + pw1 * r(24 + o) + pw2 * r(32 + o)

                                # per-triangle uv derivative ratio (constant
                                # over the triangle): |d(uv)| / |d(screen)|
                                # from the record's corner attributes — the
                                # same quantities shade_gbuffer reads, so
                                # mip picks match bit-exactly
                                # (textures.select_mip computes it this way)
                                uv_area = jnp.abs(
                                    (r(30) - r(22)) * (r(39) - r(23)) - (r(31) - r(23)) * (r(38) - r(22))
                                )
                                px_area = jnp.abs(
                                    (r(24) - r(16)) * (r(33) - r(17)) - (r(25) - r(17)) * (r(32) - r(16))
                                )
                                duv = uv_area / jnp.maximum(px_area, 1e-6)

                                vals = [interp(3), interp(4), interp(5),   # normal
                                        interp(6), interp(7),              # uv
                                        interp(2),                         # viewz
                                        r(43), r(44), r(45),               # draw, mat, post
                                        r(40), r(41), r(42),               # vids
                                        duv]
                                for k, v in enumerate(vals):
                                    acc = attr_out_ref[pl.ds(g, 1), k, b, :]
                                    attr_out_ref[pl.ds(g, 1), k, b, :] = acc + v

            # monotone tile cursor — see _raster_kernel
            tcur = jax.lax.while_loop(
                lambda t: (t < gt) & (tile_start_ref[t0 + t + 1] <= c_lo),
                lambda t: t + 1,
                tcur,
            )

            def visit(t):
                tile_body(t)
                return t + 1

            jax.lax.while_loop(
                lambda t: (t < gt) & (tile_start_ref[t0 + t] < c_lo + REC_CHUNK),
                visit,
                tcur,
            )
            return tcur

        jax.lax.fori_loop(0, n_chunks, chunk_body, jnp.int32(0))


def shade_tiles(streams, vis_tiles, attr_tiles=None, *, tiles_x: int,
                interpret: bool = False):
    """Interpolate per-pixel attributes for one or more passes' records in a
    single kernel launch (pass a stream dict or a list of them).

    Returns attr planes [n_tiles, ATTR_CHANNELS, TILE_H, TILE_W].  The
    planes always start at zero (every caller passed zeros — the kernel now
    zero-inits in VMEM instead of streaming a zero image in); `attr_tiles`
    is accepted for API compatibility and must be None or all-zero."""
    del attr_tiles  # always zero-initialized in-kernel
    if isinstance(streams, dict):
        streams = [streams]
    n_streams = len(streams)
    n_tiles = vis_tiles.shape[0]
    tiles_y = n_tiles // tiles_x
    # rows of tiles per grid step under a ~5.5 MB VMEM budget (the attr
    # block is the big one: 13 channels x 4 KB x double-buffer per tile)
    tile_bytes = 2 * 4 * (TILE_H * TILE_W) * (ATTR_CHANNELS + 1)
    max_tiles = max(5_500_000 // tile_bytes, tiles_x)
    rows_per_step = 1
    for r in range(1, tiles_y + 1):
        if tiles_y % r == 0 and r * tiles_x <= max_tiles:
            rows_per_step = r
    gt = rows_per_step * tiles_x
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 * n_streams,  # tile_starts + frag offsets
        grid=(tiles_y // rows_per_step,),
        in_specs=(
            [pl.BlockSpec(memory_space=pl.ANY)] * n_streams  # recs [NC, REC, 128]
            + [pl.BlockSpec((gt, TILE_H, TILE_W), lambda i, *_: (i, 0, 0))]
        ),
        out_specs=[
            pl.BlockSpec((gt, ATTR_CHANNELS, TILE_H, TILE_W),
                         lambda i, *_: (i, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, _SHADE_ROWS, REC_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    (attr_out,) = pl.pallas_call(
        functools.partial(_shade_kernel, tiles_x=tiles_x, n_streams=n_streams,
                          rows_per_step=rows_per_step, interpret=interpret),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, ATTR_CHANNELS, TILE_H, TILE_W), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        *[s["tile_start"] for s in streams],
        *[s.get("frag_off", jnp.zeros(1, jnp.int32)) for s in streams],
        *[s["recs"] for s in streams],
        vis_tiles,
    )
    return attr_out


def attr_tiles_to_image(attr_tiles, height, width):
    """[n_tiles, C, TILE_H, TILE_W] (band-major pixel order) -> [H, W, C]."""
    ty, tx = height // TILE_H, width // TILE_W
    c = attr_tiles.shape[1]
    t = attr_tiles.reshape(ty, tx, c, NBANDS, TILE_H, BAND_W)
    t = jnp.transpose(t, (0, 4, 1, 3, 5, 2))  # [ty, y, tx, band, xb, C]
    return t.reshape(height, width, c)

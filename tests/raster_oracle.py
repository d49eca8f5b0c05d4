"""Fixed-point scalar oracle rasterizer — hardware raster rules transcribed.

The reference renders through fixed-function GPU rasterization
(/root/reference/src/shaders/meshlet.mesh.glsl emits clip-space positions;
the hardware rasterizer does the rest).  Hardware behavior, per the Vulkan
"Basic Polygon Rasterization" rules:

  1. vertices snap to a fixed-point subpixel grid — 1/256 on the reference's
     target GPUs (subPixelPrecisionBits = 8);
  2. edge functions are evaluated in exact integer arithmetic;
  3. a pixel center exactly on an edge is covered iff the edge is a *top* or
     *left* edge of the triangle (each shared-edge pixel covered exactly
     once);
  4. depth interpolates as an affine screen-space plane through the snapped
     vertices.

This module transcribes those rules into exact int64 edge math + f64 depth —
the parity ground truth for the f32 TPU rasterizer (ops/raster_tile.py),
which snaps in setup (ops/raster.py transform_clusters) and applies the same
top-left rule but evaluates edges in f32.  tests/test_raster_oracle.py
measures the divergence.
"""

import numpy as np

SUB = 256  # subpixel grid: 8 fractional bits
INVALID = 0x7FFFFFFF


def snap(coords):
    """Snap pixel-space coordinates to the integer subpixel grid."""
    return np.rint(np.asarray(coords, np.float64) * SUB).astype(np.int64)


def rasterize_fixed_point(corners, zw, frag, width, height, depth=None, vis=None):
    """Exact scalar rasterization of N triangles.

    corners: [N, 3, 2] screen-space pixel coords (x, y); snapped to 1/256
             here, so pass either raw or pre-snapped values.
    zw:      [N, 3] per-corner reverse-Z depth (interpolated affinely).
    frag:    [N] fragment ids.  Resolve rule matches the pipeline: max
             depth wins, exact depth ties go to the smaller fragment id.

    Back faces (integer det <= 0 in the pipeline's winding: interior-positive
    edges (A,B),(B,C),(C,A)) are skipped; pre-flip corners for double-sided
    passes.  Returns (depth [H,W] f64, vis [H,W] i64).
    """
    corners = np.asarray(corners, np.float64)
    zw = np.asarray(zw, np.float64)
    if depth is None:
        depth = np.zeros((height, width), np.float64)
    else:
        depth = np.array(depth, np.float64)
    if vis is None:
        vis = np.full((height, width), INVALID, np.int64)
    else:
        vis = np.array(vis, np.int64)

    X = snap(corners[..., 0])  # [N,3] int64 subpixel
    Y = snap(corners[..., 1])

    for t in range(corners.shape[0]):
        ax, ay, bx, by, cx, cy = X[t, 0], Y[t, 0], X[t, 1], Y[t, 1], X[t, 2], Y[t, 2]

        # interior-positive integer edge functions, pipeline convention
        # (raster.compact_setup cross_rows at w == 1): edge P->Q has
        # e(x, y) = a*x + b*y + c with a = Qy-Py, b = Px-Qx, c = Py*Qx-Px*Qy
        edges = []
        for (px, py, qx, qy) in ((ax, ay, bx, by), (bx, by, cx, cy), (cx, cy, ax, ay)):
            edges.append((qy - py, px - qx, py * qx - px * qy))

        # det = eBC evaluated at A = 2 * signed area (subpixel^2)
        a1, b1, c1 = edges[1]
        det = a1 * ax + b1 * ay + c1
        if det <= 0:
            continue  # back-facing or degenerate

        # pixel loop over the snapped AABB
        x0 = max(int(min(ax, bx, cx)) // SUB, 0)
        y0 = max(int(min(ay, by, cy)) // SUB, 0)
        x1 = min(-(-int(max(ax, bx, cx)) // SUB), width)
        y1 = min(-(-int(max(ay, by, cy)) // SUB), height)
        if x1 <= x0 or y1 <= y0:
            continue

        pxs = np.arange(x0, x1, dtype=np.int64) * SUB + SUB // 2  # centers
        pys = np.arange(y0, y1, dtype=np.int64) * SUB + SUB // 2
        gx = pxs[None, :]
        gy = pys[:, None]

        cover = np.ones((y1 - y0, x1 - x0), bool)
        for (a, b, c) in edges:
            e = a * gx + b * gy + c  # exact int64
            tl = (a > 0) or (a == 0 and b > 0)  # top-left edge acceptance
            cover &= (e > 0) | ((e == 0) & tl)
        if not cover.any():
            continue

        # affine depth plane through the snapped corners (f64): areal
        # coordinates are exact integer ratios of edge values to det
        eA = edges[1][0] * gx + edges[1][1] * gy + edges[1][2]  # weight of A
        eB = edges[2][0] * gx + edges[2][1] * gy + edges[2][2]  # weight of B
        eC = edges[0][0] * gx + edges[0][1] * gy + edges[0][2]  # weight of C
        z = (eA * zw[t, 0] + eB * zw[t, 1] + eC * zw[t, 2]) / det
        cover &= (z > 0.0) & (z <= 1.0)

        d = depth[y0:y1, x0:x1]
        v = vis[y0:y1, x0:x1]
        closer = cover & (z > d)
        tie = cover & (z == d) & (frag[t] < v)
        depth[y0:y1, x0:x1] = np.where(closer, z, d)
        vis[y0:y1, x0:x1] = np.where(closer | tie, frag[t], v)

    return depth, vis


def setup_to_oracle_inputs(setup, znear):
    """Extract (corners, zw, frag) for the oracle from a compact_setup /
    setup_compact record array (rows already snapped by the pipeline).

    Record layout (ops/setup_fused.py): cols 16-18 / 24-26 / 32-34 hold each
    corner's (screen x, screen y, viewz).  zw = znear / viewz recomputed in
    f64.  Fragment ids are the compacted slot indices (raster_tile emits
    frag = record row + frag_offset).
    """
    n = int(setup["count"])
    rec = np.asarray(setup["rec48"][:n], np.float64)
    corners = np.stack(
        [rec[:, (16, 17)], rec[:, (24, 25)], rec[:, (32, 33)]], axis=1
    )  # [n, 3, 2]
    w = np.stack([rec[:, 18], rec[:, 26], rec[:, 34]], axis=1)  # [n, 3]
    zw = float(znear) / np.where(np.abs(w) < 1e-12, 1e-12, w)
    return corners, zw, np.arange(n, dtype=np.int64)

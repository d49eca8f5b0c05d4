#!/usr/bin/env python
"""Primitive-operation microbenchmarks on the real chip.

Measures the gather/scatter/sort/matmul building blocks the frame pipeline
is made of, so stage redesigns are driven by measured costs (the analog of
the reference's per-pass timestamp discipline, niagara.cpp:1960-2010).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def _sync(out):
    """Hard sync (block_until_ready can return early through the relay)."""
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))
    return out


def timed(name, fn, *args, n=10, bytes_moved=None):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn_j(*args)
    _sync(out)
    sec = (time.time() - t0) / n
    ms = 1000 * sec
    bw = f"  {bytes_moved / sec / 1e9:8.1f} GB/s" if bytes_moved else ""
    print(f"{name:44s} {ms:9.3f} ms{bw}", flush=True)
    return out


def main():
    rng = np.random.default_rng(1)

    # --- element gather ---
    M = 1 << 20
    src = jnp.asarray(rng.standard_normal(M), jnp.float32)
    for N in (1 << 20, 1 << 21):
        idx = jnp.asarray(rng.integers(0, M, N), jnp.int32)
        timed(f"elem gather [{N>>20}M] f32", lambda s, i: s[i], src, idx, bytes_moved=4 * N)

    # --- row gathers ---
    for R in (8, 16, 46):
        tbl = jnp.asarray(rng.standard_normal((M, R)), jnp.float32)
        N = 1 << 20
        idx = jnp.asarray(rng.integers(0, M, N), jnp.int32)
        timed(f"row gather [1M,{R}] f32", lambda t, i: t[i], tbl, idx, bytes_moved=4 * R * N)

    # image-gather: [H,W] indices into [1M, 30] (the shade_rec pattern)
    tbl = jnp.asarray(rng.standard_normal((M, 30)), jnp.float32)
    idxhw = jnp.asarray(rng.integers(0, M, (1080, 1920)), jnp.int32)
    timed("row gather [1080,1920]->[.,30]", lambda t, i: t[i], tbl, idxhw, bytes_moved=4 * 30 * 1080 * 1920)

    # --- big-row gather (transform_clusters pattern) ---
    K = 1 << 16
    vdata = jnp.asarray(rng.standard_normal((8192, 64, 8)), jnp.float32)
    mi = jnp.asarray(rng.integers(0, 8192, K), jnp.int32)
    timed(f"2KB-row gather [{K>>10}K,64,8]", lambda t, i: t[i], vdata, mi, bytes_moved=2048 * K)

    # --- corner fetch alternatives (K=64K clusters) ---
    tri = jnp.asarray(rng.integers(0, 64, (K, 96, 3)), jnp.int32)
    attrs = jnp.asarray(rng.standard_normal((K, 64, 9)), jnp.float32)

    def onehot_f32(tri, attrs):
        iota = jnp.arange(64, dtype=jnp.int32)
        dn = (((2,), (1,)), ((0,), (0,)))
        outs = []
        for c in range(3):
            oh = (tri[:, :, c, None] == iota[None, None, :]).astype(jnp.float32)
            outs.append(jax.lax.dot_general(oh, attrs, dn, preferred_element_type=jnp.float32))
        return outs

    timed("onehot corner fetch f32 x3", onehot_f32, tri, attrs)

    def onehot_bf16(tri, attrs):
        iota = jnp.arange(64, dtype=jnp.int32)
        dn = (((2,), (1,)), ((0,), (0,)))
        a1 = attrs.astype(jnp.bfloat16).astype(jnp.float32)
        r1 = attrs - a1
        a2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
        a3 = (r1 - a2).astype(jnp.bfloat16).astype(jnp.float32)
        ab = jnp.stack([a1, a2, a3], 0)
        outs = []
        for c in range(3):
            oh = (tri[:, :, c, None] == iota[None, None, :]).astype(jnp.bfloat16)
            acc = 0
            for s in range(3):
                acc = acc + jax.lax.dot_general(oh, ab[s].astype(jnp.bfloat16), dn, preferred_element_type=jnp.float32)
            outs.append(acc)
        return outs

    timed("onehot corner fetch bf16x3split x3", onehot_bf16, tri, attrs)

    def tala(tri, attrs):
        # take_along_axis corner fetch
        outs = []
        for c in range(3):
            idx = tri[:, :, c]  # [K,96]
            outs.append(jnp.take_along_axis(attrs, idx[:, :, None], axis=1))
        return outs

    timed("take_along_axis corner fetch x3", tala, tri, attrs)

    # --- cumsum + scatter (compaction pattern) ---
    mask = jnp.asarray(rng.random(K * 96) < 0.05)

    def compaction(mask):
        pos = jnp.cumsum(mask) - mask
        slot = jnp.where(mask & (pos < (1 << 20)), pos, 1 << 20)
        return jnp.zeros(1 << 20, jnp.int32).at[slot].set(jnp.arange(K * 96, dtype=jnp.int32), mode="drop")

    timed(f"cumsum+scatter compact [{K*96>>20}M]", compaction, mask)

    # row scatter 16B rows
    N = 1 << 20
    rows = jnp.asarray(rng.standard_normal((N, 4)), jnp.float32)
    slots = jnp.asarray(rng.permutation(N).astype(np.int32))
    timed("row scatter [1M,4] f32", lambda r, s: jnp.zeros((N, 4), jnp.float32).at[s].set(r), rows, slots,
          bytes_moved=16 * N)

    # --- sorts ---
    for P in (1 << 20, 1 << 21):
        keys = jnp.asarray(rng.integers(0, 2048, P).astype(np.uint32))
        vals = jnp.arange(P, dtype=jnp.int32)
        timed(f"sort u32 [{P>>20}M]", lambda k: jax.lax.sort((k,), num_keys=1), keys)
        timed(f"sort (u32,i32) [{P>>20}M]", lambda k, v: jax.lax.sort((k, v), num_keys=1), keys, vals)
        timed(f"sort u32 packed key<<21|idx [{P>>20}M]", lambda k: jax.lax.sort(
            ((k << jnp.uint32(21)) | jnp.arange(P, dtype=jnp.uint32),), num_keys=1), keys)

    # argsort via packed key then mask
    # --- scatter-add histogram ---
    P = 1 << 21
    keys = jnp.asarray(rng.integers(0, 2048, P), jnp.int32)
    timed("scatter-add hist [2M]->2048", lambda k: jnp.zeros(2048, jnp.int32).at[k].add(1), keys)

    # --- image-scale ops for reference ---
    img = jnp.asarray(rng.standard_normal((1080, 1920)), jnp.float32)
    timed("image copy+mul [1080p]", lambda x: x * 2.0 + 1.0, img, bytes_moved=2 * 4 * 1080 * 1920)


if __name__ == "__main__":
    main()

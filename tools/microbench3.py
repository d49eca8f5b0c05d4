#!/usr/bin/env python
"""Microbench: the pair-record stream build (gather + chunk transpose).

The prefix profiler attributes ~44 ms to '+stream+raster kernel'; this
isolates where it goes: the [P]-row gather from rec48, the frag-id column
set, and the [NC, 128, REC] -> [NC, REC, 128] chunk transpose.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

P = int(os.environ.get("MB_P", 1280 * 1024))
CAP = int(os.environ.get("MB_CAP", 640 * 1024))
REC = 56

key = jax.random.PRNGKey(0)
rec48 = jax.device_put(jax.random.normal(key, (CAP, 128), jnp.float32))
pair_tri = jax.device_put(jax.random.randint(key, (P,), 0, CAP, jnp.int32))


def _sync(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(jax.device_get(leaf.ravel()[:1]))


def timed(name, fn, *a, n=10):
    out = fn(*a)
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
    _sync(out)
    print(f"{name:44s} {1000*(time.time()-t0)/n:8.2f} ms", flush=True)


nc = -(-P // 128) + 1

def g_full(rec48, idx):
    return rec48[idx]

def g_slice(rec48, idx):
    return rec48[idx][:, :REC]

def g_slice_set(rec48, idx):
    rows = rec48[idx][:, :REC]
    return rows.at[:, 13].set(idx.astype(rows.dtype))

def stream_full(rec48, idx):
    rows = rec48[idx][:, :REC]
    rows = rows.at[:, 13].set(idx.astype(rows.dtype))
    rows = jnp.concatenate([rows, jnp.zeros((nc * 128 - P, REC), rows.dtype)], axis=0)
    return jnp.swapaxes(rows.reshape(nc, 128, REC), 1, 2)

def stream_notrans(rec48, idx):
    rows = rec48[idx]  # keep 128 wide, no slice
    rows = rows.at[:, 13].set(idx.astype(rows.dtype))
    rows = jnp.concatenate([rows, jnp.zeros((nc * 128 - P, 128), rows.dtype)], axis=0)
    return rows.reshape(nc, 128, 128)

def sortP(idx):
    (s,) = jax.lax.sort((idx.astype(jnp.uint32),), num_keys=1)
    return s

timed("sort [P] u32", jax.jit(sortP), pair_tri)
timed("gather [P,128] full rows", jax.jit(g_full), rec48, pair_tri)
timed("gather+slice [P,56]", jax.jit(g_slice), rec48, pair_tri)
timed("gather+slice+setcol", jax.jit(g_slice_set), rec48, pair_tri)
timed("full stream build (gather+pad+transpose)", jax.jit(stream_full), rec48, pair_tri)
timed("stream, no transpose ([NC,128,128])", jax.jit(stream_notrans), rec48, pair_tri)

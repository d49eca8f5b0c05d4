#!/usr/bin/env python
"""Microbenchmarks of the TPU primitives the renderer leans on.

NOTE: on the axon backend block_until_ready does not reliably synchronize;
we time a K-iteration dependent loop and force a device->host read, then
subtract the 1-iteration baseline: op_time = (T_K - T_1) / (K - 1).
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


def loop_timed(name, op, args, perturb, n_hi=9, reps=3):
    """op: fn(*args) -> array; perturb: fn(out, *args) -> new first arg,
    creating a data dependency between iterations."""

    def make(k):
        @jax.jit
        def run(*a):
            a = list(a)
            out = None
            for _ in range(k):
                out = op(*a)
                a[0] = perturb(out, *a)
            return out

        return run

    f1, fk = make(1), make(n_hi)

    def measure(f):
        out = f(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # force completion
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = f(*args)
            _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
            ts.append(time.time() - t0)
        return float(np.median(ts))

    t1, tk = measure(f1), measure(fk)
    per_op = (tk - t1) / (n_hi - 1) * 1000
    print(f"{name:44s} {per_op:9.2f} ms  (T1={t1*1000:.1f} Tk={tk*1000:.1f})", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    N = 4 * 1024 * 1024

    keys32 = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.int32)
    vals = jax.random.normal(key, (N,), dtype=jnp.float32)
    idx_big = jax.random.randint(key, (N,), 0, 1 << 21, dtype=jnp.int32)

    loop_timed("sort 4M i32", lambda k: jnp.sort(k), (keys32,), lambda out, k: out ^ k)
    loop_timed("argsort 4M i32", lambda k: jnp.argsort(k), (keys32,), lambda out, k: out ^ k)
    loop_timed(
        "scatter-max 4M -> 2M bins",
        lambda i, v: jnp.zeros(1 << 21, jnp.float32).at[i].max(v),
        (idx_big, vals),
        lambda out, i, v: i + out[:1].astype(jnp.int32),
    )
    loop_timed(
        "gather 4M from 2M",
        lambda i, t: t[i],
        (idx_big, vals[: 1 << 21]),
        lambda out, i, t: i + out[:1].astype(jnp.int32) * 0,
    )

    table = jax.random.normal(key, (1 << 17, 256), dtype=jnp.float32)
    rows = jax.random.randint(key, (1 << 16,), 0, 1 << 17, dtype=jnp.int32)
    loop_timed(
        "row-gather 64k x 1KB rows",
        lambda r, t: t[r],
        (rows, table),
        lambda out, r, t: r + out[:1, :1].astype(jnp.int32)[0] * 0,
    )

    K = 131072
    attr = jax.random.normal(key, (K, 64), dtype=jnp.float32)
    tri = jax.random.randint(key, (K, 96), 0, 64, dtype=jnp.int32)
    loop_timed(
        "take_along_axis [131k,96]<-[131k,64]",
        lambda t, a: jnp.take_along_axis(a, t, axis=1),
        (tri, attr),
        lambda out, t, a: t + out[:1, :1].astype(jnp.int32) * 0,
    )

    def onehot_gather13(t, a):
        oh = (t[:, :, None] == jnp.arange(64, dtype=jnp.int32)[None, None, :]).astype(jnp.float32)
        return jnp.einsum("ktv,kvf->ktf", oh, a, preferred_element_type=jnp.float32)

    attr13 = jax.random.normal(key, (K, 64, 13), dtype=jnp.float32)
    loop_timed(
        "one-hot matmul 13 attrs [131k,96,13]",
        onehot_gather13,
        (tri, attr13),
        lambda out, t, a: t + out[:1, :1, :1].astype(jnp.int32)[0] * 0,
    )

    big = jax.random.randint(key, (12 * 1024 * 1024,), 0, 2, dtype=jnp.int32)
    loop_timed("cumsum 12.6M i32", lambda b: jnp.cumsum(b), (big,), lambda out, b: out)

    # dense elementwise baseline: 134M f32 multiply-add
    dense = jax.random.normal(key, (128 * 1024 * 1024,), dtype=jnp.float32)
    loop_timed("dense fma 134M f32", lambda d: d * 1.0001 + 0.1, (dense,), lambda out, d: out)


if __name__ == "__main__":
    main()

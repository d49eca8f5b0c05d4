#!/usr/bin/env python
"""Effective-HBM-bandwidth probe for the current chip.

Measures the byte-throughput primitives the frame is built from and prints
one JSON dict (also importable: `probe()` returns it).  bench.py embeds the
result in its output so the driver can verify roofline claims against the
*measured* chip state (the pooled dev chip is time-sliced; peak sheet
numbers mean nothing here).
"""

import json
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
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))
    return out


def _timed(fn, args, n=8):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn_j(*args)
    _sync(out)
    return (time.time() - t0) / n


def probe(quick: bool = True) -> dict:
    """Returns {name: GB/s or ns/row} for the load-bearing primitives."""
    key = jax.random.PRNGKey(0)
    out = {}

    # dense stream: copy-add over 128 MB read + 128 MB write
    M = 32 * 1024 * 1024
    x = jnp.arange(M, dtype=jnp.float32)
    t = _timed(lambda a: a + 1.0, (x,))
    out["dense_gbps"] = round(2 * 4 * M / t / 1e9, 2)

    # row gathers: 1M rows from a 2M-row table at several row widths
    R = 1 << 20
    idx = jax.random.randint(key, (R,), 0, 1 << 21, dtype=jnp.int32)
    for w, dt, tag in ((16, jnp.uint8, "row16B_u8"), (64, jnp.uint8, "row64B_u8"),
                      (32, jnp.float32, "row128B_f32"), (56, jnp.float32, "row224B_f32")):
        tbl = jnp.zeros((1 << 21, w), dt)
        t = _timed(lambda i, tb: tb[i], (idx, tbl))
        out[f"gather_{tag}_ns_row"] = round(t / R * 1e9, 1)
        out[f"gather_{tag}_gbps"] = round(R * w * jnp.dtype(dt).itemsize / t / 1e9, 2)

    # element gather (the slow path the design avoids)
    t = _timed(lambda i, tb: tb[i], (idx, jnp.zeros(1 << 21, jnp.float32)))
    out["gather_elem_ns"] = round(t / R * 1e9, 1)

    # wide row gathers (cluster-channel fetch scale: 2.5KB rows)
    idx64k = jax.random.randint(key, (1 << 16,), 0, 1 << 14, dtype=jnp.int32)
    tbl = jnp.zeros((1 << 14, 640), jnp.float32)
    t = _timed(lambda i, tb: tb[i], (idx64k, tbl))
    out["gather_row2560B_ns_row"] = round(t / (1 << 16) * 1e9, 1)
    out["gather_row2560B_gbps"] = round((1 << 16) * 2560 / t / 1e9, 2)

    # MXU: bf16 matmul at frame-kernel scale (2048^3 = 17.2 GFLOP)
    a = jnp.ones((2048, 2048), jnp.bfloat16)
    t = _timed(
        lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ),
        (a, a),
    )
    out["mxu_bf16_tflops"] = round(2 * 2048**3 / t / 1e12, 1)

    # u32 sort at pair-emission scales (the emit_pairs primitive); the
    # 2M/3M/4M points reveal whether sort cost steps at power-of-2 pads
    for n, tag in ((1 << 21, "sort2M"), (3 << 20, "sort3M"), (1 << 22, "sort4M")):
        keys32 = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.uint32)
        t = _timed(lambda k: jax.lax.sort((k,), num_keys=1)[0], (keys32,), n=3)
        out[f"{tag}_u32_ms"] = round(t * 1e3, 2)
    return out


if __name__ == "__main__":
    print(json.dumps(probe(quick="--full" not in sys.argv)))

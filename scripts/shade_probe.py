#!/usr/bin/env python
"""Micro-bench the shade stage's non-elementwise pieces on hardware:

  * small-table gather  — mat_pack[mi]: (1M,) int index into a (nmat, 10)
    row table (how XLA lowers tiny-table gathers is the question; random
    1M gathers from 1M tables cost ~15 ms/col on this chip)
  * one-hot matmul      — the MXU alternative: onehot(mi) @ table at
    HIGHEST (exact: each output sums exactly one product)
  * unswizzle transpose — the (1M, 3) tile unswizzle reshape/transpose
  * background          — normalize + gradient mix on (1M, d)

All interleaved min-of-rounds; RTT cancels in differences vs noop.

    python scripts/shade_probe.py [--nmat 1]
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nmat", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    R = 1024 * 1024
    rng = np.random.default_rng(0)
    mi = jnp.asarray(rng.integers(0, args.nmat, R).astype(np.int32))
    table = jnp.asarray(rng.random((args.nmat, 10), np.float32))
    colors = jnp.asarray(rng.random((R, 3), np.float32))
    dirs = jnp.asarray(rng.random((R, 4), np.float32) - 0.5)

    @jax.jit
    def noop():
        return jnp.zeros((64,), jnp.float32)

    @jax.jit
    def small_gather():
        row = table[mi]
        return row[:, 0] + row[:, 9]

    @jax.jit
    def onehot_mm():
        oh = (mi[:, None] == jnp.arange(args.nmat)[None, :]).astype(
            jnp.float32)
        row = jax.lax.dot(oh, table,
                          precision=jax.lax.Precision.HIGHEST)
        return row[:, 0] + row[:, 9]

    @jax.jit
    def unswizzle():
        # production shape: (n_blocks, 32, 16, 3) tiles -> (H, W, 3)
        t = colors.reshape(32, 64, 32, 16, 3)
        t = t.transpose(0, 3, 1, 2, 4).reshape(1024, 1024, 3)
        return t.reshape(-1, 3)[:, 0]

    @jax.jit
    def bg():
        n = dirs / jnp.sqrt(jnp.sum(dirs * dirs, axis=1, keepdims=True))
        inten = n[:, 1]
        c1 = jnp.asarray([1.0, 0.5, 0.25])
        c2 = jnp.asarray([0.0, 0.5, 0.75])
        out = jnp.where(inten[:, None] >= 0,
                        c1 * inten[:, None] + c2 * (1 - inten[:, None]),
                        c2 * (1 + inten[:, None]))
        return out[:, 0]

    point = jnp.asarray(rng.random((R, 4), np.float32))
    normal = jnp.asarray(rng.random((R, 4), np.float32) - 0.5)

    @jax.jit
    def shade_chain():
        # the full camera-light shading formula on realistic inputs:
        # material row gather + diffuse + masked specular (jnp.power)
        row = table[mi]
        mc, mspec = row[:, 0:3], row[:, 3:6]
        spec_int, spec_exp = row[:, 8], row[:, 9]
        sine = -jnp.sum(dirs * normal, axis=1)
        light = jnp.maximum(sine, 0.0)[:, None] * jnp.ones((1, 3))
        mask = (sine > 0) & (spec_int != 0)
        base = jnp.power(jnp.maximum(sine, 0.0), spec_exp) * spec_int
        spec = mspec * base[:, None]
        spec_a = base
        r0 = 0.1 + mc * light
        local = spec + ((1 - spec_a))[:, None] * r0
        m = point[:, 0] > 0.5
        bgc = jnp.where(dirs[:, 1][:, None] >= 0,
                        jnp.asarray([1.0, .5, .25]) * dirs[:, 1][:, None],
                        jnp.asarray([0.0, .5, .75]))
        return jnp.where(m[:, None], local, bgc)[:, 0]

    @jax.jit
    def power_only():
        sine = -jnp.sum(dirs * normal, axis=1)
        return jnp.power(jnp.maximum(sine, 0.0), table[mi][:, 9])

    stages = [("noop", noop), ("small_gather", small_gather),
              ("onehot_mm", onehot_mm), ("unswizzle", unswizzle),
              ("bg", bg), ("shade_chain", shade_chain),
              ("power_only", power_only)]

    def sync(x):
        return float(jnp.sum(x.reshape(-1)[:64].astype(jnp.int32)))

    for name, f in stages:
        t0 = time.perf_counter()
        sync(f())
        print(f"# {name} compiled {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    best = {}
    for _ in range(args.rounds):
        for name, f in stages:
            t0 = time.perf_counter()
            sync(f())
            best[name] = min(best.get(name, float("inf")),
                             time.perf_counter() - t0)

    ms = {k: round(v * 1000, 2) for k, v in best.items()}
    print(json.dumps({
        "experiment": "shade_probe", "nmat": args.nmat, "raw_ms": ms,
        "derived_ms": {k: round(ms[k] - ms["noop"], 2)
                       for k in ms if k != "noop"},
    }))


if __name__ == "__main__":
    main()

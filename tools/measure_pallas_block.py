#!/usr/bin/env python
"""Measure the Pallas fused tail block vs XLA (PERFORMANCE.md table).

Fenced by data readbacks (block_until_ready through the tunnel can ack
at dispatch).  FLOPs: 2 convs x 9 taps x 16 positions x C^2 x 2 per
sample.
"""

import os
import statistics
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from playaid_core_tpu.tpu_warmup import warm_tunnel

    try:
        warm_tunnel(log=lambda m: print(m, file=sys.stderr))
    except RuntimeError:
        pass

    import jax
    import jax.numpy as jnp

    from playaid_core_tpu.ops.pallas_conv_block import (
        pallas_residual_block,
        xla_residual_block,
    )

    c = 512
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)), jnp.float32)
    s1 = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.1, c), jnp.float32)
    s2 = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.1, c), jnp.float32)

    xla_fn = jax.jit(xla_residual_block)

    for batch in (256, 1024):
        x = jnp.asarray(rng.normal(0, 1, (batch, 4, 4, c)), jnp.bfloat16)
        flops = 2 * 9 * 16 * c * c * 2 * batch

        # numerics check at this batch
        ref = np.asarray(xla_fn(x, w1, s1, b1, w2, s2, b2), np.float32)
        for tile_b in (32, 64, 128):
            if batch % tile_b:
                continue
            got = np.asarray(
                pallas_residual_block(x, w1, s1, b1, w2, s2, b2,
                                      tile_b=tile_b), np.float32)
            err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
            assert err < 5e-2, f"numerics mismatch at tile {tile_b}: {err}"

        def timed(fn, iters=30):
            out = fn()
            float(jnp.sum(out.astype(jnp.float32)))  # warm + fence
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            float(jnp.sum(out.astype(jnp.float32)))
            return (time.perf_counter() - t0) / iters

        rows = []
        dt = statistics.median(
            timed(lambda: xla_fn(x, w1, s1, b1, w2, s2, b2))
            for _ in range(3))
        rows.append(("xla", dt))
        for tile_b in (32, 64, 128):
            if batch % tile_b:
                continue
            f = lambda: pallas_residual_block(  # noqa: E731
                x, w1, s1, b1, w2, s2, b2, tile_b=tile_b)
            dt = statistics.median(timed(f) for _ in range(3))
            rows.append((f"pallas tb={tile_b}", dt))
        print(f"\nbatch {batch} ({flops/1e9:.1f} GFLOP/call):")
        for name, dt in rows:
            print(f"  {name:16s}: {dt*1e3:7.3f} ms  "
                  f"{flops/dt/1e12:6.1f} TFLOP/s  "
                  f"MFU {flops/dt/1e12/197*100:5.1f}%")


if __name__ == "__main__":
    main()

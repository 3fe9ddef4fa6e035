#!/usr/bin/env python
"""Sort operand-count cliff + segmented associative_scan cost at N=5.9M."""

import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))
import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, tgt, *args, reps=5):
    out = fn(tgt, *args)
    _ = float(jnp.asarray(out[0] if isinstance(out, tuple) else out).ravel()[0])
    t0 = time.perf_counter()
    cur = tgt
    for _ in range(reps):
        cur = fn(cur, *args)
        if isinstance(cur, tuple):
            cur = cur[0]
    _ = float(jnp.asarray(cur).ravel()[0])
    print(f"{name:<56} {(time.perf_counter()-t0)/reps*1000:9.2f} ms",
          flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    N = 5898240
    a = jnp.asarray(rng.rand(N).astype(np.float32))
    k = jnp.asarray(rng.randint(0, 1 << 29, N).astype(np.int32))

    flags = jnp.asarray((rng.rand(N) < 0.003).astype(np.float32))

    @jax.jit
    def segscan1(v, f):
        def op(l, r):
            (lv, lf), (rv, rf) = l, r
            return jnp.where(rf > 0, rv, lv + rv), jnp.maximum(lf, rf)
        out, _ = jax.lax.associative_scan(op, (v, f))
        return out
    timeit("assoc_scan segmented 1ch", segscan1, a, flags)

    @jax.jit
    def segscan3(v, f):
        def op(l, r):
            (la, lb, lc, lf), (ra, rb, rc, rf) = l, r
            keep = rf > 0
            return (jnp.where(keep, ra, la + ra),
                    jnp.where(keep, rb, lb + rb),
                    jnp.where(keep, rc, lc + rc),
                    jnp.maximum(lf, rf))
        out = jax.lax.associative_scan(op, (v, v * 2, v * 3, f))
        return out[0]
    timeit("assoc_scan segmented 3ch", segscan3, a, flags)

    # cumsum-based 3ch for comparison (f32 precision caveat)
    @jax.jit
    def cumsum3(v, f):
        tot = None
        for ch in (v, v * 2, v * 3):
            c = jnp.cumsum(ch)
            marked = jnp.where(f > 0, c, 0.0)
            pe = jnp.concatenate([jnp.zeros((1,), c.dtype),
                                  jax.lax.cummax(marked, axis=0)[:-1]])
            t = c - pe
            tot = t if tot is None else tot + t
        return tot
    timeit("cumsum+cummax 3ch", cumsum3, a, flags)


if __name__ == "__main__":
    main()

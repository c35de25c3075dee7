"""Microbench: element-gather/scatter cost vs table size on the real chip.

Decides the sparse-conv table substrate (VERDICT r3 item 1): if random element
gathers are much cheaper from small tables than from the 90M-cell dense map,
a fixed-capacity hash table wins; if per-row cost is flat, keeping the dense
map (made flat, no relayout) is optimal.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    jax.device_get(jnp.sum(out[..., :1]).astype(jnp.float32))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jnp.sum(out[..., :1]).astype(jnp.float32))
    return (time.time() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    n_idx = 1_080_000
    print(f"== element gather of {n_idx} random indices ==")
    for log_t in [14, 17, 20, 24, 27, int(np.log2(180e6))]:
        t_size = 1 << log_t
        for dt in (jnp.uint16, jnp.uint32):
            table = jnp.asarray(rng.integers(0, 60000, t_size), dt)
            idx = jnp.asarray(rng.integers(0, t_size, n_idx), jnp.int32)
            f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
            dur = timeit(f, table, idx)
            print(f"  table 2^{log_t:>2} ({t_size * np.dtype(dt.dtype if hasattr(dt,'dtype') else dt).itemsize / 1e6:8.1f} MB) "
                  f"{np.dtype(jnp.dtype(dt)).name:>7}: {dur * 1e3:7.3f} ms "
                  f"({dur / n_idx * 1e9:6.2f} ns/row)")

    print(f"\n== scatter of 240k values into table ==")
    n_scat = 240_000
    for log_t in [17, 20, 24, int(np.log2(180e6))]:
        t_size = 1 << log_t
        idx = jnp.asarray(rng.integers(0, t_size, n_scat), jnp.int32)
        vals = jnp.asarray(rng.integers(1, 60000, n_scat), jnp.uint16)

        def f(i, v):
            t = jnp.zeros((t_size,), jnp.uint16)
            return t.at[i].set(v, mode="drop", unique_indices=True)

        dur = timeit(jax.jit(f), idx, vals)
        print(f"  table 2^{log_t:>2}: {dur * 1e3:7.3f} ms")

    print(f"\n== argsort of K keys (int32) ==")
    for n in [60_000, 120_000, 240_000, 1_080_000]:
        keys = jnp.asarray(rng.integers(0, 90_000_000, n), jnp.int32)
        f = jax.jit(jnp.argsort)
        dur = timeit(f, keys)
        print(f"  n={n:>9}: {dur * 1e3:7.3f} ms")

    print(f"\n== dependent 2-probe gather (hash-style) 1.08M from 2^17 ==")
    t_size = 1 << 17
    keys_t = jnp.asarray(rng.integers(0, 90_000_000, t_size), jnp.uint32)
    slots_t = jnp.asarray(rng.integers(0, 60000, t_size), jnp.uint16)
    q = jnp.asarray(rng.integers(0, 90_000_000, n_idx), jnp.uint32)

    def probe2(keys_t, slots_t, q):
        h1 = (q * jnp.uint32(2654435761)) >> jnp.uint32(32 - 17)
        k1 = jnp.take(keys_t, h1.astype(jnp.int32), axis=0)
        s1 = jnp.take(slots_t, h1.astype(jnp.int32), axis=0)
        h2 = (q * jnp.uint32(40503)) >> jnp.uint32(32 - 17)
        k2 = jnp.take(keys_t, h2.astype(jnp.int32), axis=0)
        s2 = jnp.take(slots_t, h2.astype(jnp.int32), axis=0)
        return jnp.where(k1 == q, s1, jnp.where(k2 == q, s2, 0))

    dur = timeit(jax.jit(probe2), keys_t, slots_t, q)
    print(f"  2-probe (4 gathers): {dur * 1e3:7.3f} ms ({dur / n_idx * 1e9:6.2f} ns/query)")


if __name__ == "__main__":
    main()

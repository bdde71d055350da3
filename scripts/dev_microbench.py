"""Dev tool: TPU primitive-rate microbenchmarks that drive the geometry
builder's design (element gather vs row gather vs take_along_axis vs sort vs
scan), plus the pivot-tree lower_bound end to end."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    probe = jax.jit(lambda a: a * 1.0)
    small = jnp.ones((8, 8))
    _ = float(np.asarray(probe(small)).sum())
    t = time.time()
    for _ in range(5):
        _ = float(np.asarray(probe(small)).sum())
    rtt = (time.time() - t) / 5
    print(f"# rtt {rtt*1e3:.1f}ms", flush=True)

    def timeit(fn, args, iters=10):
        out = fn(*args)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]
                             .reshape(-1)[0]))
        t = time.time()
        for _ in range(iters):
            out = fn(*args)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]
                             .reshape(-1)[0]))
        return (time.time() - t - rtt) / iters

    key = jax.random.PRNGKey(0)
    N = 10_000_000
    M = 1_100_000
    src1d = jax.random.randint(key, (M,), 0, 1 << 30, dtype=jnp.int32)
    idx = jax.random.randint(key, (N,), 0, M, dtype=jnp.int32)

    t = timeit(jax.jit(lambda s, i: jnp.take(s, i)), (src1d, idx))
    print(f"element gather 10M from 1.1M int32: {t*1e3:8.1f}ms "
          f"({N/t/1e6:.0f}M elt/s)", flush=True)

    nb = (M + 127) // 128
    src2d = src1d[:nb * 128 - (nb * 128 - M)]
    src2d = jnp.pad(src1d, (0, nb * 128 - M)).reshape(nb, 128)
    ridx = jax.random.randint(key, (N,), 0, nb, dtype=jnp.int32)
    t = timeit(jax.jit(lambda s, i: jnp.take(s, i, axis=0)), (src2d, ridx))
    print(f"row gather 10M x 128-lane rows:     {t*1e3:8.1f}ms "
          f"({N*512/t/1e9:.1f}GB/s)", flush=True)

    lane = jax.random.randint(key, (N, 1), 0, 128, dtype=jnp.int32)
    big = jax.random.randint(key, (N, 128), 0, 1 << 30, dtype=jnp.int32)
    t = timeit(jax.jit(
        lambda s, i: jnp.take_along_axis(s, i, axis=1)), (big, lane))
    print(f"take_along_axis (10M,128)->1 lane:  {t*1e3:8.1f}ms", flush=True)

    t = timeit(jax.jit(lambda a: jax.lax.sort((a, a, a), num_keys=2)),
               (idx,))
    print(f"lax.sort 10M x3 int32 (2 keys):     {t*1e3:8.1f}ms", flush=True)

    t = timeit(jax.jit(lambda a: jax.lax.cummax(a)), (idx,))
    print(f"cummax 10M int32:                   {t*1e3:8.1f}ms", flush=True)

    # pivot-tree lower bound, 9.9M probes into 1.1M sorted keys
    from openscene_tpu.sparse.geometry_device import _lower_bound
    kh = jnp.sort(src1d)
    kl = jnp.zeros_like(kh)
    ph = jnp.take(kh, idx[: 9 * M].reshape(9, M)) + 1
    pl = jnp.zeros_like(ph)
    t = timeit(jax.jit(_lower_bound), (kh, kl, ph, pl))
    print(f"tree lower_bound 9.9M probes/1.1M:  {t*1e3:8.1f}ms "
          f"({9*M/t/1e6:.0f}M probe/s)", flush=True)


if __name__ == "__main__":
    main()

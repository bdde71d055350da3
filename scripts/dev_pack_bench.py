"""Dev tool: microbench _pack_t variants on TPU.

The r5 step trace shows the XLA lowering of _pack_t (pair-bitcast +
transpose to the gather-ready (cap//128, C/2, 128) window source) costs
~198ms/step across ~56 pack calls: XLA widens to u32 at full channel
width, copies to column-major, reshapes through a T(2,128) layout and
only then combines the pairs.  This script times the committed pack
against a two-stage variant (elementwise u16 pair-combine + a Pallas
transpose kernel) at the bench L0/L1 shapes and checks bit-equality.

Usage: python scripts/dev_pack_bench.py [--iters 20]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openscene_tpu.sparse.pallas_conv import _pack_t

RTT = 0.034


def _pack_rows(cap: int) -> int:
    for r in (4096, 2048, 1024, 512, 256, 128):
        if cap % r == 0:
            return r
    raise ValueError(cap)


@functools.lru_cache(maxsize=None)
def _pack_kernel_call(rows: int, Cw: int, cap: int):
    R = rows // 128

    def kernel(x_ref, o_ref):
        for r in range(R):
            o_ref[r] = x_ref[r * 128:(r + 1) * 128, :].T

    return pl.pallas_call(
        kernel,
        grid=(cap // rows,),
        in_specs=[pl.BlockSpec((rows, Cw), lambda t: (t, 0))],
        out_specs=pl.BlockSpec((R, Cw, 128), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((cap // 128, Cw, 128), jnp.float32),
    )


def pack_pallas(a):
    cap, C = a.shape
    Cw = C // 2
    x16 = jax.lax.bitcast_convert_type(a, jnp.uint16)
    ev = x16[:, 0::2].astype(jnp.uint32)
    od = x16[:, 1::2].astype(jnp.uint32)
    xp = jax.lax.bitcast_convert_type(ev | (od << 16), jnp.float32)
    rows = _pack_rows(cap)
    return _pack_kernel_call(rows, Cw, cap)(xp)


def pack_xla2(a):
    """Pairing via u16 strided slices + the same XLA reshape/transpose."""
    cap, C = a.shape
    x16 = jax.lax.bitcast_convert_type(a, jnp.uint16)
    ev = x16[:, 0::2].astype(jnp.uint32)
    od = x16[:, 1::2].astype(jnp.uint32)
    xp = jax.lax.bitcast_convert_type(ev | (od << 16), jnp.float32)
    return xp.reshape(cap // 128, 128, C // 2).transpose(0, 2, 1)


def timeit(fn, x, iters):
    out = fn(x)
    np.asarray(out[0, 0, :1])  # sync
    t0 = time.time()
    for _ in range(iters):
        out = fn(x)
    np.asarray(out[0, 0, :1])
    return (time.time() - t0 - RTT) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    shapes = [(1039872, 96), (1039872, 128), (425472, 96), (425472, 256),
              (108544, 256)]
    for cap, C in shapes:
        key = jax.random.PRNGKey(cap % 97 + C)
        x = jax.random.normal(key, (cap, C), jnp.float32).astype(jnp.bfloat16)
        x = jax.device_put(x)
        f_old = jax.jit(_pack_t)
        f_pal = jax.jit(pack_pallas)
        f_x2 = jax.jit(pack_xla2)
        ref = np.asarray(f_old(x))
        got = np.asarray(f_pal(x))
        ok = np.array_equal(ref, got) or np.array_equal(
            ref.view(np.uint32), got.view(np.uint32))
        got2 = np.asarray(f_x2(x))
        ok2 = np.array_equal(ref.view(np.uint32), got2.view(np.uint32))
        t_old = timeit(f_old, x, args.iters)
        t_pal = timeit(f_pal, x, args.iters)
        t_x2 = timeit(f_x2, x, args.iters)
        print(f"({cap:8d},{C:4d})  old {t_old*1e3:7.2f}ms  "
              f"pallas {t_pal*1e3:7.2f}ms (eq={ok})  "
              f"xla2 {t_x2*1e3:7.2f}ms (eq={ok2})", flush=True)


if __name__ == "__main__":
    main()

"""Does Mosaic overlap independent MXU (matmul) and VPU (exp) work?

Three kernels: (a) a chain of matmuls only, (b) a chain of exp passes only,
(c) both interleaved with NO data dependence between the streams. If
(c) ~= max(a, b) the units overlap and the fused block kernel should be
restructured to interleave softmax (VPU) with proj/MLP GEMMs (MXU); if
(c) ~= a + b the instruction stream is serial and that door is closed.

  python tools/probe_overlap.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = 512          # matmul size
V = 2048         # VPU tile rows
REPS = 8         # chain length inside the kernel


def make_kernel(mode):
    def kernel(a_ref, w_ref, x_ref, out_ref, vout_ref):
        acc = a_ref[:]
        vec = x_ref[:]
        for _ in range(REPS):
            if mode in ("mxu", "both"):
                acc = jax.lax.dot_general(
                    acc, w_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(a_ref.dtype)
            if mode in ("vpu", "both"):
                # 4 dependent exp passes per rep over the VPU tile
                for _ in range(4):
                    vec = jnp.exp(vec * 0.25 - 1.0)
        out_ref[:] = acc
        vout_ref[:] = vec

    return kernel


def bench(mode, dtype=jnp.bfloat16, iters=20):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(N, N)) * 0.05, dtype)
    w = jnp.asarray(rng.normal(size=(N, N)) * 0.05, dtype)
    x = jnp.asarray(rng.normal(size=(V, 512)), jnp.float32)

    f = pl.pallas_call(
        make_kernel(mode),
        grid=(64,),
        in_specs=[
            pl.BlockSpec((N, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((V, 512), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((V, 512), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, N), dtype),
            jax.ShapeDtypeStruct((V, 512), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )

    def chained(n):
        def body(_, carry):
            o, v = f(a + carry.astype(dtype) * 1e-20, w, x)
            return jnp.sum(o).astype(jnp.float32) + jnp.sum(v[0, :1])

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    f1 = jax.jit(lambda: chained(1))
    fk = jax.jit(lambda: chained(iters + 1))
    jax.device_get(f1())
    jax.device_get(fk())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(f1())
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(fk())
        tk = time.perf_counter() - t0
        print(f"  [{mode}] t1={t1 * 1e3:8.3f} ms  tk={tk * 1e3:8.3f} ms")
        best = min(best, max(tk - t1, 1e-9) / iters)
    return best


if __name__ == "__main__":
    ta = bench("mxu")
    tb = bench("vpu")
    tc = bench("both")
    print(f"mxu only : {ta * 1e3:7.3f} ms")
    print(f"vpu only : {tb * 1e3:7.3f} ms")
    print(f"both     : {tc * 1e3:7.3f} ms   (serial sum {((ta + tb) * 1e3):.3f}, "
          f"perfect overlap {max(ta, tb) * 1e3:.3f})")

"""Microbench: TPU gather-op cost vs index count + corner8 build cost.

Questions:
1. Is a 65k-index random gather per-op-overhead-bound (i.e. does
   cost/idx fall with more indices)?
2. What does a planar [8, N] column gather cost vs 8 separate gathers?
3. What does the corner-packed field build cost, by variant?
"""
import sys, time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from functools import partial

N = 16 * 16 * 16 * 4096  # 16.8M cells (the dim=16 packed field)
field = jnp.asarray(np.random.RandomState(0).rand(N).astype(np.float32))
rng = np.random.RandomState(1)


def timeit(fn, *args, reps=8, groups=3):
    # Vary the first arg per call (CLAUDE.md: identical dispatches can
    # be memoized in the remote-TPU path).
    out = fn(args[0], *args[1:])
    jax.block_until_ready(out)
    times = []
    k = 1
    for g in range(groups):
        t0 = time.perf_counter()
        for i in range(reps):
            k += 1
            out = fn(args[0] + np.float32(1e-6 * k), *args[1:])
        float(out.reshape(-1)[0])  # forced readback: bur under-waits
        times.append((time.perf_counter() - t0) / reps)
    return sorted(times)[len(times) // 2] * 1e3


@jax.jit
def chain_gather(f, idx, n_steps=8):
    # Dependent chain: each gather's result perturbs the next indices —
    # mimics the march's serial structure, defeats memoization.
    def body(i, carry):
        idx2, acc = carry
        v = f[idx2]
        idx2 = (idx2 + v.astype(jnp.int32) + 1) % N
        return idx2, acc + v
    idx2, acc = jax.lax.fori_loop(0, n_steps, body, (idx, jnp.zeros_like(idx, jnp.float32)))
    return acc


for n_idx in (65536, 262144, 1048576):
    idx = jnp.asarray(rng.randint(0, N, n_idx).astype(np.int32))
    ms = timeit(chain_gather, field, idx)
    per = ms / 8
    print(f"chain gather {n_idx//1024}k idx: {per:.3f} ms/step = "
          f"{n_idx/per*1e3/1e6:.0f} M idx/s")

# Planar [8, N] column gather vs 8 separate gathers, 65k queries.
f8 = jnp.stack([field] * 8)
idx = jnp.asarray(rng.randint(0, N, 65536).astype(np.int32))


@jax.jit
def col_gather(f8, idx, reps=6):
    def body(i, carry):
        idx2, acc = carry
        v = jnp.take(f8, idx2, axis=1)  # [8, Q]
        idx2 = (idx2 + v[0].astype(jnp.int32) + 1) % N
        return idx2, acc + v.sum(0)
    return jax.lax.fori_loop(0, reps, body,
                             (idx, jnp.zeros_like(idx, jnp.float32)))[1]


@jax.jit
def sep8_gather(f, idx, reps=6):
    def body(i, carry):
        idx2, acc = carry
        tot = 0.0
        for k in range(8):
            tot = tot + f[(idx2 + k * 17) % N]
        idx2 = (idx2 + tot.astype(jnp.int32) + 1) % N
        return idx2, acc + tot
    return jax.lax.fori_loop(0, reps, body,
                             (idx, jnp.zeros_like(idx, jnp.float32)))[1]


ms = timeit(col_gather, f8, idx)
print(f"[8,N] column gather 64k: {ms/6:.3f} ms/pass")
ms = timeit(sep8_gather, field, idx)
print(f"8 separate gathers 64k: {ms/6:.3f} ms/pass")

# corner8 build variants (dim=16, v=16).
dim, v = 16, 16
f6s = field.reshape(dim, dim, dim, v, v, v)
SK = np.float32(1e6)


def shift(f, gaxis):
    baxis, laxis = ((0, 5), (1, 4), (2, 3))[gaxis]
    main = jax.lax.slice_in_dim(f, 1, None, axis=laxis)
    first = jax.lax.slice_in_dim(f, 0, 1, axis=laxis)
    carry = jnp.concatenate([
        jax.lax.slice_in_dim(first, 1, None, axis=baxis),
        jnp.full_like(jax.lax.slice_in_dim(first, 0, 1, axis=baxis), SK),
    ], axis=baxis)
    return jnp.concatenate([main, carry], axis=laxis)


@jax.jit
def build_6d(f):
    f6 = f.reshape(dim, dim, dim, v, v, v)
    f100 = shift(f6, 0)
    f010 = shift(f6, 1)
    f110 = shift(f100, 1)
    mats = []
    for lo in (f6, f100, f010, f110):
        mats += [lo, shift(lo, 2)]
    c8 = jnp.stack([m.reshape(-1) for m in mats])
    return c8[jnp.asarray([0, 2, 4, 6, 1, 3, 5, 7])]


@jax.jit
def build_6d_ordered(f):
    # Stack directly in _CORNERS order (no permute copy).
    f6 = f.reshape(dim, dim, dim, v, v, v)
    f100 = shift(f6, 0)
    f010 = shift(f6, 1)
    f110 = shift(f100, 1)
    lows = (f6, f100, f010, f110)
    return jnp.stack([m.reshape(-1) for m in lows]
                     + [shift(m, 2).reshape(-1) for m in lows])


@jax.jit
def build_flat2d(f):
    # Shift in flat-friendly 2-D layouts: global-x shift via [N/v, v]
    # roll with a row-gather carry; y/z analogous via reshapes that keep
    # the minor dim 4096-wide (never materialize thin slabs).
    # x: view [R, v] rows; carry value for x=15 comes from block x-nbr.
    # Here we just emulate the traffic with same-shape ops.
    a = f.reshape(-1, 4096)
    ax = jnp.concatenate([a[:, 1:], a[:, :1]], axis=1)
    return jnp.stack([f, ax.reshape(-1)] * 4)


print(f"build_6d: {timeit(build_6d, field, reps=4):.2f} ms")
print(f"build_6d_ordered: {timeit(build_6d_ordered, field, reps=4):.2f} ms")
print(f"build_flat2d(traffic probe): {timeit(build_flat2d, field, reps=4):.2f} ms")

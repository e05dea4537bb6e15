"""Microbenchmarks for the irregular data-movement primitives on TPU.

Decides between implementation variants for the binning sort, the instance
row gather, and the per-Gaussian gradient reduction. Development tool.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

I = 1_871_488        # instances incl. worst-case alignment dummies
I_REAL = 1_310_720   # real instance capacity
N = 262_144          # gaussian capacity
T = 4346             # tiles
REPS = 10


def _fetch(out):
    """Value fetch: block_until_ready is unreliable on the tunneled backend."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf, jnp.float32).ravel()[0])


def timeit(name, fn, *args):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    out = fn(*args)
    _fetch(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f'{name:48s} {dt:8.2f} ms')
    return out


def rep(fn, n=REPS):
    def run(*args):
        def body(i, carry):
            acc, a = carry
            out = fn(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            v = jnp.asarray(leaf, jnp.float32).ravel()[0]
            a0 = jax.tree_util.tree_map(
                lambda x: x + (0.0 * v).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x + (0.0 * v).astype(x.dtype), a[0])
            a = (a0,) + a[1:]
            return acc + v, a
        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), args))
        return acc
    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    tile = np.sort(rng.integers(0, T, I)).astype(np.int32)  # tile-major like real
    depth = rng.integers(0, 1 << 30, I).astype(np.int32)
    own = rng.integers(0, N, I).astype(np.int32)
    tile_u = jnp.asarray(tile)
    depth_u = jnp.asarray(depth)
    own_u = jnp.asarray(own)
    # unsorted variants
    perm = rng.permutation(I)
    tile_r = jnp.asarray(tile[perm])
    depth_r = jnp.asarray(depth[perm])
    own_r = jnp.asarray(own[perm])

    print(f'I={I} N={N} T={T}')

    # ---- sorts ----
    def sort3(t, d, o):
        return jax.lax.sort((t, d, o), num_keys=2, is_stable=False)

    timeit('sort 3-array num_keys=2 (current)', rep(sort3),
           tile_r.astype(jnp.float32), depth_r, own_r)

    def sort2(t, d):
        return jax.lax.sort((t, d), num_keys=2, is_stable=False)

    timeit('sort 2-array num_keys=2', rep(sort2),
           tile_r.astype(jnp.float32), depth_r)

    packed = (tile_r.astype(jnp.uint32) << jnp.uint32(19)) | \
        (own_r.astype(jnp.uint32) & jnp.uint32((1 << 19) - 1))

    def sort1(k):
        return jax.lax.sort(k.astype(jnp.float32))

    def sort1u(k):
        return (jax.lax.sort((k,), num_keys=1, is_stable=False)[0],)

    timeit('sort 1-array uint32 packed', rep(sort1u),
           packed.astype(jnp.float32).astype(jnp.uint32))

    def sort1i(k):
        return (jax.lax.sort((k,), num_keys=1, is_stable=False)[0],)

    timeit('sort 1-array int32', rep(sort1i),
           packed.astype(jnp.float32).astype(jnp.int32))

    def sort_n(d):
        return jax.lax.sort((d, jnp.arange(N, dtype=jnp.int32)),
                            num_keys=1, is_stable=False)

    timeit('sort N gaussians (depth, iota)', rep(sort_n),
           jnp.asarray(rng.standard_normal(N), jnp.float32))

    # ---- gathers ----
    pack9 = jnp.asarray(rng.standard_normal((N + 1, 9)), jnp.float32)
    pack16 = jnp.asarray(rng.standard_normal((N + 1, 16)), jnp.float32)
    pack16_t = pack16.T.copy()

    def gather_rows9(p, idx):
        return p[idx]

    timeit('gather (N,9) rows by I idx', rep(gather_rows9), pack9, own_u)
    timeit('gather (N,16) rows by I idx', rep(gather_rows9), pack16, own_u)

    def gather_pad_t(p, idx):
        return jnp.pad(p[idx], ((0, 0), (0, 7))).T

    timeit('gather rows9 + pad + T (current fwd)', rep(gather_pad_t),
           pack9, own_u)

    def gather_t(p_t, idx):
        return p_t[:, idx]

    timeit('gather (16,N) cols by I idx', rep(gather_t), pack16_t, own_u)

    pack9_bf16 = pack9.astype(jnp.bfloat16)

    def gather_bf16(p, idx):
        return p[idx]

    timeit('gather (N,9) bf16 rows', rep(gather_bf16), pack9_bf16, own_u)

    # ---- transposes ----
    big_t = jnp.asarray(rng.standard_normal((16, I)), jnp.float32)
    big = jnp.asarray(rng.standard_normal((I, 16)), jnp.float32)

    def transp(x):
        return x.T[:, :9]

    timeit('transpose (16,I)->(I,16)[:, :9]', rep(transp), big_t)

    # ---- scatters (gradient reduction) ----
    rows9 = jnp.asarray(rng.standard_normal((I, 9)), jnp.float32)

    def scatter_add(rows, idx):
        return jnp.zeros((N + 1, 9), jnp.float32).at[idx].add(rows)

    timeit('scatter-add (I,9) -> (N,9) tile-order idx', rep(scatter_add),
           rows9, own_u)

    own_sorted = jnp.sort(own_u)
    timeit('scatter-add SORTED idx', rep(
        lambda rows, idx: jnp.zeros((N + 1, 9), jnp.float32).at[idx].add(
            rows, indices_are_sorted=True)), rows9, own_sorted)

    def seg_sum(rows, idx):
        return jax.ops.segment_sum(rows, idx, num_segments=N + 1,
                                   indices_are_sorted=True)

    timeit('segment_sum sorted idx', rep(seg_sum), rows9, own_sorted)

    # permutation scatter (unsort): unique indices
    perm_idx = jnp.asarray(rng.permutation(I).astype(np.int32))

    def perm_scatter(rows, idx):
        return jnp.zeros((I, 9), jnp.float32).at[idx].set(
            rows, unique_indices=True)

    timeit('permutation scatter (I,9) unique', rep(perm_scatter),
           rows9, perm_idx)

    def perm_gather(rows, idx):
        return rows[idx]

    timeit('permutation gather (I,9)', rep(perm_gather), rows9, perm_idx)

    # contiguous-segment reduction via two-level cumsum
    starts = jnp.asarray(
        np.sort(rng.integers(0, I, N)).astype(np.int32))
    ends = jnp.concatenate([starts[1:], jnp.asarray([I], jnp.int32)])

    def cumsum_reduce(rows, s, e):
        c = jnp.cumsum(rows, axis=0)
        cz = jnp.concatenate([jnp.zeros((1, 9), jnp.float32), c], axis=0)
        return cz[e] - cz[s]

    timeit('contig-seg reduce: cumsum + 2 gathers', rep(cumsum_reduce),
           rows9, starts, ends)

    # cumsum alone
    timeit('cumsum (I,9)', rep(lambda r: jnp.cumsum(r, axis=0)), rows9)

    # histogram scatter (binning counts)
    timeit('histogram: zeros(T+1).at[tile].add(1)', rep(
        lambda t: jnp.zeros(T + 1, jnp.int32).at[t].add(1)),
        tile_r)


if __name__ == '__main__':
    main()

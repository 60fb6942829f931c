"""Round 2: force real synchronization by pulling a scalar to host."""
import time
import jax
import jax.numpy as jnp
import numpy as np

N_PROBE = 50_000_000
N_BUILD = 10_000_000

def timed(name, fn, *args, iters=3):
    try:
        fn_j = jax.jit(fn)
        out = np.asarray(fn_j(*args))  # force host transfer of (small) result
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = np.asarray(fn_j(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name:44s} {min(ts)*1e3:10.2f} ms   out={out.ravel()[:2]}")
        return min(ts)
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
probe = jax.random.randint(k1, (N_PROBE,), 1, N_BUILD + 1, dtype=jnp.int32)
build = jax.random.permutation(k2, jnp.arange(1, N_BUILD + 1, dtype=jnp.int32))
vals = jnp.arange(N_PROBE, dtype=jnp.int32)
jax.block_until_ready((probe, build, vals))

# reduce result to a scalar so transfer cost is negligible
timed("sort probe keys -> checksum", lambda x: jax.lax.sort(x)[::1000001].sum(), probe)
timed("sort (key+payload) -> checksum",
      lambda x, v: sum(a[::1000001].sum() for a in jax.lax.sort((x, v), num_keys=1)), probe, vals)
timed("sort build -> checksum", lambda x: jax.lax.sort(x)[::999999].sum(), build)
build_sorted = jax.block_until_ready(jax.jit(jax.lax.sort)(build))
timed("searchsorted 50M->10M -> checksum", lambda p, b: jnp.searchsorted(b, p)[::1000001].sum(), probe, build_sorted)
timed("gather 50M from 10M -> checksum", lambda t, i: t[i - 1][::1000001].sum(), build, probe)
timed("scatter-add 50M into 10M -> checksum",
      lambda i: jnp.zeros(N_BUILD, jnp.int32).at[i - 1].add(1)[::999999].sum(), probe)
timed("stream sum 50M", lambda p: jnp.sum(p.astype(jnp.int64) if False else p), probe)
timed("copy 50M (x+1) -> checksum", lambda p: (p + 1)[::1000001].sum(), probe)

def hist64(p):
    pid = (p & 63)
    oh = (pid[:, None] == jnp.arange(64, dtype=jnp.int32)[None, :])
    return jnp.sum(oh, axis=0, dtype=jnp.int32).sum()
timed("one-hot histogram P=64", hist64, probe)

def hist4096(p):
    pid = (p & 4095).reshape(-1, 1)
    oh = (pid == jnp.arange(4096, dtype=jnp.int32)[None, :])
    return jnp.sum(oh, axis=0, dtype=jnp.int32).sum()
timed("one-hot histogram P=4096", hist4096, probe)

# argsort-style partition: sort by partition id carrying key+payload
def partition_sort(p, v):
    pid = p & 4095
    outs = jax.lax.sort((pid, p, v), num_keys=1, is_stable=True)
    return outs[1][::1000001].sum() + outs[2][::1000001].sum()
timed("partition via stable sort P=4096", partition_sort, probe, vals)

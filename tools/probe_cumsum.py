#!/usr/bin/env python
"""Is jnp.cumsum the fixed ~12 ms inside extract's prep?  Compare the
native cumsum on (B, P) i32 against a two-level MXU form: inner prefix
as x @ triu-ones (f32 matmul on the MXU), outer prefix over the G-block
sums (array 128x smaller), broadcast add."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

B, F, L = 128, 32, 8370
P = F * L
base_key = jax.random.key(time.time_ns() % (2 ** 31))


def diff_time(make_body, n_long=4, wins=3):
    @functools.partial(jax.jit, static_argnums=0)
    def run(n, key):
        def body(acc, i):
            return acc + make_body(jax.random.fold_in(key, i)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc
    float(run(1, base_key))
    float(run(n_long, base_key))
    best = float("inf")
    for w in range(wins):
        kw = jax.random.fold_in(base_key, 7000 + w)
        t0 = time.perf_counter(); float(run(1, kw)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run(n_long, kw)); tl = time.perf_counter() - t0
        best = min(best, (tl - t1) / (n_long - 1))
    return best


def c2_of(k):
    return jax.random.bernoulli(k, 0.5, (B, P)).astype(jnp.int32) + \
        jax.random.bernoulli(jax.random.fold_in(k, 1), 0.5, (B, P)) \
        .astype(jnp.int32) - 0  # values 0..2, mean 1


G = 512
TRI = None


def cumsum_mxu(x):
    """Inclusive prefix sum along axis 1 via G-blocked MXU matmul."""
    Bn, Pn = x.shape
    nb = -(-Pn // G)
    pad = nb * G - Pn
    xp = jnp.pad(x, ((0, 0), (0, pad)))
    xb = xp.reshape(Bn, nb, G).astype(jnp.float32)
    tri = jnp.asarray(
        jnp.tril(jnp.ones((G, G), jnp.float32)))
    inner = jnp.einsum("bng,hg->bnh", xb, tri,
                       preferred_element_type=jnp.float32)
    sums = inner[:, :, -1]                       # (B, nb) block totals
    off = jnp.cumsum(sums, axis=1) - sums        # exclusive, small array
    return (inner + off[:, :, None]).reshape(Bn, nb * G)[:, :Pn] \
        .astype(x.dtype)


def main():
    def t(name, body, **kw):
        dt = diff_time(body, **kw)
        print(f"  {name:24s} {dt * 1e3:8.1f} ms", flush=True)
        return dt

    # correctness first (on-device, tiny fetch)
    x = c2_of(base_key)
    ref = jnp.cumsum(x, axis=1)
    got = cumsum_mxu(x)
    assert int(jnp.max(jnp.abs(ref - got))) == 0, "mxu cumsum mismatch"
    print("cumsum_mxu exact: OK")

    t("jnp.cumsum (B,P) i32", lambda k: jnp.cumsum(
        c2_of(k), axis=1).ravel()[-1].astype(jnp.float32))
    t("cumsum_mxu G=512", lambda k: cumsum_mxu(
        c2_of(k)).ravel()[-1].astype(jnp.float32))
    t("c2 gen only", lambda k: c2_of(k).ravel()[-1].astype(jnp.float32))


if __name__ == "__main__":
    main()

"""Layout hypothesis microbench: is an (R,3)-shaped wavefront backward
bandwidth-crippled by the T(8,128) lane padding vs an (R,)-SoA layout?

Times fwd and fwd+bwd of an identical 4-step scan of vec3 elementwise
chains, once with (R,3) arrays (minor dim 3 -> lanes padded 3/128) and
once with three (R,) component arrays (dense lanes). Same flops, same
logical bytes; any large timing gap is physical-layout traffic.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

R = int(sys.argv[1]) if len(sys.argv) > 1 else 2_073_600
STEPS = 4


def timeit(label, fn, *args):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    del out
    c = time.time() - t0
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        dt = min(dt, time.time() - t0)
    print(f"{label:22s} {dt*1e3:8.2f} ms   (compile+first {c:.1f}s)",
          flush=True)
    return dt


def chain_rows(o, d, t):
    # ~the per-bounce radiance-chain op mix on (R,3)
    for _ in range(6):
        h = o * 0.9 + d * t
        n = h / jnp.sqrt(jnp.sum(h * h, axis=-1, keepdims=True) + 1e-6)
        t = t * jnp.where((n[:, :1] > 0.0), 0.7, 0.9)
        o = jnp.where(n[:, :1] > 0.0, h, o)
        d = d - 2.0 * jnp.sum(d * n, -1, keepdims=True) * n
    return o, d, t


def chain_soa(o, d, t):
    ox, oy, oz = o
    dx, dy, dz = d
    for _ in range(6):
        hx, hy, hz = ox * 0.9 + dx * t, oy * 0.9 + dy * t, oz * 0.9 + dz * t
        inv = 1.0 / jnp.sqrt(hx * hx + hy * hy + hz * hz + 1e-6)
        nx, ny, nz = hx * inv, hy * inv, hz * inv
        m = nx > 0.0
        t = t * jnp.where(m, 0.7, 0.9)
        ox = jnp.where(m, hx, ox)
        oy = jnp.where(m, hy, oy)
        oz = jnp.where(m, hz, oz)
        dd = 2.0 * (dx * nx + dy * ny + dz * nz)
        dx, dy, dz = dx - dd * nx, dy - dd * ny, dz - dd * nz
    return (ox, oy, oz), (dx, dy, dz), t


@jax.jit
def fwd_rows(o, d):
    def body(c, _):
        o, d, t = c
        return chain_rows(o, d, t), None
    (o, d, t), _ = jax.lax.scan(body, (o, d, jnp.ones((R, 1))), None,
                                length=STEPS)
    return jnp.sum(t)


@jax.jit
def grad_rows(o, d):
    return jax.grad(lambda o: fwd_rows(o, d))(o)


@jax.jit
def fwd_soa(ox, oy, oz, dx, dy, dz):
    def body(c, _):
        o, d, t = c
        return chain_soa(o, d, t), None
    (o, d, t), _ = jax.lax.scan(
        body, ((ox, oy, oz), (dx, dy, dz), jnp.ones((R,))), None,
        length=STEPS)
    return jnp.sum(t)


@jax.jit
def grad_soa(ox, oy, oz, dx, dy, dz):
    return jax.grad(fwd_soa, argnums=(0, 1, 2))(ox, oy, oz, dx, dy, dz)


def main():
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (R, 3), jnp.float32)
    Y = jax.random.normal(key, (R, 3), jnp.float32) + 2.0
    comps = [jnp.asarray(np.asarray(X[:, i])) for i in range(3)]
    dcomps = [jnp.asarray(np.asarray(Y[:, i])) for i in range(3)]
    jax.block_until_ready((X, Y, comps, dcomps))
    a = timeit("fwd  (R,3) rows", fwd_rows, X, Y)
    b = timeit("fwd  (R,) soa", fwd_soa, *comps, *dcomps)
    c = timeit("grad (R,3) rows", grad_rows, X, Y)
    d = timeit("grad (R,) soa", grad_soa, *comps, *dcomps)
    print(f"fwd ratio rows/soa: {a/b:.2f}   grad ratio rows/soa: {c/d:.2f}",
          flush=True)


if __name__ == "__main__":
    main()

"""Decompose the UMAP training-step cost on the real chip.

Times each component of the fused step (attraction gather+pow+einsum,
repulsion sampling+gather+einsum, optimizer) standalone under jit, with
the ~25 ms axon dispatch overhead measured and subtracted.
"""

import sys
import time

import numpy as np


def timeit(fn, reps=20):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    n, width, n_neg, d = 60_000, 240, 150, 2
    key = jax.random.PRNGKey(0)
    Z = jax.random.normal(key, (n, d))
    NN = jax.random.randint(key, (n, width), 0, n)
    P = jax.random.uniform(key, (n, width))
    a, b = 1.577, 0.895

    # dispatch overhead: a trivial jitted op
    trivial = jax.jit(lambda z: z + 1.0)
    overhead = timeit(lambda: np.asarray(trivial(Z)[0, 0]))
    print(f"dispatch overhead: {overhead*1000:.1f} ms")

    def run(f, *args):
        g = jax.jit(f)
        return timeit(lambda: np.asarray(g(*args)[0, 0]))

    t_gather = run(lambda Z, NN: Z[NN].sum(1), Z, NN)
    print(f"gather (n,{width},2) + sum: {(t_gather-overhead)*1000:.1f} ms")

    def sqdist(Z, NN):
        diff = Z[:, None, :] - Z[NN]
        return jnp.sum(diff * diff, -1)

    t_dist = run(sqdist, Z, NN)
    print(f"indexed sqdist: {(t_dist-overhead)*1000:.1f} ms")

    def attr(Z, NN, P):
        D = sqdist(Z, NN)
        coef = 2 * a * b * D ** (b - 1.0) / (1.0 + a * D**b)
        coef = jnp.where(D > 0, coef, 0.0)
        diff = Z[:, None, :] - Z[NN]
        return jnp.clip(jnp.einsum("ijk,ij->ik", diff, coef), -4, 4)

    t_attr = run(attr, Z, NN, P)
    print(f"attraction full: {(t_attr-overhead)*1000:.1f} ms")

    def attr_1pow(Z, NN, P):
        D = sqdist(Z, NN)
        t = D**b
        coef = 2 * a * b * t / (jnp.maximum(D, 1e-12) * (1.0 + a * t))
        coef = jnp.where(D > 0, coef, 0.0)
        diff = Z[:, None, :] - Z[NN]
        return jnp.clip(jnp.einsum("ijk,ij->ik", diff, coef), -4, 4)

    t_attr1 = run(attr_1pow, Z, NN, P)
    print(f"attraction 1-pow: {(t_attr1-overhead)*1000:.1f} ms")

    def rep(Z, key):
        neg = jax.random.randint(key, (n, n_neg), 0, n)
        D = sqdist(Z, neg)
        coef = -2 * b / ((D + 1e-3) * (1.0 + a * D**b))
        diff = Z[:, None, :] - Z[neg]
        return jnp.clip(jnp.einsum("ijk,ij->ik", diff, coef), -4, 4)

    t_rep = run(rep, Z, key)
    print(f"repulsion full: {(t_rep-overhead)*1000:.1f} ms")

    def powonly(Z, NN):
        D = sqdist(Z, NN)
        return D**b

    t_pow = run(powonly, Z, NN)
    print(f"sqdist+pow only: {(t_pow-overhead)*1000:.1f} ms (pow ≈ {(t_pow-t_dist)*1000:.1f} ms)")


if __name__ == "__main__":
    main()

"""On-TPU k-means (Lloyd's) — replaces faiss's CPU `train()` for the IVF
coarse quantizer and PQ codebooks (reference: faiss IndexIVFFlat.train at
scripts/create_test_docs.py:84-104 trains on CPU; here training is XLA on
the mesh, BASELINE.json configs[2]).

Everything is chunked matmuls (MXU) + one-hot accumulation matmuls, with
static shapes throughout; no per-point Python control flow.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp



@functools.partial(jax.jit, static_argnames=("chunk",))
def assign_clusters(
    x: jax.Array, centroids: jax.Array, *, chunk: int = 65536
) -> jax.Array:
    """Nearest-centroid assignment (L2). Returns [N] int32.

    argmin ||x-c||^2 == argmax (2 x.c - ||c||^2); computed as chunked MXU
    matmuls against the centroid matrix.
    """
    n, d = x.shape
    n_pad = ((n + chunk - 1) // chunk) * chunk
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0))) if n_pad != n else x
    c = centroids.astype(jnp.float32)
    c_sq = jnp.sum(c * c, axis=1)

    def body(_, xc):
        s = 2.0 * jnp.dot(
            xc.astype(jnp.float32), c.T, preferred_element_type=jnp.float32
        ) - c_sq[None, :]
        return None, jnp.argmax(s, axis=1).astype(jnp.int32)

    _, a = jax.lax.scan(body, None, xp.reshape(-1, chunk, d))
    return a.reshape(-1)[:n]


def _lloyd_step(x_pad, n_real, centroids, *, chunk):
    """One Lloyd iteration over padded data. Returns (new_centroids, counts)."""
    k, d = centroids.shape
    c = centroids.astype(jnp.float32)
    c_sq = jnp.sum(c * c, axis=1)
    n_pad = x_pad.shape[0]
    n_chunks = n_pad // chunk

    def body(carry, xc):
        sums, counts, start = carry
        xf = xc.astype(jnp.float32)
        s = 2.0 * jnp.dot(xf, c.T, preferred_element_type=jnp.float32) - c_sq[None, :]
        # mask padded rows out of the accumulation
        rid = start + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)[:, 0]
        valid = (rid < n_real)[:, None]
        onehot = jax.nn.one_hot(jnp.argmax(s, axis=1), k, dtype=jnp.float32)
        onehot = jnp.where(valid, onehot, 0.0)
        sums = sums + jnp.dot(onehot.T, xf, preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(onehot, axis=0)
        return (sums, counts, start + chunk), None

    init = (
        jnp.zeros((k, d), jnp.float32),
        jnp.zeros((k,), jnp.float32),
        jnp.int32(0),
    )
    (sums, counts, _), _ = jax.lax.scan(
        body, init, x_pad.reshape(n_chunks, chunk, d)
    )
    new_c = sums / jnp.maximum(counts, 1.0)[:, None]
    # empty clusters keep their old centroid (host-side reseed handles drift)
    new_c = jnp.where((counts > 0)[:, None], new_c, c)
    return new_c, counts


@functools.partial(jax.jit, static_argnames=("k", "iters", "chunk"))
def kmeans(
    key: jax.Array,
    x: jax.Array,
    k: int,
    *,
    iters: int = 15,
    chunk: int = 65536,
) -> tuple[jax.Array, jax.Array]:
    """Lloyd's k-means. Returns (centroids [k, D] f32, counts [k] f32).

    Init: k points sampled without replacement. Empty clusters are reseeded
    each iteration to perturbed copies of the current largest centroid.
    """
    n, d = x.shape
    if n < k:
        raise ValueError(
            f"k-means needs at least k training points: n={n} < k={k}"
        )
    chunk = min(chunk, max(256, n))
    n_pad = ((n + chunk - 1) // chunk) * chunk
    x_pad = jnp.pad(x, ((0, n_pad - n), (0, 0))) if n_pad != n else x

    perm = jax.random.permutation(key, n)[:k]
    centroids = x[perm].astype(jnp.float32)

    def step(carry, key_i):
        c, _ = carry
        new_c, counts = _lloyd_step(x_pad, n, c, chunk=chunk)
        # reseed empties near the fattest cluster to split it
        big = jnp.argmax(counts)
        noise = 1e-3 * jax.random.normal(key_i, new_c.shape, jnp.float32)
        reseed = new_c[big][None, :] + noise
        new_c = jnp.where((counts > 0)[:, None], new_c, reseed)
        return (new_c, counts), None

    keys = jax.random.split(key, iters)
    (centroids, counts), _ = jax.lax.scan(step, (centroids, jnp.zeros(k)), keys)
    return centroids, counts

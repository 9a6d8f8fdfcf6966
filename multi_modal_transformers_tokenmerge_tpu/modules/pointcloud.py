"""Point-cloud tokenizer: farthest-point sampling, kNN grouping, and the
sample-and-group module.

TPU-first rewrites of the reference
(reference: tokenizers/pointclouds/point_cloud_tokenizer.py):

* FPS is a ``lax.fori_loop`` over a preallocated index buffer — the
  reference grows a jnp array with ``jnp.append`` inside a Python loop
  (point_cloud_tokenizer.py:69-90), which retraces and reallocates per step;
* distances are computed via one batched matmul (MXU) instead of per-point
  tiling;
* kNN uses ``jax.lax.approx_max_k`` (TPU-native) like the reference
  (:106-118), but batched over all centroids in one call;
* everything is jit/vmap friendly with static shapes.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["pairwise_sq_dist", "farthest_point_sampling", "knn",
           "ball_query", "SampleAndGroup"]


def pairwise_sq_dist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distances (N, M) between point sets (N, D), (M, D).

    ||a - b||^2 = ||a||^2 + ||b||^2 - 2ab (reference: :19-39) — one matmul.
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)          # (N, 1)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True).T        # (1, M)
    ab = jnp.matmul(a, b.T, preferred_element_type=jnp.float32)
    return a2 + b2 - 2.0 * ab


def farthest_point_sampling(points: jax.Array, num_samples: int,
                            key: jax.Array) -> jax.Array:
    """FPS: (N, D) points -> (num_samples,) int32 indices.

    Greedy max-min sampling (reference: :42-94) with O(N) state per step.
    """
    n = points.shape[0]
    first = jax.random.randint(key, (), 0, n)

    def body(i, state):
        sampled, dists = state
        last = sampled[i - 1]
        d = jnp.sum(jnp.square(points - points[last]), axis=-1)
        dists = jnp.minimum(dists, d)
        # exclude already-sampled points
        nxt = jnp.argmax(dists)
        sampled = sampled.at[i].set(nxt)
        dists = dists.at[nxt].set(-jnp.inf)
        return sampled, dists

    sampled0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(first)
    dists0 = jnp.full((n,), jnp.inf).at[first].set(-jnp.inf)
    sampled, _ = jax.lax.fori_loop(1, num_samples, body, (sampled0, dists0))
    return sampled


def ball_query(points: jax.Array, centroids: jax.Array, k: int,
               radius: float) -> jax.Array:
    """Indices (M, k) of up to k points within ``radius`` of each centroid
    (the reference leaves this as an unimplemented stub,
    point_cloud_tokenizer.py:98-104).

    TPU-friendly static-shape semantics: candidates beyond the radius are
    replaced by the centroid's nearest neighbour (PointNet++ convention of
    padding short balls with a duplicate).
    """
    d = pairwise_sq_dist(centroids, points)            # (M, N)
    within = d <= radius * radius
    # prefer in-radius points, then by distance
    score = jnp.where(within, -d, -d - 1e9)
    idx = jax.lax.top_k(score, k)[1]                   # (M, k)
    nearest = jnp.argmin(d, axis=-1, keepdims=True)    # (M, 1)
    chosen_within = jnp.take_along_axis(within, idx, axis=-1)
    return jnp.where(chosen_within, idx, nearest)


def knn(points: jax.Array, centroids: jax.Array, k: int,
        exact: bool = False) -> jax.Array:
    """Indices (M, k) of the k nearest points to each of M centroids.

    ``exact=False`` uses TPU-native ``approx_max_k`` (reference: :116);
    ``exact=True`` uses ``top_k``.
    """
    neg_d = -pairwise_sq_dist(centroids, points)  # (M, N)
    if exact:
        return jax.lax.top_k(neg_d, k)[1]
    return jax.lax.approx_max_k(neg_d, k)[1]


class SampleAndGroup(nn.Module):
    """Downsample (FPS) + group (kNN) + local-feature embed
    (reference: :121-198).

    Input: (N, F) points whose first 3 features are xyz.
    Output: (num_samples, k, embed_dim) grouped local features.
    """

    num_samples: int
    num_neighbours: int
    embed_dim: int
    # pool over neighbours so the output is (M, E) and stages can stack
    # (the reference leaves grouped (M, k, E) features and relies on
    # config-driven DenseGeneral axes; pooling is the PointNet++ intent)
    pool_neighbours: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, key, train: bool = False):
        xyz = points[:, :3].astype(jnp.float32)
        sampled_idx = farthest_point_sampling(xyz, self.num_samples, key)
        centroids = jnp.take(xyz, sampled_idx, axis=0)          # (M, 3)
        groups = knn(xyz, centroids, self.num_neighbours)       # (M, k)

        feats = jnp.take(points, groups, axis=0)                # (M, k, F)
        delta = feats[..., :3] - centroids[:, None, :]
        feats = jnp.concatenate([delta, feats], axis=-1)

        for i in range(2):
            feats = nn.DenseGeneral(self.embed_dim, axis=-1,
                                    dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    kernel_init=nn.initializers.xavier_uniform(),
                                    name=f"lbr{i}_dense")(feats)
            feats = nn.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"lbr{i}_bn")(feats)
            feats = nn.relu(feats)
        if self.pool_neighbours:
            feats = jnp.max(feats, axis=-2)  # (M, E)
            # stacked stages sample from xyz again: carry centroids forward
            feats = jnp.concatenate([centroids.astype(feats.dtype), feats],
                                    axis=-1)
        return feats

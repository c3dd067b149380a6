"""Point normals + FPFH descriptors, batched for the MXU.

The Multi_LiCa coarse stage (``Calibration.py:139-212``) voxel-downsamples,
estimates normals, computes 33-bin FPFH (Open3D), and matches features by
mutual kNN.  Here every stage is a fixed-shape batched program: normals from
the kNN covariance eigensolver, SPFH Darboux-angle histograms accumulated
with scatter-adds, FPFH as the distance-weighted neighbor average, and the
feature distance matrix as one (N, 33) x (33, M) matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import knn, linalg

Array = jax.Array

N_BINS = 11  # per angle, 3 angles -> 33-dim FPFH (Open3D/PCL layout)


def estimate_normals(xyz: Array, mask: Array, grid: knn.HashGrid, k: int = 16,
                     candidates_per_cell: int = 32,
                     max_radius: float = jnp.inf) -> Array:
    """Smallest-eigenvector normals oriented toward the origin (viewpoint).

    ``max_radius`` bounds the support like Open3D's KDTreeSearchParamHybrid
    (``Calibration.py:413-415``: radius 5*voxel, max_nn 100) — pure kNN
    support makes the feature scale density-dependent, which breaks
    cross-sensor matching between sparse and dense clouds."""
    res = knn.query(grid, xyz, mask, k=k, candidates_per_cell=candidates_per_cell,
                    max_sqdist=float(max_radius) ** 2)
    nbrs = xyz[res.idx]
    w = res.valid.astype(xyz.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mu = jnp.sum(nbrs * w, axis=1) / cnt
    dev = (nbrs - mu[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", dev, dev)
    _, vecs = linalg.sym3x3_eigh(cov)
    n = vecs[:, 0, :]
    # orient toward viewpoint (sensor origin), like pcl::flipNormalTowardsViewpoint
    flip = jnp.sum(n * xyz, axis=1) > 0
    return jnp.where(flip[:, None], -n, n)


def _pair_features(p1, n1, p2, n2, eps=1e-9):
    """Darboux frame angles (alpha, phi, theta) for point pairs (batched)."""
    d = p2 - p1
    dist = jnp.linalg.norm(d, axis=-1)
    dn = d / jnp.maximum(dist, eps)[..., None]
    # choose source such that angle(n, d) is smaller — PCL convention; for the
    # histogram shape the symmetric treatment below is adequate
    u = n1
    v = jnp.cross(dn, u)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)
    w = jnp.cross(u, v)
    alpha = jnp.sum(v * n2, axis=-1)                       # in [-1, 1]
    phi = jnp.sum(u * dn, axis=-1)                         # in [-1, 1]
    theta = jnp.arctan2(jnp.sum(w * n2, axis=-1), jnp.sum(u * n2, axis=-1))
    return alpha, phi, theta, dist


def _spfh(xyz: Array, normals: Array, nbr_idx: Array, nbr_valid: Array) -> Array:
    """Simplified point feature histograms (N, 33)."""
    n, k = nbr_idx.shape
    p1 = xyz[:, None, :]
    n1 = normals[:, None, :]
    p2 = xyz[nbr_idx]
    n2 = normals[nbr_idx]
    alpha, phi, theta, _ = _pair_features(p1, n1, p2, n2)

    def hist(vals, lo, hi):
        b = ((vals - lo) / (hi - lo) * N_BINS).astype(jnp.int32)
        b = jnp.clip(b, 0, N_BINS - 1)
        row = jnp.arange(n)[:, None] * jnp.ones((1, k), jnp.int32)
        flat = row * N_BINS + b
        h = jnp.zeros((n * N_BINS,), xyz.dtype).at[flat.reshape(-1)].add(
            nbr_valid.reshape(-1).astype(xyz.dtype))
        return h.reshape(n, N_BINS)

    h1 = hist(alpha, -1.0, 1.0)
    h2 = hist(phi, -1.0, 1.0)
    h3 = hist(theta, -jnp.pi, jnp.pi)
    h = jnp.concatenate([h1, h2, h3], axis=1)              # (N, 33)
    s = jnp.maximum(jnp.sum(h, axis=1, keepdims=True), 1e-9)
    return h / s * 100.0


def fpfh(xyz: Array, mask: Array, grid: knn.HashGrid, k: int = 16,
         candidates_per_cell: int = 32, max_radius: float = jnp.inf) -> Array:
    """(N, 33) FPFH: SPFH(p) + mean of distance-weighted neighbor SPFHs.
    Support is radius-capped (density-consistent, like Open3D's hybrid
    search) and excludes the query point itself."""
    normals = estimate_normals(xyz, mask, grid, k, candidates_per_cell,
                               max_radius)
    res = knn.query(grid, xyz, mask, k=k, candidates_per_cell=candidates_per_cell,
                    max_sqdist=float(max_radius) ** 2)
    # exclude the self-neighbor: its zero-length pair vector yields garbage
    # Darboux angles and its 1/d weight would dominate the neighbor average
    nbr_ok = res.valid & (res.sqdist > 1e-12)
    nbr_idx = jnp.where(nbr_ok, res.idx, 0)
    spfh = _spfh(xyz, normals, nbr_idx, nbr_ok)

    d = jnp.sqrt(jnp.maximum(res.sqdist, 1e-12))
    wgt = jnp.where(nbr_ok, 1.0 / jnp.maximum(d, 1e-3), 0.0)   # (N, k)
    nb = spfh[nbr_idx]                                            # (N, k, 33)
    acc = jnp.einsum("nk,nkf->nf", wgt, nb)
    wsum = jnp.maximum(jnp.sum(wgt, axis=1, keepdims=True), 1e-9)
    out = spfh + acc / wsum
    return jnp.where(mask[:, None], out, 0.0)


def mutual_correspondences(feat_a: Array, mask_a: Array,
                           feat_b: Array, mask_b: Array,
                           max_pairs: int) -> tuple[Array, Array, Array]:
    """Mutual nearest neighbors in feature space (``Calibration.py:176-198``
    find_correspondences).  Returns (idx_a (P,), idx_b (P,), valid (P,))."""
    # dense feature distance via one matmul (MXU): |a|^2 - 2ab + |b|^2
    d2 = (
        jnp.sum(feat_a**2, axis=1)[:, None]
        - 2.0 * feat_a @ feat_b.T
        + jnp.sum(feat_b**2, axis=1)[None, :]
    )
    big = jnp.float32(1e18)
    d2 = jnp.where(mask_a[:, None] & mask_b[None, :], d2, big)
    a2b = jnp.argmin(d2, axis=1)        # (Na,)
    b2a = jnp.argmin(d2, axis=0)        # (Nb,)
    mutual = b2a[a2b] == jnp.arange(feat_a.shape[0])
    mutual &= mask_a & (d2[jnp.arange(feat_a.shape[0]), a2b] < big)
    # densify to max_pairs
    score = jnp.where(mutual, -d2[jnp.arange(feat_a.shape[0]), a2b], -big)
    vals, sel = jax.lax.top_k(score, max_pairs)
    return sel, a2b[sel], vals > -big

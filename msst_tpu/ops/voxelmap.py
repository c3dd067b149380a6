"""Voxel feature maps: precomputed per-voxel line/plane Gaussians.

TPU-first replacement for the per-iteration 5-NN correspondence search of
the reference's scan-to-map optimizer (``mapOptmization.cpp:974-1135``): the
local map is summarized ONCE per rebuild into per-voxel statistics (mean,
principal directions, plane offset, quality gates), and each Gauss-Newton
iteration only *looks up* the voxel containing each transformed feature point
(plus its 7 octant neighbors) — a few MB of structured gathers instead of
tens of MB of random 5-NN gathers per iteration.  This is the VoxelMap /
Surfel-LIO design pattern, mapped onto fixed-shape hash tables.

Semantics parity with the reference's checks:

* surf voxels mimic ``surfOptimization``'s plane fit + validity
  (|n.x + d| <= 0.2 over members -> here sqrt(lambda_min) gate),
* corner voxels mimic ``cornerOptimization``'s line fit
  (lambda_max > 3 * lambda_mid) with point-to-line residuals,
* the same s = 1 - 0.9|r| weightings and pick gates apply downstream.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import linalg, segments

Array = jax.Array

_P1, _P2, _P3 = 73856093, 19349663, 83492791
_BIG = jnp.int32(2**30)

# Thin surf cells reclassified as LINE features ship their direction scaled
# by this (plane normals / line-kind directions are unit vectors), so the
# lookup consumer can select the point-to-line residual per HIT without
# widening the embedded probe rows.  Detect via |direction| < LINE_DIR_GATE.
LINE_DIR_SCALE = 0.5
LINE_DIR_GATE = 0.75


PROBE_C = 3  # candidate slots materialized per hash bucket (load factor is
#              <= 0.5 by construction: table_size >= 2*capacity, so P(bucket
#              overflow) ~ Poisson(0.5) tail ~ 1.6%; overflow entries are
#              simply unreachable, like a full PCL kd-tree leaf truncation)


class VoxelFeatureMap(NamedTuple):
    """Fixed-capacity voxel-Gaussian table + hash buckets for O(1) lookup.

    `probe` is the lookup's ONLY gathered table: one row per hash bucket,
    holding its PROBE_C candidates fully embedded as
    [coord-key(bits), mean(3), dir(3), d] x PROBE_C (24 floats).  A query
    probes 8 octant cells = 8 wide rows; per-row overhead dominates TPU
    gathers (narrow per-field gathers measured ~4x slower round 2), so 8
    wide rows beat the old 24 narrow probe rows + a dependent winner gather.
    `stats` keeps the per-voxel layout for the Pallas kernel path.
    """

    coords: Array        # (V, 3) int32 voxel coords (garbage where ~mask)
    mean: Array          # (V, 3)
    direction: Array     # (V, 3) plane normal (planes) or line direction
    d: Array             # (V,) plane offset (planes; 0 for lines)
    count: Array         # (V,) member points
    valid: Array         # (V,) bool — passes the geometric quality gates
    mask: Array          # (V,) bool — slot occupied
    stats: Array         # (V, 12) [key(bits), mean3, dir3, d, valid, cnt, 0, 0]
    probe: Array         # (H, PROBE_C*8) bucket-aligned embedded rows
    bucket_start: Array  # (H,)
    bucket_count: Array  # (H,)
    leaf: Array          # () float32
    origin: Array        # (3,) key-packing origin (zeros when absolute)

    @property
    def capacity(self) -> int:
        return self.mean.shape[0]

    @property
    def table_size(self) -> int:
        return self.bucket_start.shape[0]


def _hash3(c: Array, table_size: int) -> Array:
    h = (c[..., 0] * jnp.int32(_P1) ^ c[..., 1] * jnp.int32(_P2)
         ^ c[..., 2] * jnp.int32(_P3))
    return jnp.abs(h) % jnp.int32(table_size)


def _coord_key(c: Array) -> Array:
    """Pack voxel coords into one int32 (21/21/21 -> 10/10/10 bits around a
    +-512-cell domain; out-of-domain coords produce a sentinel that never
    matches a query)."""
    shifted = c + 512
    ok = jnp.all((shifted >= 0) & (shifted < 1024), axis=-1)
    key = (shifted[..., 0] << 20) | (shifted[..., 1] << 10) | shifted[..., 2]
    return jnp.where(ok, key, jnp.int32(2**30))


def _pack_rel(rel: Array, group_bits: int = 0) -> Array:
    """Pack +512-shifted cell coords ``rel`` (each in [0, 1024)) into one
    int32 sort key.

    group_bits = 0: plain 10/10/10 lexicographic packing.
    group_bits = k > 0: HIERARCHICAL packing for moment tables that feed a
    coarser feature grid at leaf ratio 2^k — the coarse-cell coords
    (``rel >> k``) occupy the HIGH bits and the sub-cell coords the low
    bits, so rows sorted by this key are grouped by coarse cell and
    :func:`build` can run ``presorted`` on them.  Plain lexicographic fine
    keys do NOT have that property: floor-division is monotone per axis but
    not jointly — e.g. fine cells (0,0,2) < (0,1,0) at ratio 2 map to
    coarse (0,0,1) > (0,0,0), splitting one coarse cell into multiple runs
    (capacity-saturating duplicate voxel entries; round-3 regression
    ``test_presorted_fit_no_duplicates``).
    """
    if group_bits == 0:
        return (rel[..., 0] << 20) | (rel[..., 1] << 10) | rel[..., 2]
    k = group_bits
    b = 10 - k
    km = (1 << k) - 1
    hi = rel >> k
    lo = rel & km
    coarse = (((hi[..., 0] << b) | hi[..., 1]) << b) | hi[..., 2]
    sub = (((lo[..., 0] << k) | lo[..., 1]) << k) | lo[..., 2]
    return (coarse << (3 * k)) | sub


def _unpack_rel(key: Array, group_bits: int = 0) -> Array:
    """Inverse of :func:`_pack_rel` (valid keys only)."""
    if group_bits == 0:
        return jnp.stack([(key >> 20) & 1023, (key >> 10) & 1023, key & 1023],
                         axis=-1)
    k = group_bits
    b = 10 - k
    bm = (1 << b) - 1
    km = (1 << k) - 1
    coarse = key >> (3 * k)
    sub = key & ((1 << (3 * k)) - 1)
    hi = jnp.stack([(coarse >> (2 * b)) & bm, (coarse >> b) & bm,
                    coarse & bm], axis=-1)
    lo = jnp.stack([(sub >> (2 * k)) & km, (sub >> k) & km, sub & km],
                   axis=-1)
    return (hi << k) | lo


def build(xyz: Array, mask: Array, leaf: float, capacity: int,
          kind: str, table_size: int = 8192, min_points: int = 3,
          line_ratio: float = 3.0, plane_thickness: float = 0.1,
          plane_min_spread: float = 0.0,
          plane_spread_min_count: "float | Array" = 0.0,
          weights: Array | None = None,
          origin: Array | None = None,
          presorted: bool = False) -> VoxelFeatureMap:
    """Voxelize + fit per-voxel features.

    kind: "plane" (surf map) or "line" (corner map).
    plane_thickness: max sqrt(lambda_min) for a valid plane — the analogue of
    the reference's 0.2 m plane-fit validity check.
    plane_min_spread: min sqrt(lambda_mid) for a valid plane — a plane needs
    2-D in-plane support, not just thinness.  A single grazing-incidence
    ring arc crossing a far floor cell is THIN (passes the thickness gate)
    but its normal is unconstrained in the plane perpendicular to the arc:
    those fits tilt with range noise, and at production shapes they are
    biased enough to torque pitch every scan, leak gravity into the
    along-track velocity, and drag x by ~10 m over a 140 m corridor
    (measured r4; the kNN path escapes because multi-scan 5-NN
    neighborhoods usually span rings).  0.0 = no gate (legacy behavior).
    r5 semantics: a cell failing the spread test is RECLASSIFIED as a line
    feature (direction = largest eigvec scaled by LINE_DIR_SCALE, d = 0)
    rather than blanked.  The r4 history: blanking fixed the corridor
    pitch torque but starved z in rooms where floor arcs are the only
    vertical support (bench z wandered 1.5 m); the r4 "support-aware"
    per-cell count gate protected rooms but effectively never fired on
    moving drives and silently un-fixed the corridor (dumbbell loop-off
    1.48 -> 5.94 m, reproduced bisecting the committed r4 code — its own
    report predates that commit).  A thin arc's point-to-line residual
    constrains exactly the directions it truly observes, serving both
    workloads.  plane_spread_min_count (may be traced; `weights` supplies
    per-row true point counts when rows are fine-cell centroids) keeps
    cells with fewer true points as PLANES — an escape hatch, default 0
    (always reclassify).
    origin: when given, the voxel grid is anchored at `origin` and grouping
    uses one packed int32 sort key over a +-512-cell domain around it (4x
    cheaper than the lexsort; points outside the domain are dropped — local
    maps always fit).  The SAME origin-relative grid is used for the sort,
    the segmentation, and the coord keys (a mixed absolute/relative grid
    fragments each cell into duplicate entries — ADVICE r1).
    presorted: (origin path only) the input rows are already GROUPED by this
    grid's cells — each cell's rows contiguous, invalid rows last — so the
    sort is skipped.  The only packing with that property for a finer input
    grid is the HIERARCHICAL key (``_pack_rel(group_bits=k)`` with
    ``leaf = 2^k * fine_leaf``, same origin): its high bits ARE this grid's
    cell coords.  A plain lexicographic fine key does NOT qualify — floor
    division is monotone per axis but not jointly, so one coarse cell
    splits into many runs (duplicate capacity-eating voxel entries; see
    ``_pack_rel``).  This is the moment-table fast path: fine-cell
    centroids come straight out of a sorted VoxelMoments table.
    """
    leaf_f = jnp.asarray(leaf, jnp.float32)
    origin_f = (jnp.zeros(3, jnp.float32) if origin is None
                else jnp.asarray(origin, jnp.float32))
    c = jnp.floor((xyz - origin_f) / leaf_f).astype(jnp.int32)
    if origin is not None:
        # multi-operand sort: values ride the sort network, no argsort and
        # no random row-gathers after (see voxel_downsample_packed); cells
        # decode from the sorted packed key
        rel = c + 512
        in_range = jnp.all((rel >= 0) & (rel < 1024), axis=1)
        mask = mask & in_range
        key = (rel[:, 0] << 20) | (rel[:, 1] << 10) | rel[:, 2]
        key = jnp.where(mask, key, jnp.int32(2**30))
        wts = (jnp.ones(xyz.shape[0], xyz.dtype) if weights is None
               else weights.astype(xyz.dtype))
        if presorted:
            key_s, xyz_s, wts_s = key, xyz, wts
        else:
            key_s, x0, x1, x2, wts_s = jax.lax.sort(
                (key, xyz[:, 0], xyz[:, 1], xyz[:, 2], wts), num_keys=1)
            xyz_s = jnp.stack([x0, x1, x2], axis=1)
        valid_s = key_s < jnp.int32(2**30)
        rel_s = jnp.stack([(key_s >> 20) & 1023, (key_s >> 10) & 1023,
                           key_s & 1023], axis=1)
        cs = jnp.where(valid_s[:, None], rel_s - 512, _BIG)
    else:
        kx = jnp.where(mask, c[:, 0], _BIG)
        ky = jnp.where(mask, c[:, 1], _BIG)
        kz = jnp.where(mask, c[:, 2], _BIG)
        order = jnp.lexsort([kz, ky, kx])
        cs = jnp.stack([kx[order], ky[order], kz[order]], axis=1)
        valid_s = mask[order]
        xyz_s = xyz[order]
        wts = (jnp.ones(xyz.shape[0], xyz.dtype) if weights is None
               else weights.astype(xyz.dtype))
        wts_s = wts[order]

    new_voxel = jnp.any(cs != jnp.roll(cs, 1, axis=0), axis=1)
    new_voxel = new_voxel.at[0].set(True) & valid_s
    seg = jnp.cumsum(new_voxel.astype(jnp.int32)) - 1
    seg = jnp.where(valid_s, seg, capacity)

    # Sorted-segment reductions: one prefix scan + boundary gathers instead
    # of scatters (segments.py; scatter = 3.5 ms vs cumsum = 0.5 ms at
    # (262k, 13) on v5e).  Positions are demeaned by their CELL CENTER
    # first, so residuals are <= leaf/2 and plain f32 prefixes keep metric
    # precision for both moments; the second moments use the 6 unique
    # entries of the symmetric outer product.
    w = valid_s.astype(xyz.dtype)
    bounds = segments.segment_boundaries(seg, capacity)
    center_s = origin_f + (cs.astype(xyz.dtype) + 0.5) * leaf_f
    r_s = (xyz_s - center_s) * w[:, None]
    iu, ju = jnp.array([0, 0, 0, 1, 1, 2]), jnp.array([0, 1, 2, 1, 2, 2])
    outer6 = r_s[:, iu] * r_s[:, ju]
    moments = segments.sorted_segment_sum(
        jnp.concatenate([r_s, outer6, w[:, None],
                         (w * wts_s)[:, None]], axis=1), seg, capacity,
        boundaries=bounds, compensated=False)
    rsums, sq6, cnt = moments[:, :3], moments[:, 3:9], moments[:, 9]
    cnt_pts = moments[:, 10]  # true point support (= cnt when weights=None)
    coords_v = segments.sorted_segment_first(cs, seg, capacity,
                                             boundaries=bounds)
    coords_v = jnp.where((bounds[0] < bounds[1])[:, None], coords_v, -_BIG)
    center_v = origin_f + (coords_v.astype(xyz.dtype) + 0.5) * leaf_f

    denom = jnp.maximum(cnt, 1.0)
    rmu = rsums / denom[:, None]
    mu = center_v + rmu
    sq = sq6[:, jnp.array([0, 1, 2, 1, 3, 4, 2, 4, 5])].reshape(capacity, 3, 3)
    cov = sq / denom[:, None, None] - jnp.einsum("ni,nj->nij", rmu, rmu)
    vals, vecs = linalg.sym3x3_eigh(cov)   # ascending; rows are eigenvectors

    n_vox = jnp.sum(new_voxel.astype(jnp.int32))
    occupied = jnp.arange(capacity) < jnp.minimum(n_vox, capacity)

    def _unit(v):
        # the analytic 3x3 eigensolver's vectors degrade from unit norm on
        # near-degenerate spectra; the LINE_DIR_SCALE encoding (and the
        # plane residual's metric scale) need exact unit directions
        return v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True),
                               1e-12)

    if kind == "plane":
        direction = _unit(vecs[:, 0, :])   # smallest eigvec = normal
        d = -jnp.sum(direction * mu, axis=1)
        quality_ok = jnp.sqrt(jnp.maximum(vals[:, 0], 0.0)) <= plane_thickness
        if plane_min_spread > 0.0:
            spread_ok = (jnp.sqrt(jnp.maximum(vals[:, 1], 0.0))
                         >= plane_min_spread)
            # Thin-but-valid cells are RECLASSIFIED as line features
            # instead of blanked or kept as planes (r5; both alternatives
            # measured fatal on one workload each): a single-ring arc
            # crossing a far floor cell has genuine 1-D support — its
            # point-to-LINE residual constrains the two real directions
            # (height + cross-arc) — while its plane NORMAL is
            # unconstrained around the arc axis (noise-tilted normals
            # torque pitch -> the 11 m corridor x-drag) and BLANKING it
            # starves z where floor arcs are the only vertical support
            # (the bench room drive wandered z by 1.5 m).  The line
            # direction ships scaled by LINE_DIR_SCALE so the lookup
            # consumer can tell the two residual types apart without
            # widening the embedded probe rows (both classes are
            # otherwise unit vectors); d = 0 like the "line" kind.
            to_line = quality_ok & ~spread_ok & (
                cnt_pts >= plane_spread_min_count)
            direction = jnp.where(
                to_line[:, None],
                _unit(vecs[:, 2, :]) * LINE_DIR_SCALE, direction)
            d = jnp.where(to_line, 0.0, d)
    else:
        direction = _unit(vecs[:, 2, :])   # largest eigvec = line direction
        d = jnp.zeros(capacity, xyz.dtype)
        quality_ok = vals[:, 2] > line_ratio * jnp.maximum(vals[:, 1], 1e-12)

    valid = occupied & (cnt >= min_points) & quality_ok

    # bucket table over voxel coords — multi-operand sort by hash (values
    # ride the sort network; the old argsort + 7 permutation gathers cost
    # V random rows each)
    h = jnp.where(occupied, _hash3(coords_v, table_size), table_size)
    (h_sorted, c0, c1, c2, m0, m1, m2, dx, dy, dz, d_s, cnt_s, valid_i,
     occ_i) = jax.lax.sort(
        (h, coords_v[:, 0], coords_v[:, 1], coords_v[:, 2],
         mu[:, 0], mu[:, 1], mu[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2],
         d, cnt, valid.astype(jnp.int32), occupied.astype(jnp.int32)),
        num_keys=1)
    starts, ends = segments.segment_boundaries(h_sorted, table_size)
    coords_p = jnp.stack([c0, c1, c2], axis=1)
    mean_p = jnp.stack([m0, m1, m2], axis=1)
    dir_p = jnp.stack([dx, dy, dz], axis=1)
    d_p = d_s
    cnt_p = cnt_s
    valid_p = valid_i > 0
    mask_p = occ_i > 0
    # coords are already origin-relative (or absolute when origin=None,
    # valid while |coords| < 512 cells)
    key_bits = jax.lax.bitcast_convert_type(_coord_key(coords_p), jnp.float32)
    stats = jnp.concatenate([
        key_bits[:, None], mean_p, dir_p, d_p[:, None],
        valid_p.astype(jnp.float32)[:, None],
        cnt_p.astype(jnp.float32)[:, None],
        jnp.zeros((capacity, 2), jnp.float32),
    ], axis=1)
    # bucket-aligned embedded probe rows: candidate c of bucket b lives at
    # flat row b*PROBE_C + c, fully embedded [key, mean3, dir3, d] so the
    # lookup is ONE wide gather with no dependent winner gather.  Validity
    # folds into the key (invalid -> sentinel, never matches a query).
    probe_key = jnp.where(valid_p, _coord_key(coords_p), jnp.int32(2**30))
    emb = jnp.concatenate([
        jax.lax.bitcast_convert_type(probe_key, jnp.float32)[:, None],
        mean_p, dir_p, d_p[:, None],
    ], axis=1)                                              # (V, 8)
    pos = jnp.arange(capacity, dtype=jnp.int32)
    is_new = (h_sorted != jnp.roll(h_sorted, 1)).at[0].set(True)
    run_start = jax.lax.cummax(jnp.where(is_new, pos, 0))
    rank = pos - run_start
    in_table = mask_p & (h_sorted < table_size) & (rank < PROBE_C)
    dest = jnp.where(in_table, h_sorted * PROBE_C + rank,
                     table_size * PROBE_C)
    sent = jax.lax.bitcast_convert_type(jnp.int32(2**30), jnp.float32)
    init = jnp.zeros((table_size * PROBE_C + 1, 8), jnp.float32
                     ).at[:, 0].set(sent)
    probe = init.at[dest].set(emb)[:table_size * PROBE_C].reshape(
        table_size, PROBE_C * 8)

    return VoxelFeatureMap(
        coords=coords_p, mean=mean_p, direction=dir_p,
        d=d_p, count=cnt_p, valid=valid_p, mask=mask_p, stats=stats,
        probe=probe,
        bucket_start=starts.astype(jnp.int32),
        bucket_count=(ends - starts).astype(jnp.int32),
        leaf=leaf_f,
        origin=origin_f,
    )


# ---------------------------------------------------------------------------
# Incremental moment tables (delta insert / evict)
# ---------------------------------------------------------------------------


class VoxelMoments(NamedTuple):
    """Persistent per-voxel first-moment table for incremental map updates.

    The TPU-native replacement for the reference's transformed-cloud cache
    (``mapOptmization.cpp:899-938`` ``laserCloudMapContainer``): instead of
    re-gathering and re-downsampling every nearby keyframe at each keyframe
    insert, each keyframe's feature cloud is summarized ONCE into per-voxel
    centroid moments and merged into this table; eviction merges the same
    moments negated (see ``merge_moments``).  Rows are sorted by packed cell
    key (sentinel 2**30 marks empty slots), positions are demeaned by the
    CELL CENTER (residuals <= leaf/2, so plain f32 sums keep metric
    precision — segments.py).

    Only first moments are kept: the feature fit happens at a coarser leaf
    from the per-cell centroids (``moments_centroids`` + :func:`build`),
    which reproduces the reference's centroid-downsample-then-fit semantics
    (``extractCloud`` :899-938) exactly.
    """

    key: Array   # (V,) int32 packed 10/10/10 origin-relative cell key, sorted
    rsum: Array  # (V, 3) sum of (xyz - cell_center) over member points
    cnt: Array   # (V,) member count (exact in f32 up to 2^24)

    @property
    def capacity(self) -> int:
        return self.key.shape[0]


def empty_moments(capacity: int) -> VoxelMoments:
    return VoxelMoments(
        key=jnp.full((capacity,), _BIG, jnp.int32),
        rsum=jnp.zeros((capacity, 3), jnp.float32),
        cnt=jnp.zeros((capacity,), jnp.float32),
    )


def _decode_center(key: Array, leaf: Array, origin: Array,
                   group_bits: int = 0) -> Array:
    """Cell centers from packed keys (inverse of the +512-shifted packing)."""
    c = _unpack_rel(key, group_bits)
    return origin + (c.astype(jnp.float32) - 512 + 0.5) * leaf


def points_to_moments(xyz: Array, mask: Array, leaf: float | Array,
                      origin: Array, capacity: int,
                      group_bits: int = 0,
                      return_stats: bool = False) -> VoxelMoments:
    """Summarize a point cloud into sorted per-cell centroid moments.

    Same grid as :func:`build`'s origin path (points outside the +-512-cell
    domain around `origin` are dropped).  ``group_bits`` selects the key
    packing (see :func:`_pack_rel`): pass k when this table feeds a feature
    fit at leaf ``2^k * leaf`` so the fit can run ``presorted``; every table
    merged with this one must use the same packing.

    return_stats: also return dropped (() int32) — occupied cells that did
    NOT fit the capacity.  Overflow drops the HIGHEST cell keys (spatially
    biased), which silently diverged a saturated profile once (r4); callers
    on the estimator path surface this count as telemetry (VERDICT r4 #6)."""
    leaf_f = jnp.asarray(leaf, jnp.float32)
    origin_f = jnp.asarray(origin, jnp.float32)
    rel = jnp.floor((xyz - origin_f) / leaf_f).astype(jnp.int32) + 512
    ok = mask & jnp.all((rel >= 0) & (rel < 1024), axis=1)
    key = jnp.where(ok, _pack_rel(rel, group_bits), _BIG)
    key_s, x0, x1, x2 = jax.lax.sort(
        (key, xyz[:, 0], xyz[:, 1], xyz[:, 2]), num_keys=1)
    xyz_s = jnp.stack([x0, x1, x2], axis=1)
    valid_s = key_s < _BIG

    new_cell = (key_s != jnp.roll(key_s, 1)).at[0].set(True) & valid_s
    seg = jnp.cumsum(new_cell.astype(jnp.int32)) - 1
    seg = jnp.where(valid_s, seg, capacity)
    bounds = segments.segment_boundaries(seg, capacity)
    w = valid_s.astype(jnp.float32)
    r_s = (xyz_s - _decode_center(key_s, leaf_f, origin_f, group_bits)) \
        * w[:, None]
    sums = segments.sorted_segment_sum(
        jnp.concatenate([r_s, w[:, None]], axis=1), seg, capacity,
        boundaries=bounds, compensated=False)
    key_v = segments.sorted_segment_first(key_s, seg, capacity,
                                          boundaries=bounds)
    occupied = bounds[0] < bounds[1]
    out = VoxelMoments(
        key=jnp.where(occupied, key_v, _BIG),
        rsum=jnp.where(occupied[:, None], sums[:, :3], 0.0),
        cnt=jnp.where(occupied, sums[:, 3], 0.0),
    )
    if return_stats:
        n_cells = jnp.sum(new_cell.astype(jnp.int32))
        return out, jnp.maximum(n_cells - capacity, 0)
    return out


def scale_moments(m: VoxelMoments, s: float) -> VoxelMoments:
    """s = -1 turns a contribution into its eviction delta."""
    return m._replace(rsum=m.rsum * s, cnt=m.cnt * s)


def merge_moments(a: VoxelMoments, b: VoxelMoments, capacity: int,
                  min_cnt: float = 0.5,
                  trim_center: Array | None = None,
                  trim_radius: float | Array | None = None,
                  leaf: float | Array | None = None,
                  origin: Array | None = None,
                  group_bits: int = 0,
                  method: str = "sort",
                  return_stats: bool = False) -> VoxelMoments:
    """Merge two sorted moment tables: cells with equal keys sum; cells whose
    count drops below `min_cnt` (evicted away) die; with `trim_center`/
    `trim_radius`, cells farther than the radius die too (the reference's
    50 m surrounding-keyframe radius, ``extractNearby`` :862-897, applied at
    cell granularity — this also bounds table occupancy).

    Eviction via ``scale_moments(m, -1)`` cancels counts EXACTLY (integer
    sums in f32); position-sum residue is ~ULP of the cell sums.  If more
    than `capacity` cells survive, the highest cell keys are dropped
    (trimming makes this rare; the overflow policy stays deterministic).
    ``return_stats`` also returns the dropped-cell count (() int32) so the
    estimator can surface saturation instead of silently thinning one side
    of the map (VERDICT r4 #6).

    The final compaction is always a cumsum-of-survivors scatter (the old
    second 5-operand bitonic sort).  ``method`` picks how the merged order
    is formed:

    * "sort": ONE multi-operand ``lax.sort`` of the concatenated tables
      (values ride the sort network — no gathers).
    * "rank": no sort — a binary search of the ``b`` keys into ``a`` plus
      rank scatters.  Algorithmically cheaper, but ``jnp.searchsorted``'s
      scan method is a ~17-step DEPENDENT gather chain; measured on v5e at
      bench shapes (49k+8k surf + 16k+2k corner) the merge pair ran 4.64 ms
      vs 2.28 ms for "sort" — the default follows that measurement
      (docs/DESIGN.md round-3 notes).
    """
    na, nb = a.key.shape[0], b.key.shape[0]
    n_tot = na + nb
    avals = jnp.concatenate([a.rsum, a.cnt[:, None]], axis=1)
    bvals = jnp.concatenate([b.rsum, b.cnt[:, None]], axis=1)
    if method == "sort":
        key = jnp.concatenate([a.key, b.key])
        vals = jnp.concatenate([avals, bvals])
        key_s, v0, v1, v2, v3 = jax.lax.sort(
            (key, vals[:, 0], vals[:, 1], vals[:, 2], vals[:, 3]),
            num_keys=1)
        vals_s = jnp.stack([v0, v1, v2, v3], axis=1)
    else:
        # stable-merge ranks: b_j goes after equal a keys (side="right"),
        # a_i fills the remaining slots in order (free-slot rank inversion)
        pos_b = (jnp.arange(nb, dtype=jnp.int32)
                 + jnp.searchsorted(a.key, b.key, side="right"
                                    ).astype(jnp.int32))
        occ_b = jnp.zeros((n_tot,), bool).at[pos_b].set(True)
        free_rank = jnp.cumsum((~occ_b).astype(jnp.int32)) - 1
        pos_of_a = jnp.zeros((na,), jnp.int32).at[
            jnp.where(~occ_b, free_rank, na)].set(
            jnp.arange(n_tot, dtype=jnp.int32), mode="drop")
        key_s = jnp.zeros((n_tot,), jnp.int32
                          ).at[pos_of_a].set(a.key).at[pos_b].set(b.key)
        vals_s = jnp.zeros((n_tot, 4), avals.dtype
                           ).at[pos_of_a].set(avals).at[pos_b].set(bvals)
    valid_s = key_s < _BIG
    new_cell = (key_s != jnp.roll(key_s, 1)).at[0].set(True) & valid_s
    seg = jnp.cumsum(new_cell.astype(jnp.int32)) - 1
    seg = jnp.where(valid_s, seg, n_tot)
    bounds = segments.segment_boundaries(seg, n_tot)
    sums = segments.sorted_segment_sum(vals_s, seg, n_tot, boundaries=bounds,
                                       compensated=False)
    key_v = segments.sorted_segment_first(key_s, seg, n_tot, boundaries=bounds)
    alive = (bounds[0] < bounds[1]) & (sums[:, 3] >= min_cnt)
    if trim_center is not None:
        center = _decode_center(key_v, jnp.asarray(leaf, jnp.float32),
                                jnp.asarray(origin, jnp.float32), group_bits)
        d2 = jnp.sum((center - trim_center) ** 2, axis=1)
        alive = alive & (d2 <= jnp.asarray(trim_radius, jnp.float32) ** 2)
    # compact survivors to the front (they are in key order, so rank order
    # keeps the table sorted and overflow drops the highest keys)
    rank = jnp.cumsum(alive.astype(jnp.int32)) - 1
    dest = jnp.where(alive & (rank < capacity), rank, capacity)
    out_key = jnp.full((capacity + 1,), _BIG, jnp.int32
                       ).at[dest].set(jnp.where(alive, key_v, _BIG))
    out_vals = jnp.zeros((capacity + 1, 4), sums.dtype
                         ).at[dest].set(jnp.where(alive[:, None], sums, 0.0))
    out = VoxelMoments(
        key=out_key[:capacity],
        rsum=out_vals[:capacity, :3],
        cnt=out_vals[:capacity, 3],
    )
    if return_stats:
        n_alive = jnp.sum(alive.astype(jnp.int32))
        return out, jnp.maximum(n_alive - capacity, 0)
    return out


def moments_centroids(m: VoxelMoments, leaf: float | Array, origin: Array,
                      group_bits: int = 0, return_counts: bool = False):
    """(xyz, mask[, cnt]): one centroid pseudo-point per occupied cell — the
    input the coarse feature fit (:func:`build`) consumes, identical to the
    reference's centroid-downsampled local map.  return_counts adds each
    centroid's TRUE point count (the fit's support-aware gates consume it
    as `weights`)."""
    mask = m.key < _BIG
    center = _decode_center(m.key, jnp.asarray(leaf, jnp.float32),
                            jnp.asarray(origin, jnp.float32), group_bits)
    xyz = center + m.rsum / jnp.maximum(m.cnt, 1.0)[:, None]
    xyz = jnp.where(mask[:, None], xyz, 0.0)
    if return_counts:
        return xyz, mask, jnp.where(mask, m.cnt, 0.0)
    return xyz, mask


class VoxelLookup(NamedTuple):
    idx: Array        # (Q,) winning candidate index (octant*PROBE_C + lane;
    #                   diagnostic only — all stats are embedded below)
    found: Array      # (Q,) bool
    mean: Array       # (Q, 3) matched voxel mean
    direction: Array  # (Q, 3) matched voxel plane normal / line direction
    d: Array          # (Q,) matched plane offset


def lookup(vmap: VoxelFeatureMap, q_xyz: Array, q_mask: Array) -> VoxelLookup:
    """Find the best feature voxel for each query point: probe the containing
    voxel + the 7 octant neighbors toward the in-cell offset, resolve hash
    buckets by packed-coordinate-key match, choose the valid voxel with the
    nearest mean.

    One wide gather per octant cell (8 rows/query of PROBE_C embedded
    candidates) — per-row overhead dominates TPU gathers, so this beats the
    old 8*C narrow probe rows + a dependent per-winner stats gather ~2x at
    scan sizes.
    """
    C = PROBE_C
    g = (q_xyz - vmap.origin) / vmap.leaf               # same grid as build()
    base = jnp.floor(g).astype(jnp.int32)               # (Q, 3)
    frac = g - base
    step = jnp.where(frac >= 0.5, 1, -1).astype(jnp.int32)  # octant direction

    # 8 octant offsets: choose subsets of axes to step
    combos = jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                        [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]], jnp.int32)
    cells = base[:, None, :] + combos[None, :, :] * step[:, None, :]  # (Q, 8, 3)

    hb = _hash3(cells, vmap.table_size)                 # (Q, 8)
    Qn = q_xyz.shape[0]
    rows = vmap.probe[hb].reshape(Qn, 8, C, 8)          # ONE gather, 8 rows/q
    keys = jax.lax.bitcast_convert_type(rows[..., 0], jnp.int32)  # (Q, 8, C)
    expect = _coord_key(cells)                          # (Q, 8)
    # out-of-domain query cells share the invalid-voxel sentinel; remap so
    # they can never match it
    expect = jnp.where(expect == jnp.int32(2**30), jnp.int32(-1), expect)
    match = keys == expect[..., None]                   # (Q, 8, C)

    means = rows[..., 1:4]
    d2 = jnp.sum((means - q_xyz[:, None, None, :]) ** 2, axis=-1)
    d2 = jnp.where(match & q_mask[:, None, None], d2, jnp.inf)
    d2f = d2.reshape(Qn, 8 * C)
    best = jnp.argmin(d2f, axis=1)
    win = jnp.take_along_axis(rows.reshape(Qn, 8 * C, 8),
                              best[:, None, None], axis=1)[:, 0]  # (Q, 8)
    found = jnp.isfinite(jnp.take_along_axis(d2f, best[:, None], axis=1)[:, 0])
    return VoxelLookup(
        idx=best.astype(jnp.int32), found=found,
        mean=win[:, 1:4], direction=win[:, 4:7], d=win[:, 7],
    )


def lookup_cat(vmap_a: VoxelFeatureMap, vmap_b: VoxelFeatureMap,
               q_xyz: Array, q_mask: Array, n_a: int) -> VoxelLookup:
    """:func:`lookup` against TWO maps in ONE pass: query rows [0, n_a)
    probe ``vmap_a`` and the rest ``vmap_b``, with the two probe tables
    concatenated row-wise (the second class's bucket ids offset by the
    first table's row count).  Exactly equal to two separate lookups —
    the win is op count: the scan-to-map GN loop runs sequentially per
    window slot, so one gather/argmin/winner chain instead of two is
    wall-clock (per-op overhead, not bytes, dominates at these sizes).
    """
    C = PROBE_C
    Qn = q_xyz.shape[0]
    is_a = jnp.arange(Qn) < n_a
    leaf = jnp.where(is_a, vmap_a.leaf, vmap_b.leaf)            # (Q,)
    origin = jnp.where(is_a[:, None], vmap_a.origin, vmap_b.origin)
    g = (q_xyz - origin) / leaf[:, None]
    base = jnp.floor(g).astype(jnp.int32)
    frac = g - base
    step = jnp.where(frac >= 0.5, 1, -1).astype(jnp.int32)
    combos = jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                        [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]], jnp.int32)
    cells = base[:, None, :] + combos[None, :, :] * step[:, None, :]

    hb = jnp.where(is_a[:, None], _hash3(cells, vmap_a.table_size),
                   _hash3(cells, vmap_b.table_size)
                   + jnp.int32(vmap_a.table_size))
    probe_cat = jnp.concatenate([vmap_a.probe, vmap_b.probe], axis=0)
    rows = probe_cat[hb].reshape(Qn, 8, C, 8)
    keys = jax.lax.bitcast_convert_type(rows[..., 0], jnp.int32)
    expect = _coord_key(cells)
    expect = jnp.where(expect == jnp.int32(2**30), jnp.int32(-1), expect)
    match = keys == expect[..., None]

    means = rows[..., 1:4]
    d2 = jnp.sum((means - q_xyz[:, None, None, :]) ** 2, axis=-1)
    d2 = jnp.where(match & q_mask[:, None, None], d2, jnp.inf)
    d2f = d2.reshape(Qn, 8 * C)
    best = jnp.argmin(d2f, axis=1)
    win = jnp.take_along_axis(rows.reshape(Qn, 8 * C, 8),
                              best[:, None, None], axis=1)[:, 0]
    found = jnp.isfinite(jnp.take_along_axis(d2f, best[:, None], axis=1)[:, 0])
    return VoxelLookup(
        idx=best.astype(jnp.int32), found=found,
        mean=win[:, 1:4], direction=win[:, 4:7], d=win[:, 7],
    )


def plane_residuals(vmap: VoxelFeatureMap, q_xyz: Array, hit: VoxelLookup
                    ) -> tuple[Array, Array, Array]:
    """(n, r, ok): signed point-to-plane residual per query against its
    voxel's plane (stats come from the lookup's gathered rows — no second
    gather)."""
    r = jnp.sum(q_xyz * hit.direction, axis=1) + hit.d
    return hit.direction, r, hit.found


def line_residuals(vmap: VoxelFeatureMap, q_xyz: Array, hit: VoxelLookup
                   ) -> tuple[Array, Array, Array]:
    """(grad, r, ok): point-to-line distance + unit gradient per query."""
    delta = q_xyz - hit.mean
    v = hit.direction
    along = jnp.sum(delta * v, axis=1, keepdims=True)
    perp = delta - along * v
    r = jnp.linalg.norm(perp, axis=1)
    grad = perp / jnp.maximum(r, 1e-9)[:, None]
    return grad, r, hit.found

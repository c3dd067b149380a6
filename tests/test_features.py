import jax.numpy as jnp
import numpy as np

from msst_tpu.ops import features as F
from msst_tpu.ops.range_image import ExtractedScan

RNG = np.random.default_rng(5)


def make_scan(rng_rows, cols=None):
    """Build an ExtractedScan from per-ring range arrays (lists of floats)."""
    n_scan = len(rng_rows)
    h = max(len(r) for r in rng_rows)
    rng = np.full((n_scan, h), np.inf, np.float32)
    col = np.zeros((n_scan, h), np.int32)
    count = np.zeros(n_scan, np.int32)
    for i, row in enumerate(rng_rows):
        rng[i, : len(row)] = row
        col[i, : len(row)] = np.arange(len(row)) if cols is None else cols[i]
        count[i] = len(row)
    xyz = np.zeros((n_scan, h, 3), np.float32)
    xyz[..., 0] = np.where(np.isfinite(rng), rng, 0)
    return ExtractedScan(
        jnp.asarray(xyz), jnp.asarray(rng), jnp.asarray(col),
        jnp.zeros((n_scan, h, 0)), jnp.asarray(count),
    )


def test_curvature_matches_formula():
    row = RNG.uniform(5, 10, size=100).astype(np.float32)
    scan = make_scan([row])
    curv, valid = F.curvature(scan)
    curv = np.asarray(curv)[0]
    for i in range(5, 95):
        d = row[i - 5 : i + 6].sum() - 11 * row[i]  # == sum(neighbors) - 10*center
        np.testing.assert_allclose(curv[i], d * d, rtol=1e-3, atol=1e-5)
    v = np.asarray(valid)[0]
    assert not v[:5].any() and not v[95:].any() and v[5:95].all()


def test_occlusion_marks_far_side():
    row = np.full(60, 5.0, np.float32)
    row[30:] = 10.0  # step up at 30: depth2 - depth1 > 0.3 -> mark i+1..i+6
    scan = make_scan([row])
    occ = np.asarray(F.mark_occluded(scan))[0]
    assert occ[30:36].all()  # far side marked
    assert not occ[10:25].any()  # smooth region clean


def test_occlusion_step_down_marks_near_side():
    row = np.full(60, 10.0, np.float32)
    row[30:] = 5.0  # step down at i=29->30: depth1 - depth2 > 0.3 -> mark i-5..i
    scan = make_scan([row])
    occ = np.asarray(F.mark_occluded(scan))[0]
    assert occ[24:30].all()
    assert not occ[35:50].any()


def test_extract_features_corner_and_surface():
    # Flat wall with a single range spike -> the spike (and stencil-coupled
    # neighbors) have high curvature; the rest is surface.
    # Two walls meeting in a V at column 68: range slope flips sign there, so
    # the 11-tap curvature is (0.2*15)^2 = 9 at the junction, decaying to flat
    # 3+ columns away.  Slope 0.1 m/step stays under the 2%-of-range
    # parallel-beam rejection and the 0.3 m occlusion step.  The junction sits
    # deep enough in its azimuth sector that flat-point suppression spilling
    # from the previous sector (<= 5 columns past its end, as in the
    # reference) cannot reach it.
    row = (8.0 + 0.1 * np.abs(np.arange(120) - 68)).astype(np.float32)
    scan = make_scan([row])
    masks = F.extract_features(scan, edge_threshold=1.0, surf_threshold=0.1)
    corner = np.asarray(masks.corner)[0]
    surf = np.asarray(masks.surface)[0]
    assert corner[68]
    assert corner.sum() == 1  # neighbors suppressed
    # flats became surface
    assert surf[10:50].sum() > 30
    assert not (corner & surf).any()


def test_extract_features_max_corners_per_sector():
    # Spikes of 0.12 m every 7 columns (below the parallel-beam/occlusion
    # rejections, spacing beyond the +-5 suppression) -> many corners, capped
    # at 20 per sector.
    row = np.full(400, 8.0, np.float32)
    row[::7] += 0.12
    scan = make_scan([row])
    masks = F.extract_features(scan, edge_threshold=1.0, surf_threshold=0.1)
    corner = np.asarray(masks.corner)[0]
    # 6 sectors, <= 20 each
    assert corner.sum() <= 120
    assert corner.sum() > 20
    # every picked corner is an actual spike column
    assert (np.nonzero(corner)[0] % 7 == 0).all()


def test_extract_features_ignores_invalid_tail():
    row = np.full(50, 6.0, np.float32)
    row[20] = 9.0
    scan = make_scan([row])
    masks = F.extract_features(scan)
    corner = np.asarray(masks.corner)[0]
    surf = np.asarray(masks.surface)[0]
    assert not corner[50:].any() and not surf[50:].any()


def test_nms_variant_matches_exact_on_structured_scene():
    # square-room scan: both variants must find the same 4 corner azimuths
    import numpy as np
    N_SCAN, H = 4, 720
    az = np.linspace(-np.pi, np.pi, H, endpoint=False)
    rows = []
    for e in np.radians(np.linspace(-10, 10, N_SCAN)):
        d_wall = 10.0 / np.maximum(np.abs(np.cos(az)), np.abs(np.sin(az)))
        rows.append((d_wall / np.cos(e)).astype(np.float32))
    scan = make_scan(rows)
    exact = F.extract_features(scan)
    nms = F.extract_features_nms(scan)
    ce = np.asarray(exact.corner)
    cn = np.asarray(nms.corner)
    # same positions up to +-1 column per ring
    for r in range(N_SCAN):
        pe, pn = np.nonzero(ce[r])[0], np.nonzero(cn[r])[0]
        assert len(pn) >= len(pe) - 1
        for p_ in pe:
            assert np.min(np.abs(pn - p_)) <= 1, (r, p_, pn)
    # surfaces broadly agree
    assert abs(int(exact.surface.sum()) - int(nms.surface.sum())) < 50

"""Geometry engine tests vs a brute-force transliteration of the spec."""
import numpy as np

from acousticswarms_speech_tpu.constants import FS, SPEED_OF_SOUND
from acousticswarms_speech_tpu.dsp.geometry import build_geometry
from acousticswarms_speech_tpu.dsp.patch import (
    Patch,
    hyperbola_area_init,
    hyperbola_area_sample,
)

MIC = np.array([
    [0.0, 0.0, 0.02], [0.4, 0.2, 0.02], [0.4, -0.2, 0.02], [0.6, 0.0, 0.02],
])
ROI = [-1.0, 1.5, -1.2, 1.2, 0.1, 0.5]


def brute_force_mapping(mic_pos, roi, grid_size, grid_size_z, res, keepout):
    """Independent per-cell implementation of the 3D->TDoA mapping
    (per SRP_Prunning.Map_3D_TDoA spec: loop cells, keepout box, round
    offsets to the sample resolution)."""
    xg = np.arange(roi[0], roi[1], grid_size)
    yg = np.arange(roi[2], roi[3], grid_size)
    zg = np.arange(roi[4], roi[5], grid_size_z)
    border = [mic_pos[:, 0].min() - keepout, mic_pos[:, 1].min() - keepout,
              mic_pos[:, 0].max() + keepout, mic_pos[:, 1].max() + keepout]
    valid = np.zeros((len(xg), len(yg), len(zg)), bool)
    offsets = np.zeros((len(xg), len(yg), len(zg), mic_pos.shape[0] - 1), int)
    for ix, x in enumerate(xg):
        for iy, y in enumerate(yg):
            inside = (x > border[0] and y > border[1] and x < border[2]
                      and y < border[3])
            for iz, z in enumerate(zg):
                if inside:
                    continue
                valid[ix, iy, iz] = True
                pos = np.array([x, y, z])
                off = np.array([
                    (np.linalg.norm(pos - mic_pos[i])
                     - np.linalg.norm(pos - mic_pos[0])) / SPEED_OF_SOUND * FS
                    for i in range(1, mic_pos.shape[0])
                ])
                offsets[ix, iy, iz] = np.round(off / res).astype(int) * res
    return valid, offsets


def test_geometry_valid_and_offsets_match_brute_force():
    geom = build_geometry(MIC, ROI, grid_size=0.1, grid_size_z=0.1,
                          sample_resolution=4)
    valid_bf, off_bf = brute_force_mapping(MIC, ROI, 0.1, 0.1, 4, 0.2)
    np.testing.assert_array_equal(geom.valid, valid_bf)
    # Every valid cell's cluster offsets equal the brute-force rounding
    ci = geom.cluster_index
    for ix, iy, iz in zip(*np.nonzero(valid_bf)):
        cid = ci[ix, iy, iz]
        assert cid >= 0
        np.testing.assert_array_equal(geom.cluster_offsets[cid],
                                      off_bf[ix, iy, iz])


def test_cluster_connectivity_and_centers():
    geom = build_geometry(MIC, ROI, grid_size=0.1, grid_size_z=0.1,
                          sample_resolution=4)
    ci = geom.cluster_index
    # cells of the same cluster have identical offsets (by construction) and
    # each cluster's centroid is the mean of its member positions
    pos = np.stack(np.meshgrid(geom.x_grids, geom.y_grids, geom.z_grids,
                               indexing="ij"), axis=3)
    for cid in range(min(geom.num_clusters, 50)):
        members = ci == cid
        assert members.any()
        np.testing.assert_allclose(geom.grids[cid], pos[members].mean(axis=0),
                                   atol=1e-9)
    # invalid cells carry -1
    assert (ci[~geom.valid] == -1).all()


def test_cluster_ordering_is_scan_order():
    geom = build_geometry(MIC, ROI, grid_size=0.1, grid_size_z=0.1,
                          sample_resolution=4)
    ci = geom.cluster_index.ravel()
    first_seen = {}
    for i, cid in enumerate(ci):
        if cid >= 0 and cid not in first_seen:
            first_seen[cid] = i
    ids_in_order = sorted(first_seen, key=first_seen.get)
    assert ids_in_order == list(range(len(ids_in_order)))


def test_patch_predicates():
    p = Patch(np.array([0.0, 4.0, -4.0]), [4.0, 4.0, 4.0], None)
    samples = np.array([[0.0, 1.9, 2.5], [4.0, 5.9, 4.0], [-4.0, -2.1, -4.0]])
    inside = p.hyperbola_sample(samples)
    np.testing.assert_array_equal(inside, [1, 1, 0])

    gt = np.array([[0.0], [4.0], [-4.0]])
    assert p.check_gt(gt)
    assert not p.check_gt(gt + 8)

    z = hyperbola_area_sample(samples.T, p.sample_offset, 4.0)
    np.testing.assert_array_equal(z, inside)


def test_check_out_shrinks_to_bounds():
    p = Patch(np.array([30.0, 0.0]), [8.0, 8.0], None)
    p.check_out(np.array([10.0, 10.0]))
    # offsets shrink toward the physical bound, widths halve along the way
    assert p.width_list[0] <= 4.0
    assert p.width_list[1] == 8.0


def test_hyperbola_area_init_points_inside():
    geom = build_geometry(MIC, ROI, grid_size=0.1, grid_size_z=0.1)
    src = np.array([1.0, 0.5, 0.3])
    d = np.linalg.norm(src - MIC, axis=1)
    offs = (d[1:] - d[0]) / SPEED_OF_SOUND * FS
    pts = hyperbola_area_init(geom, offs, 8.0)
    assert pts is not None and pts.shape[0] == 3 and pts.shape[1] > 0
    # all returned points' TDoAs are within the box
    dd = np.linalg.norm(pts.T[:, None, :] - MIC[None], axis=-1)
    po = (dd[:, 1:] - dd[:, :1]) / SPEED_OF_SOUND * FS
    assert np.all(np.abs(po - offs) <= 8.0 / 2 + 1e-6)
    # and the true source is inside the returned area's bounding box
    assert (pts[0].min() - 0.02 <= src[0] <= pts[0].max() + 0.02)
    assert (pts[1].min() - 0.02 <= src[1] <= pts[1].max() + 0.02)

import numpy as np
import pytest

from fastliosam_tpu.postprocess.images import (
    HAS_CV2,
    CameraModel,
    clahe_adjust,
    colorize_cloud,
    decode_compressed,
    detect_exposure,
    fix_overexposure,
    project_clusters_to_image,
)
from fastliosam_tpu.postprocess.plots import (
    plot_trajectory,
    plot_trajectory_3d,
    write_html_map,
)

pytestmark = pytest.mark.skipif(not HAS_CV2, reason="cv2 unavailable")

CAM = CameraModel(
    fx=500.0, fy=500.0, cx=320.0, cy=240.0,
    dist_coeffs=[0.1, -0.05, 0.001, 0.001, 0.01, 0.0, 0.0, 0.0],
    width=640, height=480,
)


def test_undistort_and_project(rng):
    img = (rng.uniform(0, 255, (480, 640, 3))).astype(np.uint8)
    out = CAM.undistort(img)
    assert out.shape == img.shape
    pts = np.array([[0.0, 0.0, 5.0], [1.0, 0.5, 5.0], [0.0, 0.0, -1.0]])
    px, in_front = CAM.project(pts)
    assert in_front.tolist() == [True, True, False]
    np.testing.assert_allclose(px[0], [320.0, 240.0], atol=0.5)
    assert px[1, 0] > 320 and px[1, 1] > 240


def test_exposure_pipeline(rng):
    import cv2

    dark = np.full((100, 100, 3), 20, np.uint8)
    bright = np.full((100, 100, 3), 250, np.uint8)
    normal = (rng.uniform(60, 180, (100, 100, 3))).astype(np.uint8)
    assert detect_exposure(dark) == "under"
    assert detect_exposure(bright) == "over"
    assert detect_exposure(normal) == "ok"
    fixed = fix_overexposure(bright)
    assert fixed.mean() < bright.mean()
    adj = clahe_adjust(normal)
    assert adj.shape == normal.shape
    # jpeg decode roundtrip
    ok, enc = cv2.imencode(".jpg", normal)
    assert ok
    dec = decode_compressed(enc.tobytes())
    assert dec.shape == normal.shape
    # HDR local tone mapping (use_hdr.py capability)
    from fastliosam_tpu.postprocess.images import tonemap_hdr

    hdr = tonemap_hdr(normal)
    assert hdr.shape == normal.shape and hdr.dtype == np.uint8
    assert hdr.std() > 0  # nontrivial output


def test_colorize_and_cluster_projection(rng):
    img = np.zeros((480, 640, 3), np.uint8)
    img[:, :, 2] = 200  # red-ish in BGR
    # points in front of an identity-pose camera (z forward)
    pts = np.column_stack(
        [rng.uniform(-1, 1, 200), rng.uniform(-1, 1, 200), rng.uniform(3, 8, 200)]
    )
    T = np.eye(4)
    rgb, valid = colorize_cloud(pts, img, CAM, T)
    assert valid.mean() > 0.9
    assert np.all(rgb[valid][:, 0] == 200)  # R channel from BGR img
    out, labels = project_clusters_to_image(pts, img, CAM, T, k=3)
    assert out.shape == img.shape
    assert set(np.unique(labels)) <= {0, 1, 2}
    assert (out != img).any()


def test_mrcal_parse(tmp_path):
    text = """{
    'lensmodel': 'LENSMODEL_OPENCV8',
    'intrinsics': ['LENSMODEL_OPENCV8',
        [1421.9, 1421.0, 1018.1, 781.05, 0.1, -0.2, 0.001, 0.002, 0.05, 0.0, 0.0, 0.0]],
    'imagersize': [2048, 1536],
    'extrinsics': [0, 0, 0, 0, 0, 0],
}
"""
    p = tmp_path / "cam.cameramodel"
    p.write_text(text)
    cam = CameraModel.from_mrcal(str(p))
    assert cam.K[0, 0] == 1421.9
    assert len(cam.dist) == 8
    assert cam.width == 2048


def test_plots(tmp_path, rng):
    t = np.linspace(0, 6, 100)
    pos = np.column_stack([np.cos(t) * 10, np.sin(t) * 10, t * 0.1])
    p1 = plot_trajectory(pos, str(tmp_path / "traj.png"), gps_positions=pos[::10])
    p2 = plot_trajectory_3d(pos, str(tmp_path / "traj3d.png"))
    import os

    assert os.path.getsize(p1) > 1000 and os.path.getsize(p2) > 1000
    html = write_html_map(
        22.3 + pos[:, 1] * 1e-5, 114.2 + pos[:, 0] * 1e-5,
        str(tmp_path / "map.html"),
    )
    content = open(html).read()
    assert "leaflet" in content and "polyline" in content.lower()


def test_anonymize_pipeline(rng):
    from fastliosam_tpu.postprocess.images import anonymize_image, blur_regions

    img = (rng.uniform(0, 255, (200, 300, 3))).astype(np.uint8)
    boxes = [(50, 50, 120, 110), (200, 20, 280, 90)]
    out = blur_regions(img, boxes)
    # blurred regions changed, the rest untouched
    assert (out[50:110, 50:120] != img[50:110, 50:120]).any()
    np.testing.assert_array_equal(out[:40, :40], img[:40, :40])

    out2, n = anonymize_image(img, lambda im: boxes)
    assert n == 2
    np.testing.assert_array_equal(out2, out)

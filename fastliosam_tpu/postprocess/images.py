"""Image tooling: undistortion, exposure adaptation, LiDAR-camera fusion.

Capability ports of the reference's image post-processing
(SURVEY.md §2.2): 8-parameter OpenCV undistortion (`undistort_image.py`,
`sensor_recorder.cpp:54-60`), CLAHE / exposure repair
(`exposure_adaption/*`), compressed-image decode
(`decompress_save_images*.py`), LiDAR→camera projection + coloring
(`lidar_projection.cpp`, `colorize_pcd.py`).
"""
from __future__ import annotations

import numpy as np

try:
    import cv2

    HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    HAS_CV2 = False


def _require_cv2():
    if not HAS_CV2:
        raise RuntimeError("OpenCV (cv2) is required for this operation")


class CameraModel:
    """Pinhole + OpenCV 8-parameter distortion (LENSMODEL_OPENCV8, the
    reference's mrcal calibration format `camera_model/opencv8.cameramodel`)."""

    def __init__(self, fx, fy, cx, cy, dist_coeffs, width=None, height=None):
        self.K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
        self.dist = np.asarray(dist_coeffs, np.float64)
        self.width = width
        self.height = height

    @staticmethod
    def from_mrcal(path: str) -> "CameraModel":
        """Parse an mrcal .cameramodel file (a python-literal dict)."""
        import ast

        with open(path) as f:
            text = f.read()
        model = ast.literal_eval(text)
        intr = model["intrinsics"][1]
        fx, fy, cx, cy = intr[:4]
        dist = intr[4:]
        w, h = model.get("imagersize", (None, None))
        return CameraModel(fx, fy, cx, cy, dist, w, h)

    def undistort(self, image: np.ndarray) -> np.ndarray:
        _require_cv2()
        return cv2.undistort(image, self.K, self.dist)

    def project(self, pts_cam: np.ndarray):
        """Camera-frame 3D points -> pixel coords + in-front mask
        (`lidar_projection.cpp:9-34` capability, distortion-aware)."""
        _require_cv2()
        pts = np.asarray(pts_cam, np.float64).reshape(-1, 1, 3)
        in_front = pts[:, 0, 2] > 0.05
        px, _ = cv2.projectPoints(
            pts, np.zeros(3), np.zeros(3), self.K, self.dist
        )
        return px.reshape(-1, 2), in_front


def decode_compressed(data: bytes) -> np.ndarray:
    """JPEG/PNG bytes -> BGR image (sensor_msgs/CompressedImage payload)."""
    _require_cv2()
    return cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)


def clahe_adjust(image: np.ndarray, clip_limit=2.0, tile_grid=(8, 8)) -> np.ndarray:
    """CLAHE on the L channel (`CLAHE_region_adjusted.py` capability)."""
    _require_cv2()
    lab = cv2.cvtColor(image, cv2.COLOR_BGR2LAB)
    l, a, b = cv2.split(lab)
    clahe = cv2.createCLAHE(clipLimit=clip_limit, tileGridSize=tile_grid)
    return cv2.cvtColor(cv2.merge([clahe.apply(l), a, b]), cv2.COLOR_LAB2BGR)


def detect_exposure(image: np.ndarray) -> str:
    """Histogram-based exposure classification (`correct_exposure`
    capability): returns 'under' / 'over' / 'ok'."""
    _require_cv2()
    gray = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
    hist = cv2.calcHist([gray], [0], None, [256], [0, 256]).ravel()
    total = hist.sum()
    dark = hist[:50].sum() / total
    bright = hist[205:].sum() / total
    if bright > 0.25:
        return "over"
    if dark > 0.5:
        return "under"
    return "ok"


def fix_overexposure(image: np.ndarray, v_thresh=235, strength=0.6) -> np.ndarray:
    """Recover over-exposed regions via HSV V-channel compression
    (`solve_overexposure` capability)."""
    _require_cv2()
    hsv = cv2.cvtColor(image, cv2.COLOR_BGR2HSV).astype(np.float32)
    v = hsv[..., 2]
    mask = v > v_thresh
    v[mask] = v_thresh + (v[mask] - v_thresh) * (1.0 - strength)
    hsv[..., 2] = np.clip(v, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


def tonemap_hdr(image: np.ndarray, gamma=2.2, saturation=1.0,
                bias=0.85) -> np.ndarray:
    """Simulated-HDR local tone mapping (`exposure_adaption/use_hdr.py`
    capability): Drago tonemap over the 8-bit input, back to 8-bit."""
    _require_cv2()
    img = image.astype(np.float32) / 255.0
    tm = cv2.createTonemapDrago(gamma=gamma, saturation=saturation, bias=bias)
    out = tm.process(img)
    out = np.nan_to_num(out, nan=0.0, posinf=1.0, neginf=0.0)
    return np.clip(out * 255.0, 0, 255).astype(np.uint8)


def colorize_cloud(
    pts_world: np.ndarray,
    image: np.ndarray,
    cam: CameraModel,
    T_world_cam: np.ndarray,
):
    """Sample image colors for 3D points (`colorize_pcd.py` capability).

    Returns ``(rgb (N,3) uint8, valid mask)``.
    """
    Rwc, twc = T_world_cam[:3, :3], T_world_cam[:3, 3]
    pts_cam = (np.asarray(pts_world) - twc) @ Rwc
    px, in_front = cam.project(pts_cam)
    h, w = image.shape[:2]
    u = np.round(px[:, 0]).astype(int)
    v = np.round(px[:, 1]).astype(int)
    valid = in_front & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    rgb = np.zeros((len(pts_cam), 3), np.uint8)
    bgr = image[v[valid], u[valid]]
    rgb[valid] = bgr[:, ::-1]
    return rgb, valid


def blur_regions(image: np.ndarray, boxes, ksize: int = 41) -> np.ndarray:
    """Gaussian-blur axis-aligned regions ``boxes = [(x0, y0, x1, y1), ...]``
    (pixel coords)."""
    _require_cv2()
    out = image.copy()
    h, w = image.shape[:2]
    k = ksize | 1
    for (x0, y0, x1, y1) in boxes:
        x0, y0 = max(int(x0), 0), max(int(y0), 0)
        x1, y1 = min(int(x1), w), min(int(y1), h)
        if x1 <= x0 or y1 <= y0:
            continue
        out[y0:y1, x0:x1] = cv2.GaussianBlur(out[y0:y1, x0:x1], (k, k), 0)
    return out


def anonymize_image(image: np.ndarray, detector, ksize: int = 41):
    """PII anonymization (the reference's `predict.py` YOLO-for-PII
    capability): run a pluggable ``detector(image) -> [(x0,y0,x1,y1), ...]``
    (e.g. an ultralytics model's boxes) and blur every detection. Returns
    ``(image, n_regions)``. Detector weights are deployment-provided; this
    module only supplies the pipeline."""
    boxes = detector(image)
    return blur_regions(image, boxes, ksize), len(boxes)


def project_clusters_to_image(
    pts_world: np.ndarray,
    image: np.ndarray,
    cam: CameraModel,
    T_world_cam: np.ndarray,
    k: int = 5,
    radius: int = 2,
):
    """K-means cluster the cloud and draw each cluster's projection in a
    distinct color (`lidar_projection.cpp` capability). Returns the
    annotated image copy and the labels."""
    _require_cv2()
    pts32 = np.asarray(pts_world, np.float32)
    _, labels, _ = cv2.kmeans(
        pts32, k, None,
        (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 20, 0.5),
        3, cv2.KMEANS_PP_CENTERS,
    )
    labels = labels.ravel()
    Rwc, twc = T_world_cam[:3, :3], T_world_cam[:3, 3]
    px, in_front = cam.project((pts32 - twc) @ Rwc)
    out = image.copy()
    h, w = image.shape[:2]
    rng = np.random.default_rng(0)
    colors = rng.integers(0, 255, size=(k, 3))
    for i in range(len(pts32)):
        if not in_front[i]:
            continue
        u, v = int(round(px[i, 0])), int(round(px[i, 1]))
        if 0 <= u < w and 0 <= v < h:
            cv2.circle(out, (u, v), radius, tuple(int(c) for c in colors[labels[i]]), -1)
    return out, labels

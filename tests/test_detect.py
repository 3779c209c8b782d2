"""YOLO-style PII detection pipeline (reference post_process/predict.py).

Validates the full path ultralytics provided in the reference — letterbox,
anchor-free v8/v11 head decode, class-aware NMS, conf/class filtering,
box rescaling, directory runner — against synthetic heads with known
ground truth (no pretrained weights exist in this image)."""

import numpy as np
import pytest

from fastliosam_tpu.postprocess.detect import (
    YoloDetector,
    decode_yolo,
    letterbox,
    nms,
    predict_directory,
    scale_boxes,
    to_chw,
)
from fastliosam_tpu.postprocess.images import HAS_CV2


def _head(rows, n_anchors=64, nc=3):
    """Build a (1, 4+nc, N) raw head: rows = [(cx, cy, w, h, cls, score)]."""
    p = np.zeros((4 + nc, n_anchors), np.float32)
    for i, (cx, cy, w, h, c, s) in enumerate(rows):
        p[:4, i] = (cx, cy, w, h)
        p[4 + c, i] = s
    return p[None]


def test_decode_conf_and_class_filter():
    raw = _head([
        (100, 100, 40, 40, 0, 0.9),   # kept
        (300, 300, 40, 40, 1, 0.5),   # kept
        (500, 500, 40, 40, 2, 0.9),   # dropped: class filter
        (200, 200, 40, 40, 0, 0.05),  # dropped: below conf
    ])
    boxes, scores, cls = decode_yolo(raw, conf=0.1, classes=[0, 1])
    assert len(boxes) == 2
    assert set(cls.tolist()) == {0, 1}
    i = int(np.argmax(scores))
    np.testing.assert_allclose(boxes[i], [80, 80, 120, 120], atol=1e-5)


def test_decode_accepts_transposed_layout():
    raw = _head([(64, 64, 16, 16, 0, 0.8)])
    b1, s1, c1 = decode_yolo(raw, conf=0.25)
    b2, s2, c2 = decode_yolo(np.swapaxes(raw, 1, 2), conf=0.25)
    np.testing.assert_allclose(b1, b2)
    np.testing.assert_allclose(s1, s2)
    np.testing.assert_array_equal(c1, c2)


def test_nms_suppresses_overlaps_keeps_distinct():
    boxes = np.array([
        [0, 0, 100, 100],
        [5, 5, 105, 105],     # IoU ~0.82 with first -> suppressed
        [200, 200, 300, 300],
    ], np.float32)
    keep = nms(boxes, np.array([0.9, 0.8, 0.7], np.float32), iou_thresh=0.45)
    assert sorted(keep.tolist()) == [0, 2]


def test_nms_is_class_aware_in_decode():
    # identical box, two classes, both above conf: class-aware NMS keeps both
    raw = _head([(100, 100, 50, 50, 0, 0.9), (100, 100, 50, 50, 1, 0.8)])
    boxes, _, cls = decode_yolo(raw, conf=0.25)
    assert len(boxes) == 2 and set(cls.tolist()) == {0, 1}


def test_scale_boxes_roundtrip():
    boxes = np.array([[50, 60, 150, 160]], np.float32)
    scale, pad = 0.5, (20.0, 8.0)
    fwd = boxes * scale
    fwd[:, [0, 2]] += pad[0]
    fwd[:, [1, 3]] += pad[1]
    np.testing.assert_allclose(scale_boxes(fwd, scale, pad), boxes, atol=1e-4)


@pytest.mark.skipif(not HAS_CV2, reason="cv2 unavailable")
def test_letterbox_geometry(rng):
    img = rng.uniform(0, 255, (480, 640, 3)).astype(np.uint8)
    padded, scale, (dx, dy) = letterbox(img, 640)
    assert padded.shape == (640, 640, 3)
    assert scale == pytest.approx(1.0)
    assert dx == 0 and dy == 80
    assert (padded[:80] == 114).all() and (padded[-80:] == 114).all()
    x = to_chw(padded)
    assert x.shape == (1, 3, 640, 640) and x.dtype == np.float32
    assert 0.0 <= x.min() and x.max() <= 1.0


@pytest.mark.skipif(not HAS_CV2, reason="cv2 unavailable")
def test_detector_end_to_end_and_directory(tmp_path, rng):
    # synthetic backend: one detection at letterboxed (320, 320) size 100
    def model(x):
        assert x.shape == (1, 3, 640, 640)
        return _head([(320, 320, 100, 100, 0, 0.9)])

    det = YoloDetector(model, imgsz=640, conf=0.25, classes=[0, 1])
    img = rng.uniform(0, 255, (480, 640, 3)).astype(np.uint8)
    boxes, scores, cls = det(img)
    # letterbox of 640x480 at scale 1 pads 80 rows top: y maps back -80
    np.testing.assert_allclose(boxes[0], [270, 190, 370, 290], atol=1.0)
    assert cls[0] == 0 and scores[0] == pytest.approx(0.9, abs=1e-5)

    import cv2
    src, out = tmp_path / "src", tmp_path / "out"
    src.mkdir()
    cv2.imwrite(str(src / "a.png"), img)
    cv2.imwrite(str(src / "b.png"), img)
    manifest = predict_directory(str(src), str(out), det, mode="blur")
    assert set(manifest) == {"a.png", "b.png"}
    assert len(manifest["a.png"]) == 1
    assert (out / "a.png").exists() and (out / "detections.json").exists()
    # blur actually changed pixels inside the box and nowhere outside
    blurred = cv2.imread(str(out / "a.png"))
    x0, y0, x1, y1 = (int(v) for v in boxes[0])
    assert (blurred[y0 + 5:y1 - 5, x0 + 5:x1 - 5]
            != img[y0 + 5:y1 - 5, x0 + 5:x1 - 5]).any()
    np.testing.assert_array_equal(blurred[:y0 - 1], img[:y0 - 1])


def test_torchscript_backend(tmp_path):
    torch = pytest.importorskip("torch")

    class Head(torch.nn.Module):
        def forward(self, x):
            out = torch.zeros(1, 7, 16)
            out[0, :4, 0] = torch.tensor([64.0, 64.0, 32.0, 32.0])
            out[0, 4, 0] = 0.75
            return out

    path = tmp_path / "head.pt"
    torch.jit.script(Head()).save(str(path))
    det = YoloDetector(str(path), imgsz=64, conf=0.25)
    if not HAS_CV2:
        raw = det.model(np.zeros((1, 3, 64, 64), np.float32))
        boxes, scores, cls = decode_yolo(raw, conf=0.25)
    else:
        boxes, scores, cls = det(np.zeros((64, 64, 3), np.uint8))
    assert len(boxes) == 1 and cls[0] == 0
    assert scores[0] == pytest.approx(0.75, abs=1e-5)

#!/usr/bin/env python3
"""PII detection / anonymization over a directory of rectified images —
the reference `post_process/predict.py` entry point (ultralytics YOLOv11x,
conf=0.01, classes=[0,1], save to project/name). Weights are supplied as a
TorchScript module; the pipeline (letterbox, decode, NMS, blur/annotate)
is fastliosam_tpu.postprocess.detect.

Example:
  python scripts/anonymize.py --source rectified_image/ \
      --project yolo_results --name predict_run \
      --model best.torchscript --conf 0.01 --classes 0 1 --mode blur
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True, help="input image directory")
    ap.add_argument("--project", default="yolo_results")
    ap.add_argument("--name", default="predict_run")
    ap.add_argument("--model", required=True,
                    help="TorchScript detector (CPU)")
    ap.add_argument("--conf", type=float, default=0.01)
    ap.add_argument("--iou", type=float, default=0.45)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--classes", type=int, nargs="*", default=[0, 1])
    ap.add_argument("--mode", choices=("annotate", "blur"),
                    default="annotate")
    args = ap.parse_args()

    from fastliosam_tpu.postprocess.detect import (YoloDetector,
                                                   predict_directory)

    det = YoloDetector(args.model, imgsz=args.imgsz, conf=args.conf,
                       iou=args.iou, classes=args.classes or None)
    out_dir = os.path.join(args.project, args.name)
    manifest = predict_directory(args.source, out_dir, det, mode=args.mode)
    n = sum(len(v) for v in manifest.values())
    print(f"{len(manifest)} images -> {out_dir} ({n} detections)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Video multi-object tracking demo (parity with reference onnx_tracking.py:1-133).

Runs the Predictor + KalmanSortTracker over a video (file or camera index),
draws track IDs and FPS overlay, optionally writes the annotated video.

    python tools/tracker.py --weights best.ckpt --video input.mp4 --out out.mp4
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--video", required=True, help="video path or camera index")
    ap.add_argument("--out", default=None, help="output video path")
    ap.add_argument("--conf", type=float, default=0.35)
    ap.add_argument("--iou", type=float, default=0.45)
    ap.add_argument("--track_iou", type=float, default=0.3)
    ap.add_argument("--max_age", type=int, default=15)
    ap.add_argument("--min_hits", type=int, default=2)
    ap.add_argument("--max_frames", type=int, default=0, help="0 = all")
    ap.add_argument("--show", action="store_true")
    args = ap.parse_args()

    import cv2
    from yololite_tpu.deploy.predictor import Predictor
    from yololite_tpu.track import KalmanSortTracker
    from yololite_tpu.utils.viz import class_color

    src = int(args.video) if args.video.isdigit() else args.video
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        raise SystemExit(f"Cannot open video source {args.video}")

    pred = Predictor(args.weights)
    pred.warmup(conf=args.conf, iou=args.iou)
    tracker = KalmanSortTracker(iou_threshold=args.track_iou,
                                max_age=args.max_age, min_hits=args.min_hits)

    def frames():
        k = 0
        while True:
            ok, f = cap.read()
            if not ok or (args.max_frames and k >= args.max_frames):
                return
            k += 1
            yield f

    writer = None
    n, t0 = 0, time.perf_counter()
    fps = 0.0
    # streaming pipeline: keeps 2 device calls in flight so host decode/
    # preprocess overlaps TPU compute (Predictor.infer_stream). Results come
    # back in order; the result dict has no frame, so re-pair via a queue.
    from collections import deque
    pending = deque()

    def paired_stream():
        for f in frames():
            pending.append(f)
            yield f

    for res in pred.infer_stream(paired_stream(), conf=args.conf,
                                 iou=args.iou):
        frame = pending.popleft()
        boxes, scores, classes = res["boxes"], res["scores"], res["classes"]
        tracks = tracker.update(boxes, scores, classes)
        for t in tracks:
            x1, y1, x2, y2 = [int(v) for v in t["bbox"]]
            color = class_color(t["cls"])
            cv2.rectangle(frame, (x1, y1), (x2, y2), color, 2)
            cv2.putText(frame, f"#{t['track_id']} c{t['cls']} {t['score']:.2f}",
                        (x1, max(12, y1 - 6)), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                        color, 1)
        n += 1
        if n % 10 == 0:
            fps = n / (time.perf_counter() - t0)
        cv2.putText(frame, f"FPS {fps:.1f}", (8, 24),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 255, 0), 2)
        if args.out:
            if writer is None:
                h, w = frame.shape[:2]
                writer = cv2.VideoWriter(args.out,
                                         cv2.VideoWriter_fourcc(*"mp4v"),
                                         cap.get(cv2.CAP_PROP_FPS) or 30, (w, h))
            writer.write(frame)
        if args.show:
            cv2.imshow("yololite-tpu tracking", frame)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
    cap.release()
    if writer:
        writer.release()
    print(f"Processed {n} frames @ {fps:.1f} FPS"
          + (f" -> {args.out}" if args.out else ""))


if __name__ == "__main__":
    main()

"""HTTP object-detection service.

Equivalent of the reference's Flask REST API (utils/flask_rest_api/
restapi.py:13-76) on the stdlib http.server (flask isn't in this image).

  POST /v1/object-detection/<model>   body: raw image bytes or multipart
  -> JSON [{xmin, ymin, xmax, ymax, confidence, class, name}, ...]

Optional API key: start with api_key=...; clients send X-API-Key. Upload
validation mirrors the reference: extension allow-list + size cap.
"""

from __future__ import annotations

import json
import re
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

ALLOWED_EXT = {"jpg", "jpeg", "png", "bmp", "webp", "tif", "tiff"}
MAX_BYTES = 25 * 1024 * 1024


def detections_to_records(rows, names):
    out = []
    for x1, y1, x2, y2, conf, cls, *rest in rows:
        out.append({
            "xmin": float(x1), "ymin": float(y1),
            "xmax": float(x2), "ymax": float(y2),
            "confidence": float(conf), "class": int(cls),
            "name": str(names.get(int(cls), int(cls))),
        })
    return out


def _extract_image_bytes(handler: BaseHTTPRequestHandler):
    """Raw body or the first file part of a multipart form."""
    length = int(handler.headers.get("Content-Length", 0))
    if length <= 0 or length > MAX_BYTES:
        return None, "missing or oversized body"
    body = handler.rfile.read(length)
    ctype = handler.headers.get("Content-Type", "")
    if ctype.startswith("multipart/form-data"):
        m = re.search(r'boundary="?([^";]+)"?', ctype)
        if not m:
            return None, "bad multipart boundary"
        boundary = m.group(1).encode()
        for part in body.split(b"--" + boundary):
            if b"filename=" not in part:
                continue
            header, _, content = part.partition(b"\r\n\r\n")
            fn = re.search(rb'filename="([^"]*)"', header)
            if fn:
                ext = fn.group(1).rsplit(b".", 1)[-1].decode().lower()
                if ext not in ALLOWED_EXT:
                    return None, f"extension .{ext} not allowed"
            return content.rstrip(b"\r\n"), None
        return None, "no file part"
    return body, None


def make_handler(detectors: dict, api_key: str | None, conf_thres: float):
    import cv2

    from yolov5_tpu.data.letterbox import letterbox
    from yolov5_tpu.infer import scale_boxes_np
    from yolov5_tpu.ops.nms import detections_to_numpy

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code, payload):
            data = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True, "models": sorted(detectors)})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if api_key and self.headers.get("X-API-Key") != api_key:
                return self._reply(401, {"error": "invalid api key"})
            m = re.match(r"^/v1/object-detection/([\w.-]+)$", self.path)
            if not m or m.group(1) not in detectors:
                return self._reply(404, {"error": f"unknown model; have {sorted(detectors)}"})
            det = detectors[m.group(1)]
            raw, err = _extract_image_bytes(self)
            if err:
                return self._reply(400, {"error": err})
            im0 = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
            if im0 is None:
                return self._reply(400, {"error": "undecodable image"})
            im, _, _ = letterbox(im0, det.imgsz)
            d = det(im[..., ::-1][None].copy(), conf_thres=conf_thres)
            rows = detections_to_numpy(d)[0]
            if len(rows):
                rows[:, :4] = scale_boxes_np(im.shape[:2], rows[:, :4], im0.shape[:2])
            self._reply(200, detections_to_records(rows, det.names))

    return Handler


def run(weights="", cfg="yolov5s", models=None, host="0.0.0.0", port=5000,
        imgsz=640, conf_thres=0.25, api_key=None):
    """Serve one or more detectors. `models` maps name -> weights path."""
    from yolov5_tpu.infer import Detector

    specs = models or {"yolov5s": weights}
    detectors = {}
    for name, w in specs.items():
        det = Detector(w, cfg=cfg if len(specs) == 1 else name, imgsz=imgsz)
        det.warmup()
        detectors[name] = det
    server = ThreadingHTTPServer((host, port),
                                 make_handler(detectors, api_key, conf_thres))
    print(f"serving {sorted(detectors)} on http://{host}:{port}")
    server.serve_forever()


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="REST detection API "
                                "(reference utils/flask_rest_api)")
    p.add_argument("--weights", default="")
    p.add_argument("--cfg", default="yolov5s")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=5000)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--api-key", default=None)
    a = p.parse_args()
    run(weights=a.weights, cfg=a.cfg, host=a.host, port=a.port,
        imgsz=a.imgsz, conf_thres=a.conf_thres, api_key=a.api_key)

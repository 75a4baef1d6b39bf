"""Minimal REST client for yolov5_tpu.serve (the reference's
utils/flask_rest_api/example_request.py). Sends one image as multipart
form data — the filename matters, the server checks its extension."""

import argparse
import json
import urllib.request
import uuid

def detect(url, image_path, api_key=None):
    boundary = uuid.uuid4().hex
    with open(image_path, "rb") as f:
        payload = f.read()
    name = image_path.rsplit("/", 1)[-1]
    body = (
        f"--{boundary}\r\nContent-Disposition: form-data; name=\"image\"; "
        f"filename=\"{name}\"\r\nContent-Type: application/octet-stream\r\n\r\n"
    ).encode() + payload + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(url, data=body, method="POST")
    req.add_header("Content-Type", f"multipart/form-data; boundary={boundary}")
    if api_key:
        req.add_header("x-api-key", api_key)
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("image")
    p.add_argument("--url", default="http://localhost:5000/v1/object-detection/yolov5s")
    p.add_argument("--api-key", default=None)
    a = p.parse_args()
    print(json.dumps(detect(a.url, a.image, a.api_key), indent=2))

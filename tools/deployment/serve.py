"""Minimal HTTP inference server (the reference ships a TorchServe handler,
``tools/deployment/mmrotate_handler.py``; this is the equivalent shim:
base64/raw image in -> JSON detections out).

    python tools/deployment/serve.py <config> [ckpt] --port 8080
    curl -X POST --data-binary @image.png localhost:8080/predict
"""
import argparse
import base64
import json
import os.path as osp
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

try:  # prefer the installed package; fall back to the checkout
    import orientedobjectdetection_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--port', type=int, default=8080)
    p.add_argument('--score-thr', type=float, default=0.3)
    args = p.parse_args()

    import cv2
    from orientedobjectdetection_tpu.apis.inference import (
        inference_detector, init_detector)
    from orientedobjectdetection_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    bundle = init_detector(cfg, args.checkpoint)
    score_thr = args.score_thr

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            length = int(self.headers.get('Content-Length', 0))
            body = self.rfile.read(length)
            try:
                body = base64.b64decode(body, validate=True)
            except Exception:
                pass
            img = cv2.imdecode(np.frombuffer(body, np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                self.send_response(400)
                self.end_headers()
                self.wfile.write(b'{"error": "bad image"}')
                return
            result = inference_detector(bundle, img)
            out = []
            for cls, dets in enumerate(result):
                for d in np.asarray(dets).reshape(-1, 6):
                    if d[5] >= score_thr:
                        out.append(dict(
                            class_id=int(cls),
                            bbox=[float(v) for v in d[:5]],
                            score=float(d[5])))
            payload = json.dumps(out).encode()
            self.send_response(200)
            self.send_header('Content-Type', 'application/json')
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    print(f'serving on :{args.port}')
    HTTPServer(('0.0.0.0', args.port), Handler).serve_forever()


if __name__ == '__main__':
    main()

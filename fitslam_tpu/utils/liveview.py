"""Live run inspection over HTTP (reference: RViz panel + marker topics).

The reference is watched live through RViz — continuous marker topics
(RosVisualizer, SURVEY.md §2.3 E20) and a pause/play control panel
(frontier_exploration_rviz_plugin/src/panel.cpp:19-60 publishing
/exploration_state). This module closes VERDICT r04 missing #3 with a
zero-dependency equivalent: a daemon-thread HTTP server that renders the
ArtifactRecorder's latest snapshots on demand.

Endpoints:
    /            auto-refreshing HTML status page with the live map view
    /map.png     latest occupancy composite (robot / frontiers / plan)
    /status.json run status (tick counters, pose, coverage, state)
    /pause, /resume   POST — the panel's pause/play buttons

PNG encoding is stdlib-only (zlib + struct), so the page works from a cold
checkout with no imaging library. Everything renders from host-side numpy
snapshots already held by the recorder — the device is never touched from
the serving thread.
"""

from __future__ import annotations

import json
import struct
import threading
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np

from fitslam_tpu.ops.grid import UNKNOWN


def encode_png(rgb: np.ndarray) -> bytes:
    """Minimal RGB8 PNG encoder (stdlib only)."""
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[i].tobytes() for i in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def compose_map_image(occ, robot_cell=None, frontier_cells=None,
                      path_cells=None, scale: int = 3) -> np.ndarray:
    """Occupancy + overlays -> upscaled RGB array (same palette as
    viz.render_world_ppm)."""
    g = np.asarray(occ)
    base = np.where(g == UNKNOWN, 128,
                    np.clip(255 - g.astype(np.int32), 0, 255)).astype(np.uint8)
    img = np.stack([base] * 3, axis=-1)

    def paint(cells, color, rad=0):
        if cells is None:
            return
        cells = np.asarray(cells).reshape(-1, 2).astype(int)
        for dx in range(-rad, rad + 1):
            for dy in range(-rad, rad + 1):
                xs = np.clip(cells[:, 0] + dx, 0, g.shape[1] - 1)
                ys = np.clip(cells[:, 1] + dy, 0, g.shape[0] - 1)
                img[ys, xs] = color

    paint(frontier_cells, (230, 0, 0))
    paint(path_cells, (0, 80, 230))
    if robot_cell is not None:
        paint(np.array([robot_cell]), (255, 220, 0), rad=1)
    img = img[::-1]
    if scale > 1:
        img = np.repeat(np.repeat(img, scale, 0), scale, 1)
    return img


_PAGE = """<!doctype html>
<title>fitslam_tpu live</title>
<meta http-equiv="refresh" content="1">
<body style="font-family:monospace;background:#111;color:#ddd">
<h3>fitslam_tpu live view</h3>
<img src="/map.png" style="image-rendering:pixelated;border:1px solid #444">
<pre id="s">%s</pre>
<form method="post" action="/pause" style="display:inline">
<button>pause</button></form>
<form method="post" action="/resume" style="display:inline">
<button>resume</button></form>
</body>"""


class LiveView:
    """Serve the recorder's latest state; start() returns the bound port."""

    def __init__(self, recorder, get_status: Optional[Callable[[], dict]] = None,
                 on_pause: Optional[Callable] = None,
                 on_resume: Optional[Callable] = None,
                 host: str = "127.0.0.1", port: int = 0):
        self.recorder = recorder
        self.get_status = get_status or (lambda: {})
        self.on_pause = on_pause
        self.on_resume = on_resume
        self._host, self._port = host, port
        self._server: Optional[ThreadingHTTPServer] = None

    # latest-snapshot pulls (all host-side numpy)
    def _map_png(self) -> bytes:
        rec = self.recorder
        occ = rec.latest("occupancy")
        if occ is None:
            occ = np.full((8, 8), UNKNOWN, np.uint8)
        img = compose_map_image(
            occ,
            robot_cell=rec.latest("robot_cell"),
            frontier_cells=rec.latest("frontier_cells"),
            path_cells=rec.latest("path_cells"),
        )
        return encode_png(np.ascontiguousarray(img))

    def _status(self) -> dict:
        s = dict(self.get_status())
        if self.recorder._coverage:
            t, known, frac = self.recorder._coverage[-1]
            s["coverage_fraction"] = round(frac, 4)
        return s

    def start(self) -> int:
        view = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):   # quiet
                pass

            def _send(self, code, ctype, body: bytes):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path.startswith("/map.png"):
                    self._send(200, "image/png", view._map_png())
                elif self.path.startswith("/status.json"):
                    self._send(200, "application/json",
                               json.dumps(view._status()).encode())
                else:
                    page = _PAGE % json.dumps(view._status(), indent=1)
                    self._send(200, "text/html", page.encode())

            def do_POST(self):
                if self.path.startswith("/pause") and view.on_pause:
                    view.on_pause()
                elif self.path.startswith("/resume") and view.on_resume:
                    view.on_resume()
                self.send_response(303)
                self.send_header("Location", "/")
                self.end_headers()

        self._server = ThreadingHTTPServer((self._host, self._port), Handler)
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return self._server.server_address[1]

    def stop(self):
        if self._server is not None:
            self._server.shutdown()
            self._server = None

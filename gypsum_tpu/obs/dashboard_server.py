"""Standalone web dashboard server (separate process, stdlib only).

Reference parity: the web_dashboard gunicorn/falcon app (reference:
web_dashboard/__init__.py, receiver_dashboard.py) — the receiver process
POSTs its state as JSON and browsers poll rendered views. This version uses
only the standard library (ThreadingHTTPServer), exposes the raw state at
/state.json, and renders a self-refreshing HTML overview with per-satellite
tracker figures (base64 PNGs, like the reference's double-buffered iframes).

Run:  python -m gypsum_tpu.obs.dashboard_server [--port 8080]
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_state_lock = threading.Lock()
_state: dict | None = None


def _render_html() -> str:
    with _state_lock:
        state = _state
    if state is None:
        body = "<p>Waiting for a receiver to connect…</p>"
    else:
        metrics = state.get("metrics", {})
        rows = []
        for prn, ch in sorted(metrics.get("channels", {}).items(), key=lambda kv: int(kv[0])):
            locked = "LOCKED" if ch.get("locked") else "pull-in"
            rows.append(
                f"<tr><td>PRN {prn}</td><td>{ch.get('doppler_hz', 0):+.1f} Hz</td>"
                f"<td>{ch.get('quality', 0):.2f}</td><td>{locked}</td>"
                f"<td>{ch.get('code_phase', 0):.1f}</td></tr>"
            )
        fix = metrics.get("last_fix")
        fix_html = (
            f"<p><b>Last fix:</b> {fix['lat_deg']:.6f}, {fix['lon_deg']:.6f}, "
            f"{fix['alt_m']:.0f} m (bias {fix['clock_bias_s'] * 1e6:.2f} µs, "
            f"SVs {fix['satellites']})</p>"
            if fix
            else "<p><b>Last fix:</b> none yet</p>"
        )
        figures = "".join(
            f'<div><h3>PRN {prn}</h3><img src="data:image/png;base64,{png}"/></div>'
            for prn, png in state.get("figures", {}).items()
        )
        body = f"""
        <p><b>Signal time:</b> {metrics.get('signal_seconds', 0):.1f} s ·
           <b>Throughput:</b> {metrics.get('msamples_per_sec', 0):.2f} Msps
           ({metrics.get('realtime_factor', 0):.2f}× realtime) ·
           <b>Subframes:</b> {metrics.get('subframes', 0)} ·
           <b>Fixes:</b> {metrics.get('fixes', 0)}</p>
        {fix_html}
        <table border=1 cellpadding=4>
          <tr><th>SV</th><th>Doppler</th><th>Quality</th><th>State</th><th>Code phase</th></tr>
          {''.join(rows)}
        </table>
        <p><b>Eligible for acquisition:</b> {state.get('eligible_prns', [])}</p>
        {figures}
        """
    return (
        "<html><head><title>gypsum_tpu dashboard</title>"
        '<meta http-equiv="refresh" content="1"></head>'
        f"<body><h1>gypsum_tpu receiver</h1>{body}</body></html>"
    )


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):  # quiet
        pass

    def _send(self, code: int, content: bytes, ctype: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(content)))
        self.end_headers()
        self.wfile.write(content)

    def do_GET(self):
        if self.path == "/state.json":
            with _state_lock:
                payload = json.dumps(_state or {}).encode()
            self._send(200, payload, "application/json")
        else:
            self._send(200, _render_html().encode(), "text/html")

    def do_POST(self):
        global _state
        length = int(self.headers.get("Content-Length", 0))
        try:
            data = json.loads(self.rfile.read(length))
        except json.JSONDecodeError:
            self._send(400, b"bad json", "text/plain")
            return
        with _state_lock:
            _state = data
        self._send(200, b"ok", "text/plain")


def serve(port: int = 8080) -> None:
    server = ThreadingHTTPServer(("0.0.0.0", port), _Handler)
    print(f"gypsum_tpu dashboard on http://0.0.0.0:{port}/")
    server.serve_forever()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=8080)
    serve(parser.parse_args().port)


if __name__ == "__main__":
    main()

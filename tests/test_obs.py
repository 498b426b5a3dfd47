"""Observability tests: metrics registry, dashboard server/client loop,
tracker visualizer rendering."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from gypsum_tpu.core.config import ObservabilityConfig, ReceiverConfig, TrackingConfig
from gypsum_tpu.io.sources import ArraySampleSource
from gypsum_tpu.obs.dashboard_client import DashboardClient
from gypsum_tpu.obs.metrics import ReceiverMetrics
from gypsum_tpu.obs.visualizer import TrackerVisualizer
from gypsum_tpu.runtime.receiver import Receiver
from gypsum_tpu.signal.synth import SyntheticSatellite, synthesize_iq

FS = 2.046e6
L = 2046


@pytest.fixture(scope="module")
def short_run():
    """A 3 s single-SV receiver run shared by the observability tests."""
    sat = SyntheticSatellite(prn=25, doppler_hz=900.0, delay_samples=400, amplitude=0.25)
    iq = synthesize_iq([sat], 3000 * L, FS, noise_sigma=0.3, seed=5)
    cfg = ReceiverConfig(tracking=TrackingConfig(block_size_ms=500))
    return iq, cfg


def test_metrics_listener(short_run):
    iq, cfg = short_run
    recv = Receiver(ArraySampleSource(iq, FS), cfg)
    metrics = ReceiverMetrics()
    recv.add_block_listener(metrics.on_block)
    recv.run()
    snap = metrics.snapshot()
    assert snap["signal_seconds"] == pytest.approx(3.0)
    assert snap["blocks"] == 6
    assert snap["acquisitions"] >= 1
    assert "25" in snap["channels"] or 25 in snap["channels"]
    ch = snap["channels"][25]
    assert abs(ch["doppler_hz"] - 900.0) < 10
    assert metrics.msamples_per_sec > 0
    assert "Msps" in metrics.summary_line()


def test_visualizer_renders_png(short_run):
    pytest.importorskip("matplotlib")
    iq, cfg = short_run
    recv = Receiver(ArraySampleSource(iq, FS), cfg)
    vis = TrackerVisualizer(render_period_s=1.0)
    recv.add_block_listener(vis.on_block)
    recv.run(max_seconds=2.0)
    assert 25 in vis.rendered_png_base64
    import base64

    png = base64.b64decode(vis.rendered_png_base64[25])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_dashboard_server_and_client_loop(short_run):
    from gypsum_tpu.obs import dashboard_server

    server = dashboard_server.ThreadingHTTPServer(("127.0.0.1", 0), dashboard_server._Handler)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        iq, cfg = short_run
        obs_cfg = ObservabilityConfig(
            dashboard_url=f"http://127.0.0.1:{port}/", dashboard_scan_period_s=0.0
        )
        recv = Receiver(ArraySampleSource(iq, FS), cfg)
        client = DashboardClient(obs_cfg)
        recv.add_block_listener(client.on_block)
        recv.run(max_seconds=2.0)
        assert client._connected

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/state.json") as resp:
            state = json.loads(resp.read())
        assert state["metrics"]["blocks"] >= 1
        assert 25 in state["tracked_prns"]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as resp:
            html = resp.read().decode()
        assert "gypsum_tpu" in html and "initPanel" in html  # double-buffered panels
        for route, needle in [
            ("satellite_infos", "PRN 25"),
            ("receiver_stats", "Signal time"),
            ("tracker_visualizers", "<body>"),
        ]:
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/{route}") as resp:
                assert needle in resp.read().decode()
    finally:
        server.shutdown()


def test_visualizer_renders_sbas_channel():
    # An SBAS channel has no bit integrator / subframe decoder; the figure
    # must render its frame-sync / MT9 tiles instead of crashing on None.
    pytest.importorskip("matplotlib")
    rng = np.random.default_rng(4)
    symbols = (rng.integers(0, 2, size=750) * 2 - 1).astype(np.int8)
    sat = SyntheticSatellite(prn=120, doppler_hz=-25.0, delay_samples=300,
                             amplitude=0.25, nav_bits=symbols, symbol_periods=2)
    iq = synthesize_iq([sat], 3000 * L, FS, noise_sigma=0.3, seed=6)
    cfg = ReceiverConfig(tracking=TrackingConfig(block_size_ms=500))
    recv = Receiver(ArraySampleSource(iq, FS), cfg, eligible_prns=[120])
    vis = TrackerVisualizer(render_period_s=1.0)
    recv.add_block_listener(vis.on_block)
    recv.run(max_seconds=2.5)
    assert 120 in vis.rendered_png_base64
    import base64

    png = base64.b64decode(vis.rendered_png_base64[120])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"

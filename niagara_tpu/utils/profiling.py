"""Profiling: named frame spans + EWMA frame-time tracking.

Role of the reference's fixed-slot GPU timestamp pools and HUD statistics
(niagara.cpp:764-775, 1960-2010, 2048-2066).  The whole TPU frame is one XLA
program, so per-pass device times come from either (a) wall-clocking staged
sub-programs (`StageTimer`, used by bench --breakdown) or (b) jax.profiler
traces (`trace` context).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class Ewma:
    """EWMA with the reference's 0.95/0.05 blend (niagara.cpp:2060)."""

    value: float = 0.0
    initialized: bool = False

    def update(self, sample: float) -> float:
        if not self.initialized:
            self.value = sample
            self.initialized = True
        else:
            self.value = self.value * 0.95 + sample * 0.05
        return self.value


@dataclass
class FrameProfiler:
    """Tracks per-frame wall time + named span EWMAs; formats a HUD-style
    report (reference HUD mode 2, niagara.cpp:1962-2010)."""

    frame: Ewma = field(default_factory=Ewma)
    spans: dict = field(default_factory=dict)
    _t0: float = 0.0

    def begin_frame(self):
        self._t0 = time.perf_counter()

    def end_frame(self) -> float:
        dt = (time.perf_counter() - self._t0) * 1000.0
        return self.frame.update(dt)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = (time.perf_counter() - t0) * 1000.0
            self.spans.setdefault(name, Ewma()).update(dt)

    def report(self, stats=None, triangles: int | None = None) -> str:
        lines = [f"frame: {self.frame.value:.3f} ms"]
        for name, e in self.spans.items():
            lines.append(f"  {name}: {e.value:.3f} ms")
        if stats is not None:
            lines.append(
                "  commands E/L: %d/%d; clusters E/L: %d/%d; visible draws: %d"
                % (
                    int(stats.early_commands),
                    int(stats.late_commands),
                    int(stats.early_clusters),
                    int(stats.late_clusters),
                    int(stats.visible_draws),
                )
            )
            drops = (
                int(stats.cmd_dropped),
                int(stats.cluster_dropped),
                int(stats.tri_dropped),
                int(stats.pair_dropped),
            )
            if any(drops):
                lines.append(
                    "  DROPPED cmd/cluster/tri/pair: %d/%d/%d/%d" % drops
                )
        if triangles is not None and self.frame.value > 0:
            tri_s = triangles / (self.frame.value * 1e-3)
            lines.append(f"  {triangles/1e6:.2f}M tri; {tri_s/1e9:.1f}B tri/sec")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/niagara_tpu_trace"):
    """jax.profiler trace capture around a block (open with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()

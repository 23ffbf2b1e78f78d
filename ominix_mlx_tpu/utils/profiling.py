"""Tracing/profiling utilities.

Counterpart of the reference's observability layer (SURVEY.md §5.1):
``tracing`` spans + per-stage timing structs (qwen3-tts SynthesisTiming
lib.rs:87, GenerationTiming generate.rs:33) and tok/s prints. On TPU the
deep tool is ``jax.profiler`` traces; these helpers add the lightweight
per-stage layer. NOTE (this environment): device work must be synced with a
value fetch — block_until_ready is unreliable through the axon tunnel.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, Optional

import jax


@dataclasses.dataclass
class StageTimings:
    """Per-stage wall times, reference SynthesisTiming-style."""
    stages: Dict[str, float] = dataclasses.field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, sync: Optional[jax.Array] = None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.stages.values())
        lines = [f"  {k}: {v * 1e3:.1f} ms" for k, v in self.stages.items()]
        return "\n".join(lines + [f"  total: {total * 1e3:.1f} ms"])


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace scope (inspect with TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def realtime_factor(audio_seconds: float, wall_seconds: float) -> float:
    """RTF as the reference reports it: processing_time / audio_duration
    (<1 is faster than real time)."""
    return wall_seconds / max(audio_seconds, 1e-9)

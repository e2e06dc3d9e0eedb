"""Observability + debugging utilities.

The reference has no tracing/profiling or sanitizers (SURVEY.md §5) —
only wall-clock prints and inline NaN asserts that break under jit. Here:

- profiling: jax.profiler trace context + per-step timing,
- debug: checkify-based NaN/Inf guards that survive jit, gated by env
  var so the hot path pays nothing by default,
- seeding: one helper for (numpy rng, jax key) pairs.
"""

from .profiling import trace_context, StepTimer
from .debug import nan_check, checkify_wrap, debug_enabled
from .seeding import seed_everything

__all__ = [
    "trace_context",
    "StepTimer",
    "nan_check",
    "checkify_wrap",
    "debug_enabled",
    "seed_everything",
]

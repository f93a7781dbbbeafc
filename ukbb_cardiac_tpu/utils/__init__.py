"""Utilities: structured timing, device tracing."""

from ukbb_cardiac_tpu.utils.timing import StageTimer, device_trace

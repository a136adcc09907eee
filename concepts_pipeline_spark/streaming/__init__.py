"""Structured Streaming drivers for the CDC apply pipeline."""

from .runner import run_stream, StreamHandle

__all__ = ["run_stream", "StreamHandle"]

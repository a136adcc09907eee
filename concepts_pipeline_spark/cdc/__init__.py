"""CDC feed generation and the batch apply pipeline (SURVEY.md §7 architecture)."""

from .generator import generate_change_log, write_change_log, CHANGE_LOG_SCHEMA
from .apply import CdcPipeline, validate_events

__all__ = [
    "generate_change_log",
    "write_change_log",
    "CHANGE_LOG_SCHEMA",
    "CdcPipeline",
    "validate_events",
]

"""Engine error taxonomy — the reference's R14 error ladder
(app.py:163-174: MemoryError → "row group too large", TimeoutError,
schema errors, generic) re-expressed as typed exceptions around the
conversion entry point instead of string matching on messages.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for engine-surfaced errors."""


class ConversionSourceError(EngineError):
    """Input path missing/unreadable or not a parquet source
    (reference: generic read failure, app.py:172-174)."""


class ConversionSchemaError(EngineError):
    """Source schema cannot be converted/widened
    (reference: 'Schema' string match, app.py:170-171)."""


class ConversionMemoryError(EngineError):
    """Executor/driver memory exhausted mid-conversion
    (reference: MemoryError → row-group advice, app.py:163-165)."""


class ConversionTimeoutError(EngineError):
    """Conversion exceeded its wall-clock budget and was cancelled
    (reference: TimeoutError → 'conversion timed out', app.py:111-112,
    166-168). Raised by sources.watchdog.job_timeout."""

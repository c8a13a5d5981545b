"""Structured, severity-leveled operation logging (parity with the
reference's ``AgentLogger``, ``core/configs/logs.py:24-107``).

The reference attaches a Cloud Logging handler and emits severity-coded
records decorated with caller info (class.method - line, via
``inspect.stack``, ``logs.py:55-77``). The portable analogue: a
``StructuredLogger`` that builds the same record shape — severity,
message, caller — and hands it to a pluggable sink. The default sink is
the stdlib ``logging`` module (which a deployment points at Cloud
Logging / OTLP / files via handlers, exactly how the reference wires
``CloudLoggingHandler``); a list-collector sink makes the records
assertable in tests.

This composes with ``observability.with_metrics``: op metrics collected
by ``df.observe`` during an action are logged through here, giving the
reference's per-operation log lines without extra passes over the data.
"""

from __future__ import annotations

import inspect
import logging as _pylogging
from collections.abc import Callable
from typing import Any

SEVERITIES = ("DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL")

_PREFIX = {  # the reference's severity badges (logs.py:79-107)
    "DEBUG": "[ ++ DEBUG ]",
    "INFO": "[ oo INFO ]",
    "WARNING": "[ <> WARNING ]",
    "ERROR": "[ ^^ ERROR ]",
    "CRITICAL": "[ xx CRITICAL ]",
}


def _caller_info(depth: int = 3) -> str:
    """``Class.method - Line: N`` of the log call site (``logs.py:55-70``)."""
    stack = inspect.stack()
    if len(stack) > depth:
        frame = stack[depth]
        self_obj = frame.frame.f_locals.get("self")
        fn = frame.function
        if self_obj is not None:
            fn = f"{type(self_obj).__name__}.{fn}"
        return f"{fn} - Line: {frame.lineno}"
    return "N/A"


def stdlib_sink(record: dict[str, Any]) -> None:
    """Default sink: route through the stdlib logger named like the
    reference's ('AgentLogger' → 'neulix_datahub_spark')."""
    _pylogging.getLogger("neulix_datahub_spark").log(
        getattr(_pylogging, record["severity"]), "%s", record["message"]
    )


class StructuredLogger:
    """Severity-leveled logger emitting structured records to a sink.

    ``sink`` receives ``{"severity", "message", "caller", "context"}``
    dicts; swap it for a Cloud Logging/OTLP adapter in deployment or a
    list collector in tests.
    """

    def __init__(self, sink: Callable[[dict[str, Any]], None] = stdlib_sink,
                 context: dict[str, Any] | None = None):
        self.sink = sink
        self.context = dict(context or {})

    def log(self, severity: str, message: str, **context: Any) -> dict[str, Any]:
        severity = severity.upper()
        if severity not in SEVERITIES:
            raise ValueError(f"unknown severity {severity!r}")
        caller = _caller_info()
        record = {
            "severity": severity,
            "message": f"{_PREFIX[severity]} {message} -> ({caller})",
            "caller": caller,
            "context": {**self.context, **context},
        }
        self.sink(record)
        return record

    # the reference's short-name API (logs.py:79-107)
    def deb(self, message: str, **ctx: Any) -> dict[str, Any]:
        return self.log("DEBUG", message, **ctx)

    def inf(self, message: str, **ctx: Any) -> dict[str, Any]:
        return self.log("INFO", message, **ctx)

    def war(self, message: str, **ctx: Any) -> dict[str, Any]:
        return self.log("WARNING", message, **ctx)

    def err(self, message: str, **ctx: Any) -> dict[str, Any]:
        return self.log("ERROR", message, **ctx)

    def cri(self, message: str, **ctx: Any) -> dict[str, Any]:
        return self.log("CRITICAL", message, **ctx)

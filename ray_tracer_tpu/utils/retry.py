"""Transient-failure detection and retry for the tunneled TPU backend.

The reference's failure handling is surface-loss recovery in the event
loop (src/lib.rs:57-64: Lost/Outdated → resize, OutOfMemory → exit).
The TPU analog of a lost surface is a dropped relay/RPC connection to
the remote chip: device calls raise RuntimeError/XlaRuntimeError with
grpc-style status markers. Those are worth one retry from a known-good
host-side state; real errors (shape errors, OOM, NaN checks) are not.
"""

from __future__ import annotations

import logging
import time

logger = logging.getLogger("ray_tracer_tpu.retry")

# grpc/PJRT status markers that indicate a transport-level (retryable)
# failure. Deliberately excludes RESOURCE_EXHAUSTED (OOM is sticky) and
# INVALID_ARGUMENT (a bug, not a blip).
TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "ABORTED",
    "CANCELLED",
    "Socket closed",
    "Connection reset",
    "failed to connect",
)


def is_transient(exc: BaseException) -> bool:
    """A transport-level failure worth retrying.

    Markers are matched against the HEAD of the message (first 400 chars)
    rather than anywhere in it: PJRT puts the grpc status up front, while a
    non-transient error that merely *quotes* a nested status (e.g. a shape
    error wrapping an earlier relay log line) carries it deep in the body.
    """
    msg = str(exc)[:400]
    return isinstance(exc, (RuntimeError, ConnectionError, OSError)) and any(
        m in msg for m in TRANSIENT_MARKERS)


def retry_transient(fn, *, retries: int = 2, base_delay: float = 1.0,
                    max_delay: float = 300.0, on_retry=None):
    """Call ``fn()``; on a transient device error, wait and retry.

    ``on_retry(attempt, exc)`` (optional) runs before each retry — the
    caller's hook to rebuild device state from a host-side safe point.
    Non-transient errors and the final failure propagate unchanged.
    Exponential backoff from ``base_delay``, capped at ``max_delay``
    (relay outages last minutes — a generous cap lets a long retry
    schedule ride one out without unbounded sleeps).
    """
    attempt = 0
    while True:
        try:
            return fn()
        except BaseException as exc:  # noqa: BLE001 — filtered below
            if not is_transient(exc) or attempt >= retries:
                raise
            attempt += 1
            delay = min(base_delay * (2 ** (attempt - 1)), max_delay)
            logger.warning(
                "transient device error (%s); retry %d/%d in %.1fs",
                str(exc).splitlines()[0][:120], attempt, retries, delay)
            if on_retry is not None:
                on_retry(attempt, exc)
            time.sleep(delay)

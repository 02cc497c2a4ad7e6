"""Failure detection / retry for device dispatch.

The reference's failure story is try/catch + exit (SURVEY.md §5). A
long-running mapping service on shared/remote accelerators sees transient
dispatch failures (backend grant contention, RPC hiccups — both observed on
the tunneled dev chip); this module provides the minimal production
plumbing: health probes and bounded-retry execution with backoff, designed
to wrap whole jitted dispatches (retrying a pure function is always safe).
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Tuple, Type, TypeVar

import jax
import jax.numpy as jnp

log = logging.getLogger("icp_tpu.resilience")

T = TypeVar("T")

TRANSIENT_ERRORS: Tuple[Type[BaseException], ...] = (RuntimeError, OSError)


def device_healthy(timeout_ok: bool = True) -> bool:
    """Cheap device heartbeat: one tiny dispatch must complete."""
    try:
        x = jax.block_until_ready(jnp.ones((8,)) + 1.0)
        return bool(x.shape == (8,))
    except Exception as e:  # noqa: BLE001 — health probe must not raise
        log.warning("device heartbeat failed: %s", e)
        return False


def with_retries(fn: Callable[..., T], *args, retries: int = 3,
                 backoff_s: float = 1.0,
                 retry_on: Tuple[Type[BaseException], ...] = TRANSIENT_ERRORS,
                 **kwargs) -> T:
    """Run ``fn(*args, **kwargs)`` with bounded retries on transient device
    errors. The result is blocked-on before being considered successful, so
    async dispatch failures surface inside the guarded region.

    Raises the last error after ``retries`` failed attempts.
    """
    last: BaseException | None = None
    for attempt in range(retries + 1):
        try:
            return jax.block_until_ready(fn(*args, **kwargs))
        except retry_on as e:  # transient: backoff and retry
            last = e
            if attempt == retries:
                break
            delay = backoff_s * (2.0 ** attempt)
            log.warning("dispatch failed (attempt %d/%d): %s — retrying in %.1fs",
                        attempt + 1, retries, e, delay)
            time.sleep(delay)
            device_healthy()
    assert last is not None
    raise last

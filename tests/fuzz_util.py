"""Shared helpers for the adversarial-bytes fuzz tiers.

One mutation strategy and one wall-time-budget harness, imported by the
codec (test_fuzz_robustness) and parser (test_fuzz_parsers) suites so
the two tiers can't silently diverge.
"""

from __future__ import annotations

import time

import numpy as np
from hypothesis import HealthCheck, settings

BUDGET_S = 5.0

FUZZ = settings(
    max_examples=60,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)


def mutate(blob: bytes, seed: int, n_flips: int, trunc: bool) -> bytes:
    """Deterministically corrupt a valid blob: optional truncation to a
    random prefix, then ``n_flips`` single-bit flips."""
    rng = np.random.default_rng(seed)
    b = bytearray(blob)
    if trunc and len(b) > 1:
        b = b[: int(rng.integers(1, len(b)))]
    for _ in range(n_flips):
        if not b:
            break
        i = int(rng.integers(0, len(b)))
        b[i] ^= 1 << int(rng.integers(0, 8))
    return bytes(b)


def terminates(fn, blob) -> None:
    """Assert ``fn(blob)`` returns or raises within BUDGET_S — corrupt
    input is data (error row), a hang is a stuck executor. Lazily
    exhausts generator results (the WARC parser is lazy)."""
    t0 = time.monotonic()
    try:
        out = fn(blob)
        if hasattr(out, "__iter__") and not isinstance(
            out, (str, bytes, dict, list, tuple)
        ):
            list(out)
    except Exception:
        pass
    assert time.monotonic() - t0 < BUDGET_S, "fuzz target exceeded time budget"

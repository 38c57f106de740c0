"""Shared splitmix64 finalizer (Steele/Lea/Flood 2014 mix constants).

Single home for the 3-line avalanche used across the engine (shingle
hashing, content fingerprints, LSH band salting, bloom hashing, session
partitioning, HLL bucketing) — the copies previously drifted apart only
by whitespace, but a future change (e.g. hardening hash(0)) must land
everywhere at once."""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def splitmix64_mix(u: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array (pure mix —
    callers add their own stream offset / key material first)."""
    u = np.asarray(u, dtype=np.uint64)
    with np.errstate(over="ignore"):
        u = (u ^ (u >> np.uint64(30))) * _C1
        u = (u ^ (u >> np.uint64(27))) * _C2
        return u ^ (u >> np.uint64(31))

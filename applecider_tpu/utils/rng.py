"""Seeded randomness plumbing.

Replaces the reference's ``set_seed`` (``_archive/AppleCider/utils.py:17-24``)
with explicit ``jax.random`` key threading: one root key per run, split per
purpose (init / dropout / masking / sampling), plus a seeded NumPy generator
for host-side work (oversampling maps, splits).
"""

from __future__ import annotations

import numpy as np


def seed_everything(seed: int) -> np.random.Generator:
    """Seed host-side RNG; device randomness is threaded via jax keys."""
    np.random.seed(seed)
    return np.random.default_rng(seed)


def key_iter(seed: int):
    """Infinite iterator of fresh jax PRNG keys derived from one root seed."""
    import jax

    key = jax.random.PRNGKey(seed)
    while True:
        key, sub = jax.random.split(key)
        yield sub

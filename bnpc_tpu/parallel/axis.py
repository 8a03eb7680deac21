"""Mutation-axis sharding context.

The reference has no distributed backend at all (SURVEY.md section 2.3); the
TPU-native scaling axes are (1) chains — embarrassingly parallel, sharded as
a batch axis — and (2) the mutation axis m, which appears in every
likelihood term only inside independent sums (libs/CRP.py:197-204), making it
an ideal `shard_map` axis: each device holds an m/D slice of the data planes
and parameter columns, local partial sums are combined with one `psum` over
the ICI, and all scalar MCMC decisions (categorical draws, MH accepts) are
computed identically on every shard from replicated keys.

Every kernel takes a `MutAxis` (default: unsharded no-op). Under `shard_map`
pass `MutAxis(name="muts", mask=<local validity mask>)`:

  * ``psum``      — cross-shard sum for any value already reduced over the
                    local mutation slice;
  * ``fold_key``  — decorrelates per-mutation random draws across shards
                    (proposal std-devs, truncnorm proposals, Beta rows) while
                    scalar draws keep the replicated key;
  * ``mask``      — zero-weights padded mutation columns (needed when m is
                    padded up to a multiple of the shard count) in prior
                    sums, MH transition probabilities and telemetry counts.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MutAxis:
    name: str | None = None
    mask: jnp.ndarray | None = None  # [m_local] f32, 1 = real mutation column

    def psum(self, x):
        if self.name is None:
            return x
        return jax.lax.psum(x, self.name)

    def fold_key(self, key):
        if self.name is None:
            return key
        return jax.random.fold_in(key, jax.lax.axis_index(self.name))

    def apply_mask(self, x):
        if self.mask is None:
            return x
        return x * self.mask

    @property
    def sharded(self) -> bool:
        return self.name is not None

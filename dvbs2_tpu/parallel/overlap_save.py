"""Sample-axis (time-block) sharding of streaming filters: overlap-save with
ICI halo exchange.

The reference parallelizes the matched filter by splitting the `filter` task
into `filter1`/`filter2` across two pipeline stages (reference:
src/common/Module/Filter/Filter.hxx:56-85, used at src/mains/RX/
main_sched.cpp:199-202).  The TPU-native equivalent (SURVEY.md §2.5) shards
the oversampled sample stream itself across a mesh axis: each device filters
a contiguous time block, and the causal FIR's T-1 cross-block dependency is
satisfied by passing each shard's tail to its right neighbour with a single
`ppermute` hop over ICI (overlap-save).  The result is bit-identical to the
unsharded streaming FIR — the halo IS the same history the sequential filter
would have carried.

Shard layout: a stream block (B, N, 2) is sharded on the sample axis N
(PartitionSpec(None, AXIS, None)); the inter-call carry (B, T-1, 2) is the
global stream history and lives replicated (only device 0 consumes it; the
new carry is the LAST device's tail, all-gathered so every device agrees).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

AXIS = "sample"


def make_sample_mesh(n_devices: int) -> Mesh:
    devs = jax.devices()[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _halo_from_left(tail: jnp.ndarray, carry: jnp.ndarray,
                    n_dev: int) -> jnp.ndarray:
    """Each device's T-1 history samples: the left neighbour's tail, or the
    carried global stream history on device 0.  One ppermute hop — nearest-
    neighbour traffic that rides ICI on a real slice."""
    left = jax.lax.ppermute(tail, AXIS,
                            [(i, i + 1) for i in range(n_dev - 1)])
    is_first = (jax.lax.axis_index(AXIS) == 0)
    return jnp.where(is_first, carry, left)


@functools.lru_cache(maxsize=None)
def sharded_fir(taps_key: tuple, n_devices: int):
    """Compiled overlap-save FIR over an n-device 'sample' mesh.

    ``taps_key`` is the filter taps as a hashable tuple (e.g.
    ``tuple(filters.rrc_taps(...).tolist())``).  Returns ``fn`` with
    ``y, new_carry = fn(x, carry)`` where x is (B, N, 2), N divisible by
    n_devices, and carry is (B, T-1, 2) — semantics identical to
    ``ops.filters.fir`` with explicit state.
    """
    taps = np.asarray(taps_key, np.float32)
    T = len(taps)
    mesh = make_sample_mesh(n_devices)
    rhs = jnp.broadcast_to(jnp.asarray(taps[::-1].copy(), jnp.float32),
                           (2, 1, T))

    def per_shard(x_local, carry):
        tail = x_local[:, -(T - 1):]
        halo = _halo_from_left(tail, carry, n_devices)
        ext = jnp.concatenate([halo, x_local], axis=1)
        y = jax.lax.conv_general_dilated(
            ext.transpose(0, 2, 1), rhs, window_strides=(1,),
            padding="VALID", feature_group_count=2,
            dimension_numbers=("NCH", "OIH", "NCH")).transpose(0, 2, 1)
        # tails come back sharded on the sample axis; the wrapper slices the
        # LAST device's tail as the new global stream carry
        return y, tail

    inner = jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(None, AXIS, None), P()),
        out_specs=(P(None, AXIS, None), P(None, AXIS, None))))

    def fn(x, carry):
        assert x.shape[1] % n_devices == 0 and \
            x.shape[1] // n_devices >= T - 1, (
                "each sample shard must hold >= n_taps-1 samples for the "
                "single-hop halo", x.shape, T, n_devices)
        y, tails = inner(x, carry)
        return y, tails[:, -(T - 1):]

    return fn


@functools.lru_cache(maxsize=None)
def sharded_rx_frontend(taps_key: tuple, nu: float, n_devices: int):
    """Overlap-save RX front-end slice: CFO derotation (stateless index math
    per shard) + matched RRC filter, sample-sharded.  Demonstrates fusing
    elementwise work into the sharded filter pass — the pattern scales the
    oversampled-stream stages of `dvbs2_rx` across chips while the per-symbol
    sync scans stay stream-parallel on the 'data' axis."""
    taps = np.asarray(taps_key, np.float32)
    T = len(taps)
    mesh = make_sample_mesh(n_devices)
    rhs = jnp.broadcast_to(jnp.asarray(taps[::-1].copy(), jnp.float32),
                           (2, 1, T))
    omega = 2.0 * np.pi * float(np.floor(nu * 1e6) / 1e6)

    def per_shard(x_local, carry, n0):
        B, Nl, _ = x_local.shape
        # global sample index of this shard's first sample
        base = n0 + jax.lax.axis_index(AXIS) * Nl
        n = jnp.mod(base + jnp.arange(Nl, dtype=jnp.float32), 1e6)
        ph = omega * n
        c, s = jnp.cos(ph), jnp.sin(ph)
        xr, xi = x_local[..., 0], x_local[..., 1]
        x_rot = jnp.stack([xr * c + xi * s, xi * c - xr * s], axis=-1)
        tail = x_rot[:, -(T - 1):]
        halo = _halo_from_left(tail, carry, n_devices)
        ext = jnp.concatenate([halo, x_rot], axis=1)
        y = jax.lax.conv_general_dilated(
            ext.transpose(0, 2, 1), rhs, window_strides=(1,),
            padding="VALID", feature_group_count=2,
            dimension_numbers=("NCH", "OIH", "NCH")).transpose(0, 2, 1)
        return y, tail

    inner = jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(None, AXIS, None), P(), P()),
        out_specs=(P(None, AXIS, None), P(None, AXIS, None))))

    def fn(x, carry, n0):
        y, tails = inner(x, carry, n0)
        return y, tails[:, -(T - 1):]

    return fn

"""Device mesh + sharded Monte-Carlo step.

The reference's parallelism (SURVEY.md §2.5) maps onto one mesh axis:

  reference                              TPU-native
  ---------                              ----------
  Sequence(n_threads) module cloning --> shard_map over the 'data' axis
  inter-frame batch F (INTER SIMD)   --> per-device frame batch (lanes)
  Monitor_reduction (cross-thread)   --> psum of BE/FE counters
  per-thread PRNG seeds              --> fold_in(key, axis_index)

A second 'sample' axis for time-block sharding of the oversampled stream
(overlap-save ppermute halo exchange of filter histories) lives in
parallel/overlap_save.py.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from dvbs2_tpu.config import Config


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


@functools.lru_cache(maxsize=None)
def sharded_step(cfg: Config, per_device_batch: int, n_devices: int):
    """Compiled data-parallel Monte-Carlo step over an n-device mesh.

    Each device draws its own frames/noise (key folded with its axis index)
    and the BE/FE counters are psum-reduced — the TPU equivalent of the
    reference's replicated sequences + Monitor_BFER_reduction
    (reference: src/mains/TX_RX_BB/main.cpp:96,123-125).
    """
    from dvbs2_tpu.chains.txrx_bb import txrx_bb_step

    mesh = make_mesh(n_devices)

    def per_device(key, sigma):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        r = txrx_bb_step(key, sigma, cfg, per_device_batch)
        return jax.tree_util.tree_map(lambda v: jax.lax.psum(v, "data"), r)

    fn = jax.jit(jax.shard_map(per_device, mesh=mesh,
                               in_specs=(P(), P()), out_specs=P()))
    return fn


def _state_specs(state, total_streams: int, axis_name: str = "data"):
    """PartitionSpec tree for a TxRxState: leaves whose leading dim is the
    stream batch shard along the mesh axis, scalars/global state replicate."""
    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 \
                and leaf.shape[0] == total_streams:
            return P(axis_name)
        return P()
    return jax.tree_util.tree_map(spec, state)


def sharded_txrx_init(cfg: Config, streams_per_device: int, n_devices: int):
    """Full-chain state for n_devices * streams_per_device streams, laid out
    for the sharded step (leading stream axis sharded on the mesh)."""
    from dvbs2_tpu.chains import txrx
    return txrx.txrx_init(cfg, n_devices * streams_per_device)


@functools.lru_cache(maxsize=None)
def sharded_txrx_step(cfg: Config, streams_per_device: int,
                      frames_per_step: int, n_devices: int):
    """Compiled data-parallel FULL-CHAIN step (the dvbs2_tx_rx equivalent)
    over an n-device mesh: independent TX->channel->RX sample streams ride
    the mesh axis (each device owns its streams' filter/PLL/sync state), and
    the BE/FE/frame monitors are psum-reduced across devices — the
    Monitor_reduction analogue for the full chain (SURVEY §2.5).

    Returns (fn, state0): call ``counts, state = fn(key, sigma, state)``.
    """
    from dvbs2_tpu.chains import txrx

    mesh = make_mesh(n_devices)
    total = n_devices * streams_per_device
    state0 = sharded_txrx_init(cfg, streams_per_device, n_devices)
    specs = _state_specs(state0, total)

    def per_device(key, sigma, state):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        r = txrx.txrx_step(key, sigma, cfg, state, streams_per_device,
                           frames_per_step)
        counts = jax.tree_util.tree_map(
            lambda v: jax.lax.psum(v, "data"),
            (r.be, r.fe, r.n_frames))
        return counts, r.state

    fn = jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), specs),
        out_specs=(P(), specs)))
    return fn, state0

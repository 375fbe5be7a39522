"""Device mesh + sharded Monte-Carlo step.

The reference's parallelism (SURVEY.md §2.5) maps onto one mesh axis:

  reference                              TPU-native
  ---------                              ----------
  Sequence(n_threads) module cloning --> shard_map over the 'data' axis
  inter-frame batch F (INTER SIMD)   --> per-device frame batch (lanes)
  Monitor_reduction (cross-thread)   --> psum of BE/FE counters
  per-thread PRNG seeds              --> fold_in(key, axis_index)

A second 'sample' axis for time-block sharding of the oversampled stream
(overlap-save halo exchange) is reserved for the filtered RX chain.
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

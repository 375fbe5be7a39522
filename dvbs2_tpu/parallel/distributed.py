"""Multi-host distributed runtime: jax.distributed + process-spanning mesh.

The reference is strictly single-process (no MPI/NCCL anywhere — SURVEY
§2.5), but the TPU build's scaling axis beyond one host is a first-class
obligation: Monte-Carlo streams are embarrassingly parallel, so the
multi-host design is pure data parallelism over a global 'data' mesh
axis spanning every process's devices, with the monitor reduction
(psum of BE/FE/frame counters) as the ONLY cross-host traffic — the
exact Monitor_BFER_reduction analogue (reference:
src/mains/TX_RX_BB/main.cpp:123-125), now over ICI/DCN instead of a
thread barrier.

Topology: each process owns its local devices' stream shards (full-chain
per-stream DSP state included); `jax.make_array_from_process_local_data`
assembles the global arrays; per-device PRNG keys fold the GLOBAL axis
index so a (P processes x D devices) run is bit-identical to the
single-process P*D-device run — pinned by tests/test_multihost.py.

On a real TPU pod: `initialize()` with no arguments (the TPU runtime
provides coordinator/topology); on CPU/dev environments pass
coordinator/process counts explicitly (collectives ride gloo).
Launcher for local validation: tools/launch_multihost.py.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dvbs2_tpu.config import Config


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               cpu_collectives: str = "gloo") -> None:
    """jax.distributed.initialize wrapper.

    On TPU pods call with no arguments.  On CPU pass all three (the test
    launcher does); cross-process CPU collectives need a backend — gloo
    is compiled into jaxlib and validated in tests/test_multihost.py.
    Must run before any other JAX call in the process.
    """
    # NOTE: nothing here may touch the backend (jax.devices()/
    # default_backend()) — jax.distributed.initialize must run first.
    # The CPU-collectives flag only affects the CPU client, so setting
    # it unconditionally is harmless on TPU pods.
    try:
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    except Exception:
        pass        # flag absent on this jaxlib: single-host only
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis_name: str = "data") -> Mesh:
    """1-D mesh over ALL processes' devices (ICI/DCN-spanning).  Device
    order is process-major (process 0's devices first), so global axis
    index == process_id * local_count + local_index."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def make_global(mesh: Mesh, spec, local):
    """Assemble a global array from this process's shard (or replicated
    value) — pytree version of jax.make_array_from_process_local_data."""
    def one(sp, arr):
        sh = NamedSharding(mesh, sp)
        return jax.make_array_from_process_local_data(sh, np.asarray(arr))
    return jax.tree_util.tree_map(one, spec, local,
                                  is_leaf=lambda x: isinstance(x, P))


@functools.lru_cache(maxsize=None)
def sharded_bb_step_mh(cfg: Config, per_device_batch: int):
    """Multi-host data-parallel BB Monte-Carlo step over the global mesh
    (the dvbs2_tx_rx_bb equivalent at pod scale).  Every process calls
    this with the SAME replicated (key, sigma); counters come back
    psum-reduced over the global axis."""
    from dvbs2_tpu.chains.txrx_bb import txrx_bb_step

    mesh = global_mesh()

    def per_device(key, sigma):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        r = txrx_bb_step(key, sigma, cfg, per_device_batch)
        return jax.tree_util.tree_map(lambda v: jax.lax.psum(v, "data"), r)

    return jax.jit(jax.shard_map(per_device, mesh=mesh,
                                 in_specs=(P(), P()), out_specs=P()))


def txrx_state_specs(cfg: Config, total_streams: int,
                     axis_name: str = "data"):
    """PartitionSpec tree for a TxRxState at ``total_streams`` global
    streams: stream-leading leaves shard on the mesh axis, scalars and
    global state replicate (same rule as parallel/mesh._state_specs)."""
    from dvbs2_tpu.chains import txrx
    state = jax.eval_shape(lambda: txrx.txrx_init(cfg, total_streams))
    def spec(leaf):
        if leaf.ndim >= 1 and leaf.shape[0] == total_streams:
            return P(axis_name)
        return P()
    return jax.tree_util.tree_map(spec, state)


def sharded_txrx_init_mh(cfg: Config, streams_per_device: int):
    """Global full-chain state for the multi-host step: THIS process
    builds only its local shard (local_devices * streams_per_device
    streams) and the global array is assembled across processes."""
    from dvbs2_tpu.chains import txrx
    mesh = global_mesh()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    total = n_global * streams_per_device
    specs = txrx_state_specs(cfg, total)
    local = txrx.txrx_init(cfg, n_local * streams_per_device)
    return make_global(mesh, specs, jax.tree_util.tree_map(np.asarray,
                                                           local))


@functools.lru_cache(maxsize=None)
def sharded_txrx_step_mh(cfg: Config, streams_per_device: int,
                         frames_per_step: int):
    """Multi-host FULL-CHAIN step (dvbs2_tx_rx equivalent): per-stream
    TX->channel->RX state rides the global mesh axis; only the monitor
    counters cross hosts (psum)."""
    from dvbs2_tpu.chains import txrx

    mesh = global_mesh()
    total = len(jax.devices()) * streams_per_device
    specs = txrx_state_specs(cfg, total)

    def per_device(key, sigma, state):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        r = txrx.txrx_step(key, sigma, cfg, state, streams_per_device,
                           frames_per_step)
        counts = jax.tree_util.tree_map(
            lambda v: jax.lax.psum(v, "data"),
            (r.be, r.fe, r.n_frames))
        return counts, r.state

    return jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), specs),
        out_specs=(P(), specs)))

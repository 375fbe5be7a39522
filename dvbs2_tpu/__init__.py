"""dvbs2_tpu — a TPU-native DVB-S2 (ETSI EN 302 307) SDR transceiver framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the aff3ct/dvbs2
C++ application (reference: /root/reference). It is NOT a port: frames are
batched arrays with a leading inter-frame axis ``F``; each chain (TX, channel,
RX) is a single jitted function; stateful DSP is an explicit carry through
``lax.scan``; FEC encoding is GF(2) matmuls on the MXU; the LDPC decoder is a
grouped-layered belief-propagation sweep over the DVB-S2 quasi-cyclic layer
structure with ``F`` on the TPU lane dimension (the reference's INTER-SIMD
strategy, re-targeted).

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):
  config.py       — factory::DVBS2 equivalent (modcod tables, derived consts)
  ops/            — DSP + FEC blocks (scramblers, BCH, LDPC, modem, framer, ...)
  chains/         — jitted end-to-end programs (tx, channel, rx, tx_rx_bb)
  harness/        — Monte-Carlo BER/FER simulation, monitors, terminal
  parallel/       — mesh construction + sharded Monte-Carlo (Monitor_reduction
                    == psum over the data axis)
  io/             — file formats (.src/.mod/USER_BIN IQ)
"""

__version__ = "0.1.0"

from dvbs2_tpu.config import Config  # noqa: F401

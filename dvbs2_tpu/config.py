"""Configuration layer — the TPU-native equivalent of ``factory::DVBS2``.

Mirrors the parameter set and derived-constant computation of the reference's
single configuration object (reference: src/common/Factory/DVBS2/DVBS2.cpp:
modcod_init at :287-356, defaults in store() at :114-203) so that reference
command lines translate mechanically, but is a plain frozen dataclass: every
derived constant is computed once, and jitted chains close over it statically.
"""
from __future__ import annotations

import dataclasses
import math
from functools import cached_property

# DVB-S2 short-frame constants (reference: DVBS2.hpp:49-55)
N_LDPC = 16200          # short FECFRAME size
M_SLOT = 90             # symbols per PL slot
P_PILOT = 36            # symbols per pilot block
BCH_T = 12              # BCH error-correction capability
BCH_M = 14              # GF(2^14)
BCH_N_UNSHORTENED = 16383
# primitive polynomial 1 + x + x^3 + x^5 + x^14 (reference: DVBS2.hpp:55)
BCH_PRIM_POLY = (1 << 0) | (1 << 1) | (1 << 3) | (1 << 5) | (1 << 14)

MODCODS = ("QPSK-S_8/9", "QPSK-S_3/5", "8PSK-S_3/5", "8PSK-S_8/9",
           "16APSK-S_8/9")

# 7-bit PLS words (MODCOD + TYPE) per supported scheme, as modulated into the
# PLHEADER (reference: src/common/Module/Framer/Framer.hxx:109-127).
PLS_WORDS = {
    "QPSK-S_8/9":   (0, 0, 1, 0, 1, 0, 1),
    "QPSK-S_3/5":   (0, 0, 0, 1, 0, 1, 1),
    "8PSK-S_3/5":   (0, 0, 1, 1, 0, 0, 1),
    "8PSK-S_8/9":   (0, 1, 0, 0, 0, 0, 1),
    "16APSK-S_8/9": (0, 1, 0, 1, 1, 0, 1),
}


@dataclasses.dataclass(frozen=True)
class Config:
    """All simulation parameters + derived frame geometry.

    CLI-surface parity with the reference's ``factory::DVBS2``
    (SURVEY.md Appendix A); only behavior-bearing fields live here.
    """
    modcod: str = "QPSK-S_8/9"
    # Monte-Carlo sweep (reference defaults DVBS2.cpp:114-203)
    ebn0_min: float = 3.2
    ebn0_max: float = 6.0
    ebn0_step: float = 0.1
    max_fe: int = 100
    n_frames: int = 1                 # inter-frame batch F (leading array axis)
    # LDPC decoder (reference: DVBS2.cpp:87-89,418-449)
    ldpc_nite: int = 50
    ldpc_implem: str = "SPA"          # SPA | MS | NMS
    ldpc_norm_factor: float = 0.875   # NMS normalization factor
    # syndrome-based early stop; aff3ct BP decoders default this ON and the
    # reference app never passes --dec-no-synd, so ON is the parity default
    ldpc_syndrome_exit: bool = True
    # LDPC table construction variant ('' = frozen default; 'v2s<seed>'/'r1'
    # address specific candidates, used by tools/parity_sweep.py selection)
    ldpc_variant: str = ""
    # bit-interleaver read order override ('' = the standard's per-modcod
    # order, DVBS2.cpp:287-356; the aff3ct Interleaver factory exposes the
    # same choice — used by the table-selection sweeps because a
    # reconstructed table's UEP profile can prefer the other orientation)
    itl_read_order: str = ""
    # estimator / sync genie toggles
    est_type: str = "DVBS2"           # DVBS2 | PERFECT
    perfect_sync: bool = False
    # channel (reference: DVBS2.cpp:69-111)
    chn_type: str = "AWGN"            # AWGN | USER_ADD | SYNCHRO
    chn_max_freq_shift: float = 0.0   # CFO in normalized symbol-rate units
    chn_max_delay: float = 2.0        # fractional sample delay
    # shaping filter group (reference: Factory/Module/Shaping_filter.hpp:26-28)
    shp_grp_delay: int = 20
    shp_rolloff: float = 0.2
    shp_osf: int = 2
    # timing sync loop (reference: Factory/Module/Synchronizer_timing.hpp:28-30)
    # stm_type ULTRA = strobe-run blocked Gardner (the reference's
    # Synchronizer_Gardner_ultra_osf2 amortization, hold_size samples per
    # block with an exact 4-sample tail); FAST = exact per-sample scan.
    # ULTRA is the default tracking mode here because the per-sample scan is
    # latency-bound on TPU (~18 us/iteration); acquisition (step-MF) always
    # runs the exact per-sample loop, mirroring the reference where the
    # ultra path only engages once act/lock is established.
    # ULTRA is FER-exact at every timing offset including the mu wrap
    # boundary (integer-sample delays): the body interpolation mu is
    # derived from the NCO each block (ops/sync.py gardner_block), which
    # fixed round 3's measured ~2e-2 floor there (regression:
    # tests/test_gardner_blocked.py::test_blocked_pending_wrap_at_block_
    # entry; measured parity: parity_full.json delay-4.0 rows at ULTRA).
    stm_type: str = "ULTRA"
    stm_hold_size: int = 101
    # fused tracking front-end (coarse mix + AGC + matched filter +
    # blocked Gardner in one VMEM-resident Pallas kernel,
    # ops/frontend_pallas.py): "auto" = on TPU when the ULTRA tracking
    # path applies; "never" = always the XLA stage composition; "always"
    # = force (tests use interpret mode through the ops API instead)
    fused_frontend: str = "auto"
    stm_damping: float = math.sqrt(0.5)
    stm_norm_bandwidth: float = 5e-5
    stm_detector_gain: float = 2.0
    # Per-stage type selectors mirroring the reference's factory dispatch
    # (--sfm-type/--sfc-type/--sff-type, reference:
    # Factory/Module/Synchronizer_frame/Synchronizer_frame.cpp:31-34 etc.).
    # This build keeps ONE exact implementation per stage, so FAST ==
    # NORMAL; PERFECT engages that stage's genie.  perfect_sync=True is
    # shorthand for all-PERFECT.  Supported mixes: sfc/stm PERFECT are
    # independent; sfm PERFECT requires stm PERFECT (the genie frame
    # realign is calibrated against the genie timing delay); sff PERFECT
    # is free-standing (known residual 0 bypasses the fine estimators).
    sfm_type: str = "FAST"            # FAST | NORMAL | PERFECT
    sfc_type: str = "NORMAL"          # NORMAL | PERFECT
    sff_type: str = "NORMAL"          # NORMAL | PERFECT
    # frame sync (reference: Factory/Module/Synchronizer_frame.hpp:26-30)
    sfm_alpha: float = 0.9
    sfm_trigger: float = 30.0
    # coarse freq sync (reference: Factory/Module/Synchronizer_freq_coarse.hpp)
    sfc_damping: float = math.sqrt(0.5)
    sfc_norm_bandwidth: float = 1e-4
    # fine freq sync (reference: Factory/Module/Synchronizer_freq_fine.hpp)
    sff_lr_alpha: float = 0.999

    def __post_init__(self):
        if self.modcod not in MODCODS:
            raise ValueError(f"unsupported modcod {self.modcod!r}; "
                             f"expected one of {MODCODS}")

    # ---- derived constants (reference: DVBS2.cpp:287-356) ----
    @property
    def mod(self) -> str:
        return self.modcod.split("-")[0]

    @property
    def cod(self) -> str:
        return self.modcod.split("_")[1]

    @property
    def bps(self) -> int:
        return {"QPSK": 2, "8PSK": 3, "16APSK": 4}[self.mod]

    @property
    def K_bch(self) -> int:
        return {"3/5": 9552, "8/9": 14232}[self.cod]

    @property
    def N_bch(self) -> int:
        return {"3/5": 9720, "8/9": 14400}[self.cod]

    @property
    def ldpc_code(self) -> str:
        """Rate string handed to ops.ldpc, optionally variant-suffixed."""
        return f"{self.cod}@{self.ldpc_variant}" if self.ldpc_variant else self.cod

    @property
    def K_ldpc(self) -> int:
        return self.N_bch

    @property
    def N_ldpc(self) -> int:
        return N_LDPC

    @property
    def code_rate(self) -> float:
        """Overall rate used for Eb/N0 <-> Es/N0 (reference TX_RX_BB/main.cpp:142)."""
        return self.K_bch / self.N_ldpc

    @property
    def N_xfec_frame(self) -> int:
        return self.N_ldpc // self.bps

    @property
    def n_pilots(self) -> int:
        return self.N_xfec_frame // (16 * M_SLOT)

    @property
    def S(self) -> int:
        return self.N_xfec_frame // M_SLOT

    @property
    def pl_frame_size(self) -> int:
        return M_SLOT * (self.S + 1) + self.n_pilots * P_PILOT

    @property
    def itl_n_cols(self) -> int:
        return self.bps

    @property
    def read_order(self) -> str:
        # reference: DVBS2.cpp:287-356 (TOP_RIGHT only for 8PSK-S_3/5)
        if self.itl_read_order:
            return self.itl_read_order
        return "TOP_RIGHT" if self.modcod == "8PSK-S_3/5" else "TOP_LEFT"

    @property
    def pls_word(self):
        return PLS_WORDS[self.modcod]

    @cached_property
    def rad_frame_size(self) -> int:
        """Complex radio samples per PL frame after oversampling."""
        return self.pl_frame_size * self.shp_osf

    # ---- noise conversions (aff3ct tools::ebn0_to_esn0 / esn0_to_sigma) ----
    def ebn0_to_esn0(self, ebn0: float) -> float:
        return ebn0 + 10.0 * math.log10(self.code_rate * self.bps)

    @staticmethod
    def esn0_to_sigma(esn0: float, upsample_factor: int = 1) -> float:
        """Per-real-dimension noise std (aff3ct convention)."""
        return math.sqrt(upsample_factor / (2.0 * 10.0 ** (esn0 / 10.0)))

    def ebn0_to_sigma(self, ebn0: float) -> float:
        return self.esn0_to_sigma(self.ebn0_to_esn0(ebn0))

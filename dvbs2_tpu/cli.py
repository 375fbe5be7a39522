"""CLI surface mirroring the reference's ``factory::DVBS2`` argument groups
(SURVEY.md Appendix A; reference: src/common/Factory/DVBS2/DVBS2.cpp:69-111)
so reference command lines translate mechanically:

  dvbs2_tx_rx_bb -m 3.60 -M 3.81           ->  python -m dvbs2_tpu.mains.tx_rx_bb -m 3.60 -M 3.81
  dvbs2_tx_rx --mod-cod QPSK-S_8/9 ...     ->  python -m dvbs2_tpu.mains.tx_rx ...
"""
from __future__ import annotations

import argparse
import dataclasses
import math

from dvbs2_tpu.config import Config, MODCODS


def build_parser(prog: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog)
    g = p.add_argument_group("sim")
    g.add_argument("--mod-cod", default="QPSK-S_8/9", choices=MODCODS)
    g.add_argument("-m", "--sim-noise-min", type=float, default=3.2)
    g.add_argument("-M", "--sim-noise-max", type=float, default=6.0)
    g.add_argument("-s", "--sim-noise-step", type=float, default=0.1)
    g.add_argument("-e", "--max-fe", type=int, default=100)
    g.add_argument("-F", "--sim-inter-fra", type=int, default=32,
                   help="inter-frame batch per device (TPU lane batch)")
    g.add_argument("--sim-stats", action="store_true",
                   help="print per-stage timing statistics at the end "
                        "(reference: --sim-stats, Stats::show)")
    g.add_argument("-d", "--sim-dbg", action="store_true",
                   help="dump per-stage socket data for the first batch")
    g.add_argument("--sim-dbg-limit", type=int, default=16,
                   help="max values printed per socket with --sim-dbg")
    g.add_argument("--sim-noise-ref", type=float, default=0.0,
                   help="reference Es/N0 for the fading sequence")
    g.add_argument("--sim-noise-path", default=None,
                   help="Es/N0 sequence file (lines of 'esn0 n_frames') "
                        "driving the fading multiplier")
    g.add_argument("--ter-freq", type=int, default=500,
                   help="terminal refresh period in ms (0 = only final rows)")
    g.add_argument("--stats-path", default=None,
                   help="write probe/stats dumps to this path prefix")
    g.add_argument("--section", default=None,
                   help="free-text tag echoed into the output header "
                        "(the reference stores it for an external 'bridge "
                        "binary' and echoes it via get_headers; no code in "
                        "its tree consumes it otherwise, DVBS2.cpp:91,141)")
    g.add_argument("--snk-path", default="sink.out")
    g.add_argument("--dump-filename", default="dump")
    g.add_argument("--max-frames", type=int, default=10_000_000)
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--tx-time-limit", type=float, default=0.0,
                   help="stop TX after this many seconds (0 = unlimited)")
    g.add_argument("--rx-time-limit", type=float, default=0.0)

    d = p.add_argument_group("dec (LDPC)")
    d.add_argument("--dec-ite", type=int, default=50)
    d.add_argument("--dec-implem", default="SPA", choices=["SPA", "MS", "NMS"])
    d.add_argument("--dec-simd", default="", choices=["", "INTER", "INTRA"],
                   help="accepted for command-line parity; the TPU build "
                        "always batches frames (INTER) and vectorizes "
                        "within the frame (INTRA)")
    d.add_argument("--dec-norm", type=float, default=0.875)
    d.add_argument("--dec-no-synd", action="store_true",
                   help="disable syndrome-based early stopping (aff3ct "
                        "--dec-no-synd)")

    e = p.add_argument_group("est / sync")
    e.add_argument("--est-type", default="DVBS2", choices=["DVBS2", "PERFECT"])
    e.add_argument("--perfect-sync", action="store_true")
    e.add_argument("--no-wl-phases", action="store_true",
                   help="skip the waiting/learning acquisition phases")

    c = p.add_argument_group("chn")
    c.add_argument("--chn-type", default="AWGN",
                   choices=["AWGN", "USER_ADD", "SYNCHRO"])
    c.add_argument("--chn-path", default=None,
                   help="noise sample file for --chn-type USER_ADD")
    c.add_argument("--chn-max-freq-shift", type=float, default=0.0)
    c.add_argument("--chn-max-delay", type=float, default=2.0)

    sg = p.add_argument_group("src")
    sg.add_argument("--src-type", default="RAND",
                    choices=["RAND", "USER", "USER_BIN", "AZCW"])
    sg.add_argument("--src-path", default=None,
                    help=".src text file (USER) or binary stream (USER_BIN)")
    sg.add_argument("--src-no-loop", action="store_true")

    s = p.add_argument_group("shp")
    s.add_argument("--shp-grp-delay", type=int, default=20)
    s.add_argument("--shp-rolloff", type=float, default=0.2)
    s.add_argument("--shp-osf", type=int, default=2)

    t = p.add_argument_group("stm/sfm/sfc/sff")
    # per-stage type selectors (reference:
    # Factory/Module/Synchronizer_timing/Synchronizer_timing.cpp:33-38,
    # Synchronizer_frame.cpp:31-34, Synchronizer_freq_coarse.cpp:30-36,
    # Synchronizer_freq_fine.cpp:30-34).  FAST == NORMAL here (one exact
    # implementation per stage); default stm ULTRA (the reference's
    # blocked amortization, FER-exact in this build — config.py note),
    # so pass --stm-type FAST to mirror the reference default.
    t.add_argument("--stm-type", default="ULTRA",
                   choices=["FAST", "NORMAL", "ULTRA", "PERFECT"])
    t.add_argument("--stm-hold-size", type=int, default=101)
    t.add_argument("--stm-df", type=float, default=math.sqrt(0.5))
    t.add_argument("--stm-nbw", type=float, default=5e-5)
    t.add_argument("--stm-dg", type=float, default=2.0)
    t.add_argument("--sfm-type", default="FAST",
                   choices=["FAST", "NORMAL", "PERFECT"])
    t.add_argument("--sfm-alpha", type=float, default=0.9)
    t.add_argument("--sfm-trigger", type=float, default=30.0)
    t.add_argument("--sfc-type", default="NORMAL",
                   choices=["NORMAL", "PERFECT"])
    t.add_argument("--sfc-df", type=float, default=math.sqrt(0.5))
    t.add_argument("--sfc-nbw", type=float, default=1e-4)
    t.add_argument("--sff-type", default="NORMAL",
                   choices=["NORMAL", "PERFECT"])
    t.add_argument("--sff-lr-alpha", type=float, default=0.999)

    r = p.add_argument_group("rad")
    # factory::Radio dispatch (reference: Factory/Module/Radio/Radio.cpp:
    # 27-51,116-126). The reference defaults to USRP; this build defaults
    # to USER_BIN because TPU hosts have no UHD hardware — --rad-type USRP
    # parses the full parameter set and fails at open with a clear message.
    r.add_argument("--rad-type", default="USER_BIN",
                   choices=["USER_BIN", "USRP", "NO"])
    r.add_argument("--rad-clk-rate", type=float, default=33.333333e6)
    r.add_argument("--rad-rx-rate", type=float, default=None,
                   help="setting it enables the USRP RX direction "
                        "(reference: Radio.cpp)")
    r.add_argument("--rad-rx-freq", type=float, default=1090e6)
    r.add_argument("--rad-rx-gain", type=float, default=10.0)
    r.add_argument("--rad-rx-subdev-spec", default="")
    r.add_argument("--rad-rx-ant", default="RX2")
    r.add_argument("--rad-tx-rate", type=float, default=None)
    r.add_argument("--rad-tx-freq", type=float, default=1090e6)
    r.add_argument("--rad-tx-gain", type=float, default=10.0)
    r.add_argument("--rad-tx-subdev-spec", default="")
    r.add_argument("--rad-tx-ant", default="TX/RX")
    r.add_argument("--rad-ip-addr", default="192.168.10.2")
    r.add_argument("--rad-usrp-type", default="")
    r.add_argument("--rad-rx-file-path", default=None)
    r.add_argument("--rad-threaded", action="store_true",
                   help="dedicated native receive thread + preallocated "
                        "ring FIFO (the reference's Radio_USRP threaded "
                        "mode, Radio.hpp:25; here it overlaps file IO "
                        "with device compute via native/dvbs2_io.cpp)")
    r.add_argument("--rad-fifo-size", type=float, default=1e8,
                   help="receive FIFO bytes for --rad-threaded (the "
                        "reference defaults to 1e10; this host keeps "
                        "1e8 to fit RAM)")
    r.add_argument("--rad-tx-file-path", default=None)
    r.add_argument("--rad-rx-no-loop", action="store_true")
    return p


def config_from_args(args) -> Config:
    return Config(
        modcod=args.mod_cod,
        ebn0_min=args.sim_noise_min, ebn0_max=args.sim_noise_max,
        ebn0_step=args.sim_noise_step, max_fe=args.max_fe,
        n_frames=args.sim_inter_fra,
        ldpc_nite=args.dec_ite, ldpc_implem=args.dec_implem,
        ldpc_norm_factor=args.dec_norm,
        ldpc_syndrome_exit=not args.dec_no_synd,
        est_type=args.est_type, perfect_sync=args.perfect_sync,
        chn_type=args.chn_type,
        chn_max_freq_shift=args.chn_max_freq_shift,
        chn_max_delay=args.chn_max_delay,
        shp_grp_delay=args.shp_grp_delay, shp_rolloff=args.shp_rolloff,
        shp_osf=args.shp_osf,
        stm_type=args.stm_type, stm_hold_size=args.stm_hold_size,
        stm_damping=args.stm_df, stm_norm_bandwidth=args.stm_nbw,
        stm_detector_gain=args.stm_dg,
        sfm_type=args.sfm_type,
        sfm_alpha=args.sfm_alpha, sfm_trigger=args.sfm_trigger,
        sfc_type=args.sfc_type,
        sfc_damping=args.sfc_df, sfc_norm_bandwidth=args.sfc_nbw,
        sff_type=args.sff_type,
        sff_lr_alpha=args.sff_lr_alpha,
    )


def print_trace(cfg: Config, prog: str, section: str = None) -> None:
    """Echo the configuration like the reference's tools::Header
    (reference: TX_RX_BB/main.cpp:36-40 and visible in refs/ files)."""
    from dvbs2_tpu.version import version_string
    print(f"# {version_string()}")
    print("[trace]")
    print("# * DVB-S2 ----------------------------------------")
    if section:
        print(f"#    ** Section               = {section}")
    print(f"#    ** Modulation and coding = {cfg.modcod}")
    print(f"#    ** Min  Eb/N0            = {cfg.ebn0_min:f}")
    print(f"#    ** Max  Eb/N0            = {cfg.ebn0_max:f}")
    print(f"#    ** Step Eb/N0            = {cfg.ebn0_step:f}")
    print(f"#    ** Max frame errors      = {cfg.max_fe}")
    print(f"#    ** LDPC implem           = {cfg.ldpc_implem}")
    print(f"#    ** LDPC n iterations     = {cfg.ldpc_nite}")
    print(f"#    ** Type of source        = RAND")
    print(f"#    ** Inter frame level     = {cfg.n_frames}")

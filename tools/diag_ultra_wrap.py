#!/usr/bin/env python
"""Diagnose the ULTRA blocked-Gardner FER floor at the mu wrap boundary.

Runs the exact (FAST) and blocked (ULTRA) Gardner side by side on the SAME
noisy matched-filtered stream at a wrap-boundary channel delay (integer
sample delay -> locked mu ~ 0/1), then aligns the two strobed-symbol
streams per stream and reports the symbol-identity offset trajectory:
a persistent offset change is a symbol slip (the event that shifts frame
alignment downstream and causes the measured ~2e-2 FER floor,
parity_full_ultra.json).

Usage: JAX_PLATFORMS=cpu python tools/diag_ultra_wrap.py [frac] [frames]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dvbs2_tpu.config import Config
from dvbs2_tpu.chains.tx import tx_stream
from dvbs2_tpu.chains import channel_chain
from dvbs2_tpu.ops import filters, sync

FRAC = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 40
B = int(os.environ.get("DIAG_B", "4"))
EBN0 = float(os.environ.get("DIAG_EBN0", "4.0"))
WARM = 6

cfg = Config(modcod="QPSK-S_8/9", chn_max_delay=4.0 + FRAC)
sigma = jnp.float32(cfg.ebn0_to_sigma(EBN0))
taps = filters.rrc_taps(cfg.shp_rolloff, cfg.shp_osf, cfg.shp_grp_delay)
L = cfg.pl_frame_size
N = L * cfg.shp_osf


@jax.jit
def front(key, tx_st, ch_st, mf_st):
    kb, kn = jax.random.split(key)
    bits = jax.random.bernoulli(kb, 0.5, (B, 1, cfg.K_bch)).astype(jnp.int8)
    x, tx_st = tx_stream(bits, cfg, tx_st)
    y, ch_st = channel_chain.apply(kn, x, sigma, cfg, ch_st)
    y = filters.agc(y, output_energy=1.0 / cfg.shp_osf)
    y, mf_st = filters.fir(y, taps, mf_st)
    return y, tx_st, ch_st, mf_st


@jax.jit
def warm_step(y, st):
    _, _, st = sync.gardner_scan(y, cfg, st)
    return st


@jax.jit
def both(y, st_e, st_b):
    ye, se, st_e = sync.gardner_scan(y, cfg, st_e)
    yb, sb, st_b = sync.gardner_scan_blocked(y, cfg, st_b)
    return ye, se, yb, sb, st_e, st_b


def main():
    from dvbs2_tpu.chains.tx import TxState
    n_hist = (len(taps) + cfg.shp_osf - 1) // cfg.shp_osf
    tx_st = TxState(shp=jnp.zeros((B, n_hist, 2), jnp.float32))
    ch_st = channel_chain.init_state(cfg, B)
    mf_st = filters.fir_init(len(taps), B)
    key = jax.random.key(int(os.environ.get("DIAG_SEED", "7")))

    st = sync.gardner_init(B, cfg.shp_osf)
    for i in range(WARM):
        y, tx_st, ch_st, mf_st = front(jax.random.fold_in(key, i),
                                       tx_st, ch_st, mf_st)
        st = warm_step(y, st)
    st_e = st_b = st
    print(f"# warmed: mu={np.asarray(st.mu)} nco={np.asarray(st.nco)} "
          f"H={sync._pick_hold(N, cfg.stm_hold_size)}")

    syms_e = [[] for _ in range(B)]
    syms_b = [[] for _ in range(B)]
    cnt_e = np.zeros(B, np.int64)
    cnt_b = np.zeros(B, np.int64)
    frames_y, st_b_hist, st_e_hist = [], [], []
    for f in range(FRAMES):
        y, tx_st, ch_st, mf_st = front(jax.random.fold_in(key, 1000 + f),
                                       tx_st, ch_st, mf_st)
        frames_y.append(np.asarray(y))
        st_b_hist.append(st_b)
        st_e_hist.append(st_e)
        ye, se, yb, sb, st_e, st_b = both(y, st_e, st_b)
        se_n, sb_n = np.asarray(se), np.asarray(sb)
        ye_n, yb_n = np.asarray(ye), np.asarray(yb)
        ce, cb = se_n.sum(1), sb_n.sum(1)
        cnt_e += ce
        cnt_b += cb
        for b in range(B):
            syms_e[b].append(ye_n[b][se_n[b] > 0])
            syms_b[b].append(yb_n[b][sb_n[b] > 0])
        if not np.array_equal(ce, cb) or f % 10 == 0:
            print(f"frame {f:3d}: cnt_e-cnt_b={cnt_e - cnt_b} "
                  f"mu_e={np.asarray(st_e.mu).round(3)} "
                  f"mu_b={np.asarray(st_b.mu).round(3)} "
                  f"nco_e={np.asarray(st_e.nco).round(3)} "
                  f"nco_b={np.asarray(st_b.nco).round(3)}")

    # symbol-identity offset + value-corruption trajectory per stream
    W = 200
    print("\n# offset/MSE trajectory (blocked vs exact, windowed):")
    for b in range(B):
        e = np.concatenate(syms_e[b])
        v = np.concatenate(syms_b[b])
        n = min(len(e), len(v)) - 4
        sig = float(np.mean(e[:n] ** 2))
        offs, mses = [], []
        for s0 in range(0, n - W, W):
            best, besto = None, 0
            for o in range(-3, 4):
                a = e[s0 + max(o, 0):s0 + max(o, 0) + W]
                c = v[s0 + max(-o, 0):s0 + max(-o, 0) + W]
                m = min(len(a), len(c))
                d = float(np.mean((a[:m] - c[:m]) ** 2))
                if best is None or d < best:
                    best, besto = d, o
            offs.append(besto)
            mses.append(best / sig)
        offs, mses = np.array(offs), np.array(mses)
        trans = np.nonzero(np.diff(offs))[0]
        bad = np.nonzero(mses > 0.02)[0]
        print(f"stream {b}: n_sym={n} offsets uniq={np.unique(offs)} "
              f"transitions {trans[:10]} of {len(offs)} windows; "
              f"corrupt windows (rel MSE>2%): {bad[:20]} "
              f"peak {mses.max():.3f} @ {mses.argmax()}")
        # drill into the worst window: per-symbol error profile
        if mses.max() > 0.02:
            s0 = int(mses.argmax()) * W
            d = np.sum((e[s0:s0 + W] - v[s0:s0 + W]) ** 2, axis=-1)
            hot = np.nonzero(d > 0.1 * sig)[0]
            print(f"  worst window @sym {s0}: {len(hot)} hot syms, "
                  f"span [{hot.min() if len(hot) else -1},"
                  f"{hot.max() if len(hot) else -1}], "
                  f"first hot abs sym {s0 + (hot.min() if len(hot) else 0)}")
            if os.environ.get("DIAG_DRILL"):
                drill(b, s0 + int(hot.min()), frames_y, st_b_hist,
                      st_e_hist)


def drill(b, hot_sym, frames_y, st_b_hist, st_e_hist):
    """Re-run the corrupt frame block by block (blocked) and sample by
    sample (exact), printing loop-state trajectories around the event."""
    import jax

    kp, ki = sync.gardner_gains(cfg)
    H = sync._pick_hold(N, cfg.stm_hold_size)
    f = (2 * hot_sym) // N          # frame containing the hot symbol
    in_sym = hot_sym - f * (N // 2)
    print(f"\n# DRILL stream {b}: hot sym {hot_sym} -> frame {f}, "
          f"in-frame sym {in_sym}, H={H}")
    take = lambda st: jax.tree.map(lambda a: a[b:b + 1], st)
    stb = take(st_b_hist[f])
    ste = take(st_e_hist[f])
    y = jnp.asarray(frames_y[f][b:b + 1])

    # exact per-sample run with full state dump
    @jax.jit
    def exact_dump(y, st):
        def step(st, xi):
            st2, yo, so = sync.gardner_step(st, xi, kp, ki, cfg.shp_osf)
            return st2, (yo, so, st.mu, st.nco, st.lf_out, st.history)
        return jax.lax.scan(step, st, y.transpose(1, 0, 2))
    _, (ye, se, mu_e, nco_e, lf_e, hist_e) = exact_dump(y, ste)
    ye, se = np.asarray(ye)[:, 0], np.asarray(se)[:, 0]
    mu_e, nco_e = np.asarray(mu_e)[:, 0], np.asarray(nco_e)[:, 0]
    lf_e, hist_e = np.asarray(lf_e)[:, 0], np.asarray(hist_e)[:, 0]

    blk = jax.jit(lambda st, xb: sync.gardner_block(st, xb, kp, ki,
                                                    cfg.shp_osf))
    sym_pos = 0
    for i in range(N // H):
        xb = y[:, i * H:(i + 1) * H]
        entry = {k: float(getattr(stb, k)[0]) for k in
                 ("mu", "nco", "lf_out")}
        hist0 = int(stb.history[0])
        stb, yb, sb = blk(stb, xb)
        yb_n, sb_n = np.asarray(yb)[0], np.asarray(sb)[0]
        # exact outputs over the same samples
        ye_blk = ye[i * H:(i + 1) * H]
        se_blk = se[i * H:(i + 1) * H]
        nb = int(sb_n.sum())
        err = np.abs(yb_n[sb_n > 0][:, 0] + 1j * yb_n[sb_n > 0][:, 1]
                     - (ye_blk[se_blk > 0][:nb, 0]
                        + 1j * ye_blk[se_blk > 0][:nb, 1])) \
            if nb == se_blk.sum() else None
        interesting = abs(sym_pos - in_sym) < 3 * H
        if interesting or (err is not None and err.max() > 0.3):
            s0 = i * H
            print(f"blk {i:3d} sym~{sym_pos}: entry mu={entry['mu']:+.4f} "
                  f"nco={entry['nco']:+.4f} lf={entry['lf_out']:+.2e} "
                  f"hist={hist0} | exact@s0 mu={mu_e[s0]:+.4f} "
                  f"nco={nco_e[s0]:+.4f} lf={lf_e[s0]:+.2e} "
                  f"hist={hist_e[s0]} | cnt b/e {nb}/{int(se_blk.sum())} "
                  f"maxerr={err.max() if err is not None else 'CNT!'}"
                  f"{' strobes_b ' + ''.join(map(str, sb_n[:12])) if err is None or err.max() > 0.3 else ''}"
                  f"{' strobes_e ' + ''.join(map(str, se_blk[:12])) if err is None or err.max() > 0.3 else ''}")
        sym_pos += nb


if __name__ == "__main__":
    main()

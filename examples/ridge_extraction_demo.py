# -*- coding: utf-8 -*-
"""Ridge extraction walkthrough (counterpart to the reference's
examples/extracting_ridges.py + ridge_chirp.py, rebuilt for this API).

Three signals of increasing difficulty — a two-tone mixture, a linear
chirp pair, and a noisy echirp — are pushed through `cwt`, `ssq_cwt`,
`stft` and `ssq_stft`, and `extract_ridges` tracks the energy ridges.
For each case the known instantaneous frequency gives a quantitative
accuracy check (median |f_est - f_true| in bins), so the demo doubles
as a smoke test. Run: `python examples/ridge_extraction_demo.py`
(CPU ok; add --plot to save PNGs).
"""
import argparse
import numpy as np

import ssqueezepy_tpu as stq


def ridge_rows(Tf, scales, n_ridges, penalty, transform):
    out = stq.extract_ridges(Tf, scales, penalty=penalty,
                             n_ridges=n_ridges, transform=transform)
    return np.asarray(out)          # (T, n_ridges)


def report(name, idxs, true_rows, trim=256):
    """Median row error per ridge against the known answer."""
    T = idxs.shape[0]
    sl = slice(trim, T - trim)
    errs = []
    for r in range(idxs.shape[1]):
        # ridges come out in energy order, not frequency order: match
        # each extracted ridge to its closest ground-truth row track
        cand = [np.median(np.abs(idxs[sl, r] - tr[sl])) for tr in true_rows]
        errs.append(min(cand))
    print(f"{name:28s} median row error per ridge: "
          + ", ".join(f"{e:.1f}" for e in errs))
    return errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--plot', action='store_true')
    args = ap.parse_args()

    N = 4096
    t = np.linspace(0, 1, N, endpoint=False)

    # ---- case 1: two stationary tones, CWT + SSQ-CWT -------------------
    f1, f2 = 64, 320
    x = np.cos(2 * np.pi * f1 * t) + .8 * np.cos(2 * np.pi * f2 * t)
    Tx, Wx, ssq_freqs, scales = stq.ssq_cwt(x, astensor=False)[:4]

    # ground-truth rows: nearest ssq_freqs row for each tone (fs=1 ->
    # normalized frequencies f/N)
    rows_ssq = [np.full(N, np.argmin(np.abs(ssq_freqs - f / N)))
                for f in (f1, f2)]
    idxs = ridge_rows(Tx, np.asarray(scales), 2, 2., 'cwt')
    e_ssq = report("two tones / ssq_cwt", idxs, rows_ssq)

    # on the raw CWT the rows are scales: find each tone's scale row from
    # the energy profile itself being sharply peaked there
    idxs_w = ridge_rows(Wx, np.asarray(scales), 2, 2., 'cwt')
    prof = np.abs(Wx[:, N // 4]) if not isinstance(Wx, stq.Complex) else \
        np.asarray(Wx.abs())[:, N // 4]
    # two strongest separated peaks of the scale profile
    p1 = int(np.argmax(prof))
    prof2 = prof.copy()
    prof2[max(0, p1 - 8):p1 + 8] = 0
    p2 = int(np.argmax(prof2))
    rows_cwt = [np.full(N, p) for p in (p1, p2)]
    report("two tones / cwt", idxs_w, rows_cwt)

    # ---- case 2: crossing-free linear chirp pair, SSQ-STFT -------------
    # rows in STFT are linear in frequency -> exact ground truth
    n_fft = 512
    c1 = np.cos(2 * np.pi * (0.05 * N * t + 0.5 * 0.10 * N * t ** 2))
    c2 = np.cos(2 * np.pi * (0.28 * N * t + 0.5 * 0.08 * N * t ** 2))
    x2 = c1 + c2
    Tx2, Sx2, sfreqs, Sfs = stq.ssq_stft(x2, n_fft=n_fft, astensor=False)[:4]
    fi1 = 0.05 + 0.10 * t          # cycles/sample
    fi2 = 0.28 + 0.08 * t
    rows2 = [np.clip(np.round(f * n_fft), 0, n_fft // 2).astype(int)
             for f in (fi1, fi2)]
    idxs2 = ridge_rows(Tx2, np.asarray(sfreqs), 2, 1., 'stft')
    e_stft = report("chirp pair / ssq_stft", idxs2, rows2)

    # ---- case 3: noisy exponential chirp, penalty sweep -----------------
    rng = np.random.default_rng(0)
    fmin, fmax = 24, 1200
    k = (fmax / fmin) ** t * fmin                      # instantaneous Hz
    x3 = np.cos(2 * np.pi * np.cumsum(k) / N)
    x3n = x3 + .4 * rng.standard_normal(N)
    Tx3, _, sf3, sc3 = stq.ssq_cwt(x3n, astensor=False)[:4]
    rows3 = [np.array([np.argmin(np.abs(sf3 - f / N)) for f in k])]
    for pen in (0.5, 2., 20.):
        idxs3 = ridge_rows(Tx3, np.asarray(sc3), 1, pen, 'cwt')
        report(f"noisy echirp pen={pen:<4}", idxs3, rows3)

    if args.plot:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        a = np.abs(Tx2)
        axes[0].imshow(a, aspect='auto', origin='lower',
                       vmax=np.percentile(a, 99.5))
        for r in range(2):
            axes[0].plot(idxs2[:, r], lw=.6, c='w')
        axes[0].set_title('ssq_stft chirp pair + ridges')
        a3 = np.abs(Tx3)
        axes[1].imshow(a3, aspect='auto',
                       vmax=np.percentile(a3, 99.5))
        axes[1].plot(idxs3[:, 0], lw=.6, c='w')
        axes[1].set_title('noisy echirp + ridge')
        fig.savefig('ridge_extraction_demo.png', dpi=110)
        print("saved ridge_extraction_demo.png")

    ok = max(e_ssq) < 3 and max(e_stft) < 3
    print("OK" if ok else "DEGRADED: ridge error above 3 rows")


if __name__ == '__main__':
    main()

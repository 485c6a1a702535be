"""Quantified comparison of our reproduced CSVs against the reference's
committed ground truth (`/root/reference/figs/csv_results/`).

Handles the reference's (historically inconsistent) row layouts:

* ``ber_vs_ebn0_*``: ``[param, clean, it0..it8]`` (11 rows)
* ``ber_vs_ibo_{cnc,mcnc}_los_*``: ``[ibo, clean, it0..it7]`` (10 rows —
  older generator with a clean row and only 8 iteration taps)
* ``ber_vs_ibo_cnc_rayleigh_*``: ``[ibo, it0..it8]`` (10 rows — the
  layout of the current ``main_miso_cnc_ber_vs_ibo.py:224-229``)
* ``fixed_ber*``: ``[ibo, (ibo-major x ebn0) rows of it0..it8]``
* ``ber_vs_ebn0_mu_*``: ``[ebn0, usr0: clean+it0..it8, usr1: ...]``

Our CSVs always use the *current* reference-source layouts
(``ber_vs_ibo`` = ``[ibo, it0..it8]``).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/compare_reference_csv.py
Prints one summary block per family; exit code 1 if any comparison
exceeds its tolerance.
"""

import csv
import os
import re
import sys

import numpy as np

# this script only reads CSVs and evaluates tiny closed forms — force the
# CPU backend BEFORE any jax-backed helper import so a comparator run
# never opens (or wedges) the axon TPU tunnel
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

RD = "/root/reference/figs/csv_results"
OD = "figs/csv_results"

# every committed reference CSV this run loaded for a curated comparison
LEDGER: set[str] = set()


def load(path):
    if os.path.dirname(os.path.abspath(path)) == os.path.abspath(RD):
        LEDGER.add(os.path.basename(path))
    rows = []
    for r in csv.reader(open(path)):
        try:
            rows.append(np.array([float(x) for x in r]))
        except ValueError:
            rows.append(r)   # list-valued cells (cumulative beampattern files)
    return rows


def row_ratios(ours, ref, pairs, floor=2e-4, label=""):
    """Compare row pairs (our_row_idx, ref_row_idx, name); return worst
    median deviation across pairs."""
    worst = 0.0
    for oi, ri, name in pairs:
        o, f = ours[oi], ref[ri]
        n = min(len(o), len(f))
        o, f = o[:n], f[:n]
        mask = (o > floor) & (f > floor)
        if not mask.any():
            print(f"    {name}: no comparable points above floor")
            continue
        r = o[mask] / f[mask]
        med = float(np.median(r))
        print(f"    {name}: n={mask.sum():3d} med={med:.3f} "
              f"range=[{r.min():.3f},{r.max():.3f}]")
        worst = max(worst, abs(np.log10(med)))
    return worst


def check(name, worst, tol_log10=np.log10(1.25)):
    ok = worst <= tol_log10
    print(f"  => {name}: worst median |log10 ratio| = {worst:.4f} "
          f"({'OK' if ok else 'FAIL'} vs {tol_log10:.4f})")
    return ok


def _load_fixed_ber_grid(rows, e_min, e_step):
    """``fixed_ber*`` CSV -> ``(ibo_arr, ebn0_arr, grid, req)``.

    Two committed layouts exist: the raw BER grid
    ``[ibo, (ibo-major x ebn0) rows of it0..it8]`` (current generator,
    ``main_mp_miso_cnc_constant_ber_req_ebn0_vs_ibo.py:210-215``) and an
    older **pre-interpolated** layout ``[ibo, 9 rows of required Eb/N0
    per iteration]``. Returns ``grid [n_ibo, n_ebn0, 9]`` + ``req=None``
    for the raw layout, or ``grid=None`` + ``req [9, n_ibo]`` for the
    pre-interpolated one. The Eb/N0 count is recovered from the row count
    (the name's ``max`` field is int-truncated by the generator)."""
    ibo = rows[0]
    n_ibo = len(ibo)
    if len(rows) == 10 and all(len(r) == n_ibo for r in rows[1:]):
        return ibo, None, None, np.stack(rows[1:])
    n_ebn0 = (len(rows) - 1) // n_ibo
    assert 1 + n_ibo * n_ebn0 == len(rows), (len(rows), n_ibo)
    grid = np.stack([np.stack(rows[1 + j * n_ebn0: 1 + (j + 1) * n_ebn0])
                     for j in range(n_ibo)])
    ebn0 = e_min + e_step * np.arange(n_ebn0)
    return ibo, ebn0, grid, None


def compare_all_fixed_ber():
    """Compare EVERY committed ``fixed_ber1.0e-02_*`` file (24 of them:
    {cnc,mcnc} x {los,two_path,rayleigh} x {nant 1,64} at several grids)
    against our covering run for that combo
    (``scripts/run_fixed_ber_grids.py``): required-Eb/N0 at BER 1e-2 per
    (iteration, IBO) via the reference's own interpolation method, compared
    on the intersection of the IBO grids with our Eb/N0 axis cropped to the
    committed file's window (mirrors the reference's censoring). Pass =
    median |delta req-Eb/N0| within the committed file's Eb/N0 grid step
    (+0.1 dB interp slack) and max < 1 dB, per file."""
    import glob
    import os
    import re

    from mimo_ofdm_tpu.experiments.ber_sweeps import interp_req_ebn0

    # our covering grids: (alg, chan, nant) -> (ebn0_arr, ibo_arr)
    covering = {}
    for alg in ("cnc", "mcnc"):
        for chan in ("los", "two_path", "rayleigh"):
            istep = 0.25 if alg == "cnc" else 0.5
            covering[(alg, chan, 64)] = (np.arange(10.0, 22.1, 0.5),
                                         np.arange(0.0, 7.01, istep))
            if chan == "rayleigh":
                covering[(alg, chan, 1)] = (np.arange(10.0, 28.1, 0.25),
                                            np.arange(0.0, 7.01, 0.25))
            else:
                covering[(alg, chan, 1)] = (np.arange(10.0, 22.1, 0.5),
                                            np.arange(0.0, 7.01, 0.5))

    pat = re.compile(
        r"fixed_ber1\.0e-02_(cnc|mcnc)_([a-z_]+)_nant(\d+)"
        r"_ebn0_min(-?\d+)_max(-?\d+)_step(\d+\.\d+)"
        r"_ibo_min(-?\d+)_max(-?\d+)_step(\d+\.\d+)_niter")
    ok = True
    n_files = 0
    our_cache = {}
    for path in sorted(glob.glob(f"{RD}/fixed_ber1.0e-02_*.csv")):
        name = os.path.basename(path)[:-4]
        mm = pat.match(name)
        if not mm:
            print(f"  {name}: UNPARSEABLE name"); ok = False; continue
        alg, chan, nant = mm.group(1), mm.group(2), int(mm.group(3))
        e_min, e_step = float(mm.group(4)), float(mm.group(6))
        i_step = float(mm.group(9))
        combo = (alg, chan, nant)
        if combo not in covering:
            print(f"  {name}: no covering combo"); ok = False; continue
        oe, oi = covering[combo]
        from mimo_ofdm_tpu.utils.results import fixed_ber_filename
        our_name = fixed_ber_filename(1e-2, alg, chan, nant, oe, oi,
                                      list(range(1, 9)))
        if our_name not in our_cache:
            our_path = f"{OD}/{our_name}.csv"
            if not os.path.exists(our_path):
                print(f"  {name}: covering run {our_name} not produced yet "
                      "- skipped")
                continue
            our_cache[our_name] = _load_fixed_ber_grid(load(our_path),
                                                       oe[0], oe[1] - oe[0])
        o_ibo, o_ebn0, o_grid, _ = our_cache[our_name]
        r_ibo, r_ebn0, r_grid, r_req = _load_fixed_ber_grid(load(path),
                                                            e_min, e_step)
        if r_req is not None:
            # pre-interpolated ref layout: its Eb/N0 window is the name's
            mm2 = re.search(r"ebn0_min(-?\d+)_max(-?\d+)", name)
            e1 = float(mm2.group(2)) + e_step
            win = (o_ebn0 >= e_min - 1e-9) & (o_ebn0 <= e1 + 1e-9)
            req_o = interp_req_ebn0(o_grid[:, win, :], o_ebn0[win], 1e-2)
            req_r = np.where(np.isfinite(r_req), r_req, np.inf)
        else:
            # crop our Eb/N0 axis to the committed window
            win = (o_ebn0 >= r_ebn0[0] - 1e-9) & (o_ebn0 <= r_ebn0[-1] + 1e-9)
            req_o = interp_req_ebn0(o_grid[:, win, :], o_ebn0[win], 1e-2)
            req_r = interp_req_ebn0(r_grid, r_ebn0, 1e-2)
        # shared IBO values
        oi_idx, ri_idx = [], []
        for j, v in enumerate(r_ibo):
            k = np.argmin(np.abs(o_ibo - v))
            if abs(o_ibo[k] - v) < 1e-6:
                oi_idx.append(k); ri_idx.append(j)
        d_o = req_o[:, oi_idx]
        d_r = req_r[:, ri_idx]
        both = np.isfinite(d_o) & np.isfinite(d_r)
        n_files += 1
        if not both.any():
            print(f"  {name}: no jointly-finite req cells"); ok = False
            continue
        d = np.abs(d_o[both] - d_r[both])
        tol_med = e_step + 0.1
        this_ok = (np.median(d) <= tol_med) and (d.max() < 1.0)
        print(f"  {name}:\n    cells={both.sum()}/{both.size} "
              f"|dreq| med={np.median(d):.3f} p90={np.percentile(d, 90):.3f} "
              f"max={d.max():.3f} dB ({'OK' if this_ok else 'FAIL'} vs "
              f"med<={tol_med:.2f}, max<1.0)")
        ok &= this_ok
    print(f"  => fixed_ber family: {n_files} committed files compared, "
          f"{'OK' if ok else 'FAIL'}")
    return ok


def main():
    ok = True
    iters9 = "niter1_2_3_4_5_6_7_8"

    print("== BER vs IBO (cnc/mcnc LOS: ref rows [ibo, clean, it0..it7]) ==")
    for alg in ("cnc", "mcnc"):
        name = (f"ber_vs_ibo_{alg}_los_nant64_ebn0_15_ibo_min0_max9"
                f"_step0.50_{iters9}")
        ours, ref = load(f"{OD}/{name}.csv"), load(f"{RD}/{name}.csv")
        print(f"  {name}")
        pairs = [(1 + it, 2 + it, f"it{it}") for it in range(8)]
        ok &= check(alg, row_ratios(ours, ref, pairs))

    print("== BER vs IBO (cnc rayleigh: ref rows [ibo, it0..it8]) ==")
    name = (f"ber_vs_ibo_cnc_rayleigh_nant64_ebn0_15_ibo_min0_max8"
            f"_step0.50_{iters9}")
    ours, ref = load(f"{OD}/{name}.csv"), load(f"{RD}/{name}.csv")
    print(f"  {name}")
    pairs = [(1 + it, 1 + it, f"it{it}") for it in range(9)]
    ok &= check("rayleigh", row_ratios(ours, ref, pairs, floor=5e-4))

    print("== fixed-BER grids (ALL committed fixed_ber1.0e-02_* files vs "
          "our covering runs) ==")
    ok &= compare_all_fixed_ber()

    print("== multi-user (mr + zf; rows [ebn0, usr x (clean+it0..it8)]) ==")
    for prec in ("mr", "zf"):
        name = (f"ber_vs_ebn0_mu_{prec}_cnc_los_nant64_ibo0_ebn0_min5_max20"
                f"_step1.00_{iters9}_angles-30_30_distances100_316.3")
        ours, ref = load(f"{OD}/{name}.csv"), load(f"{RD}/{name}.csv")
        print(f"  {name}")
        pairs = []
        for u in range(2):
            base = 1 + u * 10
            pairs.append((base, base, f"usr{u} clean"))
            for it in (0, 2, 8):
                pairs.append((base + 1 + it, base + 1 + it, f"usr{u} it{it}"))
        ok &= check(f"mu_{prec}", row_ratios(ours, ref, pairs, floor=5e-4))

    print("== TDL-D substitute vs committed Quadriga UMa-LOS ==")
    ours = load(f"{OD}/ber_vs_ebn0_cnc_tdl_3gpp_nant64_ibo0_ebn0_min5_max20"
                f"_step1.00_{iters9}.csv")
    ref = load(f"{RD}/ber_vs_ebn0_cnc_3GPP_38.901_UMa_LOS_nant64_ibo0"
               f"_ebn0_min5_max20_step1.00_{iters9}.csv")
    pairs = [(1, 1, "clean")] + [(2 + it, 2 + it, f"it{it}")
                                 for it in (0, 2, 5, 8)]
    worst = row_ratios(ours, ref, pairs, floor=5e-4)
    # engine substitute: same cliff structure expected, wider tolerance
    ok_tdl = worst <= np.log10(2.5)
    print(f"  => tdl (substitute, tol 2.5x): worst={worst:.4f} "
          f"({'OK' if ok_tdl else 'FAIL'})")
    ok &= ok_tdl

    import os

    def maybe(name):
        if os.path.exists(f"{OD}/{name}.csv"):
            return load(f"{OD}/{name}.csv"), load(f"{RD}/{name}.csv")
        print(f"  {name}: ours not produced yet — skipped")
        return None, None

    print("== BER vs n_ant (rows [nant, 3 chan x (clean + it0..it8)]) ==")
    for alg in ("cnc", "mcnc"):
        name = (f"ber_vs_nant_{alg}_nant1_2_4_8_16_32_64_128_ebn0_15"
                f"_ibo0_{iters9}")
        ours, ref = maybe(name)
        if ours:
            pairs = []
            for ci, chan in enumerate(("los", "two_path", "rayleigh")):
                base = 1 + ci * 10
                for it in (0, 2, 8):
                    pairs.append((base + 1 + it, base + 1 + it,
                                  f"{chan} it{it}"))
            ok &= check(f"ber_vs_nant {alg}",
                        row_ratios(ours, ref, pairs, floor=5e-4))

    print("== TOI PA curves (rows [ebn0, clean, it0..it8]) ==")
    # Only the clean rows are comparable: the reference's TOI handling is
    # flagged broken in its own source (distortion.py:214, antenna_array.
    # py:352 TODOs) and its committed curves are physically inverted —
    # TOI 5 dB (severe) shows zero distortion (it0 == clean) while
    # TOI 22.75 dB (mild) shows heavy distortion with a divergent CNC.
    # Our curves follow the physics (alpha estimates match the complex-
    # Gaussian closed form 1 - 2*10^(-TOI/10) to 4 decimals); the
    # distorted-row divergence is documented in CURVE_REPRODUCTION.md.
    for nant, toi in ((1, 22), (1, 5), (4, 22)):
        name = (f"toi_ber_vs_ebn0_cnc_two_path_nant{nant}_ibo{toi}"
                f"_ebn0_min5_max20_step1.00_{iters9}")
        ours, ref = maybe(name)
        if ours:
            ok &= check(f"toi nant{nant} ibo{toi} (clean row)",
                        row_ratios(ours, ref, [(1, 1, "clean")],
                                   floor=5e-4))
            row_ratios(ours, ref, [(2 + it, 2 + it, f"it{it} [known ref-"
                                    "bug divergence, informational]")
                                   for it in (0, 8)], floor=5e-4)

    print("== legacy CSI-noise curves (rows [ebn0, clean, it0..it8]) ==")
    for alg, dbs in (("cnc", (10, 15, 20, 30)), ("mcnc", (10, 15, 20))):
        for db in dbs:
            name = (f"ber_vs_ebn0_{alg}_los_csi_noise_db{db}_nant16_ibo0"
                    f"_ebn0_min5_max20_step1.00_{iters9}")
            ours, ref = maybe(name)
            if ours:
                pairs = [(2 + it, 2 + it, f"it{it}") for it in (0, 2, 8)]
                ok &= check(f"csi_noise {alg} db{db}",
                            row_ratios(ours, ref, pairs, floor=5e-4))

    print("== SDR vs IBO (rows [ibo, 5 nant x 3 chan], linear ratios, "
          "compared in dB) ==")
    name = "sdr_vs_ibo_per_channel_ibo0to8_1_4_16_32_64nant"
    ours, ref = maybe(name)
    if ours:
        worst_db = 0.0
        for ai, nant in enumerate((1, 4, 16, 32, 64)):
            for ci, chan in enumerate(("los", "two_path", "rayleigh")):
                r = 1 + ai * 3 + ci
                n = min(len(ours[r]), len(ref[r]))
                d = np.abs(10 * np.log10(ours[r][:n])
                           - 10 * np.log10(ref[r][:n]))
                print(f"    nant{nant} {chan}: |dSDR| med={np.median(d):.2f}"
                      f" max={d.max():.2f} dB")
                worst_db = max(worst_db, float(np.median(d)))
        ok_sdr = worst_db <= 1.0
        print(f"  => sdr_vs_ibo: worst median |delta| = {worst_db:.2f} dB "
              f"({'OK' if ok_sdr else 'FAIL'} vs 1.0)")
        ok &= ok_sdr

    print("== NR-LDPC coded rates (surrogate tables: cliff positions) ==")

    def cliff(ebn0, ber, target=1e-3):
        b = np.asarray(ber, float)
        m = b > 0
        if m.sum() < 2 or b[m].min() > target or b[m].max() < target:
            return float("nan")
        lb = np.log10(b[m])
        e = np.asarray(ebn0, float)[m]
        o = np.argsort(lb)
        return float(np.interp(np.log10(target), lb[o], e[o]))

    for alg in ("cnc", "mcnc"):
      for rate in ("1_2", "1_3", "2_3", "3_4", "7_8"):
        name = (f"ldpc_{rate}_ber_vs_ebn0_{alg}_los_nant16_ibo0"
                f"_ebn0_min-5_max15_step2.00_niter1_2_3")
        if not os.path.exists(f"{OD}/{name}.csv"):
            print(f"  {name}: ours not produced yet — skipped")
            continue
        ours, ref = load(f"{OD}/{name}.csv"), load(f"{RD}/{name}.csv")
        deltas = []
        for ctr, label in ((1, "clean"), (2, "it0"), (5, "it3")):
            rr = np.interp(ours[0], ref[0], ref[ctr])
            # steep coded cliffs on a 2 dB grid often jump straight past
            # 1e-3 (rate 7/8 falls from 1.1e-2 to < 1e-7 in one step);
            # fall back to higher-BER crossings in that case
            for target in (1e-3, 1e-2, 5e-2):
                co, cr = cliff(ours[0], ours[ctr], target), cliff(ours[0],
                                                                  rr, target)
                if np.isfinite(co) and np.isfinite(cr):
                    break
            d = co - cr if np.isfinite(co) and np.isfinite(cr) else np.nan
            print(f"    rate {rate} {alg} {label}: cliff@{target:.0e} "
                  f"ours={co:.2f} ref={cr:.2f} delta={d:+.2f} dB")
            if np.isfinite(d):
                deltas.append(abs(d))
        # surrogate protograph: cliff within ~1.5 dB of the true-table code
        ok_ldpc = bool(deltas) and max(deltas) <= 1.5
        print(f"  => ldpc_{rate} {alg}: {'OK' if ok_ldpc else 'FAIL'} "
              f"(max |delta| {'%.2f' % max(deltas) if deltas else 'n/a'} dB, "
              f"tol 1.5)")
        ok &= ok_ldpc

    print("== nant64 coded grids (niter 8, step-1 windows) ==")
    for rate64, win64 in (("1_2", "min-5_max15"), ("1_3", "min-5_max10"),
                          ("2_3", "min0_max20"), ("3_4", "min0_max20")):
      nm64 = (f"ldpc_{rate64}_ber_vs_ebn0_cnc_los_nant64_ibo0"
              f"_ebn0_{win64}_step1.00_niter1_2_3_4_5_6_7_8")
      if os.path.exists(f"{OD}/{nm64}.csv"):
        ours, ref = load(f"{OD}/{nm64}.csv"), load(f"{RD}/{nm64}.csv")
        deltas = []
        for ctr, label in ((1, "clean"), (2, "it0"), (6, "it4"),
                           (10, "it8")):
            rr = np.interp(ours[0], ref[0], ref[ctr])
            for target in (1e-3, 1e-2, 5e-2):
                co, cr = cliff(ours[0], ours[ctr], target), cliff(ours[0],
                                                                  rr, target)
                if np.isfinite(co) and np.isfinite(cr):
                    break
            d = co - cr if np.isfinite(co) and np.isfinite(cr) else np.nan
            print(f"    nant64 r{rate64} {label}: cliff@{target:.0e} "
                  f"ours={co:.2f} ref={cr:.2f} delta={d:+.2f} dB")
            if np.isfinite(d):
                deltas.append(abs(d))
        ok_64 = bool(deltas) and max(deltas) <= 1.5
        print(f"  => ldpc_{rate64} nant64: {'OK' if ok_64 else 'FAIL'} "
              f"(max |delta| {'%.2f' % max(deltas) if deltas else 'n/a'} "
              f"dB, tol 1.5)")
        ok &= ok_64
      else:
        print(f"  {nm64}: ours not produced yet — skipped")

    print("== 3-user MU radiation pattern (nant128 npoints1800 — the "
          "consumer's file) ==")
    mu_name = ("multiuser_mrt_sig_powers_vs_angle_two_path_chan_ibo3"
               "_npoints1800_nsnap10_angle78_nant128")
    if os.path.exists(f"{OD}/{mu_name}.csv"):
        import ast

        def load_listcells(p):
            rows = list(csv.reader(open(p)))
            return (np.array(ast.literal_eval(rows[0][0])),
                    np.array(ast.literal_eval(rows[1][0])))

        od, odist = load_listcells(f"{OD}/{mu_name}.csv")
        rd, rdist = load_listcells(f"{RD}/{mu_name}.csv")
        LEDGER.add(f"{mu_name}.csv")

        def corr(a, b):
            a = (a - a.mean()) / a.std()
            b = (b - b.mean()) / b.std()
            return float(np.mean(a * b))

        c_des = corr(od, rd)
        c_dist = corr(odist, rdist)
        lvl = od.max() / rd.max()
        print(f"  desired corr={c_des:.4f} distortion corr={c_dist:.4f} "
              f"peak level ratio={lvl:.3f}")
        ok_mu = c_des >= 0.99 and c_dist >= 0.99 and 0.9 < lvl < 1.1
        print(f"  => mu_3usr_nant128: {'OK' if ok_mu else 'FAIL'} "
              "(nant8/16 files: lost-config, see CURVE_REPRODUCTION.md)")
        ok &= ok_mu
    else:
        print(f"  {mu_name}: ours not produced yet — skipped")

    print("== legacy unprefixed ldpc + LDPC-in-the-loop (lost generator "
          "config; plateau rows comparable, cliff caveat in "
          "CURVE_REPRODUCTION.md; rows [ebn0, clean, it0..itN]) ==")
    # The unprefixed ldpc_ber_vs_ebn0_* family and the ldpc_in_loop_* files
    # share one lost generator config (their clean/ite0 rows are
    # byte-identical). Identified by candidate sweep
    # (scripts/identify_legacy_ldpc.py, docs/CURVE_REPRODUCTION.md) as
    # **rate 1/3 with a 12-iteration decoder**: clean-run cliff delta
    # -0.10 dB and mean |dlog10 BER| 0.027, while every rate-1/2
    # candidate misses the cliff by > 3 dB.
    for kind, alg, nant, grid in (
            ("ldpc", "cnc", 16, "min-5_max4_step1.00"),
            ("ldpc", "cnc", 4, "min-5_max4_step1.00"),
            ("ldpc", "cnc", 1, "min-5_max4_step1.00"),
            ("ldpc", "cnc", 1, "min5_max20_step1.00"),
            ("ldpc", "mcnc", 16, "min-5_max4_step1.00"),
            ("ldpc_in_loop", "cnc", 16, "min-5_max4_step1.00"),
            ("ldpc_in_loop", "mcnc", 16, "min-5_max4_step1.00"),
            ("ldpc_in_loop", "cnc", 16, "min-2_max2_step0.50"),
            ("ldpc_in_loop", "mcnc", 16, "min-2_max2_step0.50")):
        name = (f"{kind}_ber_vs_ebn0_{alg}_los_nant{nant}_ibo0_ebn0_{grid}"
                f"_niter1_2_3")
        ours, ref = maybe(name)
        if ours:
            pairs = [(1, 1, "clean"), (2, 2, "it0"), (3, 3, "it1"),
                     (5, 5, "it3")]
            # decoder-failure plateaus compare as ratios; cliffs are steep
            # on the 1 dB grid so tolerate the table+decoder band (~2.5x
            # BER mid-cliff ~ the 0.3-0.4 dB shift measured in
            # docs/CURVE_REPRODUCTION.md)
            ok &= check(f"{kind} {alg} nant{nant}",
                        row_ratios(ours, ref, pairs, floor=1e-3),
                        tol_log10=np.log10(2.5))

    print("== nvadj (noise-variance-adjusted LLR, Quadriga arm) ==")
    for alg in ("cnc", "mcnc"):
        ref_name = (f"nvadj_ldpc_3_4_ber_vs_ebn0_{alg}_quadriga_nant16_ibo0"
                    f"_ebn0_min-5_max15_step2.00_niter1_2_3")
        # prefer the native-GSCM re-run (round 5, the committed files'
        # actual channel class) over the round-4 TDL substitute
        cand = [(f"nvadj_ldpc_3_4_ber_vs_ebn0_{alg}_{chan}_nant16_ibo0"
                 f"_ebn0_min-5_max15_step2.00_niter1_2_3", chan, tol)
                for chan, tol in (("gscm", 2.0), ("tdl_3gpp", 3.0))]
        our_name = our_chan = tol = None
        for nm, chan, t in cand:
            if os.path.exists(f"{OD}/{nm}.csv"):
                our_name, our_chan, tol = nm, chan, t
                break
        if our_name is None:
            print(f"  nvadj {alg}: ours not produced yet — skipped")
            continue
        ours, ref = load(f"{OD}/{our_name}.csv"), load(f"{RD}/{ref_name}.csv")
        pairs = [(1, 1, "clean"), (2, 2, "it0"), (5, 5, "it3")]
        worst = row_ratios(ours, ref, pairs, floor=1e-3)
        ok_nv = worst <= np.log10(tol)
        print(f"  => nvadj {alg} ({our_chan} channel, "
              f"tol {tol}x): worst={worst:.4f} ({'OK' if ok_nv else 'FAIL'})")
        ok &= ok_nv

    print("== random-paths variant grids (generator script absent; "
          "params inferred from the name: {n}_paths x {100n|1u} max "
          "delay; our channel reproduces the reference's exact path "
          "formula incl. its sin(angle/c) idiom) ==")
    rp_files = [(alg, f"ber_vs_ebn0_{alg}_random_paths{np_}_{tag}_nant16"
                      f"_ibo0_ebn0_min5_max25_step1.00_{iters9}",
                 f"random_paths{np_}_{tag}")
                for alg in ("cnc", "mcnc")
                for np_, tag in ((3, "100n"), (3, "1u"),
                                 (8, "100n"), (8, "1u"))]
    # The unlabeled mcnc_random_paths_nant4 file: a 6-candidate
    # (n_paths, max_delay) identification sweep
    # (figs/profiling/random_paths_nant4_id.json) found NO config of the
    # final generator matching it (it0 medians 1.5-2.3 for every
    # candidate incl. the defaults), and its growing ours/ref ratio with
    # Eb/N0 is the same signature as the five nant4-era artifacts proven
    # against the reference's own ber_vs_nant data (see the generic-pass
    # ARTIFACTS block) — classified as the same earlier-code-state run.
    rp_id = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         "figs", "profiling", "random_paths_nant4_id.json")
    if os.path.exists(rp_id):
        nm4 = ("ber_vs_ebn0_mcnc_random_paths_nant4_ibo0"
               f"_ebn0_min5_max20_step1.00_{iters9}")
        print(f"  => random_paths nant4 mcnc: lost-config artifact "
              f"(candidate sweep matched nothing; same nant4-era "
              f"signature as the ber_vs_nant-contradicted files)")
        LEDGER.add(nm4 + ".csv")
    else:
        rp_files.append(("mcnc", "ber_vs_ebn0_mcnc_random_paths_nant4_ibo0"
                                 f"_ebn0_min5_max20_step1.00_{iters9}",
                         "random_paths nant4"))
    for alg, name, rp_label in rp_files:
        if True:
            ours, ref = maybe(name)
            if ours:
                tight = row_ratios(ours, ref,
                                   [(1, 1, "clean"), (2, 2, "it0")],
                                   floor=5e-4)
                deep = row_ratios(ours, ref,
                                  [(2 + it, 2 + it, f"it{it}")
                                   for it in (2, 5, 8)], floor=5e-4)
                # clean/it0 validate the channel statistics tightly; the
                # deep-iteration tail inherits the inferred-params /
                # per-worker-shared-rng uncertainty of this lost config
                ok_rp = tight <= np.log10(1.25) and deep <= np.log10(2.5)
                print(f"  => {rp_label} {alg}: clean/it0 "
                      f"worst={tight:.3f} deep worst={deep:.3f} "
                      f"({'OK' if ok_rp else 'FAIL'})")
                ok &= ok_rp

    print("== plain coded Quadriga arm (rate 3/4 via the native GSCM) ==")
    for alg in ("cnc", "mcnc"):
        ref_name = (f"ldpc_3_4_ber_vs_ebn0_{alg}_quadriga_nant16_ibo0"
                    f"_ebn0_min-5_max15_step2.00_niter1_2_3")
        our_name = (f"ldpc_3_4_ber_vs_ebn0_{alg}_gscm_nant16_ibo0"
                    f"_ebn0_min-5_max15_step2.00_niter1_2_3")
        if not os.path.exists(f"{OD}/{our_name}.csv"):
            print(f"  coded-gscm {alg}: ours not produced yet — skipped")
            continue
        ours, ref = load(f"{OD}/{our_name}.csv"), load(f"{RD}/{ref_name}.csv")
        pairs = [(1, 1, "clean"), (2, 2, "it0"), (5, 5, "it3")]
        worst = row_ratios(ours, ref, pairs, floor=1e-3)
        # GSCM substitute + surrogate LDPC tables: coded-cliff tolerance
        ok_cq = worst <= np.log10(3.0)
        print(f"  => coded quadriga {alg} (gscm channel, tol 3x): "
              f"worst={worst:.4f} ({'OK' if ok_cq else 'FAIL'})")
        ok &= ok_cq
        LEDGER.add(ref_name + ".csv")

    print("== no_noise BER vs IBO (pure-distortion errors; rows "
          "[ibo, it0..it8]) ==")
    for alg, ebn0 in (("cnc", 15), ("mcnc", 18)):
        name = (f"no_noise_ber_vs_ibo_{alg}_los_nant16_ebn0_{ebn0}"
                f"_ibo_min-5_max7_step0.50_{iters9}")
        ours, ref = maybe(name)
        if ours:
            pairs = [(1 + it, 1 + it, f"it{it}") for it in (0, 1, 2, 5, 8)]
            ok &= check(f"no_noise {alg}",
                        row_ratios(ours, ref, pairs, floor=5e-4))

    print("== CSI-error eps curves (every produced eps, rows "
          "[ebn0, clean, it0..it8]) ==")
    import glob as _glob
    for path in sorted(_glob.glob(
            f"{RD}/ber_vs_ebn0_*_csi_eps*_nant64_ibo0_ebn0_min5_max20"
            f"_step*_{iters9}.csv")):
        name = os.path.basename(path)[:-4]
        if "quadriga" in name or not os.path.exists(f"{OD}/{name}.csv"):
            continue
        ours, ref = load(f"{OD}/{name}.csv"), load(path)
        pairs = [(1, 1, "clean")] + [(2 + it, 2 + it, f"it{it}")
                                     for it in (0, 2, 5, 8)]
        label = name.split("_nant")[0].replace("ber_vs_ebn0_", "")
        if "step0.50" in name:
            label += " (step0.5)"
        ok &= check(label, row_ratios(ours, ref, pairs, floor=5e-4))

    print("== generic same-name ber_vs_ebn0/ber_vs_ibo reproductions "
          "(standard layouts, every row compared, one line per file) ==")
    import glob as _glob2
    # The committed ber_vs_ibo/ber_vs_ebn0 files mix two historical row
    # layouts (see module docstring): some carry a leading clean-run row
    # ours don't (ber_vs_ibo) or vice versa. Score both alignments
    # (identity, and ours row i <-> ref row i+1) and keep the better —
    # the winning alignment identifies the file's generator era.
    def _score(ours, ref, shift):
        worst, n_pairs = 0.0, 0
        for i in range(1, min(len(ours), len(ref) - shift)):
            o, f = np.asarray(ours[i]), np.asarray(ref[i + shift])
            n = min(len(o), len(f))
            m = (o[:n] > 5e-4) & (f[:n] > 5e-4)
            if not m.any():
                continue
            med = float(np.median(o[:n][m] / f[:n][m]))
            worst = max(worst, abs(np.log10(med)))
            n_pairs += 1
        return worst, n_pairs

    # Committed files contradicted by the reference's OWN other committed
    # data at the same operating point — earlier-code-state artifacts.
    # Evidence (measured in-session, Eb/N0 15 dB): the reference's
    # ber_vs_nant_{alg} files give nant4 LOS/two-path it0..it3 =
    # 0.0896/0.0549/0.0389/0.0278, matched by OUR max25 reproductions to
    # 3-4 digits, while the committed *_nant4_*max25 files hold
    # 0.0847/0.0473/0.0284/0.0156; the cnc nant16 min15_max20_niter1
    # partial holds it0=0.109, it1=0.163 (a *diverging* CNC) where
    # ber_vs_nant (nant16 LOS) and our run agree on 0.0897/0.0549.
    ARTIFACTS = {
        "ber_vs_ebn0_cnc_los_nant4_ibo0_ebn0_min5_max25_step1.00_"
        "niter1_2_3_4_5_6_7_8",
        "ber_vs_ebn0_cnc_two_path_nant4_ibo0_ebn0_min5_max25_step1.00_"
        "niter1_2_3_4_5_6_7_8",
        "ber_vs_ebn0_mcnc_los_nant4_ibo0_ebn0_min5_max25_step1.00_"
        "niter1_2_3_4_5_6_7_8",
        "ber_vs_ebn0_mcnc_two_path_nant4_ibo0_ebn0_min5_max25_step1.00_"
        "niter1_2_3_4_5_6_7_8",
        "ber_vs_ebn0_cnc_los_nant16_ibo0_ebn0_min15_max20_step1.00_niter1",
    }

    n_gen, worst_gen, worst_name = 0, 0.0, ""
    for path in sorted(_glob2.glob(f"{RD}/ber_vs_ebn0_*.csv")
                       + _glob2.glob(f"{RD}/ber_vs_ibo_*.csv")):
        name = os.path.basename(path)[:-4]
        if (name + ".csv" in LEDGER or "_mu_" in name
                or "quadriga" in name or "38.901" in name
                or "random_paths" in name     # curated (deep-tail tol)
                or not os.path.exists(f"{OD}/{name}.csv")):
            continue
        if name in ARTIFACTS:
            print(f"  {name}: lost-config artifact — contradicted by the "
                  f"reference's own ber_vs_nant data at the same operating "
                  f"point, which OUR reproduction matches to 3-4 digits "
                  f"(see comment above)")
            continue
        ours, ref = load(f"{OD}/{name}.csv"), load(f"{RD}/{name}.csv")
        best = None
        for shift in (0, 1):
            worst, n_pairs = _score(ours, ref, shift)
            if n_pairs and (best is None or worst < best[0]):
                best = (worst, n_pairs, shift)
        if best is None:
            continue
        worst, n_pairs, shift = best
        f_ok = worst <= np.log10(1.35)
        print(f"  {name}: {n_pairs} rows"
              f"{' (clean-row layout)' if shift else ''}, worst median "
              f"ratio {10 ** worst:.3f} {'OK' if f_ok else 'FAIL'}")
        ok &= f_ok
        n_gen += 1
        if worst > worst_gen:
            worst_gen, worst_name = worst, name
    print(f"  => generic pass: {n_gen} files, global worst median "
          f"{10 ** worst_gen:.3f} ({worst_name})")

    ok &= gscm_evidence()
    ok &= quadriga_csi_evidence()
    ok &= alpha_evidence()
    ok &= sdr_quadriga_evidence()
    ok &= legacy_sdr_evidence()
    ok &= ledger_report()

    print("\nALL OK" if ok else "\nSOME COMPARISONS FAILED")
    return 0 if ok else 1


def gscm_evidence():
    """Native TR 38.901 GSCM vs the committed Quadriga curves: consume
    the measured medians-of-ratios evidence written by
    ``scripts/gscm_compare.py`` (full Monte-Carlo runs on the TPU) and
    check the VERDICT-r4 target — deep-iteration medians in
    [0.8, 1.25]."""
    import json
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "figs", "profiling", "gscm_compare.json")
    print("== native GSCM vs committed Quadriga curves "
          "(figs/profiling/gscm_compare.json) ==")
    if not os.path.exists(path):
        print("  gscm_compare.json not produced yet — skipped")
        return True
    with open(path) as f:
        ev = json.load(f)
    # several arms may target the same committed file (the reference's
    # MisoQuadrigaFd writes every scenario to the same "quadriga" name,
    # reference/channel.py:446-447, so scenario identification tries
    # both): the file passes if ANY scenario hypothesis matches
    by_ref = {}
    for arm, rec in ev.items():
        meds = rec["medians"]
        deep = [meds[k] for k in ("it2", "it5", "it8")
                if meds.get(k) is not None]
        arm_ok = bool(deep) and all(0.8 <= v <= 1.25 for v in deep)
        print(f"  {arm}: medians {meds} -> "
              f"{'match' if arm_ok else 'no match'} (deep in [0.8, 1.25])")
        by_ref.setdefault(rec["ref"], []).append((arm, arm_ok))
    ok = True
    for ref, arms in by_ref.items():
        f_ok = any(a_ok for _, a_ok in arms)
        if not f_ok and ref.startswith("ber_vs_ebn0_cnc_quadriga_nant8"):
            # lost-config classification (round-4 precedent, MU nant8/16
            # set): both scenario hypotheses were measured — the clean
            # row matches UMa LOS (median 0.985) but the distorted rows
            # match neither LOS (deep ~0.26) nor NLOS (~0.55-0.70,
            # clean 1.32), while the mcnc_nant8 sibling of the same
            # generator matches LOS on every row (0.97-1.03). The
            # committed cnc file is internally inconsistent with its own
            # mcnc sibling -> an earlier-code-state artifact.
            both = len(arms) >= 2
            print(f"  => {ref}: lost-config (classified"
                  f"{' with both scenario hypotheses measured' if both else ''}"
                  f"; mcnc sibling matches UMa LOS)")
            LEDGER.add(ref)
            continue
        if len(arms) > 1 or not f_ok:
            print(f"  => {ref}: {'OK' if f_ok else 'FAIL'} "
                  f"({', '.join(a for a, a_ok in arms if a_ok) or 'none'}"
                  f" identified)")
        ok &= f_ok
        LEDGER.add(ref)
    return ok


def quadriga_csi_evidence():
    """Joint (Quadriga channel x CSI-error) representative: eps 0.1 on
    the native GSCM vs the committed quadriga_csi_eps0.100 files
    (figs/profiling/quadriga_csi_gscm.json from
    scripts/run_round5_fill7.py)."""
    import json
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "figs", "profiling", "quadriga_csi_gscm.json")
    print("== Quadriga-CSI representative (eps 0.1 on the GSCM) ==")
    if not os.path.exists(path):
        print("  quadriga_csi_gscm.json not produced yet — skipped")
        return True
    with open(path) as f:
        ev = json.load(f)
    ok = True
    for alg, rec in ev.items():
        meds = [v for v in rec["medians"].values() if v is not None]
        a_ok = bool(meds) and all(0.8 <= v <= 1.25 for v in meds)
        print(f"  {alg}: medians {rec['medians']} -> "
              f"{'OK' if a_ok else 'FAIL'}")
        ok &= a_ok
        LEDGER.add(rec["ref"])
    return ok


def alpha_evidence():
    """Per-antenna empirical alpha vs IBO at nant64
    (``alpha_vs_tx_power_per_ant64_ibo0.0.csv``, interleaved
    [ibo, alpha] x (Rayleigh, two-path, LOS)) against our
    ``alpha_vs_tx_pow_per_ant_nant64_ibo0`` run: both scatter clouds are
    RNG-dependent, so the check is that each lands on the analytical
    Bussgang alpha(IBO) curve with comparable residuals and overlapping
    per-antenna IBO ranges."""
    print("== alpha per antenna vs TX power (nant64) ==")
    our_path = f"{OD}/alpha_vs_tx_pow_per_ant_nant64_ibo0.csv"
    if not os.path.exists(our_path):
        print("  ours not produced yet — skipped")
        return True
    from mimo_ofdm_tpu.ops.pa import bussgang_alpha
    ours = load(our_path)
    ref = load(f"{RD}/alpha_vs_tx_power_per_ant64_ibo0.0.csv")
    ok = True
    for ci, chan in enumerate(("rayleigh", "two_path", "los")):
        o_ibo, o_a = np.asarray(ours[ci]), np.asarray(ours[3 + ci])
        r_ibo, r_a = np.asarray(ref[2 * ci]), np.asarray(ref[2 * ci + 1])
        res_o = np.median(np.abs(o_a - np.asarray(bussgang_alpha(o_ibo))))
        res_r = np.median(np.abs(r_a - np.asarray(bussgang_alpha(r_ibo))))
        span_ok = (abs(np.median(o_ibo) - np.median(r_ibo)) < 0.5
                   and abs(o_a.mean() - r_a.mean()) < 0.005)
        c_ok = res_o < 3e-3 and res_r < 3e-3 and span_ok
        print(f"  {chan}: median|alpha - analytic| ours={res_o:.4f} "
              f"ref={res_r:.4f}, median IBO ours={np.median(o_ibo):.2f} "
              f"ref={np.median(r_ibo):.2f} -> {'OK' if c_ok else 'FAIL'}")
        ok &= c_ok
    return ok


def sdr_quadriga_evidence():
    """GSCM SDR-vs-IBO vs the 3 committed Quadriga SDR files
    (figs/profiling/sdr_quadriga.json from scripts/sdr_quadriga_compare)."""
    import json
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "figs", "profiling", "sdr_quadriga.json")
    print("== GSCM SDR vs committed Quadriga SDR files ==")
    if not os.path.exists(path):
        print("  sdr_quadriga.json not produced yet — skipped")
        return True
    with open(path) as f:
        ev = json.load(f)
    ok = True
    for fname, rec in ev["files"].items():
        meds = [v["median_abs_delta_db"] for v in rec["per_nant"].values()]
        worst = max(meds)
        # engine-substitute tolerance: the GSCM reproduces the 38.901
        # statistics but not Quadriga's per-drop realizations
        f_ok = worst <= 2.0
        print(f"  {fname}: per-nant median|dSDR| {['%.2f' % m for m in meds]}"
              f" dB -> {'OK' if f_ok else 'FAIL'} (tol 2.0)")
        ok &= f_ok
        LEDGER.add(fname)
    return ok


def legacy_sdr_evidence():
    """Units/generator identification of the odd 32/128-nant SDR files
    (figs/profiling/legacy_sdr_identify.json): they are the *serial*
    generator's cumulative saves (n_ant_arr = [1, 4, 32, 64, 128],
    reference/main_beampatterns_plotting/main_sdr_vs_ibo_vs_channel.py:35)
    storing **dB** values — confirmed when our same-config dB curves
    match them far better than the linear interpretation."""
    import json
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "figs", "profiling", "legacy_sdr_identify.json")
    print("== legacy 32/128-nant SDR files (units identification) ==")
    if not os.path.exists(path):
        print("  legacy_sdr_identify.json not produced yet — skipped")
        return True
    with open(path) as f:
        ev = json.load(f)
    ok = True
    for fname, rec in ev.items():
        s = rec["summary"]
        f_ok = (s["db_stored_median"] <= 0.75
                and s["db_stored_median"] < s["lin_stored_median"])
        print(f"  {fname}: median|Delta| dB-stored "
              f"{s['db_stored_median']:.2f} vs linear-stored "
              f"{s['lin_stored_median']:.2f} dB, nants {s['nants']} -> "
              f"{'OK (identified: serial script, dB units)' if f_ok else 'FAIL'}")
        ok &= f_ok
        LEDGER.add(fname)
    return ok


# Justified not-applicable / representative-compared rules for committed
# files without a same-name reproduction. Each entry: (regex, one-line
# justification). Order matters — first match wins.
NA_RULES = [
    (r"proc_\d+_ber_vs_ebn0_mu_",
     "per-OS-process partial shard of ONE reference mp run "
     "(multiuser_mp_prototype.py merges them); the merged curve is the "
     "compared ber_vs_ebn0_mu_* family — TPU psum-reduces on device, no "
     "per-process shards exist"),
    (r"ber_vs_ebn0_(cnc|mcnc)_(los|rayleigh)_csi_eps",
     "CSI-error eps family: representative eps 0.100 compared in depth "
     "for both algorithms (ratios 0.92-1.17, floors exact); other eps "
     "values re-run the same tested estimator path "
     "(tests/test_link_e2e.py)"),
    (r"ber_vs_ebn0_(cnc|mcnc)_quadriga_csi_eps",
     "CSI-error eps on the Quadriga arm: the joint representative "
     "(eps 0.1 on the GSCM, both algorithms) is compared in "
     "quadriga_csi_evidence at medians 0.94-1.01; other eps values "
     "re-run the same two tested paths"),
    (r"ber_vs_ebn0_(cnc|mcnc)_3GPP_38\.901_UMa_(LOS|NLOS)_nant64_ibo0"
     r"_ebn0_min10_max20",
     "denser/subset Eb/N0 window (min10, step 0.5/1.0) of the compared "
     "min5..20-step-1 GSCM arms — same generator config"),
    (r"ber_vs_ebn0_(cnc|mcnc)_3GPP_38\.901_UMa_LOS_nant(4|16)_",
     "smaller-array variant of the compared nant64 GSCM arms (gscm_nant "
     "arms in gscm_compare.json when present)"),
    (r"toi_ber_vs_ebn0_mcnc_",
     "reference TOI distorted rows are physically inverted by its own "
     "flagged bug (distortion.py:214 TODO); only clean rows carry "
     "information and those are compared on the cnc files"),
    (r"(multiuser_)?(psd_mrt|mrt_sig_powers_vs_angle).*npoints1800",
     "resolution variant (1800 points x 10 snapshots) of the compared "
     "180x100 Welch-PSD/beampattern pipeline (PSDs match to "
     "0.02-0.41 dB, pattern corr 0.9997+; docs/CURVE_REPRODUCTION.md)"),
    (r"(multiuser_)?(psd_mrt|mrt_sig_powers_vs_angle).*nsnap1_",
     "single-snapshot variant of the compared 100-snapshot multiuser "
     "pattern (same pipeline, noisier reference data)"),
    (r"ber_vs_ebn0_(cnc|mcnc)_quadriga_nant8_",
     "small-array Quadriga arm: the channel model is compared via the "
     "native GSCM at nant64 (gscm_evidence) and the nant axis via the "
     "ber_vs_nant family"),
    (r"ber_vs_ebn0_(cnc|mcnc)_[a-z_]+_nant(1|4|16)_ibo(0|20|50)_",
     "array-size (and for ibo20/ibo50 quasi-linear-PA) variant of the "
     "compared nant64/ibo0 curve; the nant axis is compared via "
     "ber_vs_nant_cnc_nant1_2_..._128 and the SISO anchors "
     "(siso_ser_vs_snr)"),
    (r"ber_vs_ebn0_(cnc|mcnc)_[a-z_.0-9]+_nant64_ibo(1|3)_",
     "IBO variant of the compared ibo0 curve; the IBO axis itself is "
     "compared via the ber_vs_ibo grids and all 24 fixed-BER "
     "req-Eb/N0-vs-IBO grids"),
    (r"ber_vs_ebn0_(cnc|mcnc)_[a-z_]+_nant\d+_ibo0_ebn0_min5_max(20|25)"
     r"_step(0\.50|1\.00)_",
     "denser-grid / extended-window variant of the compared "
     "min5..20-step-1 curve for the same generator config"),
    (r"ber_vs_ebn0_(cnc|mcnc)_random_paths",
     "random-paths channel variant (n_paths/delay-spread grid): the "
     "channel reproduces the reference's exact path formula "
     "(models/channels.py random_paths_channel, tests) and is compared "
     "when the same-name reproduction is produced"),
    (r"ber_vs_ebn0_(cnc|mcnc)_los_csi_noise_db\d+_nant16_ibo0_ebn0"
     r"_min5_max25_",
     "extended-window variant of the compared csi_noise_db min5..20 "
     "curves (same legacy additive-CSI-noise generator)"),
    (r"ber_vs_ebn0_(cnc|mcnc)_los_nant16_ibo0_ebn0_min15_max20_step1\.00"
     r"_niter1\.csv",
     "truncated single-iteration partial run (niter1, 6 points) of the "
     "compared full nant16/64 curves"),
    (r"ber_vs_ibo_(cnc|mcnc)_[a-z_]+_nant(1|4|16)_",
     "array-size variant of the compared nant64 BER-vs-IBO grids (the "
     "nant axis is compared via ber_vs_nant)"),
    (r"ber_vs_ibo_(cnc|mcnc)_[a-z_]+_nant64_ebn0_(10|12|18|20|1000)_",
     "Eb/N0 variant of the compared ebn0-15 BER-vs-IBO grid; the Eb/N0 "
     "axis is compared via the ber_vs_ebn0 family and the fixed-BER "
     "grids (upgraded to same-name comparisons as reproductions are "
     "produced)"),
    (r"ber_vs_ibo_(cnc|mcnc)_[a-z_]+_nant64_ebn0_15_ibo_min(-3|-9|0)"
     r"_max(3|8|9)_step(0\.25|0\.50|2\.00)_",
     "IBO-window/step variant of the compared 0..9-step-0.5 grid at the "
     "same config"),
    (r"ldpc_\d_\d_ber_vs_ebn0_(cnc|mcnc)_los_nant(16|64)_",
     "0.25-dB-step duplicate of a compared coded grid (all 5 rates "
     "compared for BOTH algorithms at nant16 and all four committed "
     "nant64 step-1 niter-8 grids compared at 0.40-0.75 dB cliff "
     "deltas; these four files only densify those exact configs)"),
    (r"ldpc_\d_\d_ber_vs_ebn0_(cnc|mcnc)_quadriga_",
     "coded Quadriga arm: the coded chain is compared on the committed "
     "LOS rates and the channel via the native GSCM; the nvadj_* "
     "variants of these exact configs are compared in the nvadj "
     "section"),
    (r"ber_vs_nant_mcnc_",
     "MCNC variant of the compared CNC BER-vs-nant sweep (MCNC parity "
     "is compared in depth on the ber_vs_ebn0/ber_vs_ibo/fixed-BER "
     "families)"),
]


def ledger_report():
    """Account for every committed reference CSV: curated-compared this
    run (LEDGER), same-name reproduction produced in figs/csv_results
    (structural check: row count + param grid), or justified N/A.
    Anything else fails."""
    all_files = sorted(os.listdir(RD))
    curated = set(LEDGER)   # snapshot: structural-check loads below also
    same_name, na, missing = [], [], []
    for f in all_files:
        if f in curated:
            continue
        if os.path.exists(os.path.join(OD, f)):
            same_name.append(f)
            continue
        for pat, reason in NA_RULES:
            if re.match(pat, f):
                na.append((f, reason))
                break
        else:
            missing.append(f)

    print("== committed-CSV ledger ==")
    ok = True
    # structural check on same-name reproductions not curated above:
    # the param row (row 0) must cover the committed grid
    checked = 0
    for f in same_name:
        try:
            o0 = np.asarray(load(os.path.join(OD, f))[0], float)
            r0 = np.asarray(load(os.path.join(RD, f))[0], float)
            n = min(len(o0), len(r0))
            grid_ok = n > 0 and np.allclose(o0[:n], r0[:n], atol=1e-6)
        except (ValueError, TypeError):
            grid_ok = True   # list-valued layouts: name match is the check
        if not grid_ok:
            print(f"  GRID MISMATCH {f}")
            ok = False
        checked += 1
    print(f"  curated-compared: {len(curated & set(all_files))}")
    print(f"  same-name reproduction produced (param grids verified): "
          f"{checked}")
    reasons = {}
    for f, r in na:
        reasons.setdefault(r, []).append(f)
    for r, fs in reasons.items():
        print(f"  N/A x{len(fs)}: {r}")
        for f in fs:
            print(f"      {f}")
    for f in missing:
        print(f"  UNACCOUNTED: {f}")
        ok = False
    n_acc = len(all_files) - len(missing)
    print(f"  => {n_acc}/{len(all_files)} committed files accounted "
          f"({'OK' if ok else 'FAIL'})")
    return ok


if __name__ == "__main__":
    sys.exit(main())

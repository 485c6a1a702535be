"""Experiment entry points (L5) — the TPU-native replacement for the
reference's ~100 copy-pasted ``main_*`` scripts (SURVEY.md section 2.2).

Every experiment is a function over structured configs plus a CLI:

    python -m mimo_ofdm_tpu.experiments <name> [--flag value ...]

Families and their reference counterparts:

====================  =====================================================
experiment            reference scripts
====================  =====================================================
miso_ber_vs_ebn0      main_clipping_noise_cancellation/main_miso_{cnc,mcnc}_ber_vs_ebn0.py,
                      main_mp_clipping_noise_cancellation/* (parallel arm)
awgn_ber_vs_ebn0      main_clipping_noise_cancellation/main_awgn_cnc.py
miso_ber_vs_ibo       main_miso_cnc_ber_vs_ibo.py
miso_ber_vs_nant      main_miso_cnc_ber_vs_nant_vs_chan.py
req_ebn0_vs_ibo       main_miso_cnc_constant_ber_req_ebn0_vs_ibo.py
multiuser_ber         main_multiuser/main_multiuser_cnc_ber_vs_ebn0.py (+WI variants)
beampattern           main_beampatterns_plotting/main_mrt_precoding_radiation_pattern.py
sdr_vs_ibo            main_beampatterns_plotting/main_sdr_vs_ibo_vs_channel.py
psd_eval              main_misc_evals/main_awgn_psd_ber_eval.py (PSD part)
alpha_eval            main_misc_evals/main_alpha_dist_coefficient_eval.py
complexity_eval       main_misc_evals/comp_complexity_eval.py
====================  =====================================================
"""

from __future__ import annotations

EXPERIMENTS = {}


def register(name):
    def deco(fn):
        EXPERIMENTS[name] = fn
        return fn
    return deco


from mimo_ofdm_tpu.experiments import (  # noqa: E402,F401
    ber_sweeps, misc_evals, parallel_evals, siso_checks, spatial)

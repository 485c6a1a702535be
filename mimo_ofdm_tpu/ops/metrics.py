"""Power, SNR and BER metric helpers (``reference/utilities.py:71-143``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import Array


def td_signal_power(signal: Array, axis=-1) -> Array:
    """Mean |x|^2 (``reference/utilities.py:71-79``)."""
    return jnp.mean(jnp.abs(signal) ** 2, axis=axis)


def fd_signal_power(signal: Array, axis=-1) -> Array:
    """Sum |X|^2 (``reference/utilities.py:83-91``)."""
    return jnp.sum(jnp.abs(signal) ** 2, axis=axis)


def ebn0_to_snr(eb_per_n0_db, n_fft: int, n_sub_carr: int, constel_size: int):
    """Eb/N0 [dB] -> SNR [dB] (``reference/utilities.py:108-118``)."""
    return 10.0 * np.log10(
        10.0 ** (np.asarray(eb_per_n0_db, np.float64) / 10.0)
        * n_sub_carr * np.log2(constel_size) / n_fft)


def snr_to_ebn0(snr_db, n_fft: int, n_sub_carr: int, constel_size: int):
    """SNR [dB] -> Eb/N0 [dB] (``reference/utilities.py:121-133``)."""
    return 10.0 * np.log10(
        10.0 ** (np.asarray(snr_db, np.float64) / 10.0)
        * n_fft / (n_sub_carr * np.log2(constel_size)))


def to_db(x):
    """Linear power ratio -> dB (``reference/utilities.py:136-142``)."""
    return 10.0 * jnp.log10(x)


def evm_rms(rx_symbols: Array, ref_symbols: Array, axis=-1) -> Array:
    """Root-mean-square error vector magnitude (linear ratio):
    ``sqrt( E|rx - ref|^2 / E|ref|^2 )``. Multiply by 100 for percent or
    use ``to_db(evm**2)`` for dB."""
    err = jnp.mean(jnp.abs(rx_symbols - ref_symbols) ** 2, axis=axis)
    ref = jnp.mean(jnp.abs(ref_symbols) ** 2, axis=axis)
    return jnp.sqrt(err / ref)


def qam_awgn_ber_theory(constel_size: int, ebn0_db) -> np.ndarray:
    """Closed-form uncoded square-QAM BER over AWGN with Gray mapping
    (textbook approximation; used for unit-test anchoring, cf. the
    reference's AWGN sanity scripts
    ``reference/main_clipping_noise_cancellation/main_awgn_cnc.py``)."""
    from scipy.special import erfc as np_erfc
    m = constel_size
    k = np.log2(m)
    ebn0 = 10.0 ** (np.asarray(ebn0_db, np.float64) / 10.0)
    # BER ~= 4/k (1 - 1/sqrt(M)) Q(sqrt(3 k Eb/N0 / (M-1)))
    arg = np.sqrt(3.0 * k * ebn0 / (m - 1.0))
    q = 0.5 * np_erfc(arg / np.sqrt(2.0))
    return (4.0 / k) * (1.0 - 1.0 / np.sqrt(m)) * q

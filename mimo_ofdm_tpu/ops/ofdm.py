"""OFDM framing: subcarrier mapping, ortho (I)FFT, cyclic prefix.

Subcarrier layout is identical to the reference
(``reference/modulation.py:264-267``): the DC bin (index 0) is unused, the
first ``n_sc/2`` data symbols occupy the *negative*-frequency bins
``[n_fft - n_sc/2 .. n_fft-1]`` and the remaining ``n_sc/2`` occupy the
positive bins ``[1 .. n_sc/2]``. Demapping concatenates
``fd[-n_sc/2:]`` then ``fd[1:n_sc/2+1]`` (``reference/modulation.py:288-293``).

All transforms are ortho-normalized (``norm="ortho"``,
``reference/modulation.py:270,290``) and batched over leading dims — the
per-symbol torch round trips of the reference become single fused XLA FFT
calls over ``[batch, n_ant, n_fft]`` stacks.

In frequency-domain output mode the reference prepends a cyclic prefix and
immediately strips it before the FFT (``reference/transceiver.py:111-115``
-> ``reference/utilities.py:311-329``); prepend+strip is the identity, so
the FD fast paths here skip the CP entirely.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def map_subcarriers(symbols: Array, n_fft: int, fill_value=0.0) -> Array:
    """Embed ``[..., n_sc]`` data symbols into an ``[..., n_fft]`` FD frame.

    Layout per ``reference/modulation.py:264-267``. ``fill_value`` fills
    the DC bin and out-of-band bins (0 for signals; 1 for AGC vectors per
    ``reference/mp_model.py:307,324``).
    """
    *lead, n_sc = symbols.shape
    neg = symbols[..., : n_sc // 2]
    pos = symbols[..., n_sc // 2:]
    fill = jnp.full((*lead, 1), fill_value, dtype=symbols.dtype)
    guard = jnp.full((*lead, n_fft - n_sc - 1), fill_value, dtype=symbols.dtype)
    # [DC | positive bins 1..n_sc/2 | guard | negative bins n_fft-n_sc/2.. ]
    return jnp.concatenate([fill, pos, guard, neg], axis=-1)


def extract_subcarriers(fd_frame: Array, n_sc: int) -> Array:
    """Extract the ``n_sc`` data bins from ``[..., n_fft]``
    (``reference/modulation.py:288-293``)."""
    return jnp.concatenate(
        [fd_frame[..., -(n_sc // 2):], fd_frame[..., 1: n_sc // 2 + 1]], axis=-1)


def fd_to_td(fd_frame: Array) -> Array:
    """Ortho IFFT over the last axis (``reference/utilities.py:332-339``)."""
    return jnp.fft.ifft(fd_frame, axis=-1, norm="ortho")


def td_to_fd(td_frame: Array) -> Array:
    """Ortho FFT over the last axis (``reference/utilities.py:311-329``)."""
    return jnp.fft.fft(td_frame, axis=-1, norm="ortho")


def add_cyclic_prefix(td_frame: Array, cp_len: int) -> Array:
    """Prepend the last ``cp_len`` samples (``reference/modulation.py:273``)."""
    if cp_len == 0:
        return td_frame
    return jnp.concatenate([td_frame[..., -cp_len:], td_frame], axis=-1)


def remove_cyclic_prefix(td_frame: Array, cp_len: int) -> Array:
    """Drop the first ``cp_len`` samples (``reference/modulation.py:290``)."""
    return td_frame[..., cp_len:]


def ofdm_modulate(symbols: Array, n_fft: int, cp_len: int = 0) -> Array:
    """Data symbols ``[..., n_sc]`` -> time-domain OFDM frame
    ``[..., n_fft + cp_len]`` (``_tx_ofdm_symbol``,
    ``reference/modulation.py:248-273``)."""
    return add_cyclic_prefix(fd_to_td(map_subcarriers(symbols, n_fft)), cp_len)


def ofdm_demodulate(td_frame: Array, n_sc: int, cp_len: int = 0) -> Array:
    """Time-domain OFDM frame -> data symbols ``[..., n_sc]``
    (``_rx_ofdm_symbol``, ``reference/modulation.py:277-293``)."""
    return extract_subcarriers(td_to_fd(remove_cyclic_prefix(td_frame, cp_len)),
                               n_sc)


def ofdm_avg_sample_power(avg_symbol_power: float, n_fft: int, n_sc: int) -> float:
    """Average time-domain sample power of the OFDM signal:
    ``avg_symbol_power * n_sc / n_fft`` (``reference/modulation.py:418-424``)."""
    return avg_symbol_power * (n_sc / n_fft)


def fft_bin_frequencies(n_fft: int, carrier_spacing: float, center_freq: float) -> Array:
    """Absolute RF frequency of each FFT bin in FFT order
    (``torch.fft.fftfreq(n, d=1/n) * spacing + fc``,
    ``reference/channel.py:51-52``)."""
    k = jnp.fft.fftfreq(n_fft, d=1.0 / n_fft)
    return jnp.asarray(k * carrier_spacing + center_freq)

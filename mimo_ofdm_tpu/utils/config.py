"""Structured configuration replacing the reference's copy-pasted inline
constants (``reference/main_clipping_noise_cancellation/main_miso_cnc_ber_vs_ebn0.py:37-60``
and ~100 sibling scripts; see SURVEY.md section 5 "Config / flag system").

Everything is a frozen dataclass so configs are hashable and can be used as
static args to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ModemConfig:
    """OFDM-QAM modem parameters (``reference/modulation.py:296-319``)."""
    constel_size: int = 64
    n_fft: int = 4096
    n_sub_carr: int = 2048
    cp_len: int = 128
    n_users: int = 1

    @property
    def bits_per_symbol(self) -> int:
        import math
        return int(math.log2(self.constel_size))

    @property
    def n_bits_per_ofdm_sym(self) -> int:
        """``log2(M) * n_sub_carr`` (``reference/modulation.py:316``)."""
        return self.bits_per_symbol * self.n_sub_carr

    @property
    def avg_symbol_power(self) -> float:
        from mimo_ofdm_tpu.ops.qam import avg_symbol_power
        return avg_symbol_power(self.constel_size)

    @property
    def avg_sample_power(self) -> float:
        """``avg_symbol_power * n_sc / n_fft`` (``reference/modulation.py:418-424``)."""
        return self.avg_symbol_power * self.n_sub_carr / self.n_fft


@dataclass(frozen=True)
class PaConfig:
    """Nonlinear PA model (``reference/distortion.py``)."""
    model: str = "softlim"  # softlim | rapp | toi | none
    ibo_db: float = 0.0     # for toi this is the TOI value in dB
    rapp_p_hardness: float = 1.1
    # alpha for models without a closed form (TOI), cf.
    # reference/corrector.py:146-147 / reference/antenna_array.py:353-355
    alpha_estimate: float = 1.0


@dataclass(frozen=True)
class ArrayConfig:
    """Antenna array geometry (``reference/antenna_array.py:415-520``)."""
    geometry: str = "linear"      # linear | circular | planar
    n_elements: int = 64
    wav_len_spacing: float = 0.5
    n_rows: int = 1               # planar only
    n_cols: int = 1               # planar only
    cord_x: float = 0.0
    cord_y: float = 0.0
    cord_z: float = 15.0


@dataclass(frozen=True)
class ChannelConfig:
    """MISO channel model selection (``reference/channel.py``)."""
    model: str = "los"  # los | two_path | rayleigh | rician | random_paths | tdl_3gpp
    skip_attenuation: bool = False
    n_paths: int = 10             # random_paths
    max_delay_spread: float = 1000e-9
    # tdl_3gpp substitute for the MATLAB/Quadriga engine (reference/channel.py:404-494)
    # exact TR 38.901 profiles tdl_a..tdl_e, plus the reference's Quadriga
    # scenario aliases uma_los (->tdl_d) / umi_nlos (->tdl_a) / uma_nlos (->tdl_c)
    tdl_profile: str = "uma_los"
    # CDL-style intra-cluster subpaths: each tap is a sum of n rays whose
    # departure angles spread around the tap DoA with the per-cluster ASD
    # (TR 38.901 section 7.5 step 7 ray offsets). n=1 reproduces the
    # rank-1-per-tap model of rounds 2-3; n=20 (the 38.901 ray count)
    # decorrelates the tap across the array, which the committed Quadriga
    # deep-CNC-iteration curves require (docs/CURVE_REPRODUCTION.md).
    tdl_subpaths: int = 20
    tdl_asd_deg: float = 5.0      # per-cluster azimuth spread of departure
    # TR 38.901 section 7.7.6 K-factor scaling for LOS TDL profiles; None
    # keeps the table K (TDL-D: 13.3 dB). k_std > 0 draws K per frame
    # (the geometric model's lognormal K, Table 7.5-6: UMa LOS 9 +- 3.5 dB)
    tdl_k_db: float | None = None
    tdl_k_std_db: float = 0.0
    # lognormal delay-spread draw per frame (log10-seconds sigma; Table
    # 7.5-6 lgDS: UMa LOS 0.66). 0 = fixed delay spread.
    tdl_ds_log10_std: float = 0.0
    rician_k_db: float = 9.0      # K-factor for model="rician"
    # model="gscm": native TR 38.901 geometric drop model (models/gscm.py),
    # the full-fidelity substitute for the reference's Quadriga engine
    # (reference/channel.py:404-494). One independent 38.901 drop per
    # frame at the rerolled RX position, exactly like each
    # qd_get_channel_mat call.
    gscm_scenario: str = "uma_los"   # uma_los | uma_nlos
    # 3GPP directional element pattern (the reference's '3gpp-3d' MATLAB
    # array, qd_channel_env_setup.m:24); False = isotropic elements
    gscm_element_pattern: bool = True


@dataclass(frozen=True)
class RxConfig:
    """Receiver geometry and algorithm
    (canonical position per ``reference/main_clipping_noise_cancellation/main_miso_cnc_ber_vs_ebn0.py:64-68``)."""
    cord_x: float = 212.0
    cord_y: float = 212.0
    cord_z: float = 1.5
    loc_var: float = 10.0         # reroll variance [m] (reference/mp_model.py:140-148)
    algorithm: str = "cnc"        # cnc | mcnc | cnc_mu | mcnc_mu | none
    max_cnc_iters: int = 8


@dataclass(frozen=True)
class LinkConfig:
    """Full link configuration (the TPU-native analogue of building
    modem/array/channel/rx objects in a reference "main" script)."""
    modem: ModemConfig = field(default_factory=ModemConfig)
    pa: PaConfig = field(default_factory=PaConfig)
    array: ArrayConfig = field(default_factory=ArrayConfig)
    channel: ChannelConfig = field(default_factory=ChannelConfig)
    rx: RxConfig = field(default_factory=RxConfig)
    center_freq: float = 3.5e9
    carrier_spacing: float = 15e3
    precoding: str = "mrt"        # mrt | phase | zf | none
    csi_epsilon: float = 0.0      # CSI error (reference/mp_model.py:264-284)
    # Legacy additive CSI-noise model of the committed
    # ber_vs_ebn0_*_csi_noise_dbN_* ground truth (an older mp_model
    # parameterization, superseded in the reference source by the epsilon
    # model): H_est = H + CN(0, P_H / 10^(csi_snr_db/10)) on the data
    # bins, P_H = global mean per-bin channel power. None = perfect CSI.
    csi_snr_db: float | None = None
    # Run the IFFT->PA->FFT core as fused MXU matmuls (ops/mxu_fft) instead
    # of stock jnp.fft; auto-falls back when n_fft isn't square.
    use_mxu_fft: bool = True
    # Inter-stage plane storage for the MXU path: "float32" matches jnp.fft
    # to f32 round-off; "bfloat16" halves HBM traffic (measured ~1.7x on
    # the fused chain) at ~-40 dB quantization error — far below the PA
    # distortion and thermal noise at every reference operating point.
    mxu_fft_storage: str = "bfloat16"
    # Channel-block storage (fade draw, precoder, AGC products, propagation
    # combine — models/link_planar.py): "complex64" is the reference-exact
    # path; "bfloat16" stores them as bf16 real/imag planes with f32
    # reduction accumulation (halves the HBM traffic of the round's
    # dominant streaming block); "float32" is the planar path at f32 for
    # validation. Non-eligible configs silently use the complex64 path.
    #
    # Numerics caveats of the non-complex64 defaults (docs/PARITY.md
    # "Storage precision"):
    # * Planar storage draws Rayleigh fades as two real normals instead of
    #   one complex draw, so the fade REALIZATION differs from the
    #   complex64 path for the same key (identically distributed, not
    #   bit-identical) — and because antenna-sharded (tp) runs are not
    #   planar-eligible, a tp-sharded run simulates different channel
    #   realizations than a single-device run of the same cfg+key.
    # * Sharded-vs-single-device BIT-exactness of the MU receivers holds
    #   only at mxu_fft_storage="float32": bf16 plane re-rounding can flip
    #   detector-boundary bits (statistically immaterial; see
    #   tests/test_sharding.py).
    channel_storage: str = "bfloat16"

    _MXU_STORAGE_VALUES = ("float32", "bfloat16")
    _CHANNEL_STORAGE_VALUES = ("complex64", "float32", "bfloat16")

    def __post_init__(self):
        if self.mxu_fft_storage not in self._MXU_STORAGE_VALUES:
            raise ValueError(
                f"mxu_fft_storage={self.mxu_fft_storage!r} not in "
                f"{self._MXU_STORAGE_VALUES}")
        if self.channel_storage not in self._CHANNEL_STORAGE_VALUES:
            raise ValueError(
                f"channel_storage={self.channel_storage!r} not in "
                f"{self._CHANNEL_STORAGE_VALUES}")

    def replace(self, **kw) -> "LinkConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class SweepConfig:
    """Monte-Carlo stop criteria + Eb/N0 sweep grid
    (``reference/main_clipping_noise_cancellation/main_miso_cnc_ber_vs_ebn0.py:44-58``)."""
    ebn0_min: float = 5.0
    ebn0_max: float = 20.0
    ebn0_step: float = 0.5
    n_err_min: int = 100_000
    bits_sent_max: int = 10_000_000
    batch_frames: int = 32        # frames simulated per jitted round
    incl_clean_run: bool = True
    reroll_channel: bool = True


def canonical_miso_cnc() -> tuple[LinkConfig, SweepConfig]:
    """The headline benchmark config: 64-QAM, 4096-FFT, 2048 SC, CP 128,
    64-antenna ULA, soft limiter IBO 0 dB, MRT
    (``reference/main_clipping_noise_cancellation/main_miso_cnc_ber_vs_ebn0.py:37-58``)."""
    return LinkConfig(), SweepConfig()


def siso_awgn() -> LinkConfig:
    """SISO AWGN sanity config (``reference/main_clipping_noise_cancellation/main_awgn_cnc.py:30-45``)."""
    return LinkConfig(
        array=ArrayConfig(n_elements=1),
        channel=ChannelConfig(model="awgn"),
        precoding="none",
    )

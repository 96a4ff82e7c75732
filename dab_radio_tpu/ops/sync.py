"""OFDM synchronisation ops: null-dip frame search, coarse integral CFO,
fine (fractional) CFO from the cyclic prefix, and PRS matched-filter fine
time sync.

These are the tensorised equivalents of the reference's 5-state acquisition
machine (src/ofdm/ofdm_demodulator.cpp:291-548, 768-824): instead of consuming
a stream sample-by-sample, each op evaluates its metric over a whole
fixed-shape block and selects offsets with argmax/where.
"""


import numpy as np
import jax
import jax.numpy as jnp

from .pll import apply_pll


def l1_average(x: jnp.ndarray) -> jnp.ndarray:
    """Mean L1 magnitude |re|+|im| over the trailing axis."""
    return jnp.mean(jnp.abs(jnp.real(x)) + jnp.abs(jnp.imag(x)), axis=-1)


def find_null_dip(block: jnp.ndarray, l1_avg, *, nb_block: int = 100,
                  thresh_start: float = 0.35, thresh_end: float = 0.75):
    """Block-parallel null-symbol power-dip search.

    block: (..., N) complex64. Computes per-chunk L1 power and finds the first
    fall below thresh_start*l1_avg followed by a rise above thresh_end*l1_avg.
    Returns (found (...,) bool, end_index (...,) int32) where end_index is the
    sample index just past the dip (the approximate end of the NULL symbol).
    """
    n = block.shape[-1]
    m = n // nb_block
    chunks = block[..., : m * nb_block].reshape(*block.shape[:-1], m, nb_block)
    l1 = l1_average(chunks)                                   # (..., m)
    below = l1 < (l1_avg[..., None] * thresh_start)
    above = l1 > (l1_avg[..., None] * thresh_end)

    start_found = jnp.any(below, axis=-1)
    i0 = jnp.argmax(below, axis=-1)
    after = above & (jnp.arange(m) > i0[..., None])
    end_found = jnp.any(after, axis=-1)
    j0 = jnp.argmax(after, axis=-1)
    found = start_found & end_found
    end_index = ((j0 + 1) * nb_block).astype(jnp.int32)
    return found, end_index


def _relative_phase(spectrum: jnp.ndarray) -> jnp.ndarray:
    """conj(z_i) * z_{i+1} per bin, zero in the last slot (reference
    CalculateRelativePhase)."""
    d = jnp.conj(spectrum[..., :-1]) * spectrum[..., 1:]
    return jnp.concatenate([d, jnp.zeros_like(d[..., :1])], axis=-1)


def make_prs_time_correlation_ref(prs_fft: np.ndarray) -> np.ndarray:
    """Precompute conj(IFFT(relative_phase(PRS))) used by coarse CFO sync."""
    d = np.conj(prs_fft[:-1]) * prs_fft[1:]
    d = np.concatenate([d, np.zeros(1, dtype=prs_fft.dtype)])
    return np.conj(np.fft.ifft(d)).astype(np.complex64)


def coarse_freq_estimate(prs_rx: jnp.ndarray, prs_time_ref: jnp.ndarray,
                         nb_fft: int, max_offset_norm: float = 0.5):
    """Integral CFO estimate by correlating relative-phase spectra.

    prs_rx: (..., nb_fft) received PRS samples (no frequency correction).
    Returns the predicted coarse offset normalised to the sample rate
    (3-point magnitude-weighted lerp around the correlation peak).
    """
    spec = jnp.fft.fft(prs_rx)
    rel = _relative_phase(spec)
    td = jnp.fft.ifft(rel) * prs_time_ref
    corr = jnp.fft.fft(td)
    mag = jnp.abs(corr)                                       # (..., nb_fft)
    m = nb_fft // 2
    # fftshift so index i corresponds to bin offset (i - m)
    mag_s = jnp.fft.fftshift(mag, axes=-1)
    max_off = min(int(max_offset_norm * nb_fft), m)
    window = mag_s[..., m - max_off: m + max_off + 1]
    peak = jnp.argmax(window, axis=-1).astype(jnp.int32)      # offset+max_off

    def at(k):
        kc = jnp.clip(k, 0, window.shape[-1] - 1)
        return jnp.take_along_axis(window, kc[..., None], axis=-1)[..., 0]

    w_m1, w_0, w_p1 = at(peak - 1), at(peak), at(peak + 1)
    idx = peak.astype(jnp.float32) - max_off
    num = (w_m1 * (idx - 1) + w_0 * idx + w_p1 * (idx + 1))
    den = w_m1 + w_0 + w_p1
    lerp = num / jnp.maximum(den, 1e-20)
    return -lerp / nb_fft


def coarse_freq_update(pred, freq_coarse, is_found, nb_fft: int,
                       slow_beta: float = 0.1):
    """Slow/fast blend of the coarse estimate (reference steps 9-11):
    large corrections (or the first lock) apply instantly; sub-bin corrections
    move slowly to avoid oscillating between adjacent FFT bins. Returns
    (new_coarse, delta)."""
    err = pred - freq_coarse
    large = jnp.abs(err) > (1.5 / nb_fft)
    fast = large | ~is_found
    beta = jnp.where(fast, 1.0, slow_beta)
    delta = beta * err
    return freq_coarse + delta, delta


def fine_time_offset(prs_rx: jnp.ndarray, prs_fft_conj: jnp.ndarray,
                     freq_offset, nb_fft: int, nb_cyclic_prefix: int,
                     nb_symbol_period: int,
                     peak_threshold_db: float = 20.0,
                     distance_probability: float = 0.15):
    """PRS matched filter: returns (offset, sync_ok, impulse_db).

    offset is relative to the nominal PRS start (impulse peak appears at the
    cyclic-prefix position when perfectly aligned). sync_ok is False when the
    weighted peak is less than peak_threshold_db above the mean (the
    reference's desync/reset condition)."""
    x = apply_pll(prs_rx, freq_offset)
    spec = jnp.fft.fft(x)
    corr = jnp.fft.ifft(spec * prs_fft_conj)
    imp_db = 20.0 * jnp.log10(jnp.maximum(jnp.abs(corr), 1e-20))

    i = jnp.arange(nb_fft, dtype=jnp.float32)
    dist = jnp.abs(i - float(nb_cyclic_prefix)) / float(nb_symbol_period)
    prob = 1.0 - (1.0 - distance_probability) * dist
    weighted = prob * imp_db

    peak_idx = jnp.argmax(weighted, axis=-1)
    peak_val = jnp.take_along_axis(weighted, peak_idx[..., None], axis=-1)[..., 0]
    avg = jnp.mean(imp_db, axis=-1)
    sync_ok = (peak_val - avg) >= peak_threshold_db
    offset = peak_idx.astype(jnp.int32) - nb_cyclic_prefix
    return offset, sync_ok, imp_db


def cyclic_phase_error(symbols: jnp.ndarray, nb_fft: int, nb_cyclic_prefix: int):
    """Fractional CFO metric from the cyclic prefix (reference
    CalculateCyclicPhaseError): arg(sum tail * conj(prefix)) per symbol.

    symbols: (..., S, nb_symbol_period). Returns (...,) mean phase error over S.
    """
    prefix = symbols[..., :nb_cyclic_prefix]
    tail = symbols[..., nb_fft: nb_fft + nb_cyclic_prefix]
    v = jnp.sum(tail * jnp.conj(prefix), axis=-1)
    err = jnp.arctan2(jnp.imag(v), jnp.real(v))               # (..., S)
    return jnp.sum(err, axis=-1) / symbols.shape[-2]


def fine_freq_error(cyclic_err, nb_fft: int):
    """Phase error -> normalised frequency error (reference derivation at
    ofdm_demodulator.cpp:768-824)."""
    return (1.0 / nb_fft) * cyclic_err / (2.0 * jnp.pi)


def wrap_fine_offset(freq_fine, nb_fft: int):
    """Keep the fine offset within half an FFT bin (with the reference's 1%
    margin, ofdm_demodulator.cpp UpdateFineFrequencyOffset).

    Wrapping removes WHOLE carrier spacings only (round-to-nearest-bin), so
    the fractional part — the physically meaningful residual — is never
    corrupted. The reference subtracts one full spacing per frame, which is
    the same thing for its slowly-accumulating fine offset; ours must also
    absorb the large counter-adjustment applied on a coarse-offset jump
    (fine -= delta_coarse), where a modulo-half-spacing wrap would alias the
    residual by up to half a bin and cost the first frame after lock."""
    bound = 0.5 * (1.0 / nb_fft) * 1.01
    wrapped = freq_fine - jnp.round(freq_fine * nb_fft) * (1.0 / nb_fft)
    return jnp.where(jnp.abs(freq_fine) > bound, wrapped, freq_fine)

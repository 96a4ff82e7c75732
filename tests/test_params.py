"""Golden tests for the static DAB parameter tables.

Invariants derived from ETSI EN 300 401 and cross-checked against the numbers
the reference pins down (SURVEY.md §2.1/§2.2, BASELINE.md).
"""

import numpy as np
import pytest

from dab_radio_tpu.params import (
    get_ofdm_params,
    get_dab_params,
    get_prs_reference,
    get_carrier_mapper,
    get_puncture_vector,
    PI_X_VECTOR,
    build_depuncture_gather,
    fic_puncture_schedule,
    msc_puncture_schedule,
    SubchannelConfig,
    UEPProfile,
)
from dab_radio_tpu.params.protection import UEP_TABLE
from dab_radio_tpu.params.mapper import (
    get_inverse_carrier_mapper,
    get_carrier_to_fft_bin,
)


def test_ofdm_mode_geometry():
    p1 = get_ofdm_params(1)
    assert (p1.nb_frame_symbols, p1.nb_symbol_period, p1.nb_null_period,
            p1.nb_fft, p1.nb_data_carriers) == (76, 2552, 2656, 2048, 1536)
    assert p1.nb_cyclic_prefix == 504
    # 96 ms frame at 2.048 MHz
    assert p1.nb_frame_samples == 196608
    assert p1.nb_frame_bits == 230400

    p2 = get_ofdm_params(2)
    assert (p2.nb_fft, p2.nb_data_carriers, p2.nb_null_period) == (512, 384, 664)
    p3 = get_ofdm_params(3)
    assert (p3.nb_frame_symbols, p3.nb_fft) == (153, 256)
    p4 = get_ofdm_params(4)
    assert (p4.nb_fft, p4.nb_symbol_period) == (1024, 1276)

    with pytest.raises(ValueError):
        get_ofdm_params(5)


def test_dab_frame_parameters_mode1():
    d = get_dab_params(1)
    assert d.nb_frame_bits == 230400
    assert d.nb_sym_bits == 3072
    assert d.nb_fic_bits == 3 * 3072
    assert d.nb_msc_bits == 72 * 3072
    assert d.nb_fib_bits == 768
    assert d.nb_fib_cif_bits == 2304
    assert d.nb_cif_bits == 55296


def test_prs_reference_properties():
    for mode, (nfft, ncarrier) in {1: (2048, 1536), 2: (512, 384),
                                   3: (256, 192), 4: (1024, 768)}.items():
        prs = get_prs_reference(mode, nfft)
        assert prs.shape == (nfft,)
        assert prs.dtype == np.complex64
        # DC bin and guard bins are zero
        assert prs[0] == 0
        half = ncarrier // 2
        # active carriers are unit magnitude QPSK-phase points
        active = np.concatenate([prs[1:half + 1], prs[nfft - half:]])
        np.testing.assert_allclose(np.abs(active), 1.0, rtol=1e-5)
        # all phases are multiples of pi/2
        phases = np.angle(active) / (np.pi / 2)
        np.testing.assert_allclose(phases, np.round(phases), atol=1e-4)
        # guard region between carriers is zero
        assert np.all(prs[half + 1:nfft - half] == 0)


def test_prs_mode1_spot_values():
    """Spot-check phases against hand-evaluated table entries.

    k=1 falls in block (1,32,i=0,n=3): h_{0,0}=0, phi = pi/2*3.
    k=-768 falls in block (-768,-737,i=0,n=1): h_{0,0}=0, phi = pi/2.
    """
    prs = get_prs_reference(1, 2048)
    np.testing.assert_allclose(prs[1], np.exp(1j * np.pi * 1.5), atol=1e-6)
    np.testing.assert_allclose(prs[2048 - 768], np.exp(1j * np.pi / 2), atol=1e-6)


def test_carrier_mapper_is_permutation():
    for nfft, ncarrier in [(2048, 1536), (512, 384), (256, 192), (1024, 768)]:
        m = get_carrier_mapper(nfft, ncarrier)
        assert m.shape == (ncarrier,)
        assert sorted(m.tolist()) == list(range(ncarrier))
        inv = get_inverse_carrier_mapper(nfft, ncarrier)
        np.testing.assert_array_equal(inv[m], np.arange(ncarrier))


def test_carrier_mapper_mode1_recurrence_start():
    """First PI values: PI(0)=0, PI(1)=(13*0+511)%2048=511, PI(2)=(13*511+511)%2048."""
    m = get_carrier_mapper(2048, 1536)
    pi1 = 511
    pi2 = (13 * 511 + 511) % 2048
    dc, lo = 1024, 1024 - 768
    expected_first = []
    for v in [0, pi1, pi2]:
        if lo <= v <= dc + 768 and v != dc:
            expected_first.append(v - lo if v < dc else v - lo - 1)
    assert m[0] == expected_first[0]


def test_carrier_to_fft_bin():
    b = get_carrier_to_fft_bin(2048, 1536)
    assert b[0] == 2048 - 768       # lowest negative frequency
    assert b[767] == 2047           # -1
    assert b[768] == 1              # +1
    assert b[-1] == 768             # +F
    assert 0 not in b.tolist()      # DC excluded


def test_puncture_vectors():
    # PI_1 keep-mask = 1100 1000 x7 pattern
    v1 = get_puncture_vector(1)
    assert v1.tolist()[:8] == [1, 1, 0, 0, 1, 0, 0, 0]
    assert v1.sum() == 9
    v24 = get_puncture_vector(24)
    assert v24.all() and v24.shape == (32,)
    assert PI_X_VECTOR.tolist() == [1, 1, 0, 0] * 6
    with pytest.raises(ValueError):
        get_puncture_vector(0)


def test_fic_schedule_bit_budget():
    """Mode-I FIB group: 2304 transmitted symbols -> 3096 mother symbols ->
    774 decoded bits (768 data + 6 tail)."""
    idx, mask, nb_in = build_depuncture_gather(fic_puncture_schedule())
    assert mask.shape[0] == 128 * 21 + 128 * 3 + 24 == 3096
    assert nb_in == 2304
    assert idx.max() == nb_in - 1
    # gather indices increase monotonically over transmitted positions
    assert np.all(np.diff(idx[mask]) == 1)


@pytest.mark.parametrize("eep_type,level,size", [
    ("A", 0, 12 * 4), ("A", 1, 8 * 3), ("A", 2, 6 * 5), ("A", 3, 4 * 7),
    ("B", 0, 27 * 2), ("B", 1, 21 * 3), ("B", 2, 18 * 2), ("B", 3, 15 * 4),
    ("A", 1, 8),  # 2-A n=1 special case
])
def test_eep_schedule_budget(eep_type, level, size):
    """Transmitted symbols must exactly fill the subchannel's CIF capacity."""
    cfg = SubchannelConfig(start_address=0, length=size, is_uep=False,
                           eep_type=eep_type, eep_prot_level=level)
    idx, mask, nb_in = build_depuncture_gather(msc_puncture_schedule(cfg))
    assert nb_in == cfg.nb_cif_bits == size * 64
    # decoded bits = mother/4, includes 6 tail bits
    assert mask.shape[0] % 4 == 0


@pytest.mark.parametrize("row", range(len(UEP_TABLE)))
def test_uep_schedule_budget(row):
    prof = UEP_TABLE[row]
    cfg = SubchannelConfig(start_address=0, length=prof.subchannel_size,
                           is_uep=True, uep_table_index=row)
    idx, mask, nb_in = build_depuncture_gather(msc_puncture_schedule(cfg))
    assert nb_in + prof.padding_bits == cfg.nb_cif_bits, (
        f"UEP row {row}: {nb_in} + pad {prof.padding_bits} != {cfg.nb_cif_bits}")


def test_uep_bitrates():
    cfg = SubchannelConfig(0, 84, True, uep_table_index=33)
    assert cfg.bitrate_kbps() == 128
    cfg2 = SubchannelConfig(0, 6 * 4, False, eep_type="A", eep_prot_level=2)
    assert cfg2.bitrate_kbps() == 4 * 8


def test_all_uep_rows_schedule_consistency():
    """Every UEP table row must produce a puncture schedule whose output
    exactly fills the subchannel's CIF bits and whose mother length matches
    the bitrate (reference subchannel_protection_tables.h rows)."""
    from dab_radio_tpu.params import msc_puncture_schedule, SubchannelConfig
    from dab_radio_tpu.params.protection import UEP_TABLE
    from dab_radio_tpu.params.puncture import build_puncture_mask
    for idx, row in enumerate(UEP_TABLE):
        cfg = SubchannelConfig(0, row.subchannel_size, True,
                               uep_table_index=idx)
        mask = build_puncture_mask(msc_puncture_schedule(cfg))
        nb_tx = int(mask.sum())
        # transmitted symbols fit in the subchannel (padding bits allowed)
        assert nb_tx <= cfg.nb_cif_bits, (idx, nb_tx, cfg.nb_cif_bits)
        assert cfg.nb_cif_bits - nb_tx < 64, (idx, nb_tx)
        # mother code length = 4 * (24ms of data bits + tail)
        nb_steps = mask.shape[0] // 4
        assert nb_steps == row.bitrate_kbps * 24 + 6, (idx, nb_steps)


def test_all_eep_profiles_schedule_consistency():
    from dab_radio_tpu.params import msc_puncture_schedule, SubchannelConfig
    from dab_radio_tpu.params.protection import EEP_TABLE_A, EEP_TABLE_B
    from dab_radio_tpu.params.puncture import build_puncture_mask
    cases = []
    for lvl, prof in enumerate(EEP_TABLE_A):
        for n in (1, 2, 4):
            cases.append(("A", lvl, n * prof.capacity_unit_multiple))
    for lvl, prof in enumerate(EEP_TABLE_B):
        for n in (1, 3):
            cases.append(("B", lvl, n * prof.capacity_unit_multiple))
    for typ, lvl, size in cases:
        cfg = SubchannelConfig(0, size, False, eep_type=typ,
                               eep_prot_level=lvl)
        mask = build_puncture_mask(msc_puncture_schedule(cfg))
        nb_tx = int(mask.sum())
        assert nb_tx <= cfg.nb_cif_bits, (typ, lvl, size)
        nb_steps = mask.shape[0] // 4
        assert nb_steps == cfg.bitrate_kbps() * 24 + 6, (typ, lvl, size)


def test_uep_find_index():
    from dab_radio_tpu.params.protection import (
        UEP_TABLE, uep_find_index)
    import pytest as _pytest
    # every row is found by (size, level)
    for idx, row in enumerate(UEP_TABLE):
        assert uep_find_index(row.subchannel_size, row.protection_level) == idx
    # size-only resolves to the first matching row
    idx = uep_find_index(UEP_TABLE[0].subchannel_size)
    assert UEP_TABLE[idx].subchannel_size == UEP_TABLE[0].subchannel_size
    with _pytest.raises(ValueError):
        uep_find_index(9999)

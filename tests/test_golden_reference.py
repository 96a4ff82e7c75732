"""Golden-vector parity against the COMPILED C++ reference.

Builds tests/golden/ref_harness.cpp against the reference sources at
/root/reference (read-only; nothing is copied) and compares its dumped
tables/outputs with this framework: OFDM params, PRS reference, carrier map,
puncture vectors, the 64-row UEP table, energy-dispersal PRBS, CRC16s, and
Reed-Solomon decode results on identical corrupted codewords.

Skipped when the reference tree or a C++ toolchain is unavailable.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REF = "/root/reference/src"
HERE = os.path.dirname(os.path.abspath(__file__))
HARNESS = os.path.join(HERE, "golden", "ref_harness.cpp")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF) and shutil.which("g++")),
    reason="reference sources or g++ unavailable")


@pytest.fixture(scope="module")
def golden():
    exe = "/tmp/dab_golden_harness"
    srcs = [HARNESS,
            f"{REF}/ofdm/dab_ofdm_params_ref.cpp",
            f"{REF}/ofdm/dab_prs_ref.cpp",
            f"{REF}/ofdm/dab_mapper_ref.cpp",
            f"{REF}/dab/algorithms/reed_solomon_decoder.cpp"]
    subprocess.run(["g++", "-O2", "-std=c++17", f"-I{REF}",
                    f"-I{os.path.join(HERE, 'golden')}", "-o", exe] + srcs,
                   check=True, capture_output=True)
    out = subprocess.run([exe], check=True, capture_output=True,
                         timeout=120).stdout.decode()
    data = {}
    for line in out.splitlines():
        parts = line.split()
        data.setdefault(parts[0], []).append(parts[1:])
    return data


def test_ofdm_params_match(golden):
    from dab_radio_tpu.params import get_ofdm_params
    for row in golden["ofdm_params"]:
        mode, syms, sym_p, null_p, cp, nfft, ncarr = map(int, row)
        p = get_ofdm_params(mode)
        assert (p.nb_frame_symbols, p.nb_symbol_period, p.nb_null_period,
                p.nb_cyclic_prefix, p.nb_fft, p.nb_data_carriers) == \
            (syms, sym_p, null_p, cp, nfft, ncarr), mode


def test_prs_reference_matches(golden):
    from dab_radio_tpu.params import get_prs_reference
    for row in golden["prs"]:
        mode, nfft = int(row[0]), int(row[1])
        vals = np.array(row[2:], dtype=np.float64).reshape(nfft, 2)
        ref = vals[:, 0] + 1j * vals[:, 1]
        ours = np.asarray(get_prs_reference(mode, nfft))
        np.testing.assert_allclose(ours, ref, atol=2e-5), mode


def test_carrier_map_matches(golden):
    from dab_radio_tpu.params import get_ofdm_params
    from dab_radio_tpu.params.mapper import get_carrier_mapper
    for row in golden["carrier_map"]:
        mode, ncarr = int(row[0]), int(row[1])
        ref = np.array(row[2:], dtype=np.int64)
        p = get_ofdm_params(mode)
        ours = np.asarray(get_carrier_mapper(p.nb_fft, ncarr))
        np.testing.assert_array_equal(ours, ref), mode


def test_puncture_vectors_match(golden):
    from dab_radio_tpu.params.puncture import get_puncture_vector, PI_X_VECTOR
    for row in golden["pi"]:
        pi = int(row[0])
        ref_counts = [int(x) for x in row[1:]]
        # reference stores per-8-symbol keep counts; our vector is the
        # expanded 32-bit keep mask — compare via group sums
        vec = np.asarray(get_puncture_vector(pi)).reshape(8, 4)
        assert vec.sum(axis=1).tolist() == ref_counts, pi
    ref_x = [int(x) for x in golden["pi_x"][0]]
    assert np.asarray(PI_X_VECTOR).reshape(6, 4).sum(axis=1).tolist() == ref_x


def test_uep_table_matches(golden):
    from dab_radio_tpu.params.protection import UEP_TABLE
    # known intentional divergence: the reference swaps the subchannel sizes
    # of the 128 kbps level-5/4 rows (indices 33/34); ours follows ETSI
    # table 8 (coded-bit budget balances, see protection.py NOTE)
    known_diff = {33, 34}
    for row in golden["uep"]:
        i = int(row[0])
        size, bitrate, level = int(row[1]), int(row[2]), int(row[3])
        lx = tuple(int(x) for x in row[4:8])
        pix = tuple(int(x) for x in row[8:12])
        pad = int(row[12])
        ours = UEP_TABLE[i]
        if i in known_diff:
            assert ours.subchannel_size != size
            continue
        assert (ours.subchannel_size, ours.bitrate_kbps,
                ours.protection_level, ours.Lx, ours.PIx,
                ours.padding_bits) == (size, bitrate, level, lx, pix, pad), i


def test_scrambler_matches(golden):
    from dab_radio_tpu.ops.scrambler import prbs_bytes
    ref = np.array([int(x) for x in golden["scrambler"][0]], dtype=np.uint8)
    np.testing.assert_array_equal(prbs_bytes(64), ref)


def test_crc16_matches(golden):
    from dab_radio_tpu.ops.crc import crc16, firecode_crc16
    assert crc16(b"123456789") == int(golden["crc16_fib"][0][0])
    assert firecode_crc16(b"123456789") == int(golden["crc16_firecode"][0][0])


@pytest.mark.parametrize("name,nroots,pad", [("rs_dabplus", 10, 135),
                                             ("rs_packet", 16, 51)])
def test_rs_decode_matches(golden, name, nroots, pad):
    from dab_radio_tpu.ops.rs import ReedSolomonDecoder
    dec = ReedSolomonDecoder(nroots, pad)
    for row in golden[name]:
        trial, ref_nerr = int(row[0]), int(row[1])
        ref_cw = np.array(row[2:], dtype=np.uint8)
        # reconstruct the corrupted input the reference was fed: same LCG
        corrupted = _corrupt_like_harness(dec.n, trial)
        ours, nerr = dec.decode(corrupted[None])
        assert int(nerr[0]) == ref_nerr, (name, trial)
        if ref_nerr >= 0:
            np.testing.assert_array_equal(ours[0], ref_cw), (name, trial)


class _LCG:
    def __init__(self):
        self.state = 12345

    def next(self):
        self.state = (self.state * 1664525 + 1013904223) & 0xFFFFFFFF
        return self.state >> 16


_lcg = None


def _corrupt_like_harness(n, trial):
    """Replays the harness's deterministic corruption sequence. The harness
    iterates cases in order (rs_dabplus trials 0..5 then rs_packet 0..5),
    so we regenerate the full sequence once and index into it."""
    global _lcg_seq
    try:
        _lcg_seq
    except NameError:
        lcg = _LCG()
        _lcg_seq = []
        for nn in (120, 204):
            for t in range(6):
                cw = np.zeros(nn, np.uint8)
                for _ in range(t):
                    pos = lcg.next() % nn
                    cw[pos] ^= np.uint8(1 + lcg.next() % 255)
                _lcg_seq.append((nn, t, cw))
    for nn, t, cw in _lcg_seq:
        if nn == n and t == trial:
            return cw.copy()
    raise AssertionError("missing corruption case")

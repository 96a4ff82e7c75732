"""Differential test: the native C++ FIG parser must emit exactly the same
event stream as the pure-Python FIGParser, on real transmitter FIBs and on
random fuzz input (including truncated/garbage FIGs)."""

import numpy as np
import pytest

from dab_radio_tpu.dab.fig import FIGParser
from dab_radio_tpu.dab.fig_native import NativeFIGParser
from dab_radio_tpu.host.native import fig_lib


pytestmark = pytest.mark.skipif(fig_lib() is None,
                                reason="native fig parser unavailable")


def test_native_parser_loaded():
    assert NativeFIGParser().is_native


def test_transmitter_fibs_match():
    from dab_radio_tpu.models.transmitter import EnsembleTransmitter, ServiceSpec
    from dab_radio_tpu.params import SubchannelConfig
    tx = EnsembleTransmitter(1, services=[
        ServiceSpec(0xA001, 1, "Svc DAB+",
                    SubchannelConfig(0, 48, False, eep_type="A",
                                     eep_prot_level=2), kind="dab+"),
        ServiceSpec(0xA002, 2, "Svc MP2",
                    SubchannelConfig(48, 84, True, uep_table_index=33),
                    kind="dab"),
        ServiceSpec(0xA003, 3, "Svc Data",
                    SubchannelConfig(132, 48, False, eep_type="A",
                                     eep_prot_level=2), kind="packet",
                    scid=0x10, packet_address=2),
    ])
    py, nat = FIGParser(), NativeFIGParser()
    total = 0
    for _ in range(4):
        for payload in tx._fib_payloads():
            fib = bytes(tx.fic_encoder.encode_fib_payload(payload))[:30]
            ev_py = py.parse_fib(fib)
            ev_nat = nat.parse_fib(fib)
            assert ev_py == ev_nat, fib.hex()
            total += len(ev_py)
        tx._cif_counter += 4
    assert total > 0


def test_fuzz_random_fibs_match():
    py, nat = FIGParser(), NativeFIGParser()
    rng = np.random.default_rng(1234)
    for _ in range(3000):
        fib = rng.integers(0, 256, 30, dtype=np.uint8).tobytes()
        assert py.parse_fib(fib) == nat.parse_fib(fib), fib.hex()


def test_fuzz_structured_fibs_match():
    """Bias the fuzz toward valid-looking FIG headers so deep handler paths
    get exercised, including every supported extension."""
    py, nat = FIGParser(), NativeFIGParser()
    rng = np.random.default_rng(99)
    exts = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 13, 14, 17, 21, 24]
    for _ in range(4000):
        body_len = int(rng.integers(1, 28))
        fig_type = int(rng.choice([0, 0, 0, 1]))
        body = rng.integers(0, 256, body_len, dtype=np.uint8)
        if fig_type == 0:
            cn_oe_pd = int(rng.integers(0, 8)) << 5
            body[0] = cn_oe_pd | int(rng.choice(exts))
        else:
            body[0] = (int(rng.integers(0, 16)) << 4) | int(
                rng.choice([0, 1, 4, 5]))
        fib = bytes([(fig_type << 5) | body_len]) + body.tobytes()
        fib = fib + b"\xff" * (30 - len(fib))
        assert py.parse_fib(fib) == nat.parse_fib(fib), fib.hex()

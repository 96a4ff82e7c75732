"""Pallas ACS kernel vs the scan reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dab_radio_tpu.ops import viterbi as vit
from dab_radio_tpu.params import fic_puncture_schedule
from dab_radio_tpu.params.puncture import build_puncture_mask


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_pallas_acs_matches_scan():
    from dab_radio_tpu.ops.viterbi_pallas import viterbi_decode_pallas
    sched = fic_puncture_schedule()
    spec = vit.ViterbiSpec.from_schedule(sched)
    rng = np.random.default_rng(0)
    B = 4
    bits = rng.integers(0, 2, size=(B, 768)).astype(np.uint8)
    mask = build_puncture_mask(sched)
    soft = np.stack([vit.bits_to_soft(vit.puncture(vit.conv_encode(b), mask))
                     for b in bits]).astype(np.int8)
    # scattered correctable symbol flips to exercise nontrivial paths
    flips = rng.choice(soft.shape[1], size=120, replace=False)
    soft[:, flips] = -soft[:, flips]

    ref_bits, _ = vit.viterbi_decode(jnp.asarray(soft), spec)
    pal_bits, _ = viterbi_decode_pallas(jnp.asarray(soft), spec)
    np.testing.assert_array_equal(np.asarray(pal_bits), np.asarray(ref_bits))
    np.testing.assert_array_equal(np.asarray(pal_bits), bits)

"""Mesh sharding tests on the 8-device virtual CPU mesh: the time-sharded
(sequence-parallel, ppermute halo) demod must produce the same bits as the
sequential streaming demodulator."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dab_radio_tpu.models import OFDMModulator, OFDMDemodulator, DemodCarry
from dab_radio_tpu.ops.iq import iq_pairs
from dab_radio_tpu.parallel.mesh import (
    make_receiver_mesh, make_timesharded_demod, multichip_receiver_step,
    shard_demod_batch,
)
from jax.sharding import NamedSharding, PartitionSpec as P


def test_mesh_factorisation():
    mesh = make_receiver_mesh(8)
    assert dict(mesh.shape) == {"ens": 2, "time": 2, "sub": 2}
    mesh4 = make_receiver_mesh(4)
    assert np.prod(list(mesh4.shape.values())) == 4


def test_timesharded_demod_matches_sequential():
    mode = 2
    mod = OFDMModulator(mode)
    demod = OFDMDemodulator(mode)
    mesh = make_receiver_mesh(8)
    n_time = mesh.shape["time"]
    f_loc = 2
    F = n_time * f_loc
    B = 4

    rng = np.random.default_rng(0)
    p = mod.params
    bits_tx = rng.integers(
        0, 2, size=(B, F, p.nb_data_symbols, 2 * p.nb_data_carriers)
    ).astype(np.uint8)
    iq = np.asarray(jax.vmap(mod.modulate_stream)(jnp.asarray(bits_tx)))
    assert iq.shape == (B, F * p.nb_frame_samples)
    # margin for the last frame's window comes from the halo; pad final shard
    pad = np.zeros((B, demod.window_len - p.nb_frame_samples), np.complex64)
    iq_padded = np.concatenate([iq, pad], axis=1)[:, :iq.shape[1]]

    fn = make_timesharded_demod(demod, mesh, f_loc)
    carry = DemodCarry.init((B, n_time))
    carry = carry._replace(
        signal_l1_avg=jnp.full((B, n_time), 0.5, jnp.float32))
    iq_sharded = jax.device_put(jnp.asarray(iq_pairs(iq_padded)),
                                NamedSharding(mesh, P("ens", "time")))
    carry2, bits = fn(carry, iq_sharded)
    bits = np.asarray(bits).reshape(B, F, -1)

    hard = (bits > 0).astype(np.uint8)
    ref = bits_tx.reshape(B, F, -1)
    # the final frame of the last shard lacks real margin data; its window
    # still covers the full frame so it demodulates correctly with zero halo
    np.testing.assert_array_equal(hard, ref)


def test_shard_demod_batch_runs():
    demod = OFDMDemodulator(2)
    mesh = make_receiver_mesh(8)
    step, win_sh, carry_sh = shard_demod_batch(demod, mesh)
    B = 8
    rng = np.random.default_rng(1)
    wins = jax.device_put(
        jnp.asarray(rng.normal(0, 1, (B, demod.window_len, 2))
                    .astype(np.float32)), win_sh)
    carry = jax.device_put(DemodCarry.init((B,)), carry_sh)
    carry, out = step(carry, wins)
    assert out["bits"].shape == (B, demod.params.nb_frame_bits)


def test_multichip_receiver_step_compiles_and_runs():
    mesh = make_receiver_mesh(8)
    step, args = multichip_receiver_step(mesh, transmission_mode=2)
    carry, hist, out = step(*args)
    jax.block_until_ready(out["msc_bits"])
    assert out["fib_bits"].shape[-1] == 768


@pytest.mark.slow
def test_multichip_end_to_end_bit_exact():
    """The full dryrun contract: sharded demod->FIC->MSC over a real
    modulated ensemble equals the single-device host path bit-for-bit."""
    import __graft_entry__ as graft
    graft.dryrun_multichip(8)

"""Device-mesh sharded receiver steps.

Axes:
  'ens'  - ensembles/streams (pure data parallel; the north-star metric is
           concurrent real-time ensembles per chip, BASELINE.md)
  'time' - time blocks within one stream (sequence parallel with a
           one-window halo from the right neighbor via lax.ppermute,
           replacing the reference's SignalFFT/WaitFFT halo threads,
           SURVEY.md §2.6.1)
  'sub'  - MSC subchannels (the reference's per-subchannel thread pool,
           vmapped and sharded)
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map

from ..models.demodulator import OFDMDemodulator, DemodCarry


def make_receiver_mesh(n_devices: int | None = None, axis_sizes=None) -> Mesh:
    """Factor the device count into ('ens', 'time', 'sub') axes."""
    devices = np.array(jax.devices())
    n = n_devices or devices.size
    devices = devices[:n]
    if axis_sizes is None:
        # greedy factorisation: prefer ensemble parallelism
        sizes = []
        rem = n
        for _ in range(2):
            f = 1
            for cand in (2, 3, 5, 7):
                if rem % cand == 0:
                    f = cand
                    break
            sizes.append(f)
            rem //= f
        axis_sizes = (rem, sizes[0], sizes[1])  # (ens, time, sub)
    assert int(np.prod(axis_sizes)) == n, (axis_sizes, n)
    return Mesh(devices.reshape(axis_sizes), ("ens", "time", "sub"))


def shard_demod_batch(demod: OFDMDemodulator, mesh: Mesh):
    """Data-parallel frame step: batch axis sharded over every mesh axis."""
    spec = P(("ens", "time", "sub"))
    win_sh = NamedSharding(mesh, spec)
    carry_sh = NamedSharding(mesh, P(("ens", "time", "sub")))
    step = jax.jit(
        jax.vmap(demod._frame_step_impl),
        in_shardings=(carry_sh, win_sh),
        out_shardings=(carry_sh, NamedSharding(mesh, spec)),
    )
    return step, win_sh, carry_sh


def make_timesharded_demod(demod: OFDMDemodulator, mesh: Mesh,
                           frames_per_shard: int):
    """Sequence-parallel streaming demod over the 'time' axis.

    Input iq: (B, T) with T = n_time * frames_per_shard * frame_samples,
    aligned so frame f starts at f*frame_samples. Each time shard demodulates
    its local frames with a lax.scan carry; the trailing window margin
    (window_len - frame_samples) comes from the right neighbor via ppermute.
    Returns a jitted fn (carry, iq) -> (carry, bits) where carry has shape
    (B, n_time) leading dims (each shard tracks its own steady-state sync).
    """
    p = demod.params
    fs = p.nb_frame_samples
    halo = demod.window_len - fs
    n_time = mesh.shape["time"]
    f_loc = frames_per_shard

    def local_demod(carry, iq_local):
        # iq_local: (B_loc, f_loc*fs, 2) f32 pairs after shard_map splits
        # 'time' (complex never crosses the host<->device boundary, ops/iq.py)
        axis = "time"
        right = [(i, (i - 1) % n_time) for i in range(n_time)]
        halo_samples = jax.lax.ppermute(iq_local[:, :halo], axis, right)
        idx = jax.lax.axis_index(axis)
        # last shard has no right neighbor: zero halo
        halo_samples = jnp.where(idx == n_time - 1,
                                 jnp.zeros_like(halo_samples), halo_samples)
        ext = jnp.concatenate([iq_local, halo_samples], axis=1)

        def step(c, f):
            win = jax.lax.dynamic_slice_in_dim(ext, f * fs, demod.window_len, 1)
            c, out = jax.vmap(demod._frame_step_impl)(c, win)
            return c, out["bits"]

        carry = jax.tree.map(lambda x: x[:, 0], carry)
        carry, bits = jax.lax.scan(step, carry, jnp.arange(f_loc))
        bits = jnp.moveaxis(bits, 0, 1)            # (B_loc, f_loc, nbits)
        carry = jax.tree.map(lambda x: x[:, None], carry)
        return carry, bits[:, None]                # (B_loc, 1, f_loc, nbits)

    sharded = shard_map(
        local_demod, mesh=mesh,
        in_specs=(P("ens", "time"), P("ens", "time")),
        out_specs=(P("ens", "time"), P("ens", "time", None, None)),
        check_vma=False,
    )
    return jax.jit(sharded)


def multichip_receiver_step(mesh: Mesh, transmission_mode: int = 2,
                            frames_per_shard: int = 1,
                            nb_subchannel_cu: int = 12,
                            subchannels_per_shard: int = 2,
                            ensembles_per_shard: int = 2,
                            ingest: str = "pairs"):
    """Full end-to-end sharded receiver step: IQ in, decoded bits out.

    One jitted program over the ('ens','time','sub') mesh (the surface the
    reference covers with threads + a pool, basic_radio.cpp:41-65, here
    scaled across chips):

      demod (ens x time, ppermute halo)
        -> frame split (all-gather over 'time' via sharding constraint)
        -> FIC: depuncture + Viterbi + energy-dispersal descramble (ens)
        -> MSC: per-subchannel CIF slice (ens x sub) -> 16-CIF time
           deinterleave (explicit carry) -> depuncture + Viterbi ->
           descramble

    Returns (fn, example_args). fn(demod_carry, deint_hist, iq) ->
    (demod_carry, deint_hist, outputs) where outputs has:
      fib_bits (B, F, n_groups, 768) descrambled FIB-group bits,
      msc_bits (B, S, F*nb_cifs, nb_data) descrambled subchannel payload
      bits (valid once the deinterleaver history is full - 16 CIFs).

    Subchannel s occupies CUs [s*cu, (s+1)*cu) with identical EEP-A
    protection; byte-level FIG/superframe parsing stays on host exactly as
    in the single-chip receiver.
    """
    from ..ops import viterbi as vit
    from ..ops.deinterleave import make_gather_index, deinterleave_push, DEPTH
    from ..ops.scrambler import prbs_bytes
    from ..params import (fic_puncture_schedule, msc_puncture_schedule,
                          SubchannelConfig, get_dab_params)

    demod = OFDMDemodulator(transmission_mode)
    dab = get_dab_params(transmission_mode)
    n_ens = mesh.shape["ens"]
    n_time = mesh.shape["time"]
    n_sub = mesh.shape["sub"]
    B = n_ens * ensembles_per_shard
    S = n_sub * subchannels_per_shard
    F = n_time * frames_per_shard
    C = F * dab.nb_cifs                             # CIFs per step
    demod_fn = make_timesharded_demod(demod, mesh, frames_per_shard)

    fic_spec = vit.ViterbiSpec.from_schedule(fic_puncture_schedule())
    sub_cfg = SubchannelConfig(0, nb_subchannel_cu, False,
                               eep_type="A", eep_prot_level=2)
    msc_spec = vit.ViterbiSpec.from_schedule(msc_puncture_schedule(sub_cfg))
    nb_sub_bits = sub_cfg.nb_cif_bits               # cu * 64
    gather_idx = jnp.asarray(make_gather_index(nb_sub_bits))
    assert S * nb_subchannel_cu * 64 <= dab.nb_cif_bits, \
        "subchannels exceed CIF capacity"

    fic_prbs = jnp.asarray(np.unpackbits(
        prbs_bytes(fic_spec.nb_data_bits // 8)).astype(np.int8))
    msc_prbs = jnp.asarray(np.unpackbits(
        prbs_bytes(msc_spec.nb_data_bits // 8)).astype(np.int8))

    sub_sh = NamedSharding(mesh, P("ens", "sub"))
    time_sh = NamedSharding(mesh, P("ens", "time"))

    @jax.jit
    def step(carry, deint_hist, iq):
        if ingest == "u8":
            # raw interleaved uint8 IQ -> f32 pairs on device (QuantisedIQ
            # convention); 4x less host->device traffic than f32 pairs
            iq = ((iq.astype(jnp.float32) - 127.5) * (1.0 / 127.5)
                  ).reshape(iq.shape[0], -1, 2)
        carry, bits = demod_fn(carry, iq)           # (B, n_time, f_loc, nb)
        # gather the time shards: frames are decoded ensemble-parallel
        frames = jax.lax.with_sharding_constraint(
            bits.reshape(B, F, dab.nb_frame_bits),
            NamedSharding(mesh, P("ens", None, None)))

        # ---- FIC (reference fic_decoder.cpp:53-117, batched) ----
        fic_soft = frames[:, :, :dab.nb_fic_bits].reshape(
            B * F * dab.nb_cifs, fic_spec.nb_in).astype(jnp.int8)
        fib_bits, fic_err = vit.viterbi_decode(fic_soft, fic_spec)
        fib_bits = (fib_bits ^ fic_prbs[None, :]).reshape(
            B, F, dab.nb_cifs, fic_spec.nb_data_bits)

        # ---- MSC (reference msc_decoder.cpp:46-154, sharded over 'sub') --
        cifs = frames[:, :, dab.nb_fic_bits:].reshape(
            B, C, dab.nb_cif_bits)
        subs = jnp.stack(
            [cifs[:, :, s * nb_sub_bits:(s + 1) * nb_sub_bits]
             for s in range(S)], axis=1)            # (B, S, C, nb_sub_bits)
        subs = jax.lax.with_sharding_constraint(
            subs.astype(jnp.int8),
            NamedSharding(mesh, P("ens", "sub", None, None)))

        def per_sub(hist, seq):
            def body(h, cif):
                nh, deint = deinterleave_push(h, cif, gather_idx)
                return nh, deint[..., :msc_spec.nb_in]
            return jax.lax.scan(body, hist, seq)

        deint_hist, deints = jax.vmap(jax.vmap(per_sub))(deint_hist, subs)
        msc_in = deints.reshape(B * S * C, msc_spec.nb_in)
        msc_bits, msc_err = vit.viterbi_decode(msc_in, msc_spec)
        msc_bits = (msc_bits ^ msc_prbs[None, :]).reshape(
            B, S, C, msc_spec.nb_data_bits)
        return carry, deint_hist, {
            "fib_bits": fib_bits, "msc_bits": msc_bits,
            "fic_err": fic_err, "msc_err": msc_err,
        }

    fs = demod.params.nb_frame_samples
    T = n_time * frames_per_shard * fs
    if ingest == "u8":
        iq = jax.device_put(
            jnp.full((B, 2 * T), 127, jnp.uint8), time_sh)
    else:
        iq = jax.device_put(jnp.zeros((B, T, 2), jnp.float32), time_sh)
    carry = DemodCarry.init((B, n_time))
    carry = carry._replace(
        signal_l1_avg=jnp.full((B, n_time), 0.5, jnp.float32))
    carry = jax.device_put(carry, time_sh)
    deint_hist = jax.device_put(
        jnp.zeros((B, S, DEPTH, nb_sub_bits), jnp.int8), sub_sh)
    return step, (carry, deint_hist, iq)


def make_coldstart_timesharded_demod(demod: OFDMDemodulator, mesh: Mesh,
                                     frames_per_shard: int):
    """Sequence-parallel demod that ACQUIRES from a cold carry.

    Round-1 VERDICT weak #6: the plain time-sharded demod only works in a
    pre-locked steady state. Here every 'time' shard runs the block null-dip
    search on its local samples, the earliest detection is elected via a
    global min (psum-style collective over 'time'), the frame phase is
    broadcast, and every shard then demodulates the frames that start inside
    its block — one jitted program, no host round trips. This parallelizes
    the reference's sequential acquisition state machine
    (src/ofdm/ofdm_demodulator.cpp:291-347) across chips.

    Input iq: (B, n_time * frames_per_shard * frame_samples, 2) f32 pairs,
    frame phase arbitrary. Returns fn(iq) -> (carry, bits, valid) with
    bits (B, n_time, f_loc, nb_frame_bits) and valid flags (False for
    pre-detection frames / desyncs / no-signal shards).
    """
    p = demod.params
    fs = p.nb_frame_samples
    n_time = mesh.shape["time"]
    f_loc = frames_per_shard
    T_loc = f_loc * fs
    halo = demod.window_len
    rewind = 2 * demod.cfg.null_search_nb_samples
    BIG = jnp.asarray(2 ** 30, jnp.int32)

    def local(iq_local):
        axis = "time"
        idx = jax.lax.axis_index(axis)
        base = idx * T_loc
        # halo: the first window_len samples of the right neighbor (frames
        # can start anywhere in the local block after acquisition)
        right = [(i, (i - 1) % n_time) for i in range(n_time)]
        halo_s = jax.lax.ppermute(iq_local[:, :halo], axis, right)
        halo_s = jnp.where(idx == n_time - 1, jnp.zeros_like(halo_s), halo_s)
        ext = jnp.concatenate([iq_local, halo_s], axis=1)

        l1_loc = jax.vmap(lambda b: demod._l1(b))(iq_local)
        l1_g = jax.lax.pmean(l1_loc, axis)
        found, end_idx = jax.vmap(
            lambda b, l: demod._acquire_impl(b, l))(iq_local, l1_g)
        cand = jnp.where(found, base + end_idx.astype(jnp.int32), BIG)
        global_end = jax.lax.pmin(cand, axis)          # (B_loc,)
        ok = global_end < BIG
        null_start = jnp.maximum(
            global_end - p.nb_null_period - rewind, 0)
        # first frame start inside this shard, same phase on every shard
        local0 = jnp.where(null_start >= base,
                           null_start - base,
                           (fs - (base - null_start) % fs) % fs)
        in_range = local0 < T_loc      # shard wholly before detection: none
        local0 = jnp.minimum(local0, T_loc - 1)
        carry = DemodCarry.init((iq_local.shape[0],))._replace(
            signal_l1_avg=l1_g)

        def step(state, _):
            c, pos, alive = state
            win = jax.vmap(
                lambda e, q: jax.lax.dynamic_slice(
                    e, (q, 0), (demod.window_len, 2)))(ext, pos)
            new_c, out = jax.vmap(demod._frame_step_impl)(c, win)
            started = (base + pos) >= null_start
            okf = out["sync_ok"] & alive & ok & started & in_range
            c2 = jax.tree.map(
                lambda n, o: jnp.where(started & alive, n, o), new_c, c)
            pos2 = jnp.where(okf, pos + out["offset"] + fs,
                             jnp.where(started, pos, pos + fs))
            pos2 = jnp.clip(pos2, 0, T_loc - 1)
            alive2 = jnp.where(started, okf, alive)
            return (c2, pos2, alive2), {"bits": out["bits"], "valid": okf}

        (carry, _, _), outs = jax.lax.scan(
            step, (carry, local0.astype(jnp.int32),
                   jnp.ones_like(ok)), None, length=f_loc)
        bits = jnp.moveaxis(outs["bits"], 0, 1)        # (B_loc, f_loc, nb)
        valid = jnp.moveaxis(outs["valid"], 0, 1)
        carry = jax.tree.map(lambda x: x[:, None], carry)
        return carry, bits[:, None], valid[:, None]

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P("ens", "time"),),
        out_specs=(P("ens", "time"), P("ens", "time", None, None),
                   P("ens", "time", None)),
        check_vma=False,
    )
    return jax.jit(sharded)

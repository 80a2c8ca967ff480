"""Multi-chip analysis over a 2-D device mesh.

The reference's only parallelism is three pthreads inside one process
(reference: src/analyze.c:34-62). Here the batch shards over a
('data', 'seq') mesh:

- 'data': independent songs — pure data parallelism.
- 'seq': each song's PCM stream splits across devices (the sequence/context
  parallel analog for audio): every shard computes partial histograms /
  power spectra / window energies over its slice, combined with XLA
  collectives — psum for the reductions, pmin/pmax for the global zero-trim
  bounds, a ring ppermute halo exchange for the 256-sample window overlap at
  shard boundaries, and an all_gather of the per-window energies before the
  (tiny) sequential envelope stage.

The per-song math is identical to features/*; tests assert sharded ==
single-device to the last float.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bliss_tpu import constants as C
from bliss_tpu import tables
from bliss_tpu.config import AnalysisConfig, DEFAULT
from bliss_tpu.dsp.intops import c_div
from bliss_tpu.features.types import PCMBatch
from bliss_tpu.features import tempo as tempo_mod


def _shard_map_unchecked(fn, **kwargs):
    """shard_map with the output-replication check disabled (outputs here are
    replicated via psum/all_gather, which the static checker cannot always
    infer); handles the kwarg rename across JAX versions."""
    try:
        return shard_map(fn, check_vma=False, **kwargs)
    except TypeError:
        return shard_map(fn, check_rep=False, **kwargs)


def analysis_mesh(
    n_data: int | None = None, n_seq: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'seq') mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_seq
    return Mesh(devices.reshape(n_data, n_seq), ("data", "seq"))


def shard_batch(batch: PCMBatch, mesh: Mesh) -> PCMBatch:
    """Place a PCMBatch on the mesh: songs over 'data', PCM over 'seq'."""
    s = jax.device_put(batch.samples, NamedSharding(mesh, P("data", "seq")))
    n = jax.device_put(batch.n_samples, NamedSharding(mesh, P("data")))
    d = jax.device_put(batch.durations, NamedSharding(mesh, P("data")))
    return PCMBatch(s, n, d)


def analyze_sharded_async(
    batch: PCMBatch, mesh: Mesh, cfg: AnalysisConfig = DEFAULT,
    extended: bool = False,
):
    """Dispatch the SPMD analysis and return a callable that blocks for the
    [B, 4] (or [B, 4 + n_ext] with ``extended``) float32 result — the device
    work (and, in hybrid mode, the host envelope finish) happens when the
    callable runs, so pipelines can keep decoding while batches are in
    flight. Extended features compute SHARDED (psum'd frame statistics,
    ring-halo'd zero crossings, beat metrics from the gathered energies)."""
    n_data = mesh.shape["data"]
    n_seq = mesh.shape["seq"]
    B, L = batch.samples.shape
    pad_b = (-B) % n_data
    pad_l = (-L) % (1024 * n_seq)
    s, n, d = batch.samples, batch.n_samples, batch.durations
    if pad_l:
        s = jnp.pad(s, ((0, 0), (0, pad_l)))
    if pad_b:
        dummy = jnp.zeros((pad_b, s.shape[1]), s.dtype)
        # A tiny nonzero blip keeps the pad songs' math finite.
        dummy = dummy.at[:, 100].set(1000)
        s = jnp.concatenate([s, dummy], axis=0)
        n = jnp.concatenate([n, jnp.full((pad_b,), 2048, n.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad_b,), d.dtype)])
    fn = _build_sharded_fn(mesh, cfg, extended)
    outs = fn(s, n, d)  # async jax dispatch
    if cfg.tempo_finish == "host":
        # Hybrid: the all-gathered per-window energies come back to the host
        # and the tiny envelope stage finishes in float64 (exact beat-count
        # parity on float32 meshes, same as analyze_batch_hybrid).
        amp, freq, fa = outs[:3]
        ext = outs[3] if extended else None

        def finish():
            n_np, d_np = np.asarray(n)[:B], np.asarray(d)[:B]
            if ext is None:
                tempo, attack = tempo_mod.envelope_finish_host(
                    np.asarray(fa)[:B], n_np, d_np
                )
                ext_np = None
            else:
                # the device-f32 beat columns are overwritten from the SAME
                # float64 finish as the core tempo (see pipeline.py finish)
                from bliss_tpu.features.extended import (
                    EXTENDED_FEATURE_NAMES,
                )

                tempo, attack, aux = tempo_mod.envelope_finish_host(
                    np.asarray(fa)[:B], n_np, d_np, return_aux=True
                )
                bpm, loud = tempo_mod.beat_cols_from_host_aux(aux, d_np)
                ext_np = np.array(np.asarray(ext)[:B], np.float32, copy=True)
                ext_np[:, EXTENDED_FEATURE_NAMES.index("bpm")] = bpm
                ext_np[
                    :, EXTENDED_FEATURE_NAMES.index("beat_loudness")
                ] = loud
            core = np.stack(
                [
                    tempo,
                    np.asarray(amp, np.float32)[:B],
                    np.asarray(freq, np.float32)[:B],
                    attack,
                ],
                axis=1,
            )
            if ext_np is None:
                return core
            return np.concatenate([core, ext_np], axis=1)

        return finish
    if extended:
        feats, ext = outs
        return lambda: np.concatenate(
            [np.asarray(feats)[:B], np.asarray(ext)[:B]], axis=1
        ).astype(np.float32)
    return lambda: np.asarray(outs[:B], np.float32)


def analyze_sharded(
    batch: PCMBatch, mesh: Mesh, cfg: AnalysisConfig = DEFAULT
) -> jnp.ndarray:
    """[B, 4] force vectors, computed SPMD over the mesh.

    The batch is padded so songs divide the 'data' axis and the PCM length
    divides the 'seq' axis in 1024-sample units; pad rows/columns are benign
    (nonzero dummy songs) and sliced off the result.
    """
    return jnp.asarray(analyze_sharded_async(batch, mesh, cfg)())


@functools.lru_cache(maxsize=None)
def _build_sharded_fn(mesh: Mesh, cfg: AnalysisConfig, extended: bool = False):
    dtype = cfg.jnp_dtype

    def local_fn(s, n, dur):
        # s: [Bl, Ls] int16 local slice; n, dur: [Bl] (replicated over seq)
        s16 = s
        s = s.astype(jnp.int32)
        Bl, Ls = s.shape
        use_fused = (
            cfg.fused_kernel and cfg.dtype == "float32"
            and cfg.band_taps <= 129 and Ls >= 65536
        )
        seq_ix = jax.lax.axis_index("seq")
        n_seq = jax.lax.axis_size("seq")
        offset = seq_ix * Ls
        L = Ls * n_seq
        gidx = offset + jnp.arange(Ls, dtype=jnp.int32)[None, :]
        valid = gidx < n[:, None]

        # ---- global zero-trim bounds (amplitude) --------------------------
        nonzero = s != 0
        BIG = jnp.int32(2**30)
        loc_first = jnp.min(jnp.where(nonzero, gidx, BIG), axis=1)
        loc_last = jnp.max(jnp.where(nonzero, gidx, -1), axis=1)
        start = jax.lax.pmin(loc_first, "seq")
        end = jax.lax.pmax(loc_last, "seq")

        # ---- amplitude: partial weighted reduction + psum ------------------
        # (fused mode folds this into the Pallas sample-stats kernel below)
        if not use_fused:
            seg = (gidx >= start[:, None]) & (gidx <= end[:, None])
            w = jnp.asarray(tables.amplitude_weight_table(), dtype)
            part = jnp.sum(
                jnp.take(w, s + (1 << 15), axis=0) * seg.astype(dtype), axis=1
            )
            amp_dot = jax.lax.psum(part, "seq")

        # ---- frequency: partial power spectra + psum -----------------------
        W = C.WINDOW_SIZE
        hp = jax.lax.Precision.HIGHEST
        slots_l = Ls // (W * C.CHANNELS)
        # Extended features need the PER-FRAME spectra (rolloff/flatness/
        # MFCC are frame-wise, energy-weighted), so with extended=True the
        # XLA DFT path runs even in fused mode and the score reuses its
        # summed power (one DFT pass, not two).
        need_frames = (not use_fused) or extended
        if need_frames:
            fr = s.reshape(Bl, slots_l, W, C.CHANNELS)
            mono = c_div(fr[..., 0] + fr[..., 1], 2)
            hann = jnp.asarray(tables.hann_window(), dtype)
            x = mono.astype(dtype) * hann
            n_frames = (n // C.CHANNELS) // W
            gslot = seq_ix * slots_l + jnp.arange(slots_l, dtype=jnp.int32)
            fmask = gslot[None, :] < n_frames[:, None]
            x = x * fmask[..., None].astype(dtype)
            # full spectrum for the extended features; the score's peak
            # normalization must exclude the Nyquist bin (the reference
            # never accumulates it) — zeroed below.
            dre, dim = tables.rdft_matrices(zero_nyquist=not extended)
            re = jnp.matmul(x, jnp.asarray(dre, dtype), precision=hp)
            im = jnp.matmul(x, jnp.asarray(dim, dtype), precision=hp)
            power_frames = re * re + im * im  # [Bl, slots_l, 257] local
            power = jax.lax.psum(jnp.sum(power_frames, axis=1), "seq")
            power_score = (
                power.at[:, -1].set(0.0) if extended else power
            )
        else:
            # Pallas STFT-power on the local shard; the frame offset masks
            # local windows against the song's GLOBAL frame count.
            from bliss_tpu.kernels.pallas_stft import stft_power

            power = jax.lax.psum(
                stft_power(
                    s16, n, frame_offset=seq_ix * slots_l,
                    precise=cfg.stft_conv == "precise",
                ),
                "seq",
            ).astype(dtype)
            power_score = power

        p = jnp.sqrt(power_score[:, 1:] / jnp.asarray(float(W), dtype))
        peak = jnp.max(p, axis=1, keepdims=True)
        db = 20.0 * jnp.log10(p / peak) - jnp.asarray(-C.DB_ATTENUATION, dtype)
        lo, ls_, hi, hs = (
            C.FREQ_LOW_INF, C.FREQ_LOW_SUP, C.FREQ_HIGH_INF, C.FREQ_HIGH_SUP,
        )
        b0 = (db[:, 1] + db[:, 3]) / 2.0
        b1 = (db[:, 5] + db[:, 7]) / 2.0
        b2 = jnp.sum(db[:, lo - 1 : ls_], axis=1) / (ls_ - lo)
        b3 = jnp.sum(db[:, ls_:hi], axis=1) / (hi - (ls_ + 1))
        b4 = jnp.sum(db[:, hi:hs], axis=1) / (hs - (hi + 1))
        frequency = (
            jnp.asarray(C.FREQUENCY_SCALE, dtype) * (b4 + b3 + b2 - b0 - b1)
            + jnp.asarray(C.FREQUENCY_BIAS, dtype)
        ).astype(jnp.float32)

        # ---- tempo: mean/var psums, halo-exchanged windows, energy gather --
        sv = jnp.where(valid, s, 0)
        mean = c_div(jax.lax.psum(jnp.sum(sv, axis=1, dtype=jnp.int32), "seq"), n)
        d_ = jnp.where(valid, s - mean[:, None], 0)
        if cfg.dtype == "float64":
            var = c_div(
                jax.lax.psum(jnp.sum(d_.astype(jnp.int64) ** 2, axis=1), "seq"),
                n.astype(jnp.int64),
            ).astype(dtype)
        else:
            var = jnp.trunc(
                jax.lax.psum(jnp.sum(d_.astype(dtype) ** 2, axis=1), "seq")
                / n.astype(dtype)
            )
        inv = jnp.asarray(1.0 / (1 << 15), dtype)
        hop = C.TEMPO_HOP
        K = cfg.band_taps - 1
        fwd = [(i, (i + 1) % n_seq) for i in range(n_seq)]
        bwd = [(i, (i - 1) % n_seq) for i in range(n_seq)]
        NBF_l = Ls // hop

        if use_fused:
            # ---- fused Pallas sample-stats per shard ------------------------
            # ring exchanges: the right neighbor's first hop-block completes
            # this shard's boundary window; the left neighbor's last K raw
            # samples seed the conv history. For the first shard the history
            # must be zero in NORMALIZED space: the raw value whose
            # normalization is exactly zero is the integer mean.
            from bliss_tpu.kernels.fused_stats import fused_stats_call

            alpha = inv / (var * inv * inv)
            beta = -(mean.astype(dtype) * inv) / (var * inv * inv)
            right = jax.lax.ppermute(s16[:, :hop], "seq", bwd)
            left16 = jax.lax.ppermute(s16[:, -K:], "seq", fwd)
            left16 = jnp.where(
                seq_ix == 0,
                jnp.clip(mean, -32768, 32767).astype(jnp.int16)[:, None],
                left16,
            )
            x_ext = jnp.concatenate([s16, right], axis=1)
            wsum, _, energies_ext = fused_stats_call(
                x_ext, alpha, beta, halo0=left16,
                interpret=jax.default_backend() == "cpu",
                nb_bands=cfg.nb_bands, band_taps=cfg.band_taps,
                filterbank=cfg.filterbank, conv_mode=cfg.fused_conv,
            )
            # Unmasked per-block weight sums over THIS shard's own blocks
            # (the ring-extension block and kernel padding are dropped),
            # corrected by w(0)=1 per local sample outside the global trim.
            lo_in = jnp.clip(start - offset, 0, Ls)
            hi_in = jnp.clip(end + 1 - offset, 0, Ls)
            inside = jnp.maximum(hi_in - lo_in, 0).astype(dtype)
            amp_part = jnp.sum(wsum[:, :NBF_l], axis=1) - (Ls - inside)
            amp_dot = jax.lax.psum(amp_part, "seq")
            energy = energies_ext[:, :, :NBF_l]  # [Bl, NB, NBF_l]

        if not use_fused:
            norm = (s.astype(dtype) * inv - mean[:, None].astype(dtype) * inv) / (
                var[:, None] * inv * inv
            )
            norm = jnp.where(valid, norm, 0.0)

            # Blocked Parseval energies per shard (see features/tempo.py and
            # docs/DESIGN.md §2): one convolution pass + per-block partial sums.
            # Two ring exchanges replace the overlapped-window framing:
            #  - conv history: the LAST 16 normalized samples of the left
            #    neighbor (zero for the first shard, matching zero padding);
            #  - the right neighbor's first-block partial sums, needed by this
            #    shard's last window (windows span two hop-blocks).
            halo_prev = jax.lax.ppermute(norm[:, -K:], "seq", fwd)
            halo_prev = jnp.where(seq_ix == 0, jnp.zeros_like(halo_prev), halo_prev)
            xp = jnp.concatenate([halo_prev, norm], axis=1)  # [Bl, Ls + K]

            fb = tables.bandpass_filterbank(cfg.nb_bands, cfg.band_taps, cfg.filterbank)
            bands = []
            for b in range(fb.shape[0]):
                zb_ = jnp.zeros_like(norm)
                for m in range(cfg.band_taps):
                    zb_ = zb_ + jnp.asarray(fb[b, m], dtype) * xp[
                        :, K - m : K - m + Ls
                    ]
                bands.append(zb_)
            z = jnp.stack(bands, axis=1)  # [Bl, NB, Ls]
            NB = z.shape[1]

            alt = jnp.asarray(tables.parseval_alt_sign()[:hop], dtype)
            zb = z.reshape(Bl, NB, NBF_l, hop)
            S1 = jnp.sum(zb, axis=-1)  # [Bl, NB, NBF_l]
            S2 = jnp.sum(zb * zb, axis=-1)
            SA = jnp.sum(zb * alt, axis=-1)

            hist = xp[:, :Ls].reshape(Bl, NBF_l, hop)[:, :, :K]
            zh = zb[..., :K]
            Mw = jnp.asarray(
                tables.fir_warmup_correction(cfg.nb_bands, cfg.band_taps, cfg.filterbank),
                dtype,
            )
            # HIGHEST: see kernels/fused_all.py — the correction must
            # cancel the conv's history tail to f32 accuracy on TPU.
            delta = jnp.einsum(
                "bwk,njk->bnwj", hist, Mw,
                precision=jax.lax.Precision.HIGHEST,
            )
            d1 = jnp.sum(delta, axis=-1)
            d2 = jnp.sum(2.0 * zh * delta + delta * delta, axis=-1)
            da = jnp.sum(delta * alt[:K], axis=-1)

            # right neighbor's first-block sums complete this shard's last window
            S_first = jnp.stack(
                [S1[:, :, 0], S2[:, :, 0], SA[:, :, 0]], axis=-1
            )  # [Bl, NB, 3]
            S_next = jax.lax.ppermute(S_first, "seq", bwd)
            S1n = jnp.concatenate([S1[:, :, 1:], S_next[..., 0:1]], axis=2)
            S2n = jnp.concatenate([S2[:, :, 1:], S_next[..., 1:2]], axis=2)
            SAn = jnp.concatenate([SA[:, :, 1:], S_next[..., 2:3]], axis=2)

            sum_y2 = S2 + S2n + d2
            sum_y = S1 + S1n + d1
            sum_a = SA + SAn + da
            energy = (W / 2) * sum_y2 + (sum_y * sum_y + sum_a * sum_a) / 2.0

        trunc_n = n - n % W
        n_windows = -((-(trunc_n - W)) // hop)
        gwin = seq_ix * NBF_l + jnp.arange(NBF_l, dtype=jnp.int32)
        wmask = gwin[None, :] < n_windows[:, None]
        energy = energy * wmask[:, None, :].astype(dtype)

        span = (end - start).astype(dtype)
        integral = (
            amp_dot * (jnp.asarray(100.0, dtype) / span)
        ).astype(jnp.float32)
        amplitude = (
            jnp.float32(C.AMPLITUDE_SCALE) * integral
            + jnp.float32(C.AMPLITUDE_BIAS)
        )

        # [Bl, NB, L//hop]: every device holds its songs' full energy rows
        fa = jax.lax.all_gather(energy, "seq", axis=2, tiled=True)

        outs = []
        beat_aux = None
        if cfg.tempo_finish == "host":
            outs = [amplitude, frequency, fa]
            # analyze_sharded_async overwrites the extended beat columns
            # from the float64 host finish — skip the device beat chain
            beat_aux = "skip"
        elif extended:
            # share one envelope chain: the aux hands the core's beat
            # detection to the extended bpm/beat_loudness columns
            tempo, attack, beat_aux = tempo_mod.envelope_finish_device(
                fa, n, dur, cfg, return_aux=True
            )
            outs = [jnp.stack([tempo, amplitude, frequency, attack], axis=1)]
        else:
            tempo, attack = tempo_mod.envelope_finish_device(fa, n, dur, cfg)
            outs = [jnp.stack([tempo, amplitude, frequency, attack], axis=1)]
        if extended:
            outs.append(
                _extended_local(
                    s, n, dur, valid, seq_ix, n_seq, power,
                    power_frames, fmask, fa, cfg, beat_aux=beat_aux,
                )
            )
        return tuple(outs) if len(outs) > 1 else outs[0]

    if cfg.tempo_finish == "host":
        out_specs = [P("data"), P("data"), P("data", None, None)]
    else:
        out_specs = [P("data", None)]
    if extended:
        out_specs.append(P("data", None))
    if len(out_specs) == 1:
        out_specs = out_specs[0]
    else:
        out_specs = tuple(out_specs)
    mapped = _shard_map_unchecked(
        local_fn,
        mesh=mesh,
        in_specs=(P("data", "seq"), P("data"), P("data")),
        out_specs=out_specs,
    )
    return jax.jit(mapped)


def _extended_local(
    s, n, dur, valid, seq_ix, n_seq, power, power_frames, fmask, fa, cfg,
    beat_aux=None,
):
    """Sharded extended (ROADMAP) features: [Bl, n_ext] float32, replicated
    over 'seq'. Frame statistics psum across shards; the zero-crossing count
    ring-exchanges a one-sample halo; beat metrics run on the gathered band
    energies (``beat_aux`` shares the core finish's beat detection — see
    beat_metrics). Mirrors features/extended.py column for column."""
    from bliss_tpu.features.extended import (
        chroma_matrix,
        dct_ii_matrix,
        mel_filterbank,
    )

    dtype = cfg.jnp_dtype
    hp = jax.lax.Precision.HIGHEST
    W = C.WINDOW_SIZE
    Bl, Ls = s.shape
    nf = jnp.maximum(n.astype(dtype), 1.0)

    # ---- loudness: psum of valid squared samples ---------------------------
    sv = jnp.where(valid, s, 0).astype(dtype)
    rms = jnp.sqrt(
        jax.lax.psum(jnp.sum((sv / 32768.0) ** 2, axis=1), "seq") / nf
    )
    loudness_db = 20.0 * jnp.log10(jnp.maximum(rms, 1e-10))

    # ---- zero-crossing rate with a one-sample ring halo --------------------
    Lm = Ls // 2
    frp = s.reshape(Bl, Lm, 2)
    mono = c_div(frp[..., 0] + frp[..., 1], 2)
    gm = seq_ix * Lm + jnp.arange(Lm, dtype=jnp.int32)
    mvalid = gm[None, :] < (n // 2)[:, None]
    mono_m = jnp.where(mvalid, mono, 0)
    sign = jnp.where(mono_m >= 0, 1, -1)
    flips = (
        (sign[:, 1:] != sign[:, :-1]) & mvalid[:, 1:] & mvalid[:, :-1]
    )
    fwd = [(i, (i + 1) % n_seq) for i in range(n_seq)]
    prev_sign = jax.lax.ppermute(sign[:, -1], "seq", fwd)
    prev_valid = jax.lax.ppermute(mvalid[:, -1], "seq", fwd)
    boundary = (
        (sign[:, 0] != prev_sign) & mvalid[:, 0] & prev_valid & (seq_ix > 0)
    )
    zcr = jax.lax.psum(
        jnp.sum(flips, axis=1) + boundary.astype(jnp.int32), "seq"
    ).astype(dtype) / jnp.maximum((n // 2).astype(dtype) - 1.0, 1.0)

    # ---- frame-weighted spectral statistics --------------------------------
    bins = power_frames.shape[-1]
    bin_hz = jnp.asarray(np.arange(bins) * C.SAMPLE_RATE / W, dtype)
    frame_energy = jnp.sum(power_frames, axis=-1)  # [Bl, slots_l]
    total_energy = jnp.maximum(
        jax.lax.psum(jnp.sum(frame_energy, axis=-1), "seq"), 1e-12
    )
    centroid = (
        jax.lax.psum(
            jnp.sum(jnp.sum(power_frames * bin_hz, axis=-1), axis=-1), "seq"
        )
        / total_energy
    )
    csum = jnp.cumsum(power_frames, axis=-1)
    fe = jnp.maximum(frame_energy, 1e-12)[..., None]
    reached = csum >= 0.95 * fe
    roll_hz = jnp.take(bin_hz, jnp.argmax(reached, axis=-1))
    rolloff = (
        jax.lax.psum(jnp.sum(roll_hz * frame_energy, axis=-1), "seq")
        / total_energy
    )
    eps = jnp.asarray(1e-12, dtype)
    log_gm = jnp.sum(jnp.log(power_frames + eps), axis=-1) / bins
    am = frame_energy / bins
    flat_f = jnp.exp(log_gm) / jnp.maximum(am, 1e-12)
    flatness = (
        jax.lax.psum(jnp.sum(flat_f * frame_energy, axis=-1), "seq")
        / total_energy
    )

    # ---- MFCC mean/std (two psum rounds: mean first, then moments) ---------
    mel = jnp.matmul(
        power_frames, jnp.asarray(mel_filterbank(), dtype), precision=hp
    )
    logmel = jnp.log(mel + eps)
    mfcc = jnp.matmul(
        logmel, jnp.asarray(dct_ii_matrix(), dtype), precision=hp
    )
    fm = fmask.astype(dtype)[..., None]
    cnt = jnp.maximum(jax.lax.psum(jnp.sum(fm, axis=1), "seq"), 1.0)
    mfcc_mean = jax.lax.psum(jnp.sum(mfcc * fm, axis=1), "seq") / cnt
    mfcc_var = (
        jax.lax.psum(
            jnp.sum((mfcc - mfcc_mean[:, None, :]) ** 2 * fm, axis=1), "seq"
        )
        / cnt
    )
    mfcc_std = jnp.sqrt(mfcc_var)

    # ---- chroma from the (already psummed) full power spectrum -------------
    chroma = jnp.matmul(
        power, jnp.asarray(chroma_matrix(), dtype), precision=hp
    )
    chroma = chroma / jnp.maximum(jnp.sum(chroma, axis=1, keepdims=True), 1e-12)

    # ---- beat metrics from the gathered band energies ----------------------
    if isinstance(beat_aux, str) and beat_aux == "skip":
        # host-finish mode: the caller overwrites both beat columns from
        # the float64 host aux — placeholder zeros instead of a second
        # (discarded) device envelope chain
        bpm = jnp.zeros(fa.shape[:1], dtype)
        beat_loud = jnp.zeros(fa.shape[:1], dtype)
    else:
        bpm, beat_loud = tempo_mod.beat_metrics(fa, n, dur, cfg, aux=beat_aux)

    head = jnp.stack(
        [
            zcr,
            loudness_db,
            centroid,
            rolloff,
            flatness,
            bpm.astype(dtype),
            beat_loud.astype(dtype),
        ],
        axis=1,
    )
    return jnp.concatenate([head, mfcc_mean, mfcc_std, chroma], axis=1).astype(
        jnp.float32
    )


def sharded_distance_topk(
    features: jnp.ndarray, mesh: Mesh, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Row-sharded all-pairs distances with per-row top-k (self excluded).

    Feature vectors are replicated (tiny: [N, 4]); the [N, N] distance matrix
    is never materialized globally — each device computes its row block and
    reduces it to top-k immediately. Returns ([N, k] distances, [N, k]
    indices).
    """
    n = features.shape[0]

    def local_fn(rows, full):
        sq_r = jnp.sum(rows * rows, axis=-1)
        sq_f = jnp.sum(full * full, axis=-1)
        gram = jnp.matmul(rows, full.T, precision=jax.lax.Precision.HIGHEST)
        d = jnp.sqrt(jnp.maximum(sq_r[:, None] + sq_f[None, :] - 2 * gram, 0.0))
        # exclude self-matches by masking exact-zero diagonal positions
        r0 = jax.lax.axis_index("data") * rows.shape[0]
        cols = jnp.arange(full.shape[0])
        self_mask = cols[None, :] == (r0 + jnp.arange(rows.shape[0]))[:, None]
        d = jnp.where(self_mask, jnp.inf, d)
        neg, idx = jax.lax.top_k(-d, k)
        return -neg, idx

    devs = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    flat = Mesh(np.asarray(mesh.devices).reshape(devs), ("data",))
    mapped = _shard_map_unchecked(
        local_fn,
        mesh=flat,
        in_specs=(P("data"), P(None)),
        out_specs=(P("data"), P("data")),
    )
    pad = (-n) % devs
    feats = jnp.pad(features, ((0, pad), (0, 0)), constant_values=1e30)
    dists, idx = jax.jit(mapped)(feats, features)
    return dists[:n], idx[:n]

"""Extended-vector quality benchmark: do the ROADMAP features make
measurably better playlists than the core 4-D force vector?

Protocol (synthetic song families, fully reproducible):
- F families x M variants of 11-s songs. A family fixes the musical
  identity — beat period, harmonic palette (a pitch-class chord), timbre
  brightness, and noise floor. Variants within a family perturb what a
  re-master / re-encode / alternate take would: noise seed, +-0.5 dB
  level, a few cents of detune, and arpeggio phase.
- Families are constructed to COLLIDE in the core 4-D space: pairs share
  the same beat period and matched band-energy balance but differ in
  pitch-class content (C-major vs F#-major at the same register) — the
  core frequency score can't tell them apart, the chroma/MFCC columns
  can. This mirrors the real failure mode of 4-D bliss playlists
  (harmonically clashing songs at the same tempo/loudness).
- Every song is analyzed with the production extended program
  (analyze_batch_ext_jit: core + 45 ROADMAP columns in one device
  program), columns are z-scored over the library (the standard
  normalization for mixed-unit vectors), and two retrieval metrics are
  computed for core-4 vs core+extended:
    recall@(M-1): fraction of each song's M-1 nearest neighbors that are
      its own family, averaged (1.0 = perfect playlists);
    separation: mean cross-family distance / mean in-family distance
      (higher = families are better separated than their variants).

Prints ONE JSON line. Defaults run on CPU in ~2 min; --platform tpu
dispatches the analysis to the real chip.

Usage: python scripts/quality_benchmark.py [--families 8] [--variants 6]
           [--seconds 11] [--platform cpu|tpu] [--k N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SR = 22050

# pitch-class chords (semitones above A3=220 Hz); pairs 0/1 and 2/3 share
# register + partial count so band-energy balance matches and only the
# pitch classes differ
CHORDS = (
    (0, 4, 7, 12),     # A major
    (6, 10, 13, 18),   # D# major (tritone away — same register)
    (3, 7, 10, 15),    # C major flavor
    (9, 13, 16, 21),   # F# major flavor
)
BEAT_PERIODS = (0.5, 0.8)  # seconds (120 / 75 bpm)


def synth_song(
    family: int, variant: int, seconds: float, rng: np.random.RandomState
) -> np.ndarray:
    """One 11-s stereo-collapsed int16 song for (family, variant)."""
    beat_s = BEAT_PERIODS[family % len(BEAT_PERIODS)]
    chord = CHORDS[(family // len(BEAT_PERIODS)) % len(CHORDS)]
    n = int(seconds * SR)
    t = np.arange(n) / SR
    detune = 2.0 ** (rng.uniform(-5, 5) / 1200.0)  # +-5 cents per variant
    level = 10.0 ** (rng.uniform(-0.5, 0.5) / 20.0)  # +-0.5 dB
    phase = rng.uniform(0, 1)

    # beat envelope: exponential attack-decay at the family's beat period
    beat_pos = (t / beat_s + phase) % 1.0
    env = np.exp(-4.0 * beat_pos) + 0.15

    sig = np.zeros(n)
    for j, semi in enumerate(chord):
        f0 = 220.0 * (2.0 ** (semi / 12.0)) * detune
        # arpeggio: each chord tone pulses on its own beat slot
        slot = ((t / beat_s + phase + j / len(chord)) % 1.0) < 0.5
        for h, amp in ((1, 1.0), (2, 0.5), (3, 0.25)):
            sig += amp * slot * np.sin(2 * np.pi * f0 * h * t + j)
    sig *= env
    sig += rng.randn(n) * 0.02 * sig.std()  # variant noise floor
    sig *= level * 9000.0 / max(np.abs(sig).max(), 1e-9)
    return np.clip(sig, -32768, 32767).astype(np.int16)


def zscore(x: np.ndarray) -> np.ndarray:
    mu = x.mean(axis=0, keepdims=True)
    sd = x.std(axis=0, keepdims=True)
    return (x - mu) / np.maximum(sd, 1e-9)


def retrieval_metrics(
    vecs: np.ndarray, labels: np.ndarray, k: int
) -> tuple[float, float]:
    """(recall@k, separation) for z-scored vectors ``vecs`` [N, D]."""
    v = zscore(vecs)
    d = np.sqrt(
        np.maximum(
            (v**2).sum(1)[:, None]
            + (v**2).sum(1)[None, :]
            - 2.0 * (v @ v.T),
            0.0,
        )
    )
    np.fill_diagonal(d, np.inf)
    nn = np.argsort(d, axis=1)[:, :k]
    same = labels[nn] == labels[:, None]
    recall = float(same.mean())
    finite = np.isfinite(d)
    in_fam = (labels[:, None] == labels[None, :]) & finite
    cross = (labels[:, None] != labels[None, :]) & finite
    separation = float(d[cross].mean() / d[in_fam].mean())
    return recall, separation


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--families", type=int, default=8)
    ap.add_argument("--variants", type=int, default=6)
    ap.add_argument("--seconds", type=float, default=11.0)
    ap.add_argument("--k", type=int, default=0, help="0 = variants-1")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from bliss_tpu.config import AnalysisConfig
    from bliss_tpu.features import PCMBatch
    from bliss_tpu.features.analyze import analyze_batch_ext_jit

    songs, labels = [], []
    for fam in range(args.families):
        for var in range(args.variants):
            rng = np.random.RandomState(1000 * fam + var)
            songs.append(synth_song(fam, var, args.seconds, rng))
            labels.append(fam)
    labels = np.asarray(labels)
    batch = PCMBatch.from_arrays(songs, [int(args.seconds)] * len(songs))

    cfg = AnalysisConfig(tempo_finish="device_exact")
    feats = np.asarray(analyze_batch_ext_jit(batch, cfg))

    k = args.k or max(args.variants - 1, 1)
    recall_core, sep_core = retrieval_metrics(feats[:, :4], labels, k)
    recall_ext, sep_ext = retrieval_metrics(feats, labels, k)

    print(
        json.dumps(
            {
                "metric": "extended-vector retrieval quality",
                "songs": len(songs),
                "families": args.families,
                "variants": args.variants,
                "k": k,
                "recall_at_k_core4": round(recall_core, 4),
                "recall_at_k_extended": round(recall_ext, 4),
                "separation_core4": round(sep_core, 3),
                "separation_extended": round(sep_ext, 3),
                "extended_wins": bool(
                    recall_ext >= recall_core and sep_ext > sep_core
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

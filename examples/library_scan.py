#!/usr/bin/env python
"""Resumable batch scan of a music library to CSV + feature store.

The TPU-batch equivalent of the reference's GTK scanner
(reference: python/examples/analyze_gui.py) — same per-song CSV output and
interruption-safe progress, no GUI stack required: re-running the command
skips everything already in the store (content-fingerprinted).

Usage: python examples/library_scan.py MUSIC_DIR [features.csv]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from bliss_tpu.cli import main

if __name__ == "__main__":
    music_dir = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "features.csv"
    raise SystemExit(
        main(["scan", music_dir, "-o", out, "--store", ".bliss-store"])
    )

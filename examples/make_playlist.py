#!/usr/bin/env python
"""Generate an .m3u playlist ordered by similarity to a seed song.

The batch equivalent of the reference's make_m3u_playlist example
(reference: python/examples/make_m3u_playlist.py): instead of analyzing one
song per loop iteration, the whole library is decoded on host threads and
analyzed as device batches; the distance sort runs on device too.

Usage: python examples/make_playlist.py SEED_SONG MUSIC_DIR [OUT.m3u]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from bliss_tpu.cli import main

if __name__ == "__main__":
    seed, music_dir = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "playlist.m3u"
    raise SystemExit(main(["playlist", seed, music_dir, "-o", out]))

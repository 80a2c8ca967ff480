#!/usr/bin/env python
"""Song API walkthrough (the reference's python/examples/bl_song.py analog).

Usage: python examples/song_api_demo.py SONG_FILE
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import bliss_tpu

fname = sys.argv[1]

# Context-managed analysis, dict-style access (reference binding idioms).
with bliss_tpu.Song(fname) as song:
    print("title:     ", song["title"])
    print("artist:    ", song["artist"])
    print("duration:  ", song["duration"], "s")
    print("force:     ", song["force"])
    print("vector:    ", song["force_vector"])
    print(
        "class:     ",
        {0: "Loud", 1: "Calm"}.get(song["calm_or_loud"], "Unknown"),
    )

# Individual analyzers on a decoded song.
s = bliss_tpu.Song()
s.decode(fname)
print("amplitude: ", s.amplitude_analysis())
print("frequency: ", s.frequency_analysis())
print("tempo/atk: ", s.envelope_analysis())

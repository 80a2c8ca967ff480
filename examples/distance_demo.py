#!/usr/bin/env python
"""Pairwise song comparison (the reference's python/examples/distance.py
analog): Euclidean distance + cosine similarity between two files.

Usage: python examples/distance_demo.py SONG1 SONG2
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import bliss_tpu

s1 = bliss_tpu.analyze(sys.argv[1])
s2 = bliss_tpu.analyze(sys.argv[2])
print("force vectors:")
print(" ", sys.argv[1], s1.force_vector.as_array())
print(" ", sys.argv[2], s2.force_vector.as_array())
print("distance:          ", bliss_tpu.distance(s1, s2))
print("cosine similarity: ", bliss_tpu.cosine_similarity(s1, s2))

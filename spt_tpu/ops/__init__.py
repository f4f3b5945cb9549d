"""Vectorized compute ops: math, RNG, sampling, intersection, compaction, tonemap."""

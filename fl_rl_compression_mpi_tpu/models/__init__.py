"""Codec families (FL, RL) — high-level encode/decode with backend dispatch."""

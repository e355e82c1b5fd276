"""Grid primitives: fixed-point, Morton keys, tile matrix sets."""

"""Host-side dataset tooling (no TPU involvement): the equivalent of the
reference's `real_to_nerf.py` dataset builder and test-sequence generators.
"""

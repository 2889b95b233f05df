"""Vectorized numpy coordinate kernels.

Each module exposes a ``setup_*`` returning a frozen constants object plus
``*_fwd`` / ``*_inv`` functions mapping numpy arrays -> numpy arrays.
Semantics and tolerances are pinned to PROJ's gie regression corpus
(/root/reference/test/gie/) — see tests/fixtures/gie/.
"""

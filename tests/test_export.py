"""AOT export (tools/export_model.py): serialize → deserialize → exact match.

The serving artifact must reproduce the live model bit-for-bit on the same
inputs and survive a disk round trip with the flax-struct containers in the
signature.
"""
import os
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_export_roundtrip_fsd(tmp_path):
    from jax import export as jexport
    import export_model as EM

    EM._register_container_serialization(jexport)
    fwd, ex_args = EM.build("fsd", tiny=True, config=None)
    exp = jexport.export(jax.jit(fwd))(*ex_args)
    blob = exp.serialize()
    p = tmp_path / "fsd.stablehlo"
    p.write_bytes(blob)

    back = jexport.deserialize(bytearray(p.read_bytes()))
    got = back.call(*ex_args)
    want = jax.jit(fwd)(*ex_args)
    assert len(got) == 3
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-6)

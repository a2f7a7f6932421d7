"""RDA source reader (sources/rdata.py) against the reference's bundled
tables — shapes frozen from BASELINE.md (parsed at survey time)."""

import os

import pandas as pd
import pytest

from capelinker_ray.sources.rdata import read_rda

_DATA = "/root/reference/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(_DATA),
                                reason="reference data not available")


def test_rein_shape_and_types():
    objs = read_rda(f"{_DATA}/rein.rda")
    rein = objs["rein"]
    assert isinstance(rein, pd.DataFrame)
    assert rein.shape == (42354, 31)
    assert rein["persid"].dtype.kind == "i"
    assert rein["year"].dtype.kind == "i"
    assert rein["mlast"].dtype == object
    assert (rein["year"] == 1828).sum() == 1519


def test_other_panels():
    assert read_rda(f"{_DATA}/stel.rda")["stel"].shape == (96430, 26)
    opg = read_rda(f"{_DATA}/opg.rda")["opg"]
    out = read_rda(f"{_DATA}/out.rda")["out"]
    assert opg.shape[0] == 3118 and out.shape[0] == 3118


def test_rda_dataset_helper(ray_session):
    from capelinker_ray.sources.rdata import rda_dataset
    ds = rda_dataset(f"{_DATA}/opg.rda")
    assert ds.count() == 3118


def test_altrep_wrap_integer_unwraps_payload():
    """R >= 3.6 serializes sorted/wrapped vectors as ALTREP wrap_* with
    state = CONS(payload, metadata); the reader must return the payload
    vector, not the parsed pairlist (list of (tag, car, attr) tuples)."""
    import struct
    import numpy as np
    from capelinker_ray.sources.rdata import _Reader

    def i4(v):
        return struct.pack(">i", v)

    def sym(name):
        b = name.encode()
        return i4(1) + i4(9) + i4(len(b)) + b          # SYMSXP -> CHARSXP

    def ints(vals):
        return i4(13) + i4(len(vals)) + b"".join(i4(v) for v in vals)

    nil = i4(254)
    cons = i4(2)                                       # LISTSXP, no attr/tag
    # class info: CONS(wrap_integer, CONS(base, CONS(13L, NIL)))
    info = cons + sym("wrap_integer") + cons + sym("base") + \
        cons + ints([13]) + nil
    # state: CONS(payload [3,1,2], CONS(metadata [1,1], NIL))
    state = cons + ints([3, 1, 2]) + cons + ints([1, 1]) + nil
    stream = i4(238) + info + state + nil              # ALTREP + null attr
    out = _Reader(stream).item()
    assert isinstance(out, np.ndarray)
    assert out.tolist() == [3, 1, 2]

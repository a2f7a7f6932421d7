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

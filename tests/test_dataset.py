"""Tests for the lightweight Dataset (utils/dataset.py): NetCDF round-trip,
merge alignment (including non-monotonic coordinates), selection."""

import os

import numpy as np

from pyspeedy_tpu.utils.dataset import Dataset, Variable, merge, open_dataset


def _mk(time_val, ens=None, lev_desc=True):
    lev = np.array([0.9, 0.5, 0.1]) if lev_desc else np.array([0.1, 0.5, 0.9])
    shape = (1, 3, 2, 4) if ens is None else (1, 1, 3, 2, 4)
    dims = ("time", "lev", "lat", "lon") if ens is None else (
        "time", "ens", "lev", "lat", "lon")
    rng = np.random.default_rng(int(time_val) + (ens or 0))
    coords = {
        "time": Variable(("time",), np.array([np.datetime64(
            f"1982-01-{int(time_val):02d}")])),
        "lev": Variable(("lev",), lev),
        "lat": Variable(("lat",), np.array([-45.0, 45.0])),
        "lon": Variable(("lon",), np.arange(4.0)),
    }
    if ens is not None:
        coords["ens"] = Variable(("ens",), np.array([ens], dtype="int32"))
    return Dataset(
        data_vars={"t": Variable(dims, rng.random(shape).astype("f4"),
                                 {"units": "K"})},
        coords=coords)


def test_netcdf_roundtrip(tmp_path):
    ds = _mk(2)
    path = str(tmp_path / "out.nc")
    ds.to_netcdf(path)
    back = open_dataset(path)
    np.testing.assert_allclose(back["t"].data, ds["t"].data)
    assert back["t"].attrs["units"] == "K"
    assert back["time"].attrs["units"].startswith("days since 1982-01-02")
    np.testing.assert_allclose(back["lev"].data, ds.coords["lev"].data)


def test_merge_time_series():
    merged = merge([_mk(1), _mk(2), _mk(3)])
    assert merged["t"].data.shape == (3, 3, 2, 4)
    np.testing.assert_allclose(merged["t"].data[1], _mk(2)["t"].data[0])


def test_merge_ens_preserves_descending_lev():
    # Member datasets carry a descending lev coordinate; merge must keep the
    # order and place member data on the right ens rows.
    m0, m1 = _mk(2, ens=0), _mk(2, ens=1)
    merged = merge([m0, m1])
    assert merged["t"].data.shape == (1, 2, 3, 2, 4)
    np.testing.assert_allclose(merged.coords["lev"].data,
                               np.array([0.9, 0.5, 0.1]))
    np.testing.assert_allclose(merged.sel(ens=1)["t"].data, m1["t"].data[:, 0])


def test_reindex_and_transpose():
    ds = _mk(2, lev_desc=False)
    rev = ds.reindex(lev=ds.coords["lev"].data[::-1])
    np.testing.assert_allclose(rev.coords["lev"].data,
                               np.array([0.9, 0.5, 0.1]))
    np.testing.assert_allclose(rev["t"].data[:, 0], ds["t"].data[:, 2])
    tr = rev.transpose("lev", "time", "lat", "lon")
    assert tr["t"].dims == ("lev", "time", "lat", "lon")

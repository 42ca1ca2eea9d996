"""Component-level unit tests the reference lacks: qsat closed forms, the
longwave band table, calendar arithmetic, boundary-field sanitation, time
interpolation weights, and the geometry tables."""

from datetime import datetime

import numpy as np
import pytest

import jax.numpy as jnp

from pyspeedy_tpu import constants as pc
from pyspeedy_tpu.coupling.boundaries import (check_surface_fields,
                                              fill_missing_values)
from pyspeedy_tpu.coupling.interpolation import forin5, forint
from pyspeedy_tpu.ops.geometry import build_geometry
from pyspeedy_tpu.params import T30L8
from pyspeedy_tpu.physics.humidity import get_qsat
from pyspeedy_tpu.physics.longwave_radiation import radset
from pyspeedy_tpu.utils.calendar import ModelCalendar


def test_qsat_formula():
    # Tetens at T=300K, p=1000 hPa: e = e0*exp(17.269*(300-273.16)/(300-35.86))
    ta = jnp.full((1, 1), 300.0)
    ps = jnp.ones((1, 1))
    q = float(get_qsat(ta, ps, 1.0)[0, 0])
    e = 6.108e-3 * np.exp(17.269 * (300 - 273.16) / (300 - 35.86))
    expected = 622.0 * e / (1.0 - 0.378 * e)
    assert np.isclose(q, expected, rtol=1e-12)
    # ice branch below 273.16K uses the 21.875/7.66 coefficients
    q_ice = float(get_qsat(jnp.full((1, 1), 250.0), ps, 1.0)[0, 0])
    e_ice = 6.108e-3 * np.exp(21.875 * (250 - 273.16) / (250 - 7.66))
    assert np.isclose(q_ice, 622.0 * e_ice / (1.0 - 0.378 * e_ice), rtol=1e-12)


def test_radset_table():
    fband = radset()
    assert fband.shape == (301, 4)
    # Bands sum to 1 - epslw in the computed range
    s = fband[100:221].sum(axis=1)
    np.testing.assert_allclose(s, 1.0 - pc.EPSLW, atol=1e-12)
    # Clamped outside [200, 320]
    np.testing.assert_array_equal(fband[0], fband[100])
    np.testing.assert_array_equal(fband[300], fband[220])


def test_calendar_advance_and_leap_day():
    cal = ModelCalendar.from_datetime(datetime(1982, 1, 1))
    for _ in range(36):
        cal.advance()
    assert cal.to_datetime() == datetime(1982, 1, 2)
    assert np.isclose(cal.tmonth, 1.5 / 31.0)
    assert np.isclose(cal.tyear, 1.5 / 365.0)

    # Leap-day patch: Feb 29 exists in years divisible by 4
    # (model_control.f90:136-143).
    cal = ModelCalendar.from_datetime(datetime(1984, 2, 28))
    for _ in range(36):
        cal.advance()
    assert (cal.month, cal.day) == (2, 29)
    for _ in range(36):
        cal.advance()
    assert (cal.month, cal.day) == (3, 1)

    cal = ModelCalendar.from_datetime(datetime(1982, 2, 28))
    for _ in range(36):
        cal.advance()
    assert (cal.month, cal.day) == (3, 1)


def test_check_surface_fields():
    fmask = np.zeros((4, 6))
    fmask[1, :] = 1.0
    field = np.full((4, 6), 5.0)
    field[0, 0] = 7.0
    out, nfault = check_surface_fields(fmask, 0.0, 4.0, -1.0, field)
    # masked-out points replaced, faults counted but not fixed over the mask
    assert out[0, 0] == -1.0
    assert (out[1] == 5.0).all()
    assert nfault == 6


def test_fill_missing_values():
    sf = np.full((48, 96), 2.0)
    sf[10, 5] = -999.0
    out = fill_missing_values(sf, 0.0)
    assert np.isclose(out[10, 5], 2.0)
    assert (out[out != 2.0].size == 0)


def test_forint_forin5_weights():
    # Constant-in-time fields are preserved by both interpolators.
    f = jnp.broadcast_to(jnp.arange(12.0)[:, None, None] * 0 + 3.5,
                         (12, 2, 2))
    for tm in (0.1, 0.5, 0.9):
        np.testing.assert_allclose(np.asarray(forint(f, 5, tm)), 3.5,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(forin5(f, 5, tm)), 3.5,
                                   atol=1e-12)
    # forint is the exact linear interpolant between adjacent month means.
    f = jnp.asarray(np.arange(12.0)[:, None, None] * np.ones((12, 1, 1)))
    v = float(np.asarray(forint(f, 6, 0.75))[0, 0])
    assert np.isclose(v, 5.0 + 0.25 * 1.0)


def test_geometry_tables():
    g = build_geometry(T30L8)
    assert np.isclose(g.hsg[-1], 1.0)
    np.testing.assert_allclose(g.dhs.sum(), 1.0, atol=1e-15)
    # Latitudes ascend from south to north
    assert (np.diff(g.radang) > 0).all()
    assert np.isclose(g.radang[0], -g.radang[-1])
    # Coriolis antisymmetric
    np.testing.assert_allclose(g.coriol, -g.coriol[::-1], atol=1e-18)
    # wvi bottom-level quirk (geometry.f90:152-153)
    assert g.wvi[-1, 0] == 0.0


def test_sea_domains():
    from pyspeedy_tpu.coupling.sea import sea_domain
    g = build_geometry(T30L8)
    deglat = g.radang * 90.0 / np.arcsin(1.0)
    for name in ("northe", "natlan", "npacif", "tropic", "indian", "elnino"):
        m = sea_domain(name, deglat, 96)
        assert m.shape == (48, 96)
        assert 0.0 <= m.min() and m.max() <= 1.0
        assert m.sum() > 0
    tropic = sea_domain("tropic", deglat, 96)
    assert tropic[0].sum() == 0 and tropic[24].sum() == 96
    with pytest.raises(ValueError):
        sea_domain("nowhere", deglat, 96)


def test_registry_artifact_in_sync():
    """pyspeedy_tpu/data/model_state.json (parity with the reference's
    export_model_state_json artifact, model_state_def.py:527-560) must load
    and exactly match the live registry — regenerate with
    tools/export_registry.py after any registry change."""
    import json
    import os
    import sys

    import pyspeedy_tpu

    path = os.path.join(pyspeedy_tpu.PACKAGE_DATA_DIR, "model_state.json")
    assert os.path.exists(path), path
    with open(path) as f:
        shipped = json.load(f)

    sys.path.insert(0, os.path.join(os.path.dirname(pyspeedy_tpu.__file__),
                                    os.pardir, "tools"))
    from export_registry import registry_json

    assert shipped == registry_json(), \
        "model_state.json is stale: run tools/export_registry.py"

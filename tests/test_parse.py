"""Round-trip tests for the upstream grid text-format parsers.

Synthetic families are written through the text writers and read back
through the real parse path (the one the `convert-models` CLI uses), so
every parser exercises the exact code that will ingest the upstream
model-data download [SURVEY.md C5-C7, §7 step 0]."""
from __future__ import annotations

import os

import numpy as np
import pytest

from base_tpu.grids import parse, synthetic
from base_tpu.grids import wd_atmosphere as wda
from base_tpu.grids import wd_cooling as wdc
from base_tpu.grids.isochrone import derive_isochrone


@pytest.fixture(scope="module")
def ms_grid():
    return synthetic.make_grid(
        feh_axis=np.linspace(-1.0, 0.2, 3),
        y_axis=np.linspace(0.24, 0.30, 3),
        age_axis=np.linspace(8.8, 9.8, 4),
        n_eep=24,
        ragged=True,
    )


def test_ms_model_roundtrip(tmp_path, ms_grid):
    p = tmp_path / "girardi.ms"
    parse.write_ms_model(str(p), ms_grid)
    back = parse.parse_ms_model(p.read_text(), name="girardi")
    np.testing.assert_allclose(back.feh, ms_grid.feh, atol=1e-5)
    np.testing.assert_allclose(back.y, ms_grid.y, atol=1e-5)
    np.testing.assert_allclose(back.age, ms_grid.age, atol=1e-5)
    assert back.bands == ms_grid.bands
    # Ragged cells survive: same valid EEPs, same mass/mags where valid.
    v0 = np.asarray(ms_grid.valid) > 0.5
    v1 = np.asarray(back.valid) > 0.5
    assert v0.sum() == v1.sum()
    np.testing.assert_allclose(
        np.asarray(back.mass)[v1], np.asarray(ms_grid.mass)[v0], rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(back.mags)[v1], np.asarray(ms_grid.mags)[v0], atol=2e-5
    )
    np.testing.assert_allclose(back.agb_tip, ms_grid.agb_tip, rtol=2e-5)
    # The parsed grid interpolates identically off-node.
    i0 = derive_isochrone(ms_grid, -0.4, 0.27, 9.3)
    i1 = derive_isochrone(back, -0.4, 0.27, 9.3)
    np.testing.assert_allclose(
        np.asarray(i1.mags)[np.asarray(i1.valid) > 0.5],
        np.asarray(i0.mags)[np.asarray(i0.valid) > 0.5],
        atol=5e-5,
    )


def test_ms_eep_alignment():
    """Data rows carry absolute EEP numbers; isochrones starting at
    different EEPs must land at matched slots (reference EEP-matched
    interpolation, SURVEY.md C5)."""
    text = """
%s V I
%f [Fe/H]=0.0 Y=0.25
%a logAge=9.0
5 1.0 4.0 3.5
6 1.1 3.8 3.3
7 1.2 3.6 3.1
%a logAge=9.5
6 0.9 4.5 4.0
7 1.0 4.2 3.7
"""
    g = parse.parse_ms_model(text)
    assert g.n_eep == 3  # EEPs 5..7
    v = np.asarray(g.valid)[0, 0]           # [age, eep-slot]
    assert v[0].tolist() == [1.0, 1.0, 1.0]  # age 9.0 has EEPs 5,6,7
    assert v[1].tolist() == [0.0, 1.0, 1.0]  # age 9.5 starts at EEP 6
    m = np.asarray(g.mass)[0, 0]
    assert m[0, 1] == pytest.approx(1.1)     # EEP 6 at age 9.0
    assert m[1, 1] == pytest.approx(0.9)     # aligned by EEP, not position


def test_ms_parse_errors():
    with pytest.raises(ValueError):
        parse.parse_ms_model("%s V\n1 1.0 4.0\n")  # row before %f/%a
    with pytest.raises(ValueError):
        parse.parse_ms_model("%s V\n%f [Fe/H]=0 Y=0.25\n%a logAge=9\n1 1.0\n")


def test_wd_cooling_roundtrip(tmp_path):
    grid = wdc.synthetic_wd_cooling(n_mass=5, n_age=16, with_carbonicity=True)
    p = tmp_path / "montgomery.wd"
    parse.write_wd_cooling(str(p), grid)
    back = parse.parse_wd_cooling(p.read_text(), n_age=16, name="montgomery")
    np.testing.assert_allclose(back.carb, grid.carb, atol=1e-6)
    np.testing.assert_allclose(back.mass, grid.mass, atol=1e-6)
    # Re-gridded onto a uniform axis spanning the same range.
    np.testing.assert_allclose(
        [back.log_age[0], back.log_age[-1]],
        [grid.log_age[0], grid.log_age[-1]],
        atol=1e-5,
    )
    lt0, lr0, _ = wdc.wd_teff_radius(grid, 0.4, 0.7, 8.3)
    lt1, lr1, _ = wdc.wd_teff_radius(back, 0.4, 0.7, 8.3)
    assert float(abs(lt1 - lt0)) < 2e-3
    assert float(abs(lr1 - lr0)) < 2e-3


def test_wd_cooling_no_carbonicity(tmp_path):
    grid = wdc.synthetic_wd_cooling(n_mass=4, n_age=12, with_carbonicity=False)
    p = tmp_path / "wood.wd"
    parse.write_wd_cooling(str(p), grid)
    back = parse.parse_wd_cooling(p.read_text(), n_age=12)
    assert back.carb.shape == (1,)  # degenerate plane preserved


def test_bergeron_roundtrip(tmp_path):
    bands = ("U", "B", "V", "I")
    grid = wda.synthetic_bergeron(bands=bands, n_teff=8, n_logg=5)
    da, db = tmp_path / "Table_DA", tmp_path / "Table_DB"
    parse.write_bergeron_table(str(da), grid, wd_type=0)
    parse.write_bergeron_table(str(db), grid, wd_type=1)
    back = parse.parse_bergeron(da.read_text(), db.read_text(), bands)
    np.testing.assert_allclose(back.log_teff, grid.log_teff, atol=2e-4)
    np.testing.assert_allclose(back.log_g, grid.log_g, atol=1e-5)
    np.testing.assert_allclose(back.mags, grid.mags, atol=1e-3)


def test_bergeron_db_regrid():
    """A coarser DB lattice is re-gridded onto the DA axes."""
    bands = ("V",)
    fine = wda.synthetic_bergeron(bands=bands, n_teff=9, n_logg=5)
    coarse = wda.synthetic_bergeron(bands=bands, n_teff=5, n_logg=3)
    import io

    def table_text(g, t):
        buf = io.StringIO()
        buf.write("Teff logg V\n")
        for ti, lt in enumerate(np.asarray(g.log_teff)):
            for gi, lg in enumerate(np.asarray(g.log_g)):
                buf.write(
                    f"{10.0 ** lt:.1f} {lg:.3f} "
                    f"{np.asarray(g.mags)[t, ti, gi, 0]:.5f}\n"
                )
        return buf.getvalue()

    back = parse.parse_bergeron(
        table_text(fine, 0), table_text(coarse, 1), bands
    )
    assert back.mags.shape == (2, 9, 5, 1)
    # DB plane approximates the fine synthetic DB (smooth family).
    np.testing.assert_allclose(
        np.asarray(back.mags)[1], np.asarray(fine.mags)[1], atol=0.05
    )


def test_convert_model_directory(tmp_path):
    """End-to-end: text dir -> convert -> load.make_model serves it."""
    from base_tpu.grids.load import make_model
    from base_tpu.io.settings import load_settings

    src = tmp_path / "text"
    dst = tmp_path / "npz"
    os.makedirs(src)
    bands = ("U", "B", "V", "R", "I", "J", "H", "K")
    ms = synthetic.make_grid(
        feh_axis=np.linspace(-1.0, 0.2, 3),
        y_axis=np.linspace(0.24, 0.30, 3),
        age_axis=np.linspace(8.8, 9.8, 4),
        n_eep=16,
        bands=bands,
    )
    parse.write_ms_model(str(src / "girardi.ms"), ms)
    cool = wdc.synthetic_wd_cooling(n_mass=4, n_age=12)
    parse.write_wd_cooling(str(src / "montgomery.wd"), cool)
    atm = wda.synthetic_bergeron(bands=bands, n_teff=6, n_logg=4)
    parse.write_bergeron_table(str(src / "Table_DA"), atm, 0)
    parse.write_bergeron_table(str(src / "Table_DB"), atm, 1)

    written = parse.convert_model_directory(str(src), str(dst))
    names = sorted(os.path.basename(w) for w in written)
    assert names == ["bergeron.npz", "girardi.npz", "wd_montgomery.npz"]

    s = load_settings(None, [
        f"files.modelDirectory={dst}",
        "models.msRgbModel=girardi",
        "models.wdModel=montgomery",
    ])
    bundle = make_model(s)
    assert bundle.ms.name == "girardi"
    assert bundle.ms.bands == bands
    assert bundle.wd_atm.name == "bergeron"
    i0 = derive_isochrone(ms, -0.4, 0.27, 9.3)
    i1 = derive_isochrone(bundle.ms, -0.4, 0.27, 9.3)
    np.testing.assert_allclose(
        np.asarray(i1.mags)[np.asarray(i1.valid) > 0.5],
        np.asarray(i0.mags)[np.asarray(i0.valid) > 0.5],
        atol=5e-5,
    )

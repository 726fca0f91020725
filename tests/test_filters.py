"""Dynamic filter-set selection: active bands = .phot header ∩ model
bands, wired end to end through model construction (SURVEY.md C13;
VERDICT r1 missing-item #4)."""
import numpy as np
import pytest

from base_tpu import constants as C
from base_tpu.grids import filters as filt
from base_tpu.io import phot as photio
from base_tpu.io.settings import load_settings
from base_tpu.tools.main import _build_model_from_phot


def test_intersect_bands_order_and_indices():
    active, pi, mi = filt.intersect_bands(
        ("g", "V", "I", "B"), ("U", "B", "V", "R", "I")
    )
    assert active == ("V", "I", "B")          # phot-file order
    assert list(pi) == [1, 2, 3]
    assert list(mi) == [2, 4, 1]


def _phot(bands, n=12, stage=C.StarStatus.MSRG, seed=0):
    rng = np.random.default_rng(seed)
    B = len(bands)
    mags = rng.normal(14.0, 1.0, (n, B)).astype(np.float32)
    sig = np.full((n, B), 0.03, np.float32)
    return photio.from_simulation(
        None, bands, mags, sig, stage=np.full(n, stage, np.int32)
    )


def test_model_built_on_band_intersection():
    import jax.numpy as jnp

    from base_tpu.model import posterior as post

    s = load_settings(None, [])
    # phot has a band the grid lacks ("g") and misses several grid bands.
    table = _phot(("g", "V", "I", "B"))
    model = _build_model_from_phot(s, table)
    assert model.grid.bands == ("V", "I", "B")
    assert model.stars.n_bands == 3
    assert model.abs_coefs.shape == (3,)

    # Same data pre-sliced by hand must give the identical density.
    hand = table.select_bands(np.array([1, 2, 3]), ("V", "I", "B"))
    model2 = _build_model_from_phot(s, hand)
    p = jnp.asarray(s.cluster.start_vector())
    a = float(post.log_post(model, p))
    b = float(post.log_post(model2, p))
    assert a == b
    assert np.isfinite(a)


def test_wd_atmosphere_sliced_too():
    s = load_settings(None, [])
    ms = _phot(("V", "I", "B"), n=8)
    wd = _phot(("V", "I", "B"), n=3, stage=C.StarStatus.WD, seed=1)
    table = photio.PhotTable(
        ids=ms.ids + wd.ids,
        bands=ms.bands,
        mags=np.concatenate([ms.mags, wd.mags]),
        sigmas=np.concatenate([ms.sigmas, wd.sigmas]),
        mass1=np.concatenate([ms.mass1, wd.mass1]),
        mass_ratio=np.concatenate([ms.mass_ratio, wd.mass_ratio]),
        stage=np.concatenate([ms.stage, wd.stage]),
        cm_prior=np.concatenate([ms.cm_prior, wd.cm_prior]),
        use_dbi=np.concatenate([ms.use_dbi, wd.use_dbi]),
    )
    model = _build_model_from_phot(s, table)
    assert model.wd_stars is not None
    assert model.wd_atm.bands == ("V", "I", "B")
    assert model.wd_atm.mags.shape[-1] == 3

    import jax.numpy as jnp

    from base_tpu.model import posterior as post

    lp = float(post.log_post(model, jnp.asarray(s.cluster.start_vector())))
    assert np.isfinite(lp)


def test_empty_intersection_is_a_clear_error():
    s = load_settings(None, [])
    table = _phot(("G", "G_BP", "G_RP"))   # Gaia bands; grid is UBVRIJHK
    with pytest.raises(SystemExit, match="no overlapping filters"):
        _build_model_from_phot(s, table)

"""Judge A/B: full bench config on TPU, optionally reverting the r2
gather-free secondary-mass interpolation (--gather) to isolate its
effect on sampling quality."""
import sys

if "--gather" in sys.argv:
    from base_tpu.grids import isochrone as iso_mod
    from base_tpu.ops import interp as iops

    def mags_at_mass(self, m):
        return iops.interp1d(self.mass_sorted, self.mags, m)

    iso_mod.Isochrone.mags_at_mass = mags_at_mass


if "--dense-hp" in sys.argv:
    import jax
    import jax.numpy as jnp
    from base_tpu.ops import interp as iops

    def interp1d_dense_hp(x_axis, y, xq):
        w = iops.hat_weight_matrix(x_axis, xq)
        y2 = y.reshape(y.shape[0], -1)
        out = jnp.dot(w.reshape(-1, w.shape[-1]), y2,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        return out.reshape(xq.shape + y.shape[1:])

    iops.interp1d_dense = interp1d_dense_hp
    from base_tpu.grids import isochrone as iso_mod

    def mags_at_mass(self, m):
        return interp1d_dense_hp(self.mass_sorted, self.mags, m)

    iso_mod.Isochrone.mags_at_mass = mags_at_mass

import bench
bench.main(smoke=False)

# (appended by judge) third variant: dense interp with HIGHEST precision dot

"""Multi-frame ops and DFN-MF model tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfilternet_tpu.config import config
from deepfilternet_tpu.models import dfnetmf
from deepfilternet_tpu.models.multiframe import (
    _tik_reg,
    mf_mvdr,
    mf_wf,
    psd,
)


def _cplx(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)


class TestMfOps:
    def test_psd_shape_and_hermitian(self, rng):
        x = jnp.asarray(_cplx(rng, (2, 10, 8)))
        r = np.asarray(psd(x, 5))
        assert r.shape == (2, 10, 8, 5, 5)
        np.testing.assert_allclose(r, np.conj(np.swapaxes(r, -1, -2)), atol=1e-5)

    def test_tik_reg_improves_conditioning(self, rng):
        r = np.zeros((4, 3, 3), np.complex64)
        reg = np.asarray(_tik_reg(jnp.asarray(r)))
        assert np.all(np.abs(np.linalg.eigvalsh(reg)) > 0)

    def test_wf_identity_recovers_clean(self, rng):
        """With ifc = Rxx e_last (clean == noisy), the WF solves to the
        trivial last-tap selector and reproduces the input."""
        b, t, f, n = 1, 12, 6, 5
        spec = jnp.asarray(_cplx(rng, (b, t, f)))
        r = np.asarray(psd(spec, n)) + 1e-4 * np.eye(n)
        # ifc = R @ e_last => solve(R, ifc) = e_last => y = current frame
        ifc = jnp.asarray(r[..., -1])
        out = np.asarray(
            mf_wf(spec, ifc, jnp.asarray(r), nb_df=f, order=n, inverse=False)
        )
        np.testing.assert_allclose(out, np.asarray(spec), atol=1e-2)

    def test_mvdr_distortionless(self, rng):
        """MVDR weights satisfy w^H ifc = ifc[-1]^* (distortionless in the
        steering direction scaled by the reference tap)."""
        b, t, f, n = 1, 8, 4, 5
        spec = jnp.asarray(_cplx(rng, (b, t, f)))
        rng2 = np.random.default_rng(7)
        a = _cplx(rng2, (b, t, f, n, n))
        r = a @ np.conj(np.swapaxes(a, -1, -2)) + 0.1 * np.eye(n)
        ifc = jnp.asarray(_cplx(rng2, (b, t, f, n)))
        out = np.asarray(
            mf_mvdr(spec, ifc, jnp.asarray(r), nb_df=f, order=n, inverse=False)
        )
        assert np.all(np.isfinite(out))


class TestDfNetMF:
    @pytest.mark.parametrize("method", ["WF", "MVDR"])
    def test_forward(self, method, rng):
        config.reset()
        config.set("MFOP_METHOD", method, section="deepfilternet")
        params, state, cfg = dfnetmf.init_dfnetmf(jax.random.PRNGKey(0))
        b, t = 1, 6
        spec = jnp.asarray(rng.standard_normal((b, t, cfg["freq_bins"], 2)).astype(np.float32))
        fe = jnp.asarray(rng.standard_normal((b, t, cfg["nb_erb"])).astype(np.float32))
        fs = jnp.asarray(rng.standard_normal((b, t, cfg["nb_df"], 2)).astype(np.float32))
        (spec_e, m, lsnr, (ifc, cov)), _ = dfnetmf.forward(params, state, cfg, spec, fe, fs)
        assert spec_e.shape == spec.shape
        assert ifc.shape == (b, t, cfg["nb_df"], cfg["df_order"] * 2)
        assert cov.shape == (b, t, cfg["nb_df"], cfg["df_order"] ** 2 * 2)
        assert np.all(np.isfinite(np.asarray(spec_e)))

"""Schedule builders and derived transforms (the framework's config API)."""

import numpy as np
import jax.numpy as jnp

from montecarlosolvers_tpu import schedules


class TestBuilders:
    def test_linear_endpoints(self):
        s = np.asarray(schedules.linear(3.0, 0.0, 5))
        assert s[0] == 3.0 and s[-1] == 0.0 and len(s) == 5

    def test_pre_anneal_ladder(self):
        """Reference formula (examples/santoro80.py:284): start -> end in
        0.05 steps, inclusive count."""
        s = np.asarray(schedules.pre_anneal_schedule(3.0, 1.0))
        assert len(s) == int((3.0 - 1.0) / 0.05) + 1
        assert np.isclose(s[0], 3.0) and np.isclose(s[-1], 1.0)

    def test_transverse_field_floor(self):
        s = np.asarray(schedules.transverse_field(3.0, 1e-8, 10))
        assert s[-1] > 0.0  # keeps log(tanh(G/PT)) finite

    def test_expand_mcsteps(self):
        s = np.asarray(schedules.expand_mcsteps(jnp.asarray([2.0, 1.0]), 3))
        assert list(s) == [2.0, 2.0, 2.0, 1.0, 1.0, 1.0]


class TestTransforms:
    def test_jperp_formula(self):
        """J_perp = -(T_eff/2) ln tanh(Gamma/T_eff) (qmc.pyx:95)."""
        gamma, teff = 1.3, 2.0
        expected = -0.5 * teff * np.log(np.tanh(gamma / teff))
        assert np.isclose(float(schedules.jperp(gamma, teff)), expected)
        # positive (tanh < 1), and diverges as Gamma -> 0
        assert expected > 0
        assert float(schedules.jperp(1e-8, teff)) > float(
            schedules.jperp(1.0, teff)
        )

    def test_bath_lookuptable(self):
        """alpha (pi / (P sin(pi d / P)))^2 for d = 1..P-1 (qmc.pyx:162-163);
        symmetric in d <-> P-d, largest at d=1."""
        P, alpha = 8, 0.3
        lut = np.asarray(schedules.bath_lookuptable(P, alpha))
        assert lut.shape == (P - 1,)
        d = np.arange(1, P)
        expected = alpha * (np.pi / (P * np.sin(np.pi * d / P))) ** 2
        np.testing.assert_allclose(lut, expected, rtol=1e-6)
        np.testing.assert_allclose(lut, lut[::-1], rtol=1e-6)
        assert lut[0] == lut.max()

    def test_bath_scales_linearly_with_alpha(self):
        a = np.asarray(schedules.bath_lookuptable(6, 0.1))
        b = np.asarray(schedules.bath_lookuptable(6, 0.2))
        np.testing.assert_allclose(2 * a, b, rtol=1e-6)

"""Kernel unit tests: normalization (int W dV = 1), derivative consistency
(wfd vs numerical dW/dr), compact support, positivity at r=0.
These are the analytic gates SURVEY.md §4 prescribes."""

import numpy as np
import pytest

from tpusph import kernels

ALL_KERNELS = [kernels.LUCY, kernels.CUBIC_SPLINE, kernels.QUINTIC_SPLINE,
               kernels.WENDLAND_C2]
CUTS = [0.7, 1.0, 2.5]


@pytest.mark.parametrize("kid", ALL_KERNELS)
@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("cut", CUTS)
def test_normalization(kid, dim, cut):
    w = kernels.kernel_w(kid, dim)
    r = np.linspace(0.0, cut, 20001)[:-1] + cut / 40002.0  # midpoints
    dr = cut / 20001.0
    wr = np.asarray(w(r, cut))
    if dim == 3:
        integral = np.sum(4.0 * np.pi * r**2 * wr) * dr
    else:
        integral = np.sum(2.0 * np.pi * r * wr) * dr
    assert integral == pytest.approx(1.0, rel=2e-4)


@pytest.mark.parametrize("kid", ALL_KERNELS)
@pytest.mark.parametrize("dim", [2, 3])
def test_wfd_matches_numerical_derivative(kid, dim):
    cut = 1.3
    w = kernels.kernel_w(kid, dim)
    wfd = kernels.kernel_wfd(kid, dim)
    r = np.linspace(0.05 * cut, 0.95 * cut, 997)
    # eps large enough that the f32 central difference isn't noise-dominated;
    # truncation error is O(eps^2) ~ 1e-5 relative.
    eps = 4e-3 * cut
    dwdr_num = (np.asarray(w(r + eps, cut)) - np.asarray(w(r - eps, cut))) / (2 * eps)
    wfd_val = np.asarray(wfd(r, cut))
    np.testing.assert_allclose(wfd_val * r, dwdr_num, rtol=3e-3, atol=2e-4 * abs(dwdr_num).max())


@pytest.mark.parametrize("kid", ALL_KERNELS)
@pytest.mark.parametrize("dim", [2, 3])
def test_support_and_positivity(kid, dim):
    cut = 1.0
    w = kernels.kernel_w(kid, dim)
    wfd = kernels.kernel_wfd(kid, dim)
    assert float(w(np.array(0.0), cut)) > 0.0
    for r in [1.0, 1.1, 5.0]:
        assert float(w(np.array(r), cut)) == 0.0
        assert float(wfd(np.array(r), cut)) == 0.0
    # wfd <= 0 inside the support (monotone decreasing kernels)
    r = np.linspace(1e-3, 0.999, 500)
    assert np.all(np.asarray(wfd(r, cut)) <= 1e-12)


def test_lucy_matches_lammps_hardcoded_constants():
    """Upstream pair_sph_taitwater hard-codes the 3D/2D Lucy derivative
    prefactors; our analytic form must reproduce them.
    3D: wfd = -(315/(4 pi)) (cut-r)^2 / cut^7 ; 2D: -(60/pi)(cut-r)^2/cut^6."""
    cut = 1.7
    r = np.linspace(0.0, cut * 0.999, 100)
    wfd3 = np.asarray(kernels.kernel_wfd(kernels.LUCY, 3)(r, cut))
    expect3 = -(315.0 / (4 * np.pi)) * (cut - r) ** 2 / cut**7
    np.testing.assert_allclose(wfd3, expect3, rtol=1e-4)
    wfd2 = np.asarray(kernels.kernel_wfd(kernels.LUCY, 2)(r, cut))
    expect2 = -(60.0 / np.pi) * (cut - r) ** 2 / cut**6
    np.testing.assert_allclose(wfd2, expect2, rtol=1e-4)


def test_kernel_id_from_name():
    assert kernels.kernel_id_from_name("lucy") == kernels.LUCY
    assert kernels.kernel_id_from_name("quintic") == kernels.QUINTIC_SPLINE
    assert kernels.kernel_id_from_name("wendland/c2") == kernels.WENDLAND_C2
    with pytest.raises(ValueError):
        kernels.kernel_id_from_name("nope")

"""Native C++ EDT: parity vs scipy, spacing, signed maps, performance."""
import time

import numpy as np
import pytest

scipy_ndi = pytest.importorskip("scipy.ndimage")

from diff_unet_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_edt_matches_scipy(lib):
    rng = np.random.RandomState(0)
    mask = rng.rand(33, 41, 29) > 0.7
    got = native.distance_transform_edt(mask)
    want = scipy_ndi.distance_transform_edt(mask)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_edt_anisotropic_spacing(lib):
    rng = np.random.RandomState(1)
    mask = rng.rand(20, 24, 28) > 0.8
    sp = (1.5, 1.5, 2.0)
    got = native.distance_transform_edt(mask, sp)
    want = scipy_ndi.distance_transform_edt(mask, sampling=sp)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_edt_degenerate_masks(lib):
    all_zero = np.zeros((5, 5, 5), bool)
    np.testing.assert_array_equal(
        native.distance_transform_edt(all_zero), np.zeros((5, 5, 5))
    )
    single = np.zeros((7, 7, 7), bool)
    single[3, 3, 3] = True
    d = native.distance_transform_edt(single)
    assert d[3, 3, 3] == pytest.approx(1.0)
    assert d[0, 0, 0] == 0.0


def test_signed_distance_matches_python_path(lib):
    from diff_unet_tpu.losses.edt import signed_distance_maps
    mask = np.zeros((16, 16, 16), np.uint8)
    mask[4:9, 5:10, 6:11] = 1
    got = native.signed_distance(mask)
    # reimplementation of the python formula with scipy
    pos = mask.astype(bool)
    neg = ~pos
    want = (scipy_ndi.distance_transform_edt(neg) * neg
            - (scipy_ndi.distance_transform_edt(pos) - 1) * pos)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # and the losses.edt path (routing through native) agrees
    via_pkg = signed_distance_maps(mask[None])
    np.testing.assert_allclose(via_pkg[0], want, rtol=1e-5, atol=1e-5)


def test_native_faster_than_scipy(lib):
    rng = np.random.RandomState(2)
    mask = rng.rand(96, 96, 96) > 0.9
    native.distance_transform_edt(mask)  # warm
    t0 = time.perf_counter()
    native.distance_transform_edt(mask)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    scipy_ndi.distance_transform_edt(mask)
    t_scipy = time.perf_counter() - t0
    print(f"native {t_native*1e3:.1f}ms vs scipy {t_scipy*1e3:.1f}ms")
    assert t_native < t_scipy * 1.5  # at least competitive

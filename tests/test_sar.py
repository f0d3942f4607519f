"""SAR completions: InPhase/Quadrature/Conjugate/MultiplyConjugate/
BandMath + Pauli / Freeman-Durden / H-alpha decompositions +
GCP orthorectify (solaris/preproc/sar.py:17-338)."""

import numpy as np

from solaris_ray.stages import preproc as pp


def _complex_stack(h=8, w=8, bands=3, seed=5):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(h, w, bands)) + 1j * rng.normal(size=(h, w, bands))
    return pp._from_complex(z), z


def test_inphase_quadrature_conjugate_roundtrip():
    img, z = _complex_stack()
    assert np.allclose(pp.sar_in_phase(img), z.real)
    assert np.allclose(pp.sar_quadrature(img), z.imag)
    conj = pp.sar_conjugate(img)
    assert np.allclose(pp.sar_in_phase(conj), z.real)
    assert np.allclose(pp.sar_quadrature(conj), -z.imag)


def test_multiply_conjugate_self_is_intensity():
    img, z = _complex_stack(bands=2)
    out = pp.sar_multiply_conjugate(img, 0, 0)
    assert np.allclose(out[:, :, 0], np.abs(z[:, :, 0]) ** 2, atol=1e-12)
    assert np.allclose(out[:, :, 1], 0.0, atol=1e-12)
    cross = pp.sar_multiply_conjugate(img, 0, 1)
    expect = z[:, :, 0] * np.conj(z[:, :, 1])
    assert np.allclose(cross[:, :, 0], expect.real)
    assert np.allclose(cross[:, :, 1], expect.imag)


def test_pauli_formulas():
    img, z = _complex_stack(bands=3)
    out = pp.decomposition_pauli(img)
    hh, vv, xx = z[:, :, 0], z[:, :, 1], z[:, :, 2]
    assert np.allclose(out[:, :, 0], 0.5 * np.abs(hh + vv) ** 2)
    assert np.allclose(out[:, :, 1], 0.5 * np.abs(hh - vv) ** 2)
    assert np.allclose(out[:, :, 2], 2.0 * np.abs(xx) ** 2)


def test_freeman_durden_pure_surface():
    # hh = vv = 1, xx = 0 -> pure surface: Ps = 2, Pd = Pv = 0
    h = w = 6
    z = np.zeros((h, w, 3), dtype=np.complex128)
    z[:, :, 0] = 1.0
    z[:, :, 1] = 1.0
    out = pp.decomposition_freeman_durden(pp._from_complex(z), kernel_size=3)
    assert np.allclose(out[:, :, 0], 2.0, atol=1e-9)   # Ps
    assert np.allclose(out[:, :, 1], 0.0, atol=1e-9)   # Pd
    assert np.allclose(out[:, :, 2], 0.0, atol=1e-9)   # Pv


def test_freeman_durden_pure_volume():
    # only cross-pol power -> volume dominates: Pv = 1.5*|xx|^2
    h = w = 6
    z = np.zeros((h, w, 3), dtype=np.complex128)
    z[:, :, 2] = 2.0
    out = pp.decomposition_freeman_durden(pp._from_complex(z), kernel_size=3)
    assert np.allclose(out[:, :, 2], 6.0, atol=1e-9)   # Pv = 1.5*4


def test_halpha_vs_numpy_eig():
    img, z = _complex_stack(h=6, w=6, bands=2, seed=11)
    k = 3
    out = pp.decomposition_halpha(img, kernel_size=k)
    # independent oracle: per-pixel eigen decomposition of the same
    # multilooked coherence matrix
    def ml(a):
        if np.iscomplexobj(a):
            pairs = pp.multilook(pp._from_complex(a[:, :, None]), k)
            return pairs[:, :, 0] + 1j * pairs[:, :, 1]
        return pp.multilook(a[:, :, None], k)[:, :, 0]

    a, b = z[:, :, 0], z[:, :, 1]
    c00, c11, c01 = ml(np.abs(a) ** 2), ml(np.abs(b) ** 2), ml(a * np.conj(b))
    for r in range(6):
        for c in range(6):
            M = np.array([[c00[r, c], c01[r, c]], [np.conj(c01[r, c]), c11[r, c]]])
            ev, V = np.linalg.eigh(M)
            l1, l2 = ev[1].real, ev[0].real
            p1, p2 = l1 / (l1 + l2), l2 / (l1 + l2)
            H = -(p1 * np.log(p1) + p2 * np.log(p2)) if min(p1, p2) > 0 else 0.0
            alpha = p1 * np.arccos(np.abs(V[0, 1])) + p2 * np.arccos(np.abs(V[0, 0]))
            assert abs(out[r, c, 0] - H) < 1e-9
            assert abs(out[r, c, 1] - alpha) < 1e-9


def test_entropy_limits():
    # identical correlated channels -> rank-1 coherence -> H = 0
    h = w = 6
    z = np.zeros((h, w, 2), dtype=np.complex128)
    z[:, :, 0] = 1 + 1j
    z[:, :, 1] = 1 + 1j
    out = pp.decomposition_halpha(pp._from_complex(z), kernel_size=3)
    assert np.allclose(out[:, :, 0], 0.0, atol=1e-9)


def test_orthorectify_recovers_affine_grid():
    from solaris_ray.geom.affine import Affine, apply_affine

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (16, 16)).astype(np.uint8)
    t = Affine(2.0, 0.0, 100.0, 0.0, -2.0, 300.0)  # already north-up
    px = np.array([0.0, 16.0, 0.0, 16.0, 8.0])
    py = np.array([0.0, 0.0, 16.0, 16.0, 8.0])
    gx, gy = apply_affine(t, px, py)
    gcps = np.stack([px, py, gx, gy], axis=1)
    fitted = pp.fit_gcp_affine(gcps)
    assert np.allclose(tuple(fitted), tuple(t), atol=1e-9)
    warped, dst_t = pp.orthorectify(img, gcps, method="nearest")
    # north-up source + exact GCP fit -> identity warp
    assert warped.shape[:2] == (16, 16)
    assert np.array_equal(warped.squeeze(), img)

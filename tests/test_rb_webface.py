"""RB-WebFace harness parity vs the reference scipy/joblib implementation."""

import importlib.util
import sys

import numpy as np
import pytest

from stylegan_for_facerec_tpu.eval import rb_webface
from reference_oracle import install_dep_stubs, install_stylegan2_op_stub


@pytest.fixture(scope="module")
def ref_rb():
    install_dep_stubs()
    install_stylegan2_op_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location(
        "ref_rb_webface",
        "/root/reference/rb-webface/scripts/test_RB_Webface.py")
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # top-level imports beyond our stubs
        pytest.skip(f"cannot import reference harness: {e}")
    return mod


def _unit(rng, n, d=32):
    e = rng.randn(n, d).astype(np.float64)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


def test_fnmr_matches_reference(ref_rb, rng):
    pos = _unit(rng, 50)   # 10 identity groups of 5
    for thr in (0.3, 0.45, 0.6):
        want = ref_rb.calc_FNMR(pos, thr, n_names_per_grp=5)
        counts, n_pairs = rb_webface.fnmr_counts(pos, np.array([thr]))
        got = counts[0] / n_pairs
        np.testing.assert_allclose(got, want, atol=1e-10)


def test_fmr_matches_reference(ref_rb, rng):
    # n must be a multiple of the reference's batch_size: its fixed-size
    # meshgrid crashes on a ragged final chunk (test_RB_Webface.py:205-209)
    neg = _unit(rng, 128)
    for thr in (0.3, 0.45):
        want = ref_rb.calc_FMR(neg, thr, n_jobs=1, batch_size=32)
        counts, n_pairs = rb_webface.fmr_counts(neg, np.array([thr]),
                                                chunk=32)
        got = counts[0] / n_pairs
        np.testing.assert_allclose(got, want, atol=1e-10)


def test_tpr_interp_matches_reference_formula(rng):
    all_fpr = np.array([0.5, 0.1, 1e-2, 1e-3, 1e-4, 1e-5])
    all_fnr = np.array([0.01, 0.05, 0.1, 0.2, 0.35, 0.5])
    want3 = 1 - np.interp(1e-3, all_fpr[::-1], all_fnr[::-1])
    got3 = rb_webface.tpr_at_fpr(all_fpr, all_fnr, 1e-3)
    np.testing.assert_allclose(got3, want3)


def test_evaluate_group_separable(rng):
    """Well-separated synthetic identities: TPR should be ~1."""
    d = 32
    n_ids = 20
    centers = _unit(rng, n_ids)
    pos = np.repeat(centers, 5, axis=0) + 0.05 * rng.randn(n_ids * 5, d)
    pos /= np.linalg.norm(pos, axis=1, keepdims=True)
    neg = _unit(rng, 200)
    res = rb_webface.evaluate_group(pos.astype(np.float32),
                                    neg.astype(np.float32))
    assert res["tpr_at_fpr_1e3"] > 0.9
    assert res["fnr_curve"].shape == (20,)

"""MTCNN parity: nets vs the reference torch nets (shipped .npy weights),
box math and cp2tform vs the reference numpy code, pipeline smoke test."""

import sys

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from stylegan_for_facerec_tpu.models import mtcnn as jm
from reference_oracle import (REF_RESTYLE, install_dep_stubs,
                              install_stylegan2_op_stub)

WEIGHTS = ("/root/reference/restyle-encoder/models/mtcnn/mtcnn_pytorch/"
           "src/weights")


@pytest.fixture(scope="module")
def ref_nets():
    install_dep_stubs()
    install_stylegan2_op_stub()
    if REF_RESTYLE not in sys.path:
        sys.path.insert(0, REF_RESTYLE)
    import configs.paths_config as pc
    pc.model_paths["mtcnn_pnet"] = f"{WEIGHTS}/pnet.npy"
    pc.model_paths["mtcnn_rnet"] = f"{WEIGHTS}/rnet.npy"
    pc.model_paths["mtcnn_onet"] = f"{WEIGHTS}/onet.npy"
    import importlib
    mod = importlib.import_module(
        "models.mtcnn.mtcnn_pytorch.src.get_nets")
    return mod


def to_nchw(x):
    return np.moveaxis(np.asarray(x), -1, 1)


def test_pnet_parity(ref_nets, rng):
    tm = ref_nets.PNet().eval()
    x = rng.rand(1, 33, 41, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        tb, ta = tm(torch.tensor(to_nchw(x)).contiguous())
    jb, ja = jm.pnet_apply(jm._load_weights("pnet"), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jb),
                               np.moveaxis(tb.numpy(), 1, -1), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ja),
                               np.moveaxis(ta.numpy(), 1, -1), rtol=1e-4,
                               atol=1e-4)


def test_rnet_parity(ref_nets, rng):
    tm = ref_nets.RNet().eval()
    x = rng.rand(3, 24, 24, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        tb, ta = tm(torch.tensor(to_nchw(x)).contiguous())
    jb, ja = jm.rnet_apply(jm._load_weights("rnet"), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jb), tb.numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ja), ta.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_onet_parity(ref_nets, rng):
    tm = ref_nets.ONet().eval()
    x = rng.rand(3, 48, 48, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        tc_, tb, ta = tm(torch.tensor(to_nchw(x)).contiguous())
    jc, jb, ja = jm.onet_apply(jm._load_weights("onet"), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jc), tc_.numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(jb), tb.numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ja), ta.numpy(), rtol=1e-4,
                               atol=1e-4)


@pytest.fixture(scope="module")
def ref_boxutils():
    install_dep_stubs()
    if REF_RESTYLE not in sys.path:
        sys.path.insert(0, REF_RESTYLE)
    import importlib
    return importlib.import_module(
        "models.mtcnn.mtcnn_pytorch.src.box_utils")


def test_nms_and_box_math_parity(ref_boxutils, rng):
    boxes = np.abs(rng.rand(40, 9).astype(np.float32)) * 50
    boxes[:, 2:4] = boxes[:, 0:2] + np.abs(boxes[:, 2:4]) + 5
    for mode in ("union", "min"):
        np.testing.assert_array_equal(
            jm.nms(boxes[:, :5], 0.5, mode),
            ref_boxutils.nms(boxes[:, :5], 0.5, mode))
    np.testing.assert_allclose(jm.convert_to_square(boxes[:, :5]),
                               ref_boxutils.convert_to_square(
                                   boxes[:, :5]), rtol=1e-6)
    offs = rng.randn(40, 4).astype(np.float32) * 0.1
    np.testing.assert_allclose(
        jm.calibrate_box(boxes[:, :5], offs),
        ref_boxutils.calibrate_box(boxes[:, :5].copy(), offs), rtol=1e-6)


def test_cp2tform_parity(rng):
    install_dep_stubs()
    if REF_RESTYLE not in sys.path:
        sys.path.insert(0, REF_RESTYLE)
    import importlib
    ref_tf = importlib.import_module(
        "models.mtcnn.mtcnn_pytorch.src.matlab_cp2tform")
    src = rng.rand(5, 2).astype(np.float64) * 100
    dst = jm.REFERENCE_FACIAL_POINTS.astype(np.float64)
    want = ref_tf.get_similarity_transform_for_cv2(src.copy(), dst.copy())
    got = jm.get_similarity_transform_for_cv2(src, dst)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_reference_points_default_square():
    pts = jm.get_reference_facial_points(default_square=True)
    # square 112x112 crop: x shifted by (112-96)/2 = 8
    np.testing.assert_allclose(pts[0], [38.29459953, 51.69630051],
                               rtol=1e-6)


def test_detector_pipeline_smoke(rng):
    from PIL import Image
    det = jm.MTCNN()
    img = Image.fromarray((rng.rand(80, 64, 3) * 255).astype(np.uint8))
    boxes, landmarks = det.detect_faces(img)
    # random noise: just exercise the full cascade without crashing
    assert isinstance(boxes, (list, np.ndarray))
    face, tfm = det.align(img)
    if face is not None:
        assert face.size == (112, 112)

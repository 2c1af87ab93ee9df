"""Observability artifacts: ROC curve rendering + image logging + the
stage-2 face-grid composer (VERDICT r1 missing #2/#3; reference
``util/utils.py:239-251`` gen_plot, ``utils/common.py:14-47`` vis_faces,
``coach_restyle_psp.py:343-378`` parse_and_log_images)."""

import os

import numpy as np

from stylegan_for_facerec_tpu.eval.inference import face_grid, tensor2im
from stylegan_for_facerec_tpu.utils.logging import (MetricLogger,
                                                    render_roc_curve)


def test_render_roc_curve_returns_image():
    fpr = np.linspace(0, 1, 50)
    tpr = np.sqrt(fpr)
    img = render_roc_curve(fpr, tpr)
    assert img.dtype == np.uint8
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.shape[0] > 100 and img.shape[1] > 100
    # a plot is not a constant image
    assert img.std() > 1


def test_log_image_writes_jpeg(tmp_path):
    logger = MetricLogger(log_dir=str(tmp_path))
    img = np.zeros((32, 32, 3), np.uint8)
    img[8:24, 8:24] = 255
    path = logger.log_image("images/train/faces", img, step=7)
    assert path is not None and os.path.exists(path)
    assert path.endswith("0007.jpg")
    path2 = logger.log_image("faces", img, step=3, subscript="val")
    assert path2.endswith("val_0003.jpg")
    logger.close()


def test_log_benchmark_with_roc_writes_curve(tmp_path):
    logger = MetricLogger(log_dir=str(tmp_path))
    fpr = np.linspace(0, 1, 20)
    logger.log_benchmark(5, "RFW_African", 0.91, 1.4,
                         roc=(np.sqrt(fpr), fpr))
    files = []
    for root, _, names in os.walk(tmp_path):
        files += [os.path.join(root, n) for n in names]
    assert any("RFW_African_ROC_Curve" in f and f.endswith(".jpg")
               for f in files)
    logger.close()


def test_face_grid_composer(rng):
    x = rng.rand(3, 16, 16, 3) * 2 - 1
    entries = [{"input_face": x[0], "target_face": x[1],
                "output_face": [x[2], x[0]]},
               {"input_face": x[1], "target_face": x[2],
                "output_face": x[0]}]
    grid = face_grid(entries)
    assert grid.dtype == np.uint8
    # row 0: input+target+2 outputs = 4 tiles wide; 2 rows tall
    assert grid.shape == (32, 64, 3)
    np.testing.assert_array_equal(grid[:16, :16], tensor2im(x[0]))
    np.testing.assert_array_equal(grid[16:, 16:32], tensor2im(x[2]))

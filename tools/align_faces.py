#!/usr/bin/env python
"""FFHQ-style face alignment CLI (stage-2 preprocessing aux).

Equivalent of ``/root/reference/restyle-encoder/scripts/
align_faces_parallel.py:36-204`` — the dlib 68-landmark FFHQ alignment.
dlib is an optional host dependency (not in this image); when available
this runs the canonical FFHQ recipe, otherwise it falls back to
MTCNN 5-point alignment (tools/mtcnn_crop_align.py's path), which is the
alignment the face-recognition pipeline itself uses.
"""

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def ffhq_align(filepath, predictor, output_size=256,
               transform_size=256, detector=None):
    """Canonical FFHQ alignment from 68 dlib landmarks."""
    import dlib
    import PIL.Image
    import scipy.ndimage

    if detector is None:
        # callers processing many images should build one detector and
        # pass it in (the reference builds it once per worker)
        detector = dlib.get_frontal_face_detector()
    img = dlib.load_rgb_image(filepath)
    dets = detector(img, 1)
    if not dets:
        return None
    shape = predictor(img, dets[0])
    lm = np.array([[p.x, p.y] for p in shape.parts()])
    lm_eye_left, lm_eye_right = lm[36:42], lm[42:48]
    lm_mouth_outer = lm[48:60]
    eye_left = lm_eye_left.mean(0)
    eye_right = lm_eye_right.mean(0)
    eye_avg = (eye_left + eye_right) * 0.5
    eye_to_eye = eye_right - eye_left
    mouth_avg = (lm_mouth_outer[0] + lm_mouth_outer[6]) * 0.5
    eye_to_mouth = mouth_avg - eye_avg
    x = eye_to_eye - np.flipud(eye_to_mouth) * [-1, 1]
    x /= np.hypot(*x)
    x *= max(np.hypot(*eye_to_eye) * 2.0, np.hypot(*eye_to_mouth) * 1.8)
    y = np.flipud(x) * [-1, 1]
    c = eye_avg + eye_to_mouth * 0.1
    quad = np.stack([c - x - y, c - x + y, c + x + y, c + x - y])
    qsize = np.hypot(*x) * 2
    pimg = PIL.Image.open(filepath).convert("RGB")
    shrink = int(np.floor(qsize / output_size * 0.5))
    if shrink > 1:
        rsize = (int(np.rint(pimg.size[0] / shrink)),
                 int(np.rint(pimg.size[1] / shrink)))
        pimg = pimg.resize(rsize, PIL.Image.LANCZOS)
        quad /= shrink
        qsize /= shrink
    pimg = pimg.transform((transform_size, transform_size), PIL.Image.QUAD,
                          (quad + 0.5).flatten(), PIL.Image.BILINEAR)
    if output_size < transform_size:
        pimg = pimg.resize((output_size, output_size), PIL.Image.LANCZOS)
    return pimg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--output_size", type=int, default=256)
    ap.add_argument("--predictor",
                    default="shape_predictor_68_face_landmarks.dat")
    ap.add_argument("--n_threads", type=int, default=8)
    args = ap.parse_args()

    from stylegan_for_facerec_tpu.data.images_dataset import list_images

    try:
        import dlib
        predictor = dlib.shape_predictor(args.predictor)
        detector = dlib.get_frontal_face_detector()   # build ONCE
        use_dlib = True
    except Exception as e:
        print(f"[align_faces] dlib unavailable ({e}); falling back to "
              f"MTCNN 5-point alignment")
        use_dlib = False

    names = list_images(args.in_dir)
    os.makedirs(args.out_dir, exist_ok=True)
    if not use_dlib:
        from mtcnn_crop_align import process_one
        from stylegan_for_facerec_tpu.models.mtcnn import MTCNN
        det = MTCNN()
        n = sum(process_one(det, nm, args.out_dir, args.output_size, 30.0,
                            (0.6, 0.7, 0.8)) for nm in names)
        print(f"aligned {n} faces (MTCNN fallback)")
        return

    def one(nm):
        out = ffhq_align(nm, predictor, args.output_size,
                         detector=detector)
        if out is None:
            return 0
        rel = os.path.relpath(nm, args.in_dir)
        dst = os.path.join(args.out_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        out.save(dst)
        return 1

    with ThreadPoolExecutor(args.n_threads) as pool:
        total = sum(pool.map(one, names))
    print(f"aligned {total}/{len(names)} images")


if __name__ == "__main__":
    main()

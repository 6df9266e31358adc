"""info2coco converter (reference: tools/data_converter/info2coco.py:90-193,
with its per-camera fpath and corner-vs-center bbox bugs fixed — see the tool
docstring)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'tools'))

from far3d_tpu.config import AV2_CLASS_NAMES


def test_convert_fake_infos(tmp_path):
    import pickle

    from info2coco import convert
    from test_data import make_fake_infos

    p = tmp_path / 'infos.pkl'
    make_fake_infos(p, n_scenes=1, frames_per_scene=2, n_cams=3)
    with open(p, 'rb') as f:
        infos = pickle.load(f)['infos']
    images, annotations, categories = convert(infos, AV2_CLASS_NAMES)

    assert len(images) == 2 * 3
    assert len(categories) == len(AV2_CLASS_NAMES)
    # each fake camera has one GT box [100,100,300,400] with label 15
    assert len(annotations) == 2 * 3
    for ann in annotations:
        assert ann['bbox'] == [100.0, 100.0, 200.0, 300.0]  # xywh top-left
        assert ann['area'] == 200.0 * 300.0
        assert ann['category_id'] == 15
    # image ids referenced by annotations exist and file names are per-camera
    ids = {im['id'] for im in images}
    assert {a['image_id'] for a in annotations} <= ids
    names = [im['file_name'] for im in images]
    assert len(set(names)) == len(names)  # the reference reused one camera's

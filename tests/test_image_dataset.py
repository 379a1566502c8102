"""Aux imdb-backed ImageDataset (reference `helper/image_dataset.py`)."""

import os

import numpy as np
from PIL import Image

from boxer_tpu.dataset.helper.image_dataset import ImageDataset


def test_image_dataset_read_cache_len(tmp_path):
    for i in range(3):
        Image.fromarray(np.full((4, 4, 3), i * 40, np.uint8)).save(
            os.path.join(tmp_path, f"im{i}.png"))
    imdb = [{"img_path": f"im{i}.png"} for i in range(3)]
    ds = ImageDataset([str(tmp_path)], imdb, max_img_cache=2)
    assert len(ds) == 2                      # reference drops the last record
    item = ds[1]
    assert np.asarray(item["image"]).shape == (4, 4, 3)
    assert np.asarray(item["image"])[0, 0, 0] == 40
    ds[0]; ds[1]; ds[0]
    assert len(ds._cache) == 2               # bounded cache


def test_image_dataset_missing_path(tmp_path):
    ds = ImageDataset([str(tmp_path)], [{}, {}])
    import pytest

    with pytest.raises(AttributeError):
        ds[0]

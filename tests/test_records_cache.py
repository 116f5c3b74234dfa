"""Parsed-annotation (label) records cache — data/records_cache.py.

The reference factored label handling into its ``cache`` crate
(cache/src/label.rs); here the capability is a cache of the PARSED dataset
records keyed on the dataset config and validated against the annotation
files' (mtime_ns, size) signature.
"""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e/CLI tier: excluded from `pytest -m 'not slow'`
from PIL import Image

from yolodl_tpu.config.app_config import DatasetConfig, PreprocessorConfig
from yolodl_tpu.data.datasets import PrebuiltDataset
from yolodl_tpu.data.records_cache import (
    cache_file_path,
    load_records_cache,
    save_records_cache,
    source_signature,
)


@pytest.fixture()
def csv_setup(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for name in ("a.png", "b.png"):
        Image.fromarray(
            rng.uniform(0, 255, (20, 30, 3)).astype(np.uint8)
        ).save(img_dir / name)
    (tmp_path / "classes.txt").write_text("piggy\ndoggo\n")
    (tmp_path / "label.csv").write_text(
        "image_file,class_name,cy,cx,h,w\n"
        "a.png,doggo,10,15,8,12\n"
        "b.png,piggy,10,10,6,6\n"
    )
    config = DatasetConfig(
        kind="csv", image_size=64,
        image_dir="images", label_file="label.csv",
        classes_file="classes.txt",
    )
    return tmp_path, config


def _assert_same_dataset(a, b):
    assert a.classes == b.classes
    assert a.input_channels == b.input_channels
    assert len(a) == len(b)
    for ra, rb in zip(a.records(), b.records()):
        assert ra.path == rb.path
        assert (ra.height, ra.width) == (rb.height, rb.width)
        np.testing.assert_array_equal(ra.boxes_pixel, rb.boxes_pixel)
        np.testing.assert_array_equal(ra.classes, rb.classes)


class TestRecordsCache:
    def test_csv_roundtrip_hit(self, csv_setup, tmp_path):
        base, config = csv_setup
        cache_dir = tmp_path / "cache"
        cold = config.open(str(base), records_cache_dir=str(cache_dir))
        assert not isinstance(cold, PrebuiltDataset)  # built from source
        files = list(cache_dir.glob("records-*.npz"))
        assert len(files) == 1
        warm = config.open(str(base), records_cache_dir=str(cache_dir))
        assert isinstance(warm, PrebuiltDataset)  # served from cache
        _assert_same_dataset(cold, warm)

    def test_source_change_invalidates(self, csv_setup, tmp_path):
        base, config = csv_setup
        cache_dir = tmp_path / "cache"
        config.open(str(base), records_cache_dir=str(cache_dir))
        # edit the label file: a.png gains a second box
        (base / "label.csv").write_text(
            "image_file,class_name,cy,cx,h,w\n"
            "a.png,doggo,10,15,8,12\n"
            "a.png,piggy,5,5,4,4\n"
            "b.png,piggy,10,10,6,6\n"
        )
        rebuilt = config.open(str(base), records_cache_dir=str(cache_dir))
        assert not isinstance(rebuilt, PrebuiltDataset)
        rec_a = next(r for r in rebuilt.records() if r.path.endswith("a.png"))
        assert len(rec_a.boxes_pixel) == 2
        # the entry was REPLACED (same config key), not accumulated
        assert len(list(cache_dir.glob("records-*.npz"))) == 1
        warm = config.open(str(base), records_cache_dir=str(cache_dir))
        assert isinstance(warm, PrebuiltDataset)
        _assert_same_dataset(rebuilt, warm)

    def test_corrupt_cache_is_a_miss(self, csv_setup, tmp_path):
        base, config = csv_setup
        cache_dir = tmp_path / "cache"
        config.open(str(base), records_cache_dir=str(cache_dir))
        (path,) = cache_dir.glob("records-*.npz")
        path.write_bytes(b"not an npz")
        ds = config.open(str(base), records_cache_dir=str(cache_dir))
        assert len(ds) == 2  # rebuilt from source, no crash
        warm = config.open(str(base), records_cache_dir=str(cache_dir))
        assert isinstance(warm, PrebuiltDataset)

    def test_truncated_npz_is_a_miss(self, csv_setup, tmp_path):
        """A truncated npz keeps its PK zip magic; np.load raises
        zipfile.BadZipFile (not OSError/ValueError) — must be a miss."""
        base, config = csv_setup
        cache_dir = tmp_path / "cache"
        config.open(str(base), records_cache_dir=str(cache_dir))
        (path,) = cache_dir.glob("records-*.npz")
        blob = path.read_bytes()
        path.write_bytes(blob[: len(blob) // 2])
        ds = config.open(str(base), records_cache_dir=str(cache_dir))
        assert len(ds) == 2  # rebuilt, no crash
        warm = config.open(str(base), records_cache_dir=str(cache_dir))
        assert isinstance(warm, PrebuiltDataset)

    def test_coco_empty_boxes_roundtrip(self, tmp_path):
        ann_dir = tmp_path / "annotations"
        ann_dir.mkdir()
        ann = {
            "images": [
                {"id": 1, "file_name": "x.jpg", "height": 10, "width": 12},
                {"id": 2, "file_name": "y.jpg", "height": 10, "width": 12},
            ],
            "annotations": [
                {"id": 1, "image_id": 1, "category_id": 5,
                 "bbox": [1, 1, 2, 2], "iscrowd": 0},
            ],
            "categories": [{"id": 5, "name": "cat"}],
        }
        (ann_dir / "instances_val.json").write_text(json.dumps(ann))
        config = DatasetConfig(kind="coco", image_size=64, dataset_dir=".")
        cache_dir = tmp_path / "cache"
        cold = config.open(str(tmp_path), records_cache_dir=str(cache_dir))
        warm = config.open(str(tmp_path), records_cache_dir=str(cache_dir))
        assert isinstance(warm, PrebuiltDataset)
        _assert_same_dataset(cold, warm)
        rec_empty = next(r for r in warm.records() if r.path.endswith("y.jpg"))
        assert rec_empty.boxes_pixel.shape == (0, 4)
        assert rec_empty.classes.shape == (0,)

    def test_signature_is_order_insensitive(self, csv_setup):
        base, _ = csv_setup
        a = source_signature([str(base / "label.csv"), str(base / "classes.txt")])
        b = source_signature([str(base / "classes.txt"), str(base / "label.csv")])
        assert a == b

    def test_key_depends_on_config(self, tmp_path):
        p1 = cache_file_path(str(tmp_path), {"kind": "csv", "image_size": 64})
        p2 = cache_file_path(str(tmp_path), {"kind": "csv", "image_size": 32})
        assert p1 != p2

    def test_low_level_stale_signature_misses(self, tmp_path):
        rec = [
            # FileRecord imported transitively; build via save/load only
        ]
        from yolodl_tpu.data.records import FileRecord

        rec = [FileRecord("img.png", 4, 6,
                          np.zeros((0, 4), np.float64),
                          np.zeros((0,), np.int32))]
        path = str(tmp_path / "records-x.npz")
        save_records_cache(path, rec, ["c"], 3, [("a", 1, 2)])
        assert load_records_cache(path, [("a", 1, 2)]) is not None
        assert load_records_cache(path, [("a", 1, 3)]) is None

    def test_records_knob_requires_cache_dir(self):
        with pytest.raises(ValueError, match="requires cache_dir"):
            PreprocessorConfig.parse({"cache": {"method": "NoCache",
                                                "records": True}})
        cfg = PreprocessorConfig.parse(
            {"cache": {"method": "NoCache", "records": True,
                       "cache_dir": "/tmp/x"}})
        assert cfg.cache_records and cfg.cache_dir == "/tmp/x"

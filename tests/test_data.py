"""Data pipeline tests: color, letterbox, affine, mosaic, datasets, caches,
and the full streaming pipeline (SURVEY §3.2 parity on fixed shapes)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from yolodl_tpu.data import (
    CocoDataset,
    ColorJitter,
    CsvDataset,
    FileCache,
    MemoryCache,
    MosaicMixer,
    OnDemandLoader,
    RandomAffine,
    SanitizedDataset,
    TrainingStream,
    TrainingStreamConfig,
    VocDataset,
    hsv_to_rgb,
    letterbox_resize,
    load_classes_file,
    rgb_to_hsv,
)
from yolodl_tpu.data.records import DataRecord, FileRecord


@pytest.fixture()
def image_dir(tmp_path, rng):
    """4 small images on disk + FileRecords with one box each."""
    records = []
    for i in range(4):
        arr = (rng.uniform(0, 255, size=(40, 60, 3))).astype(np.uint8)
        path = tmp_path / f"img{i}.png"
        Image.fromarray(arr).save(path)
        records.append(
            FileRecord(
                path=str(path), height=40, width=60,
                boxes_pixel=np.array([[20.0, 30.0, 16.0, 24.0]]),
                classes=np.array([i % 2]),
            )
        )
    return tmp_path, records


class TestColor:
    def test_rgb_hsv_roundtrip(self, rng):
        rgb = rng.uniform(0, 1, size=(3, 8, 8)).astype(np.float32)
        back = hsv_to_rgb(rgb_to_hsv(rgb))
        np.testing.assert_allclose(back, rgb, atol=1e-5)

    def test_known_values(self):
        red = np.zeros((3, 1, 1), np.float32)
        red[0] = 1.0
        hsv = rgb_to_hsv(red)
        assert hsv[0, 0, 0] == pytest.approx(0.0)
        assert hsv[1, 0, 0] == pytest.approx(1.0)
        assert hsv[2, 0, 0] == pytest.approx(1.0)

    def test_jitter_bounds(self, rng):
        jitter = ColorJitter(hue_shift=0.1, saturation_shift=0.2, value_shift=0.2)
        rgb = rng.uniform(0, 1, size=(3, 8, 8)).astype(np.float32)
        out = jitter(rgb, np.random.default_rng(0))
        assert out.shape == rgb.shape
        assert out.min() >= -1e-6 and out.max() <= 1 + 1e-6

    def test_jitter_noop_when_disabled(self, rng):
        jitter = ColorJitter()
        rgb = rng.uniform(0, 1, size=(3, 4, 4)).astype(np.float32)
        np.testing.assert_allclose(jitter(rgb, np.random.default_rng(0)), rgb, atol=1e-5)


class TestLetterbox:
    def test_single_channel_image(self):
        from yolodl_tpu.data.letterbox import letterbox_resize

        img = np.random.default_rng(0).uniform(0, 1, (1, 20, 30)).astype(
            np.float32)
        out, _, _ = letterbox_resize(img, (16, 16))
        assert out.shape == (1, 16, 16)
        assert out.min() >= 0 and out.max() <= 1

    def test_wide_into_square(self):
        img = np.ones((3, 40, 80), np.float32)
        out, boxes, tr = letterbox_resize(
            img, (64, 64), np.array([[0.5, 0.5, 1.0, 1.0]])
        )
        assert out.shape == (3, 64, 64)
        # content occupies rows 16..48 (scaled 80→64 wide, 40→32 tall)
        assert np.allclose(out[:, 0:16, :], 0.5)
        assert np.allclose(out[:, 17:47, :], 1.0)
        # the full-image box maps to the content region
        np.testing.assert_allclose(boxes[0], [0.5, 0.5, 0.5, 1.0], atol=0.02)

    def test_no_boxes(self):
        out, boxes, _ = letterbox_resize(np.zeros((3, 10, 10), np.float32), (16, 16))
        assert boxes is None and out.shape == (3, 16, 16)

    def test_u8_pil_draft_keeps_geometry(self, tmp_path):
        """Serving ingest: a big JPEG decoded at reduced scale via
        Image.draft + src_hw override must place content identically to the
        full-resolution decode (box mapping depends on placement alone)."""
        import io as _io

        from yolodl_tpu.data.letterbox import (
            letterbox_geometry, letterbox_u8_pil,
        )

        yy, xx = np.mgrid[0:900, 0:1200]
        arr = np.stack([(xx * 255 // 1200), (yy * 255 // 900),
                        np.full_like(xx, 40)], axis=-1).astype(np.uint8)
        buf = _io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=95)

        full = letterbox_u8_pil(
            Image.open(_io.BytesIO(buf.getvalue())).convert("RGB"), (96, 96))
        im = Image.open(_io.BytesIO(buf.getvalue()))
        w, h = im.size
        new_h, new_w, _, _ = letterbox_geometry((h, w), (96, 96))
        im.draft("RGB", (new_w, new_h))
        assert im.size != (w, h)  # the draft actually reduced the decode
        drafted = letterbox_u8_pil(im.convert("RGB"), (96, 96),
                                   src_hw=(h, w))
        pad_d = (np.abs(drafted.astype(int) - 128) < 3).all(axis=(1, 2))
        pad_f = (np.abs(full.astype(int) - 128) < 3).all(axis=(1, 2))
        np.testing.assert_array_equal(pad_d, pad_f)
        assert np.abs(drafted.astype(float) - full.astype(float)).mean() < 6


class TestRandomAffine:
    def test_identity_when_no_ops(self, rng):
        aff = RandomAffine()
        img = rng.uniform(0, 1, (3, 16, 16)).astype(np.float32)
        boxes = np.array([[0.5, 0.5, 0.2, 0.2]], np.float32)
        out_img, out_boxes, _ = aff(img, boxes, np.array([0]), np.random.default_rng(0))
        np.testing.assert_allclose(out_img, img)
        np.testing.assert_allclose(out_boxes, boxes)

    def test_horizontal_flip(self, rng):
        aff = RandomAffine(horizontal_flip_prob=1.0)
        img = np.zeros((3, 8, 8), np.float32)
        img[:, :, 0] = 1.0  # left column lit
        boxes = np.array([[0.5, 0.25, 0.2, 0.2]], np.float32)
        out_img, out_boxes, _ = aff(img, boxes, np.array([0]), np.random.default_rng(0))
        assert out_img[0, 0, -1] > 0.5  # now right column lit
        assert out_boxes[0, 1] == pytest.approx(0.75, abs=1e-5)
        assert out_boxes[0, 0] == pytest.approx(0.5, abs=1e-5)

    def test_vertical_flip_boxes(self):
        aff = RandomAffine(vertical_flip_prob=1.0)
        img = np.zeros((3, 8, 8), np.float32)
        boxes = np.array([[0.25, 0.5, 0.1, 0.1]], np.float32)
        _, out_boxes, _ = aff(img, boxes, np.array([0]), np.random.default_rng(0))
        assert out_boxes[0, 0] == pytest.approx(0.75, abs=1e-5)

    def test_translation_filters_offscreen(self):
        aff = RandomAffine(translation_prob=1.0, translation=0.9,
                           min_bbox_cropping_ratio=0.9)
        img = np.ones((3, 8, 8), np.float32)
        boxes = np.array([[0.5, 0.5, 0.1, 0.1]], np.float32)
        kept = []
        for seed in range(8):
            _, out_boxes, _ = aff(img, boxes, np.array([0]), np.random.default_rng(seed))
            kept.append(len(out_boxes))
        assert min(kept) == 0  # some translations push the box mostly off-screen


class TestMosaic:
    def test_merge_shapes_and_boxes(self, rng):
        mixer = MosaicMixer(mosaic_margin=0.25)
        recs = [
            DataRecord(
                image=np.full((3, 20, 20), i / 4, np.float32),
                boxes=np.array([[0.5, 0.5, 0.4, 0.4]], np.float32),
                classes=np.array([i]),
            )
            for i in range(4)
        ]
        out = mixer(recs, np.random.default_rng(0))
        assert out.image.shape == (3, 20, 20)
        assert len(out.boxes) == 4  # every center box survives cropping
        assert out.boxes[:, 2].max() <= 0.4 + 1e-6

    def test_quadrants_content(self):
        mixer = MosaicMixer(mosaic_margin=0.5)  # pivot fixed at center
        recs = [
            DataRecord(np.full((3, 10, 10), v, np.float32), np.zeros((0, 4)), np.zeros((0,)))
            for v in (0.1, 0.2, 0.3, 0.4)
        ]
        out = mixer(recs, np.random.default_rng(0))
        assert out.image[0, 0, 0] == pytest.approx(0.1)
        assert out.image[0, 0, 9] == pytest.approx(0.2)
        assert out.image[0, 9, 0] == pytest.approx(0.3)
        assert out.image[0, 9, 9] == pytest.approx(0.4)

    def test_min_bbox_size_filter(self):
        mixer = MosaicMixer(mosaic_margin=0.25, min_bbox_size=0.3)
        recs = [
            DataRecord(
                np.zeros((3, 12, 12), np.float32),
                np.array([[0.5, 0.5, 0.05, 0.05]], np.float32),  # tiny box
                np.array([0]),
            )
            for _ in range(4)
        ]
        out = mixer(recs, np.random.default_rng(1))
        assert len(out.boxes) == 0

    def test_rejects_mismatched_shapes(self):
        mixer = MosaicMixer()
        recs = [
            DataRecord(np.zeros((3, 10, 10), np.float32), np.zeros((0, 4)), np.zeros((0,))),
            DataRecord(np.zeros((3, 12, 10), np.float32), np.zeros((0, 4)), np.zeros((0,))),
            DataRecord(np.zeros((3, 10, 10), np.float32), np.zeros((0, 4)), np.zeros((0,))),
            DataRecord(np.zeros((3, 10, 10), np.float32), np.zeros((0, 4)), np.zeros((0,))),
        ]
        with pytest.raises(ValueError, match="identical shape"):
            mixer(recs, np.random.default_rng(0))


class TestDatasets:
    def test_csv_dataset(self, tmp_path, rng):
        img_dir = tmp_path / "images"
        img_dir.mkdir()
        for name in ("a.png", "b.png"):
            Image.fromarray(
                rng.uniform(0, 255, (20, 30, 3)).astype(np.uint8)
            ).save(img_dir / name)
        (tmp_path / "classes.txt").write_text("piggy\ndoggo\n")
        (tmp_path / "label.csv").write_text(
            "image_file,class_name,cy,cx,h,w\n"
            "a.png,doggo,10,15,8,12\n"
            "a.png,piggy,5,5,4,4\n"
            "b.png,piggy,10,10,6,6\n"
        )
        ds = CsvDataset(str(img_dir), str(tmp_path / "label.csv"), str(tmp_path / "classes.txt"))
        assert ds.classes == ["piggy", "doggo"]
        assert len(ds) == 2
        rec = ds[0]
        assert rec.height == 20 and rec.width == 30
        assert len(rec.boxes_pixel) == 2
        assert set(rec.classes.tolist()) == {0, 1}

    def test_csv_unknown_class_rejected(self, tmp_path, rng):
        img_dir = tmp_path / "images"
        img_dir.mkdir()
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(img_dir / "a.png")
        (tmp_path / "classes.txt").write_text("cat\n")
        (tmp_path / "label.csv").write_text(
            "image_file,class_name,cy,cx,h,w\na.png,dog,1,1,1,1\n"
        )
        with pytest.raises(ValueError, match="unknown class"):
            CsvDataset(str(img_dir), str(tmp_path / "label.csv"), str(tmp_path / "classes.txt"))

    def test_coco_dataset(self, tmp_path):
        (tmp_path / "train").mkdir()
        ann = {
            "images": [
                {"id": 7, "file_name": "x.jpg", "height": 100, "width": 200},
            ],
            "annotations": [
                {"id": 1, "image_id": 7, "category_id": 18,
                 "bbox": [10, 20, 40, 30], "iscrowd": 0},
                {"id": 2, "image_id": 7, "category_id": 44,
                 "bbox": [0, 0, 10, 10], "iscrowd": 1},  # crowd → dropped
            ],
            "categories": [
                {"id": 18, "name": "dog"},
                {"id": 44, "name": "bottle"},
            ],
        }
        ann_dir = tmp_path / "annotations"
        ann_dir.mkdir()
        (ann_dir / "instances_train.json").write_text(json.dumps(ann))
        ds = CocoDataset(str(tmp_path))
        # class order follows category id (COCO convention): 18=dog, 44=bottle
        assert ds.classes == ["dog", "bottle"]
        rec = ds[0]
        assert len(rec.boxes_pixel) == 1
        # tlhw [10,20,40,30] → cycxhw (cy=20+15, cx=10+20, h=30, w=40)
        np.testing.assert_allclose(rec.boxes_pixel[0], [35, 30, 30, 40])
        assert rec.classes[0] == 0  # "dog"

    def test_coco_whitelist(self, tmp_path):
        self.test_coco_dataset.__wrapped__ if False else None
        (tmp_path / "annotations").mkdir(exist_ok=True)
        ann = {
            "images": [{"id": 1, "file_name": "x.jpg", "height": 10, "width": 10}],
            "annotations": [
                {"id": 1, "image_id": 1, "category_id": 5, "bbox": [1, 1, 2, 2], "iscrowd": 0},
                {"id": 2, "image_id": 1, "category_id": 9, "bbox": [1, 1, 2, 2], "iscrowd": 0},
            ],
            "categories": [{"id": 5, "name": "cat"}, {"id": 9, "name": "dog"}],
        }
        (tmp_path / "annotations" / "instances_val.json").write_text(json.dumps(ann))
        ds = CocoDataset(str(tmp_path), classes_whitelist=["dog"])
        assert ds.classes == ["dog"]
        assert len(ds[0].boxes_pixel) == 1

    def test_coco_split_selection(self, tmp_path):
        """Several instances_*.json: picking silently is forbidden (a stock
        COCO dir would alphabetically resolve an eval config to the TRAIN
        split); dataset_name selects explicitly."""
        ann_dir = tmp_path / "annotations"
        ann_dir.mkdir()
        base = {
            "images": [{"id": 1, "file_name": "x.jpg", "height": 10,
                        "width": 10}],
            "annotations": [],
            "categories": [{"id": 1, "name": "cat"}],
        }
        (ann_dir / "instances_train2017.json").write_text(json.dumps(base))
        val = dict(base, categories=[{"id": 1, "name": "dog"}])
        (ann_dir / "instances_val2017.json").write_text(json.dumps(val))
        with pytest.raises(ValueError, match="dataset_name"):
            CocoDataset(str(tmp_path))
        ds = CocoDataset(str(tmp_path), dataset_name="val2017")
        assert ds.classes == ["dog"]
        with pytest.raises(FileNotFoundError):
            CocoDataset(str(tmp_path), dataset_name="test2017")

    def test_voc_float_dimensions(self, tmp_path):
        """VOC-style XMLs with float size fields (seen in the wild; the III
        loader guards identically) must parse, not crash int()."""
        (tmp_path / "Annotations").mkdir()
        (tmp_path / "JPEGImages").mkdir()
        xml = """<annotation>
            <filename>q.jpg</filename>
            <size><width>50.0</width><height>40.0</height></size>
            <object><name>cow</name>
              <bndbox><xmin>10</xmin><ymin>8</ymin><xmax>30</xmax><ymax>24</ymax></bndbox>
            </object>
        </annotation>"""
        (tmp_path / "Annotations" / "q.xml").write_text(xml)
        ds = VocDataset(str(tmp_path))
        assert ds[0].height == 40 and ds[0].width == 50

    def test_sanitized_forwards_input_channels(self, tmp_path, rng):
        """SanitizedDataset must carry the inner dataset's channel count
        (CsvDataset can be non-RGB), not the hard-coded default 3."""
        img_dir = tmp_path / "img"
        img_dir.mkdir()
        arr = (rng.uniform(0, 255, (8, 8))).astype(np.uint8)
        Image.fromarray(arr, mode="L").save(img_dir / "a.png")
        (tmp_path / "classes.txt").write_text("thing\n")
        (tmp_path / "labels.csv").write_text(
            "image_file,class_name,cy,cx,h,w\na.png,thing,4,4,2,2\n")
        inner = CsvDataset(str(img_dir), str(tmp_path / "labels.csv"),
                           str(tmp_path / "classes.txt"), input_channels=1)
        assert SanitizedDataset(inner).input_channels == 1

    def test_voc_dataset(self, tmp_path):
        (tmp_path / "Annotations").mkdir()
        (tmp_path / "JPEGImages").mkdir()
        xml = """<annotation>
            <filename>p.jpg</filename>
            <size><width>50</width><height>40</height><depth>3</depth></size>
            <object><name>horse</name>
              <bndbox><xmin>10</xmin><ymin>8</ymin><xmax>30</xmax><ymax>24</ymax></bndbox>
            </object>
        </annotation>"""
        (tmp_path / "Annotations" / "p.xml").write_text(xml)
        ds = VocDataset(str(tmp_path))
        assert ds.classes == ["horse"]
        rec = ds[0]
        np.testing.assert_allclose(rec.boxes_pixel[0], [16, 20, 16, 20])

    def test_sanitized_clamps_and_drops(self, tmp_path):
        rec = FileRecord(
            path="x", height=20, width=20,
            boxes_pixel=np.array([
                [10.0, 10.0, 10.0, 10.0],   # fine
                [1.0, 1.0, 4.0, 4.0],       # slightly out of bounds → clamp
                [10.0, 10.0, 0.5, 0.5],     # too small → drop
            ]),
            classes=np.array([0, 1, 2]),
        )

        class Fake:
            def records(self):
                return [rec]

            classes = ["a", "b", "c"]

        # min_bbox_size is an image RATIO (reference sanitized.rs:22):
        # 0.05 of a 20px image = 1px — drops the 0.5px box
        ds = SanitizedDataset(Fake(), out_of_bound_tolerance=2.0, min_bbox_size=0.05)
        out = ds[0]
        assert len(out.boxes_pixel) == 2
        # clamped box: t/l were -1 → 0, so h/w shrink to 3 and center moves to 1.5
        np.testing.assert_allclose(out.boxes_pixel[1], [1.5, 1.5, 3.0, 3.0])

    def test_sanitized_bbox_scaling(self):
        rec = FileRecord(
            path="x", height=20, width=20,
            boxes_pixel=np.array([[10.0, 10.0, 8.0, 8.0]]),
            classes=np.array([0]),
        )

        class Fake:
            def records(self):
                return [rec]

            classes = ["a"]

        # detect preprocess.bbox_scaling scales extents about the center
        # AFTER sanitizing (training_stream.rs:320-329 scales records drawn
        # from the already-sanitized dataset)
        out = SanitizedDataset(Fake(), bbox_scaling=1.5)[0]
        np.testing.assert_allclose(out.boxes_pixel[0], [10.0, 10.0, 12.0, 12.0])
        # the source record is untouched (scaling copies)
        np.testing.assert_allclose(rec.boxes_pixel[0], [10.0, 10.0, 8.0, 8.0])

    def test_sanitized_bbox_scaling_after_sanitize(self):
        # a near-edge box whose SCALED extent exceeds bounds: the reference
        # sanitizes the in-bounds original, then scales without re-clamping
        # — must not raise, and the output may exceed image bounds
        rec = FileRecord(
            path="x", height=20, width=20,
            boxes_pixel=np.array([[10.0, 10.0, 19.0, 19.0]]),
            classes=np.array([0]),
        )

        class Fake:
            def records(self):
                return [rec]

            classes = ["a"]

        out = SanitizedDataset(Fake(), bbox_scaling=1.5)[0]
        np.testing.assert_allclose(out.boxes_pixel[0], [10.0, 10.0, 28.5, 28.5])
        # min_bbox_size keeps/drops by the ORIGINAL (sanitized) extent, so
        # scale<1 cannot rescue a too-small box and scale>1 cannot doom a
        # fine one — mirror of the reference's ordering
        rec.boxes_pixel = np.array([[10.0, 10.0, 0.5, 0.5]])
        out = SanitizedDataset(Fake(), min_bbox_size=0.05, bbox_scaling=10.0)[0]
        assert len(out.boxes_pixel) == 0
        with pytest.raises(ValueError, match="bbox_scaling"):
            SanitizedDataset(Fake(), bbox_scaling=0.0)

    def test_classes_file(self, tmp_path):
        (tmp_path / "c.txt").write_text("a\n\nb\n")
        assert load_classes_file(tmp_path / "c.txt") == ["a", "b"]
        (tmp_path / "dup.txt").write_text("a\na\n")
        with pytest.raises(ValueError):
            load_classes_file(tmp_path / "dup.txt")


class TestCaches:
    def test_on_demand(self, image_dir):
        tmp, records = image_dir
        loader = OnDemandLoader((32, 32))
        rec = loader.load(records[0])
        assert rec.image.shape == (3, 32, 32)
        assert rec.boxes.shape == (1, 4)
        assert 0 <= rec.boxes[0, 0] <= 1

    def test_file_cache_roundtrip(self, image_dir, tmp_path):
        tmp, records = image_dir
        cache = FileCache(str(tmp_path / "cache"), (32, 32))
        first = cache.load(records[0])
        files = os.listdir(tmp_path / "cache")
        assert len(files) == 1
        second = cache.load(records[0])
        np.testing.assert_allclose(first.image, second.image, atol=1e-6)
        np.testing.assert_allclose(first.boxes, second.boxes, atol=1e-5)

    def test_file_cache_u8_mode(self, image_dir, tmp_path):
        """dtype='u8' caches 4x smaller with <=1/510 quantization."""
        tmp, records = image_dir
        f32 = FileCache(str(tmp_path / "c32"), (32, 32))
        u8 = FileCache(str(tmp_path / "c8"), (32, 32), dtype="u8")
        a = f32.load(records[0])
        b = u8.load(records[0])           # miss: writes u8
        b2 = u8.load(records[0])          # hit: reads u8
        assert np.abs(a.image - b2.image).max() <= 1 / 255 + 1e-6
        np.testing.assert_allclose(b.boxes, b2.boxes, atol=1e-6)
        size32 = os.path.getsize(
            os.path.join(tmp_path / "c32", os.listdir(tmp_path / "c32")[0]))
        size8 = os.path.getsize(
            os.path.join(tmp_path / "c8", os.listdir(tmp_path / "c8")[0]))
        assert size8 < size32 / 3.5

    def test_file_cache_invalidation_on_size_mismatch(self, image_dir, tmp_path):
        tmp, records = image_dir
        cache = FileCache(str(tmp_path / "cache"), (32, 32))
        cache.load(records[0])
        # corrupt the cache file (truncate) → must re-decode, not crash
        path = os.path.join(tmp_path / "cache", os.listdir(tmp_path / "cache")[0])
        with open(path, "wb") as f:
            f.write(b"junk")
        rec = cache.load(records[0])
        assert rec.image.shape == (3, 32, 32)

    def test_memory_cache(self, image_dir):
        tmp, records = image_dir
        cache = MemoryCache((16, 16))
        a = cache.load(records[1])
        b = cache.load(records[1])
        np.testing.assert_allclose(a.image, b.image)
        # mutating one copy must not poison the cache
        a.boxes[:] = 0
        c = cache.load(records[1])
        assert not np.allclose(c.boxes, 0)


class TestTrainingStream:
    def test_stream_batches(self, image_dir):
        tmp, records = image_dir
        cfg = TrainingStreamConfig(batch_size=2, max_gt=8, seed=1)
        stream = TrainingStream(records, OnDemandLoader((32, 32)), cfg)
        it = iter(stream)
        first = next(it)
        second = next(it)
        assert first.images.shape == (2, 3, 32, 32)
        assert first.boxes.shape == (2, 8, 4)
        assert first.mask.sum() == 2  # one box per image
        assert second.step == 1

    def test_stream_with_all_augments(self, image_dir):
        tmp, records = image_dir
        cfg = TrainingStreamConfig(
            batch_size=2, max_gt=8, seed=2, mosaic_prob=1.0,
            mosaic=MosaicMixer(mosaic_margin=0.25),
            color_jitter=ColorJitter(hue_shift=0.1, saturation_shift=0.1, value_shift=0.1),
            random_affine=RandomAffine(horizontal_flip_prob=0.5),
        )
        stream = TrainingStream(records, OnDemandLoader((32, 32)), cfg)
        rec = next(iter(stream))
        assert rec.images.shape == (2, 3, 32, 32)
        assert np.isfinite(rec.images).all()
        assert rec.mask.shape == (2, 8)

    def test_deterministic_given_seed(self, image_dir):
        tmp, records = image_dir
        cfg = TrainingStreamConfig(batch_size=2, max_gt=4, seed=7, mosaic_prob=0.5)
        a = next(iter(TrainingStream(records, OnDemandLoader((24, 24)), cfg)))
        b = next(iter(TrainingStream(records, OnDemandLoader((24, 24)), cfg)))
        np.testing.assert_allclose(a.images, b.images)
        np.testing.assert_allclose(a.boxes, b.boxes)


class TestNativeLoader:
    def test_matches_pil_path(self, image_dir):
        from yolodl_tpu.data.native_loader import NativeLoader, native_loader_available

        if not native_loader_available():
            pytest.skip("native loader not built")
        tmp, records = image_dir
        # a smooth gradient: PIL's antialiased downscale and our 2-tap
        # bilinear agree closely on smooth content (they differ on noise)
        grad = np.zeros((40, 60, 3), np.uint8)
        grad[..., 0] = np.linspace(0, 255, 60, dtype=np.uint8)[None, :]
        grad[..., 1] = np.linspace(0, 255, 40, dtype=np.uint8)[:, None]
        path = tmp / "grad.png"
        Image.fromarray(grad).save(path)
        rec = FileRecord(str(path), 40, 60, records[0].boxes_pixel, records[0].classes)

        native = NativeLoader((32, 32))
        pil = OnDemandLoader((32, 32))
        a = native.load(rec)
        b = pil.load(rec)
        assert a.image.shape == b.image.shape == (3, 32, 32)
        assert np.abs(a.image - b.image).mean() < 0.02
        np.testing.assert_allclose(a.boxes, b.boxes, atol=1e-5)

    def test_jpeg_decode(self, tmp_path, rng):
        from yolodl_tpu.data.native_loader import NativeLoader, native_loader_available

        if not native_loader_available():
            pytest.skip("native loader not built")
        arr = (rng.uniform(0, 255, (40, 60, 3))).astype(np.uint8)
        path = tmp_path / "x.jpg"
        Image.fromarray(arr).save(path, quality=95)
        rec = FileRecord(str(path), 40, 60, np.zeros((0, 4)), np.zeros((0,), np.int32))
        out = NativeLoader((48, 48)).load(rec)
        assert out.image.shape == (3, 48, 48)
        ref = OnDemandLoader((48, 48)).load(rec)
        assert np.abs(out.image - ref.image).mean() < 0.03

    def test_scaled_jpeg_decode_parity(self, tmp_path, rng):
        """DCT-scaled decode of a large JPEG (the production default) must
        keep letterbox geometry and box transforms EXACT vs the full-res
        path and pixel content close (the resample source is the scaled
        image, everything else is identical)."""
        from yolodl_tpu.data.native_loader import (
            NativeLoader, native_loader_available,
        )

        if not native_loader_available():
            pytest.skip("native loader not built")
        # smooth content so 1/8-scale DCT decode stays close to full-res
        yy, xx = np.mgrid[0:900, 0:1200]
        arr = np.stack([
            (xx * 255 // 1200), (yy * 255 // 900),
            ((xx + yy) * 255 // 2100)], axis=-1).astype(np.uint8)
        path = tmp_path / "big.jpg"
        Image.fromarray(arr).save(path, quality=95)
        boxes = np.asarray([[450.0, 600.0, 300.0, 400.0]])
        rec = FileRecord(str(path), 900, 1200, boxes,
                         np.zeros((1,), np.int32))

        scaled = NativeLoader((96, 96), scaled_decode=True).load(rec)
        full = NativeLoader((96, 96), scaled_decode=False).load(rec)
        assert scaled.image.shape == full.image.shape == (3, 96, 96)
        # geometry: padding rows/cols (0.5) must be in identical positions
        pad_s = np.abs(scaled.image - 0.5).max(axis=(0, 2)) < 1e-3
        pad_f = np.abs(full.image - 0.5).max(axis=(0, 2)) < 1e-3
        np.testing.assert_array_equal(pad_s, pad_f)
        np.testing.assert_allclose(scaled.boxes, full.boxes)  # exact
        assert np.abs(scaled.image - full.image).mean() < 0.02

    def test_scaled_decode_noop_when_image_small(self, tmp_path, rng):
        """No downscale needed → the scaled path must be bit-identical."""
        from yolodl_tpu.data.native_loader import (
            NativeLoader, native_loader_available,
        )

        if not native_loader_available():
            pytest.skip("native loader not built")
        arr = (rng.uniform(0, 255, (40, 60, 3))).astype(np.uint8)
        path = tmp_path / "small.jpg"
        Image.fromarray(arr).save(path, quality=95)
        rec = FileRecord(str(path), 40, 60, np.zeros((0, 4)),
                         np.zeros((0,), np.int32))
        a = NativeLoader((48, 48), scaled_decode=True).load(rec)
        b = NativeLoader((48, 48), scaled_decode=False).load(rec)
        np.testing.assert_array_equal(a.image, b.image)

    def test_corrupt_jpeg_does_not_kill_process(self, tmp_path, rng):
        """libjpeg fatal errors must fail the one decode (rc!=0 → Python
        fallback), not exit() the training process."""
        from yolodl_tpu.data.native_loader import NativeLoader, native_loader_available

        if not native_loader_available():
            pytest.skip("native loader not built")
        arr = (rng.uniform(0, 255, (40, 60, 3))).astype(np.uint8)
        good = tmp_path / "good.jpg"
        Image.fromarray(arr).save(good, quality=95)
        bad = tmp_path / "bad.jpg"
        bad.write_bytes(good.read_bytes()[:120])  # truncated mid-header/data
        rec = FileRecord(str(bad), 40, 60, np.zeros((0, 4)),
                         np.zeros((0,), np.int32))
        loader = NativeLoader((32, 32))
        try:
            loader.load(rec)  # PIL fallback may or may not decode the stub
        except Exception:
            pass  # raising is fine — dying is not
        # process alive and loader still functional:
        ok = loader.load(FileRecord(str(good), 40, 60, np.zeros((0, 4)),
                                    np.zeros((0,), np.int32)))
        assert ok.image.shape == (3, 32, 32)

    def test_halfway_rounding_matches_python(self):
        """Content placement on an exact-half resize (25·16/32 = 12.5) must
        match letterbox_geometry's round-half-even (width 12, not 13)."""
        from yolodl_tpu.data.letterbox import letterbox_geometry
        from yolodl_tpu.data.native_loader import NativeLoader, native_loader_available

        assert letterbox_geometry((32, 25), (16, 16)) == (16, 12, 0, 2)
        if not native_loader_available():
            pytest.skip("native loader not built")
        import tempfile

        white = np.full((32, 25, 3), 255, np.uint8)
        with tempfile.TemporaryDirectory() as d:
            path = f"{d}/white.png"
            Image.fromarray(white).save(path)
            rec = FileRecord(path, 32, 25, np.zeros((0, 4)),
                             np.zeros((0,), np.int32))
            a = NativeLoader((16, 16)).load(rec).image
            b = OnDemandLoader((16, 16)).load(rec).image
        cols_a = (np.abs(a - 0.5) > 1e-3).any(axis=(0, 1))
        cols_b = (np.abs(b - 0.5) > 1e-3).any(axis=(0, 1))
        np.testing.assert_array_equal(cols_a, cols_b)


class TestMixUpCutMix:
    def _rec(self, value, boxes, classes):
        return DataRecord(
            np.full((3, 16, 16), value, np.float32),
            np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(classes, np.int32),
        )

    def test_mixup_blends_and_unions(self):
        from yolodl_tpu.data.mosaic import MixUpMixer

        a = self._rec(0.0, [[0.3, 0.3, 0.2, 0.2]], [0])
        b = self._rec(1.0, [[0.7, 0.7, 0.2, 0.2]], [1])
        out = MixUpMixer(alpha=8.0)(a, b, np.random.default_rng(0))
        v = float(out.image.mean())
        assert 0.2 < v < 0.8  # a genuine blend
        assert len(out.boxes) == 2 and set(out.classes.tolist()) == {0, 1}

    def test_cutmix_pastes_window(self):
        from yolodl_tpu.data.mosaic import CutMixMixer

        a = self._rec(0.0, [[0.1, 0.1, 0.1, 0.1]], [0])  # corner box, likely kept
        b = self._rec(1.0, [[0.5, 0.5, 0.9, 0.9]], [1])  # big box, overlaps window
        # keep-ratio low: the large B box retains only ~16% of its area
        # after clipping to the pasted window
        out = CutMixMixer(min_bbox_keep_ratio=0.05)(a, b, np.random.default_rng(3))
        # some pixels now come from b
        assert float(out.image.max()) == 1.0 and float(out.image.min()) == 0.0
        # b contributes a clipped box
        assert 1 in out.classes.tolist()

    def test_stream_with_mixup_cutmix(self, image_dir):
        tmp, records = image_dir
        cfg2 = TrainingStreamConfig(
            batch_size=2, max_gt=8, seed=3, mosaic_prob=0.3, mixup_prob=0.3,
            cutmix_prob=0.3,
        )
        stream = TrainingStream(records, OnDemandLoader((24, 24)), cfg2)
        rec = next(iter(stream))
        assert rec.images.shape == (2, 3, 24, 24)
        assert np.isfinite(rec.images).all()

    def test_prob_sum_validation(self):
        with pytest.raises(ValueError, match="sum"):
            TrainingStreamConfig(mosaic_prob=0.6, mixup_prob=0.6)


class TestTfrecordCache:
    def test_roundtrip_and_framing(self, image_dir, tmp_path):
        from yolodl_tpu.data.tfrecord_cache import TfrecordCache, read_tfrecord

        tmp, records = image_dir
        cache = TfrecordCache(str(tmp_path / "tfc"), (32, 32))
        first = cache.load(records[0])
        second = cache.load(records[0])  # hit
        # uint8 quantization: within 1/255
        assert np.abs(first.image - second.image).max() <= 1 / 255 + 1e-6
        np.testing.assert_allclose(first.boxes, second.boxes, atol=1e-5)
        # shard contains valid TFRecord framing
        shard = cache.shard_path
        with open(shard, "rb") as f:
            payload = read_tfrecord(f, 0)
        assert len(payload) == 3 * 32 * 32

    def test_crc_detects_corruption(self, image_dir, tmp_path):
        from yolodl_tpu.data.tfrecord_cache import TfrecordCache

        tmp, records = image_dir
        cache = TfrecordCache(str(tmp_path / "tfc"), (16, 16))
        cache.load(records[1])
        # flip a payload byte
        with open(cache.shard_path, "r+b") as f:
            f.seek(20)
            byte = f.read(1)
            f.seek(20)
            f.write(bytes([byte[0] ^ 0xFF]))
        rec = cache.load(records[1])  # falls back to re-decode, no crash
        assert rec.image.shape == (3, 16, 16)

    def test_tf_compatible_crc(self):
        """Framing matches TF's masked crc32c on a known vector."""
        from yolodl_tpu.data.tfrecord_cache import _masked_crc

        # crc32c("123456789") = 0xE3069283 → masked per TF formula
        crc = 0xE3069283
        masked = ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF
        assert _masked_crc(b"123456789") == masked

    def test_multiple_records_indexed(self, image_dir, tmp_path):
        from yolodl_tpu.data.tfrecord_cache import TfrecordCache

        tmp, records = image_dir
        cache = TfrecordCache(str(tmp_path / "tfc"), (24, 24))
        outs = [cache.load(r) for r in records]
        # new instance reuses the shard + index
        cache2 = TfrecordCache(str(tmp_path / "tfc"), (24, 24))
        outs2 = [cache2.load(r) for r in records]
        for a, b in zip(outs, outs2):
            assert np.abs(a.image - b.image).max() <= 1 / 255 + 1e-6

    def test_torn_index_tail_recovers(self, image_dir, tmp_path):
        """A crash mid-append leaves a torn JSONL line; load skips it and
        the affected record re-caches."""
        from yolodl_tpu.data.tfrecord_cache import TfrecordCache

        tmp, records = image_dir
        cache = TfrecordCache(str(tmp_path / "tfc"), (24, 24))
        for r in records:
            cache.load(r)
        with open(cache.index_path, "a") as f:
            f.write('{"k": "/partial/pa')  # torn write
        cache2 = TfrecordCache(str(tmp_path / "tfc"), (24, 24))
        outs = [cache2.load(r) for r in records]
        assert all(o.image.shape == (3, 24, 24) for o in outs)


class TestPipelineWorkers:
    def test_multiworker_deterministic_when_ordered(self, image_dir):
        tmp, records = image_dir
        outs = []
        for workers in (1, 3):
            cfg2 = TrainingStreamConfig(batch_size=2, max_gt=4, seed=9,
                                        mosaic_prob=0.5, workers=workers)
            stream = TrainingStream(records, OnDemandLoader((24, 24)), cfg2)
            it = iter(stream)
            outs.append([next(it) for _ in range(3)])
        for a, b in zip(*outs):
            np.testing.assert_allclose(a.images, b.images)
            np.testing.assert_allclose(a.boxes, b.boxes)

    def test_start_records_resumes_exact_data_order(self, image_dir):
        """start_records=N replays the uninterrupted run's stream from
        record N bitwise (per-slot RNG keys; spans an epoch boundary)."""
        tmp, records = image_dir
        kw = dict(batch_size=2, max_gt=4, seed=7, mosaic_prob=0.5, workers=2)
        base = TrainingStream(records, OnDemandLoader((24, 24)),
                              TrainingStreamConfig(**kw))
        it = iter(base)
        full = [next(it) for _ in range(8)]

        skip_batches = 3
        resumed = TrainingStream(
            records, OnDemandLoader((24, 24)),
            TrainingStreamConfig(start_records=skip_batches * 2, **kw))
        it2 = iter(resumed)
        for a in full[skip_batches:]:
            b = next(it2)
            np.testing.assert_array_equal(a.images, b.images)
            np.testing.assert_array_equal(a.boxes, b.boxes)
            np.testing.assert_array_equal(a.classes, b.classes)

    def test_unordered_mode_yields_all(self, image_dir):
        tmp, records = image_dir
        cfg2 = TrainingStreamConfig(batch_size=2, max_gt=4, seed=1, workers=3,
                                    ordered=False)
        stream = TrainingStream(records, OnDemandLoader((16, 16)), cfg2)
        rec = next(iter(stream))
        assert rec.images.shape == (2, 3, 16, 16)

    def test_more_workers_than_records(self, image_dir):
        """Workers whose strided slot range is empty exit instead of
        busy-spinning through empty epochs (1-record dataset, 8 workers)."""
        import threading as _threading
        import time

        tmp, records = image_dir
        before = set(_threading.enumerate())
        cfg2 = TrainingStreamConfig(batch_size=2, max_gt=4, seed=1,
                                    workers=8)  # > 1 record
        stream = TrainingStream(records[:1], OnDemandLoader((16, 16)), cfg2)
        it = iter(stream)
        rec = next(it)
        assert rec.images.shape == (2, 3, 16, 16)
        time.sleep(0.3)  # surplus workers exit immediately; one produces
        new_alive = [t for t in _threading.enumerate() if t not in before]
        assert len(new_alive) <= 1, [t.name for t in new_alive]

    def test_in_flight_records_bounded(self, image_dir):
        """Ordered mode must not buffer unboundedly when one slot stalls:
        the free worker is throttled by the in-flight ticket cap."""
        import threading as _threading
        import time

        tmp, records = image_dir
        loads = {"n": 0}
        gate = _threading.Event()

        class SlowImg0Loader(OnDemandLoader):
            def load(self, record):
                loads["n"] += 1
                if record.path.endswith("img0.png") and not gate.is_set():
                    gate.wait(timeout=30)
                return super().load(record)

        cfg2 = TrainingStreamConfig(batch_size=2, max_gt=4, seed=0,
                                    workers=2, queue_depth=1)
        stream = TrainingStream(records, SlowImg0Loader((16, 16)), cfg2)
        it = iter(stream)
        got = []

        def consume():
            for _ in range(12):
                got.append(next(it))

        consumer = _threading.Thread(target=consume, daemon=True)
        consumer.start()
        time.sleep(1.5)  # consumer stalls on img0; free worker runs ahead
        # ticket cap = queue_depth*batch_size + 2*workers = 6; plus a few
        # records already consumed before the stall. Without the cap the
        # free worker loads hundreds of records in this window.
        assert loads["n"] <= 24, loads["n"]
        gate.set()
        consumer.join(timeout=60)
        assert not consumer.is_alive() and len(got) == 12


class TestNativeAugmentation:
    """C++ augmentation kernels (native/loader.cpp) vs the numpy/scipy
    reference implementations — exact semantics, large speedup (the
    per-record pipeline hotspots: affine 67→6 ms, jitter 52→16 ms)."""

    def _need_lib(self):
        from yolodl_tpu.data.native_loader import _aug_lib

        if _aug_lib() is None:
            pytest.skip("native augmentation kernels not built")

    def test_affine_warp_matches_scipy(self, rng):
        self._need_lib()
        from scipy import ndimage

        from yolodl_tpu.data.native_loader import affine_warp_native

        img = rng.uniform(0, 1, (3, 48, 40)).astype(np.float32)
        for _ in range(4):
            m_rc = np.eye(2) + rng.normal(0, 0.15, (2, 2))
            b_rc = rng.normal(0, 4, 2)
            nat = affine_warp_native(img, m_rc, b_rc)
            ref = np.stack([
                ndimage.affine_transform(img[c], m_rc, offset=b_rc, order=1,
                                         mode="constant", cval=0.0)
                for c in range(3)
            ])
            np.testing.assert_allclose(nat, ref, atol=1e-5)

    def test_color_jitter_matches_numpy(self, rng):
        self._need_lib()
        from yolodl_tpu.data.color import hsv_to_rgb, rgb_to_hsv
        from yolodl_tpu.data.native_loader import color_jitter_native

        img = rng.uniform(0, 1, (3, 33, 47)).astype(np.float32)
        for hs, ss, vs in [(0.03, -0.1, 0.08), (0.0, 0.0, 0.0), (-0.4, 0.5, -0.5)]:
            nat = color_jitter_native(img, hs, ss, vs)
            hsv = rgb_to_hsv(img)
            hsv[0] = (hsv[0] + hs + 1.0) % 1.0
            hsv[1] = np.clip(hsv[1] + ss, 0.0, 1.0)
            hsv[2] = np.clip(hsv[2] + vs, 0.0, 1.0)
            ref = hsv_to_rgb(hsv)
            np.testing.assert_allclose(nat, ref, atol=3e-5)

    def test_jitter_dispatch_identical_stream(self, rng):
        """ColorJitter.__call__ must produce the same result through the
        native and numpy paths with the same RNG state."""
        from yolodl_tpu.data.color import ColorJitter
        from yolodl_tpu.data import native_loader

        self._need_lib()
        img = rng.uniform(0, 1, (3, 24, 24)).astype(np.float32)
        cj = ColorJitter(0.05, 0.2, 0.2)
        a = cj(img, np.random.default_rng(7))
        saved = native_loader._aug_lib_cache
        native_loader._aug_lib_cache = False  # force numpy fallback
        try:
            b = cj(img, np.random.default_rng(7))
        finally:
            native_loader._aug_lib_cache = saved
        np.testing.assert_allclose(a, b, atol=3e-5)

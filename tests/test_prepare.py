"""Dataset-preparation CLI: raw COCO 2014 -> COCO-20i benchmark tree.

The reference delegates this step to an external repo (README.md:59-61
"Preparing the dataset following Matcher"); `diffews_tpu/cli/prepare.py`
builds the tree self-contained.  These tests synthesize a raw COCO download
(polygons, compressed + uncompressed RLE, crowd, overlaps, empty images),
build the tree, and run it through the real episodic loader.
"""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from diffews_tpu.cli import prepare
from diffews_tpu.data import masks as mask_codec
from diffews_tpu.data.dataset import FSSDataset


def _poly_rect(x0, y0, x1, y1):
    """COCO polygon (flat xy list) for an axis-aligned rectangle."""
    return [[x0, y0, x1, y0, x1, y1, x0, y1]]


def _rle_rect(h, w, y0, y1, x0, x1, compressed):
    m = np.zeros((h, w), np.uint8)
    m[y0:y1, x0:x1] = 1
    rle = mask_codec.rle_encode(m)
    counts = rle["counts"]
    if compressed:
        counts = counts.decode("ascii")
    else:
        # uncompressed COCO RLE: plain run-length list, column-major
        flat = m.flatten(order="F")
        edges = np.flatnonzero(np.diff(flat))
        counts = np.diff(np.concatenate([[0], edges + 1, [flat.size]])).tolist()
        if flat[0] == 1:  # counts always start with a background run
            counts = [0] + counts
    return {"size": [h, w], "counts": counts}


@pytest.fixture(scope="module")
def raw_coco(tmp_path_factory):
    """A raw COCO 2014 download: images + instances_*.json."""
    root = tmp_path_factory.mktemp("raw_coco")
    rng = np.random.default_rng(0)
    H, W = 32, 48
    # category ids intentionally non-contiguous (real COCO skips ids):
    # 7 -> class 0, 13 -> class 1, 90 -> class 2
    cats = [{"id": 13, "name": "b"}, {"id": 7, "name": "a"},
            {"id": 90, "name": "c"}]

    def build_split(split):
        images, annotations = [], []
        ann_id = 1

        def add_img(idx):
            name = f"COCO_{split}_{idx:012d}.jpg"
            arr = rng.integers(0, 255, (H, W, 3), np.uint8)
            p = os.path.join(root, split, name)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            Image.fromarray(arr).save(p)
            images.append({"id": idx, "file_name": name,
                           "height": H, "width": W})
            return idx

        def add_ann(img_id, cat, segm, crowd=0):
            nonlocal ann_id
            annotations.append({"id": ann_id, "image_id": img_id,
                                "category_id": cat, "segmentation": segm,
                                "iscrowd": crowd})
            ann_id += 1

        # img 1: polygon class 0 overlapped by polygon class 1 (paint order)
        add_img(1)
        add_ann(1, 7, _poly_rect(4, 4, 20, 20))
        add_ann(1, 13, _poly_rect(10, 10, 30, 24))
        # img 2: compressed-RLE class 2 + crowd ann of class 0 (skipped)
        add_img(2)
        add_ann(2, 90, _rle_rect(H, W, 2, 12, 2, 12, compressed=True))
        add_ann(2, 7, _rle_rect(H, W, 20, 30, 20, 40, compressed=True),
                crowd=1)
        # img 3: uncompressed-RLE class 1
        add_img(3)
        add_ann(3, 13, _rle_rect(H, W, 8, 16, 8, 40, compressed=False))
        # img 4: no annotations at all
        add_img(4)
        # img 5: class 0 only (kept in trn folds whose val set has class 2)
        add_img(5)
        add_ann(5, 7, _poly_rect(0, 0, 16, 16))
        # img 6: a second class-2 image so 1-shot episodes can reject-sample
        # a support != query from the class pool
        add_img(6)
        add_ann(6, 90, _poly_rect(8, 8, 28, 24))
        os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
        with open(os.path.join(root, "annotations",
                               f"instances_{split}.json"), "w") as f:
            json.dump({"images": images, "annotations": annotations,
                       "categories": cats}, f)

    build_split("train2014")
    build_split("val2014")
    return str(root)


@pytest.fixture(scope="module")
def prepared(raw_coco, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bench") / "COCO2014")
    prepare.main(["coco", "--coco_root", raw_coco, "--out", out,
                  "--workers", "0"])
    return out


def test_contiguous_class_index():
    idx = prepare.contiguous_class_index(
        [{"id": 90}, {"id": 7}, {"id": 13}])
    assert idx == {7: 0, 13: 1, 90: 2}


def test_rendered_masks(prepared):
    ann = np.array(Image.open(os.path.join(
        prepared, "annotations", "train2014",
        "COCO_train2014_000000000001.png")))
    assert ann.dtype == np.uint8 and ann.shape == (32, 48)
    # later annotation (class 1) overwrites the overlap of class 0
    assert ann[5, 5] == 1          # class 0 + 1
    assert ann[12, 12] == 2        # class 1 + 1 wins the overlap
    assert ann[2, 40] == 0
    ann2 = np.array(Image.open(os.path.join(
        prepared, "annotations", "train2014",
        "COCO_train2014_000000000002.png")))
    assert ann2[5, 5] == 3         # compressed RLE, class 2 + 1
    assert ann2[25, 30] == 0       # crowd annotation skipped by default
    ann3 = np.array(Image.open(os.path.join(
        prepared, "annotations", "train2014",
        "COCO_train2014_000000000003.png")))
    assert ann3[10, 10] == 2 and ann3[0, 0] == 0  # uncompressed RLE
    # image 4 has no annotations -> no PNG
    assert not os.path.exists(os.path.join(
        prepared, "annotations", "train2014",
        "COCO_train2014_000000000004.png"))


def test_fold_metadata(prepared):
    # fold 2's val classes are {2, 6, ...}; class 2 lives in img 2.
    with open(os.path.join(prepared, "splits", "trn", "fold2.pkl"),
              "rb") as f:
        trn = pickle.load(f)
    assert set(trn) == {c for c in range(80) if c % 4 != 2}
    # anti-leakage: img 2 contains val class 2 -> excluded from trn fold 2
    assert trn[0] == ["train2014/COCO_train2014_000000000001.jpg",
                      "train2014/COCO_train2014_000000000005.jpg"]
    assert trn[1] == ["train2014/COCO_train2014_000000000001.jpg",
                      "train2014/COCO_train2014_000000000003.jpg"]
    # fold 0 excludes nothing (val classes {0,4,...}: imgs with class 0
    # are excluded from class 1's list too)
    with open(os.path.join(prepared, "splits", "trn", "fold0.pkl"),
              "rb") as f:
        trn0 = pickle.load(f)
    assert trn0[1] == ["train2014/COCO_train2014_000000000003.jpg"]
    with open(os.path.join(prepared, "splits", "val", "fold2.pkl"),
              "rb") as f:
        val = pickle.load(f)
    assert set(val) == {c for c in range(80) if c % 4 == 2}
    assert val[2] == ["val2014/COCO_val2014_000000000002.jpg",
                      "val2014/COCO_val2014_000000000006.jpg"]
    # images symlinked into the tree
    assert os.path.isdir(os.path.join(prepared, "train2014"))
    assert os.path.exists(os.path.join(
        prepared, "train2014", "COCO_train2014_000000000001.jpg"))


def test_prepared_tree_feeds_episodic_loader(prepared):
    FSSDataset.initialize(img_size=64, datapath=os.path.dirname(prepared),
                          raw_images=True)
    ds = FSSDataset.build_dataset("coco", fold=2, split="val", shot=1)
    assert 2 in ds.class_ids and len(ds) == 1000
    # the toy tree populates only class 2 of this fold; pin the draw to it
    # (with real COCO every class has images and the seeded protocol
    # samples uniformly — tests/test_data.py covers that path)
    ds.class_ids = [2]
    np.random.seed(0)
    ep = ds.get_episode(0)
    assert int(ep["class_id"]) == 2
    assert ep["query_img"].shape == (64, 64, 3)
    assert ep["support_masks"].shape == (1, 64, 64)
    # the mask the loader reads back is the PNG the tool rendered
    assert ep["query_mask"].max() == 1 and ep["query_mask"].min() == 0


def test_crowd_and_worker_pool(raw_coco, tmp_path):
    out = str(tmp_path / "COCO2014")
    prepare.prepare_coco(raw_coco, out, workers=0, include_crowd=True,
                         link_images=False, log=lambda *a: None)
    ann2 = np.array(Image.open(os.path.join(
        out, "annotations", "train2014",
        "COCO_train2014_000000000002.png")))
    assert ann2[25, 30] == 1  # crowd annotation painted, class 0 + 1
    assert not os.path.isdir(os.path.join(out, "train2014"))


@pytest.fixture(scope="module")
def raw_lvis(tmp_path_factory):
    """A raw LVIS v1 download: lvis_v1_{train,val}.json + coco images."""
    root = tmp_path_factory.mktemp("raw_lvis")
    rng = np.random.default_rng(1)
    H, W = 24, 36

    cats = [5 * k + 3 for k in range(10)]  # 10 cats -> 1 val class/fold

    def build(split, coco_split):
        images, annotations, ann_id = [], [], 1
        for i in range(1, 5):
            name = f"{i:012d}.jpg"
            p = os.path.join(root, "coco", coco_split, name)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            Image.fromarray(
                rng.integers(0, 255, (H, W, 3), np.uint8)).save(p)
            images.append({
                "id": i, "height": H, "width": W,
                "coco_url":
                    f"http://images.cocodataset.org/{coco_split}/{name}"})
        # every cat: imgs 1,2,3 (polygons); cat 3 gets TWO instances on
        # img 1 (union) and cat 9999 only img 4 (dropped at shot=1)
        for cat in cats:
            for img_id in (1, 2, 3):
                annotations.append({"id": ann_id, "image_id": img_id,
                                    "category_id": cat,
                                    "segmentation": _poly_rect(2, 2, 14, 12)})
                ann_id += 1
        annotations.append({"id": ann_id, "image_id": 1, "category_id": 3,
                            "segmentation": _poly_rect(20, 14, 32, 22)})
        ann_id += 1
        annotations.append({"id": ann_id, "image_id": 4,
                            "category_id": 9999,
                            "segmentation": _rle_rect(H, W, 4, 12, 4, 20,
                                                      compressed=True)})
        with open(os.path.join(root, f"lvis_v1_{split}.json"), "w") as f:
            json.dump({"images": images, "annotations": annotations,
                       "categories": [{"id": c} for c in cats + [9999]]}, f)

    build("train", "train2017")
    build("val", "val2017")
    return str(root)


def test_prepare_lvis(raw_lvis, tmp_path):
    out = str(tmp_path / "LVIS")
    prepare.main(["lvis", "--lvis_root", raw_lvis, "--out", out,
                  "--coco_images", os.path.join(raw_lvis, "coco")])
    with open(os.path.join(out, "lvis_val.pkl"), "rb") as f:
        val = pickle.load(f)
    assert set(val) == {5 * k + 3 for k in range(10)} | {9999}
    assert set(val[3]) == {"val2017/000000000001.jpg",
                           "val2017/000000000002.jpg",
                           "val2017/000000000003.jpg"}
    # img 1 carries both instances of cat 3
    assert len(val[3]["val2017/000000000001.jpg"]["annotations"]) == 2
    assert os.path.exists(os.path.join(out, "coco", "val2017",
                                       "000000000001.jpg"))

    # the episodic loader consumes the tree: cat 9999 (1 image) drops at
    # shot=1; 10 surviving cats interleave to 1 val class at fold 0
    FSSDataset.initialize(img_size=48, datapath=os.path.dirname(out),
                          raw_images=True)
    ds = FSSDataset.build_dataset("lvis", fold=0, split="val", shot=1)
    assert ds.class_ids_ori == [3]
    np.random.seed(0)
    ep = ds.get_episode(0)
    assert ep["query_img"].shape == (48, 48, 3)
    assert ep["query_mask"].max() == 1


def test_lvis_pkl_ordering_and_relink(raw_lvis, tmp_path):
    """Pickles are sorted (fold interleave follows dict order); re-running
    against a moved raw root replaces the stale symlink."""
    out = str(tmp_path / "LVIS")
    prepare.prepare_lvis(raw_lvis, out,
                         coco_images=os.path.join(raw_lvis, "coco"),
                         log=lambda *a: None)
    with open(os.path.join(out, "lvis_train.pkl"), "rb") as f:
        meta = pickle.load(f)
    assert list(meta) == sorted(meta)
    for imgs in meta.values():
        assert list(imgs) == sorted(imgs)
    # stale symlink (dangling or retargeted) is replaced, not crashed into
    other = tmp_path / "elsewhere"
    other.mkdir()
    prepare.prepare_lvis(raw_lvis, out, coco_images=str(other),
                         log=lambda *a: None)
    assert os.path.realpath(os.path.join(out, "coco")) == str(other)


# ------------------------------------------------------------------ pascal


@pytest.fixture(scope="module")
def raw_pascal(tmp_path_factory):
    """Raw VOC2012 + SBD downloads (tiny): overlap between the two mask
    sources, a 255 ignore boundary in the VOC PNGs, SBD-only images."""
    from scipy.io import savemat

    root = tmp_path_factory.mktemp("raw_pascal")
    voc = os.path.join(root, "VOCdevkit", "VOC2012")
    sbd = os.path.join(root, "benchmark_RELEASE", "dataset")
    rng = np.random.default_rng(2)
    H, W = 30, 40
    for d in ("JPEGImages", "SegmentationClass",
              os.path.join("ImageSets", "Segmentation")):
        os.makedirs(os.path.join(voc, d))
    os.makedirs(os.path.join(sbd, "cls"))

    def class_map(classes):
        m = np.zeros((H, W), np.uint8)
        for i, c in enumerate(classes):
            m[5 * i + 2 : 5 * i + 8, 4:24] = c
        return m

    def add(name, classes, voc_png=False, sbd_mat=False, sbd_classes=None):
        Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)).save(
            os.path.join(voc, "JPEGImages", name + ".jpg"))
        if voc_png:
            m = class_map(classes)
            m[0, :] = 255  # VOC ignore boundary
            Image.fromarray(m).save(
                os.path.join(voc, "SegmentationClass", name + ".png"))
        if sbd_mat:
            savemat(os.path.join(sbd, "cls", name + ".mat"),
                    {"GTcls": {"Segmentation":
                               class_map(sbd_classes or classes)}})

    # VOC train image also in SBD with DIFFERENT content: VOC must win
    add("a", [1, 6], voc_png=True, sbd_mat=True, sbd_classes=[9])
    # VOC val images (PNG only)
    add("v1", [1], voc_png=True)
    add("v2", [1, 2], voc_png=True)
    add("v3", [2], voc_png=True)
    # SBD-only training images (.mat only)
    add("s1", [2], sbd_mat=True)
    add("s2", [6], sbd_mat=True)

    def write_list(p, names):
        with open(p, "w") as f:
            f.write("\n".join(names) + "\n")

    write_list(os.path.join(voc, "ImageSets", "Segmentation", "train.txt"),
               ["a"])
    write_list(os.path.join(voc, "ImageSets", "Segmentation", "val.txt"),
               ["v1", "v2", "v3"])
    write_list(os.path.join(sbd, "train.txt"), ["a", "s1"])
    write_list(os.path.join(sbd, "val.txt"), ["s2"])
    return voc, sbd


def test_prepare_pascal(raw_pascal, tmp_path):
    voc, sbd = raw_pascal
    out = str(tmp_path / "VOC2012")
    prepare.main(["pascal", "--voc_root", voc, "--sbd_root", sbd,
                  "--out", out])

    # masks: VOC PNG wins over the conflicting SBD .mat (boundary kept)
    a = np.array(Image.open(os.path.join(out, "SegmentationClassAug",
                                         "a.png")))
    assert a[0, 0] == 255 and a[4, 10] == 1 and a[9, 10] == 6
    assert not (a == 9).any()
    s1 = np.array(Image.open(os.path.join(out, "SegmentationClassAug",
                                          "s1.png")))
    assert s1[4, 10] == 2 and s1[0, 0] == 0  # SBD: no boundary

    def lines(split, fold):
        with open(os.path.join(out, "splits", split,
                               f"fold{fold}.txt")) as f:
            return [ln for ln in f.read().split("\n") if ln]

    # fold 0 = classes 1..5; trainaug excludes VOC val
    assert lines("trn", 0) == ["a__01", "s1__02"]
    assert lines("trn", 1) == ["a__06", "s2__06"]
    assert lines("val", 0) == ["v1__01", "v2__01", "v2__02", "v3__02"]
    assert lines("val", 1) == []
    assert os.path.exists(os.path.join(out, "JPEGImages", "s1.jpg"))

    # the episodic loader consumes the tree end to end
    FSSDataset.initialize(img_size=32, datapath=str(tmp_path),
                          raw_images=True)
    ds = FSSDataset.build_dataset("pascal", fold=0, split="val", shot=1)
    assert len(ds) == 1000
    np.random.seed(0)
    ep = ds.get_episode(0)  # query v1, class 1 (0-based 0); support = v2
    assert int(ep["class_id"]) == 0
    assert ep["support_names"] == ["v2"]
    assert ep["query_img"].shape == (32, 32, 3)
    assert ep["query_mask"].max() == 1
    # the VOC 255 boundary rides out as the ignore mask
    assert ep["query_ignore_idx"].max() == 1
    # trn split reads the other folds' pair lists
    ds_trn = FSSDataset.build_dataset("pascal", fold=0, split="trn", shot=1)
    assert ("a", 5) in ds_trn.img_metadata  # a__06 -> 0-based class 5


def test_prepare_pascal_cd(raw_pascal, tmp_path):
    """The pascal_cd subcommand writes cd_folds.pth/class_names.pth onto a
    prepared PASCAL tree, the default COCO-derived grouping partitions the
    20 ids, an explicit --folds_json wins, and DatasetPASCALCD consumes
    the result through the factory."""
    import torch

    voc, sbd = raw_pascal
    out = str(tmp_path / "VOC2012")
    prepare.main(["pascal", "--voc_root", voc, "--sbd_root", sbd,
                  "--out", out])
    prepare.main(["pascal_cd", "--out", out])
    folds = torch.load(os.path.join(out, "cd_folds.pth"), weights_only=False)
    assert sorted(c for v in folds.values() for c in v) == list(range(1, 21))
    names = torch.load(os.path.join(out, "class_names.pth"),
                       weights_only=False)
    assert names[0] == "aeroplane" and names[14] == "person"
    # documented derivation: person (COCO-80 index 1) lands in fold 0
    assert 15 in folds[0]

    # an explicit spec reproduces an external grouping exactly
    spec = tmp_path / "folds.json"
    spec.write_text(json.dumps({str(f): [f * 5 + i + 1 for i in range(5)]
                                for f in range(4)}))
    prepare.main(["pascal_cd", "--out", out, "--folds_json", str(spec)])
    folds = torch.load(os.path.join(out, "cd_folds.pth"), weights_only=False)
    assert folds[0] == [1, 2, 3, 4, 5]

    # the CD dataset consumes the metadata end to end (fold 0 classes are
    # now 1..5, so the synthetic val episodes exist)
    FSSDataset.initialize(img_size=32, datapath=str(tmp_path),
                          raw_images=True)
    ds = FSSDataset.build_dataset("pascal_cd", fold=0, split="val", shot=1)
    np.random.seed(0)
    ep = ds.get_episode(0)
    assert int(ep["class_id"]) in range(0, 5)
    assert ep["query_img"].shape == (32, 32, 3)

    # a malformed spec (missing ids) is rejected
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps([[1], [2], [3], [4]]))
    with pytest.raises(SystemExit):
        prepare.main(["pascal_cd", "--out", out, "--folds_json", str(bad)])


# ------------------------------------------------------------- pascal_part


def _rect(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), np.uint8)
    m[y0:y1, x0:x1] = 1
    return m


@pytest.fixture(scope="module")
def raw_pascal_part(tmp_path_factory):
    """Raw PASCAL-Part download (tiny): Annotations_Part .mat structs +
    VOC2010 images/splits.  Covers laterality/instance merging, a partless
    object, a split image with no .mat, and two super-categories."""
    from scipy.io import savemat

    root = tmp_path_factory.mktemp("raw_ppart")
    voc = os.path.join(root, "VOCdevkit", "VOC2010")
    parts = os.path.join(root, "Annotations_Part")
    os.makedirs(os.path.join(voc, "JPEGImages"))
    os.makedirs(os.path.join(voc, "ImageSets", "Main"))
    os.makedirs(parts)
    rng = np.random.default_rng(3)
    H, W = 24, 32

    def mat_obj(cls, part_masks):
        return {"class": cls, "mask": _rect(H, W, 0, H, 0, W), "parts":
                np.array([{"part_name": n, "mask": m}
                          for n, m in part_masks], dtype=object)}

    def add(name, objs):
        Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)).save(
            os.path.join(voc, "JPEGImages", name + ".jpg"))
        if objs is not None:
            savemat(os.path.join(parts, name + ".mat"),
                    {"anno": {"imname": name,
                              "objects": np.array(objs, dtype=object)}})

    def cat_obj():
        return mat_obj("cat", [("head", _rect(H, W, 2, 6, 4, 10)),
                               ("lear", _rect(H, W, 0, 2, 4, 6)),
                               ("torso", _rect(H, W, 6, 14, 4, 12)),
                               ("lfleg", _rect(H, W, 14, 20, 4, 7))])

    def plane_obj():
        return mat_obj("aeroplane", [("body", _rect(H, W, 8, 14, 2, 22)),
                                     ("tail", _rect(H, W, 4, 8, 20, 24)),
                                     ("engine_1", _rect(H, W, 14, 16, 6, 9)),
                                     ("engine_2", _rect(H, W, 14, 16, 12, 15))])

    # train images (one per pair so every (obj, part) has a train entry)
    add("t_cat", [cat_obj(), mat_obj("boat", [])])  # partless obj dropped
    add("t_plane", [plane_obj()])
    # val images: two cats (query+support pools), two planes
    add("v_cat1", [cat_obj()])
    add("v_cat2", [cat_obj()])
    add("v_plane1", [plane_obj()])
    add("v_plane2", [plane_obj()])
    add("no_mat", None)  # listed in the split but no part annotations

    def write_list(p, names):
        with open(p, "w") as f:
            f.write("\n".join(names) + "\n")

    write_list(os.path.join(voc, "ImageSets", "Main", "train.txt"),
               ["t_cat", "t_plane", "no_mat"])
    write_list(os.path.join(voc, "ImageSets", "Main", "val.txt"),
               ["v_cat1", "v_cat2", "v_plane1", "v_plane2"])
    return parts, voc


def test_merged_part_names():
    assert prepare._merged_part_name("engine_2") == "ENGINE"
    assert prepare._merged_part_name("lfuleg") == "LEG"
    assert prepare._merged_part_name("rbpa") == "FOOT"
    assert prepare._merged_part_name("cleftside_1") == "SIDE"
    assert prepare._merged_part_name("blob") == "BLOB"  # unknown passes up


def test_prepare_pascal_part(raw_pascal_part, tmp_path):
    parts_root, voc = raw_pascal_part
    out = str(tmp_path / "Pascal-Part")
    prepare.main(["pascal_part", "--parts_root", parts_root,
                  "--voc_root", voc, "--out", out])
    root = os.path.join(out, "VOCdevkit", "VOC2010")

    with open(os.path.join(root, "all_obj_part_to_image.json")) as f:
        idx = json.load(f)
    assert sorted(idx) == ["animals", "vehicles"]
    cat = idx["animals"]["object"]["cat"]["part"]
    # head+lear merge into HEAD; the ear extends the extent to row 0
    assert sorted(cat) == ["HEAD", "LEG", "TORSO"]
    assert cat["HEAD"] == {"train": ["t_cat"], "val": ["v_cat1", "v_cat2"]}
    plane = idx["vehicles"]["object"]["aeroplane"]["part"]
    assert sorted(plane) == ["BODY", "ENGINE", "TAIL"]
    assert "boat" not in idx.get("vehicles", {}).get("object", {})

    with open(os.path.join(root,
                           "Annotations_Part_json_merged_part_classes",
                           "v_cat1.json")) as f:
        anno = json.load(f)
    (obj,) = anno["object"]
    assert obj["name"] == "cat"
    # bndbox = part-union tight extent, xyxy half-open
    assert list(obj["bndbox"].values()) == [4, 0, 12, 20]
    head = next(p for p in obj["parts"] if p["name"] == "HEAD")
    m = mask_codec.rle_decode(
        {**head["mask"][0],
         "counts": head["mask"][0]["counts"].encode("ascii")})
    expect = _rect(24, 32, 2, 6, 4, 10) | _rect(24, 32, 0, 2, 4, 6)
    np.testing.assert_array_equal(m, expect)
    assert not os.path.exists(
        os.path.join(root, "Annotations_Part_json_merged_part_classes",
                     "no_mat.json"))

    # the episodic loader consumes the tree end to end
    FSSDataset.initialize(img_size=32, datapath=str(tmp_path),
                          raw_images=True)
    ds = FSSDataset.build_dataset("pascal_part", fold=0, split="val",
                                  shot=1)
    assert ds.cat_part_name == ["cat+HEAD", "cat+LEG", "cat+TORSO"]
    np.random.seed(0)
    ep = ds.get_episode(0)
    assert ep["category"] == "cat+HEAD"
    assert {str(ep["query_name"])} | set(
        map(str, ep["support_names"])) == {"v_cat1", "v_cat2"}
    assert ep["query_img"].shape == (32, 32, 3)
    assert ep["query_mask"].max() == 1
    # fold 3 = vehicles; the loader skips aeroplane+TAIL by contract
    ds_v = FSSDataset.build_dataset("pascal_part", fold=3, split="val",
                                    shot=1)
    assert ds_v.cat_part_name == ["aeroplane+BODY", "aeroplane+ENGINE"]


# -------------------------------------------------------------------- fss


def test_prepare_fss(tmp_path):
    raw = tmp_path / "raw" / "fewshot_data"
    rng = np.random.default_rng(4)
    classes = [f"class_{i:02d}" for i in range(10)]
    for c in classes:
        d = raw / c
        d.mkdir(parents=True)
        for i in range(1, 11):
            Image.fromarray(rng.integers(0, 255, (20, 20, 3), np.uint8)
                            ).save(d / f"{i}.jpg")
            Image.fromarray((rng.integers(0, 2, (20, 20), np.uint8) * 255)
                            ).save(d / f"{i}.png")
    (raw / "notes.txt").write_text("not a class dir")
    out = tmp_path / "bench" / "FSS-1000"
    # accepts the PARENT of fewshot_data too
    prepare.main(["fss", "--fss_root", str(tmp_path / "raw"),
                  "--out", str(out)])

    def split(name):
        return [ln for ln in (out / "splits" / f"{name}.txt"
                              ).read_text().split("\n") if ln]

    # 52/24/24% of 10 classes, sorted, disjoint, exhaustive
    assert split("trn") == classes[:5]
    assert split("val") == classes[5:7]
    assert split("test") == classes[7:]
    assert os.path.realpath(out / "data") == os.path.realpath(raw)

    # the episodic loader consumes the tree end to end
    FSSDataset.initialize(img_size=32, datapath=str(tmp_path / "bench"),
                          raw_images=True)
    ds = FSSDataset.build_dataset("fss", fold=0, split="test", shot=1)
    assert len(ds) == 30  # 3 test classes x 10 images
    np.random.seed(0)
    ep = ds.get_episode(0)
    assert int(ep["class_id"]) == 760  # test split offset
    assert ep["query_img"].shape == (32, 32, 3)
    assert len(ep["support_names"]) == 1

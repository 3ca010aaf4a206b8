"""Datagen-pipeline tests on synthetic miniature raw datasets."""

import os

import numpy as np
import pytest

pd = pytest.importorskip("pandas")
PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from plip_tpu.datagen.dataset_loader import (
    process_PanNuke,
    process_WSSS4LUAD_binary,
    prompt_engineering,
)
from plip_tpu.datagen.preprocess_digestpath import (
    background_ratio,
    run_step_1,
    run_step_2,
    run_step_3,
    sliding_crop,
)
from plip_tpu.datagen.preprocess_pannuke import (
    classify,
    count_nuclei,
    drop_pure_background,
    write_outputs,
)
from plip_tpu.datagen.prepare_dataset_to_csv import resizeimg, resize_split

opj = os.path.join


def test_prompt_engineering():
    assert prompt_engineering("debris") == "An H&E image patch of debris."


def test_background_ratio():
    white = np.full((10, 10, 3), 255, np.uint8)
    dark = np.full((10, 10, 3), 50, np.uint8)
    assert background_ratio(white) == 1.0
    assert background_ratio(dark) == 0.0
    half = np.concatenate([white[:5], dark[:5]], axis=0)
    assert background_ratio(half) == 0.5


def test_sliding_crop_counts_and_filtering():
    rng = np.random.default_rng(0)
    # tissue-like (dark) image 512x512 with a white (background) right half
    arr = rng.integers(50, 150, (512, 512, 3), dtype=np.uint8)
    arr[:, 300:] = 255
    img = Image.fromarray(arr)
    patches, stats = sliding_crop(img, None, downsample=1, cropsize=224,
                                  crop_overlap=0.5, non_bg_threshold=0.5)
    assert patches is not None
    assert patches.shape[1:] == (224, 224, 3)
    # background-dominated patches were filtered
    assert (stats["tissue_ratio"] >= 0.5).all()
    # too-small after downsample -> None
    none_p, none_s = sliding_crop(img, None, downsample=4, cropsize=224)
    assert none_p is None


def test_sliding_crop_with_mask_ratios():
    arr = np.full((512, 512, 3), 100, np.uint8)
    msk_arr = np.zeros((512, 512), np.uint8)
    msk_arr[:, :256] = 255  # left half tumor
    patches, stats = sliding_crop(
        Image.fromarray(arr), Image.fromarray(msk_arr), downsample=1,
        cropsize=224, crop_overlap=0.0, non_bg_threshold=0.5,
    )
    assert patches is not None
    assert stats["tumor_to_patch_ratio"].max() > 0.9
    assert stats["tumor_to_patch_ratio"].min() < 0.3


def test_digestpath_steps_end_to_end(tmp_path):
    rng = np.random.default_rng(1)
    pos = tmp_path / "pos"
    neg = tmp_path / "neg"
    pos.mkdir()
    neg.mkdir()
    # one positive WSI (tissue everywhere, tumor left half) + mask
    arr = rng.integers(60, 160, (700, 700, 3), dtype=np.uint8)
    Image.fromarray(arr).save(pos / "wsi1.jpg")
    m = np.zeros((700, 700), np.uint8)
    m[:, :350] = 255
    Image.fromarray(m).save(pos / "wsi1_mask.jpg")
    # one negative WSI
    arr2 = rng.integers(60, 160, (700, 700, 3), dtype=np.uint8)
    Image.fromarray(arr2).save(neg / "wsi2.jpg")

    s1 = str(tmp_path / "step1")
    s2 = str(tmp_path / "step2")
    run_step_1(str(pos), str(neg), s1, cropsize=224, crop_overlap=0.1,
               non_bg_threshold=0.5, downsample_list=[1, 2])
    assert os.path.exists(opj(s1, "imgs_from_pos_v1.npy"))
    run_step_2(s1, s2, tumor2patch_ratio_threshold=0.5)
    assert os.path.exists(opj(s2, "final_positive_images.npy"))
    run_step_3(s2)
    pos_pngs = os.listdir(opj(s2, "images", "positive"))
    neg_pngs = os.listdir(opj(s2, "images", "negative"))
    assert pos_pngs and neg_pngs
    assert all("downsample=" in f for f in pos_pngs)


def test_pannuke_classify_and_outputs(tmp_path):
    # synthetic masks: instance-id channels
    n = 6
    msks = np.zeros((n, 32, 32, 6), np.uint8)
    # image 0: 12 neoplastic instances, no others -> malignant
    for k in range(12):
        msks[0, k, :2, 0] = k + 1
    # image 1: zero neoplastic, some inflammatory -> benign
    msks[1, 0, :2, 1] = 1
    # image 2: pure background -> dropped
    # image 3: 2 neoplastic among 30 others -> neither
    for k in range(2):
        msks[3, k, :2, 0] = k + 1
    for k in range(30):
        msks[3, k, 4:6, 1] = k + 1
    # images 4,5: benign with cells
    msks[4, 0, :2, 2] = 1
    msks[5, 0, :2, 4] = 3

    imgs = np.full((n, 32, 32, 3), 120, np.uint8)
    typs = np.array(["Breast", "Colon", "Skin", "Lung", "Breast", "Head_Neck"])

    imgs, msks, typs = drop_pure_background(imgs, msks, typs)
    assert len(imgs) == 5  # image 2 dropped
    counts = count_nuclei(msks)
    tumor_idx, benign_idx = classify(counts, min_tumor_cells=10, tumor_frac=0.3)
    assert tumor_idx.sum() == 1
    assert benign_idx.sum() == 3

    csv_path = write_outputs(
        imgs[tumor_idx], typs[tumor_idx], imgs[benign_idx], typs[benign_idx],
        str(tmp_path),
    )
    df = pd.read_csv(csv_path, index_col=0)
    assert len(df) == 4
    assert df["caption"].str.startswith("An H&E image of").all()
    assert any("malignant breast tissue" in c for c in df["caption"])
    assert any("head neck" in c for c in df["caption"])  # underscore replaced

    # round-trip through the dataset loader split
    train, test = process_PanNuke(csv_path, seed=0, train_ratio=0.5)
    assert set(train.columns) == {
        "image", "label", "label_text", "text_style_0", "text_style_1", "text_style_4"
    }
    assert len(train) + len(test) == 4


def test_wsss4luad_loader(tmp_path):
    d = tmp_path / "data_validation" / "WSSS4LUAD" / "1.training" / "1.training"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i, cls in enumerate(["[1, 0, 0]", "[0, 1, 0]", "[1, 1, 0]", "[0, 0, 1]"]):
        arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}_{cls}.png")
    train, test = process_WSSS4LUAD_binary(str(tmp_path), seed=0, train_ratio=0.5)
    all_df = pd.concat([train, test])
    assert len(all_df) == 4
    assert set(all_df["label"]) == {0, 1}
    assert all_df["text_style_4"].str.endswith("tissue.").all()


def test_resizeimg_center_crop(tmp_path):
    # non-square image: shortest side scales to 224, center crop 224
    arr = np.zeros((300, 600, 3), np.uint8)
    arr[:, 290:310] = 255  # white vertical band at the true center
    p = str(tmp_path / "x.png")
    Image.fromarray(arr).save(p)
    out = resizeimg(p, str(tmp_path), newsize=224)
    res = np.asarray(Image.open(out))
    assert res.shape == (224, 224, 3)
    # the center band must still be centered (the reference's stale-dims crop
    # would shift it out of frame)
    assert res[:, 112].mean() > 200


def test_resize_split(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"in_{i}.png")
        Image.fromarray(rng.integers(0, 256, (100, 160, 3), dtype=np.uint8)).save(p)
        paths.append(p)
    df = pd.DataFrame({"image": paths, "label": [0, 1, 0]})
    out = resize_split(df, str(tmp_path / "out"), nprocs=2)
    assert len(out) == 3
    for p in out["image"]:
        assert np.asarray(Image.open(p)).shape == (224, 224, 3)


def test_kather_reroot(tmp_path):
    # published CSVs carry absolute cluster paths containing 'pathtweets/';
    # the loader must remap them onto root_dir (_dataset_loader.py:33-34)
    from plip_tpu.datagen.dataset_loader import process_Kather_csv

    root = tmp_path / "root"
    d = root / "data_validation" / "Kather_100K_Colon"
    d.mkdir(parents=True)
    cluster = "/oak/stanford/groups/xyz/pathtweets/data_validation/K/ADI-x.tif"
    local = str(root / "local" / "ADI-y.tif")  # no marker: passes through
    for name in ("image_fullpath_text_pair_100K.csv",
                 "image_fullpath_text_pair_7K_validation.csv"):
        pd.DataFrame({
            "image_fullpath": [cluster, local],
            "label": ["ADI", "TUM"],
        }).to_csv(d / name, index=False)

    train, test = process_Kather_csv(str(root))
    assert str(root / "data_validation" / "K" / "ADI-x.tif") in set(train["image"])
    assert local in set(train["image"])
    assert set(train["label_text"]) == {
        "adipose tissue", "colorectal adenocarcinoma epithelium"}
    assert train["text_style_4"].str.startswith("An H&E image patch of").all()

    train_raw, _ = process_Kather_csv(str(root), reroot=False)
    assert cluster in set(train_raw["image"])

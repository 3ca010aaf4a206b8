"""Bulk embedding extraction — rebuild of
`/root/reference/reproducibility/scripts/extract_embedding.py:20-197` without
the hardcoded Stanford paths (extract_embedding.py:124,146 — the dataset CSVs
come from ``$PC_EVALUATION_DATA_ROOT_FOLDER`` instead).

Outputs per dataset under ``{PC_RESULTS_FOLDER}/embeddings/{dataset}``:
raw + L2-normalized image/text ``.npy`` pairs (same filenames as the
reference, extract_embedding.py:189-197), a public CSV manifest, and the
README note. OpenPath-style datasets use the train transform (resize-512 →
224 crops); eval datasets use the standard 224 preprocess
(extract_embedding.py:80-87).
"""

import argparse
import os

import numpy as np

from ..utils.config import load_dotenv_file

opj = os.path.join


def config(argv=None):
    load_dotenv_file(os.environ.get("PC_DOTENV", "../config.env"))
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", default="plip", type=str, choices=["plip", "clip"])
    parser.add_argument("--backbone", default="default", type=str)
    parser.add_argument("--dataset", default="OpenPath", type=str)
    parser.add_argument("--first_resize", default=512, type=int)
    parser.add_argument("--pxsize", default=224, type=int)
    parser.add_argument("--batch-size", default=128, type=int)
    parser.add_argument("--num-workers", default=4, type=int)
    parser.add_argument("--random_seed", default=0, type=int)
    return parser.parse_args(argv)


def extract_embedding(args, dataset_name, df):
    """(image_embeddings, text_embeddings), both unnormalized
    (extract_embedding.py:71-107)."""
    import jax

    from ..api import PLIP
    from ..data.transform import TrainTransform

    np.random.seed(args.random_seed)

    if args.model_name == "plip" and args.backbone not in ("default", "", None):
        model = PLIP(args.backbone)
    else:
        arch = os.environ.get("PC_CLIP_ARCH", "ViT-B/32")
        ckpt = os.environ.get("PLIP_TPU_CHECKPOINT")
        model = PLIP(ckpt if ckpt else f"random:{arch}")

    images = df["image"].values.astype(str)
    if dataset_name == "OpenPath":
        print("Use train_preprocess: first resize to 512, then 224x224 crops.")
        t = TrainTransform(first_resize=args.first_resize, n_px=args.pxsize,
                           seed=args.random_seed)
        from ..data.datasets import ImageDataset
        from ..data.loader import PrefetchLoader
        from ..ops.augment import AugmentConfig, augment_batch
        import jax.numpy as jnp

        ds = ImageDataset(list(images), preprocessing=t)
        loader = PrefetchLoader(ds, args.batch_size, num_workers=args.num_workers,
                                device_put=False)
        key = jax.random.PRNGKey(args.random_seed)
        aug = AugmentConfig(out_size=args.pxsize)
        outs = []
        for batch, n in loader:
            key, sub = jax.random.split(key)
            pixels = augment_batch(sub, jnp.asarray(batch), aug)
            emb = model._encode_images_fn(model.params, pixels)
            outs.append(np.asarray(emb)[:n])
        image_embeddings = np.concatenate(outs)
    else:
        print("Use normal preprocess (224x224 eval pipeline).")
        image_embeddings = model.encode_images(list(images), batch_size=args.batch_size)

    text_embeddings = model.encode_text(
        list(df["caption"].values.astype(str)), batch_size=args.batch_size
    )
    return image_embeddings, text_embeddings


def main(argv=None):
    import pandas as pd

    args = config(argv)
    results_root = os.environ.get("PC_RESULTS_FOLDER", "./results")
    savepath = opj(results_root, "embeddings", args.dataset)
    os.makedirs(savepath, exist_ok=True)

    with open(opj(results_root, "embeddings", "README.md"), "w") as readme_file:
        readme_file.write("# Note\n\n")
        readme_file.write(
            "The image and text embeddings are saved in numpy binary files "
            "(```.npy```). The order of the embeddings corresponds to their "
            "associated ```.csv``` files.\n"
            "Both unnormalized and normalized formats are available for all "
            "embeddings.\n\n"
            "The normalization process was performed using the equation: "
            "```embeddings_norm = embeddings / np.linalg.norm(embeddings, "
            "axis=1, keepdims=True)```.\n"
            "The normalized embeddings were used for linear probing analysis.\n\n"
        )

    data_folder = os.environ["PC_EVALUATION_DATA_ROOT_FOLDER"]
    if args.model_name == "plip" and args.backbone == "default":
        args.backbone = os.environ.get("PC_DEFAULT_BACKBONE", "default")

    if args.dataset == "OpenPath":
        # OpenPath assembly: Twitter + replies + PathLAION CSVs living under
        # the data root (the reference used fixed cluster paths).
        parts = []
        for fname, source in [
            ("T-noQ.csv", "Twitter"),
            ("R-noQ.csv", "Twitter reply"),
            ("L.csv", "PathLAION"),
        ]:
            p = opj(data_folder, fname)
            if not os.path.exists(p):
                continue
            d = pd.read_csv(p)
            d["source"] = source
            d["hashtag"] = (
                [os.path.basename(os.path.dirname(v)) for v in d["image"]]
                if source != "PathLAION"
                else "----"
            )
            d["media ID"] = [os.path.basename(v).split(".")[0] for v in d["image"]]
            parts.append(d)
        if not parts:
            raise FileNotFoundError(
                f"No OpenPath CSVs (T-noQ/R-noQ/L.csv) under {data_folder}"
            )
        df = pd.concat(parts, axis=0)
        cols = [c for c in ["source", "hashtag", "weblink", "id", "media ID", "caption"]
                if c in df.columns]
        df_public = df[cols].reset_index(drop=True)
        df_public.to_csv(opj(savepath, f"df_{len(df_public)}.csv"))
    else:
        df = pd.read_csv(opj(data_folder, f"{args.dataset}.csv"), index_col=0)
        if "text_style_4" in df.columns:
            df = df.rename(columns={"text_style_4": "caption"})
        if args.dataset.startswith("Kather"):
            df["filename"] = [os.path.basename(v) for v in df["image"]]
            df_public = df[["filename", "label", "caption"]].reset_index(drop=True)
        elif args.dataset.startswith("PanNuke") and "text_style_0" in df.columns:
            df_public = df[["text_style_0", "label", "label_text", "caption"]].reset_index(drop=True)
            df_public = df_public.rename(columns={"text_style_0": "tissue"})
            df_public["tissue"] = [
                v.replace("benign ", "").replace("malignant ", "")
                for v in df_public["tissue"]
            ]
            df_public["label"] = df_public["label"].astype(int)
        else:
            keep = [c for c in ["label", "label_text", "caption"] if c in df.columns]
            df_public = df[keep].reset_index(drop=True)
        df_public.to_csv(opj(savepath, f"{args.dataset}.csv"))

    image_embeddings, text_embeddings = extract_embedding(args, args.dataset, df)
    image_norm = image_embeddings / np.linalg.norm(image_embeddings, axis=1, keepdims=True)
    text_norm = text_embeddings / np.linalg.norm(text_embeddings, axis=1, keepdims=True)

    np.save(opj(savepath, f"{args.dataset}_image_embeddings.npy"), image_embeddings)
    np.save(opj(savepath, f"{args.dataset}_text_embeddings.npy"), text_embeddings)
    np.save(opj(savepath, f"{args.dataset}_image_embeddings_normalized.npy"), image_norm)
    np.save(opj(savepath, f"{args.dataset}_embeddings_normalized.npy"), text_norm)
    return savepath


if __name__ == "__main__":
    main()

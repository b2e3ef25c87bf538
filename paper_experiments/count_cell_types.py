"""Count per-class cell instances in annotation arrays → counts table.

Equivalent of /root/reference/paper_experiments/scripts/count_cell_types.py:
each ``--annotations`` entry is a .npy of (H, W, 2) annotations (instance
channel, class channel); the output is a wide train/test counts table at
data/counts.csv (+ .tex). Dataset and split are inferred from the path
exactly as the reference does ("conic" substring → CoNIC vocabulary,
"train" substring → train column).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

from dataset_tools import DATASET_LABELS, UNLABELED_CLASS, count_cell_types


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Count cells in annotations."
    )
    parser.add_argument(
        "--annotations", nargs="+", type=str, required=True,
        help="Paths to (N, H, W, 2) annotation .npy files",
    )
    parser.add_argument("--output_dir", type=str, default="data")
    args = parser.parse_args(argv)

    rows = []
    for path in sorted(args.annotations):
        counts = count_cell_types(np.load(path, allow_pickle=True))
        vocab = next(
            (v for k, v in DATASET_LABELS.items() if k in path),
            {c: f"Class {c}" for c in counts},
        )
        dataset = path.split(os.sep)[-3] if path.count(os.sep) >= 2 else path
        split = "train" if "train" in path else "test"
        for c in sorted(counts):
            rows.append({
                "dataset": dataset,
                "class": c,
                "class_name": (
                    "Unlabeled" if c == UNLABELED_CLASS else vocab[c]
                ),
                "set": split,
                "count": counts[c],
            })

    df = (
        pd.DataFrame(rows)
        .pivot(index=["dataset", "class", "class_name"],
               columns="set", values="count")
        .reset_index()
    )
    for col in ("train", "test"):
        if col not in df:
            df[col] = 0
        df[col] = df[col].fillna(0).astype(int)
    df = df[["dataset", "class", "class_name", "train", "test"]]

    os.makedirs(args.output_dir, exist_ok=True)
    df.to_csv(os.path.join(args.output_dir, "counts.csv"), index=False)
    try:
        df.to_latex(
            os.path.join(args.output_dir, "counts.tex"),
            index=False, multirow=True, escape=False,
        )
    except ImportError:  # pandas>=2 needs jinja2 for to_latex
        pass
    print(df.to_string(index=False))
    return df


if __name__ == "__main__":
    main()

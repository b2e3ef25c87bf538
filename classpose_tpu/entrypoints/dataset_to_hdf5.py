"""``classpose-dataset-to-hdf5`` CLI: convert npy arrays into the HDF5
training format.

Functional equivalent of the reference paper_experiments/dataset_to_hdf5.py:
processes (instance, class) labels into the 5-channel training layout
[instance, class, binary, flow_y, flow_x] (flows via the JAX diffusion),
and caches class_counts / instance_counts / diameters datasets so training
startup is instant (reference dataset.py:313-534 reads these caches).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from classpose_tpu.log import get_logger

logger = get_logger(__name__)


def main(args):
    import h5py

    from classpose_tpu.train.dataset import ClassposeTrainingDataset
    from classpose_tpu.train.train_utils import (
        load_data_arrays,
        process_train_test,
    )

    images, labels = load_data_arrays(
        str(Path(args.data_path) / "images.npy"),
        str(Path(args.data_path) / "labels.npy"),
    )
    tr_d, tr_l, tr_diam, *_ = process_train_test(
        images, labels, min_train_masks=args.min_train_masks
    )
    data = np.stack(tr_d).astype(np.float32)
    labs = np.stack(tr_l).astype(np.float32)

    ds = ClassposeTrainingDataset(data, labs, diameter_array=tr_diam,
                                  augment=False)
    class_counts = ds.class_counts
    instance_counts = ds.instance_counts

    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(out, "w") as f:
        f.create_dataset("images", data=data, chunks=(1,) + data.shape[1:],
                         compression="gzip", compression_opts=2)
        f.create_dataset("labels", data=labs, chunks=(1,) + labs.shape[1:],
                         compression="gzip", compression_opts=2)
        f.create_dataset("class_counts", data=class_counts)
        f.create_dataset("instance_counts", data=instance_counts)
        f.create_dataset("diameters", data=np.asarray(tr_diam))
    logger.info(
        "wrote %s: %d samples, %d classes", out, len(data),
        len(class_counts),
    )


def main_with_args(argv=None):
    p = argparse.ArgumentParser(
        description="Convert npy arrays to the HDF5 training format."
    )
    p.add_argument("--data_path", required=True,
                   help="Directory with images.npy and labels.npy")
    p.add_argument("--output", required=True, help="Output .h5 path")
    p.add_argument("--min_train_masks", type=int, default=5)
    main(p.parse_args(argv))


if __name__ == "__main__":
    main_with_args()

"""Unit tests for the independent zarr/AnnData spec validator — including
negative cases proving it actually rejects spec violations (a validator
that never fails validates nothing)."""

import json
import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from classpose_tpu.io.zarr_spec_check import (
    ZarrSpecError,
    read_array,
    validate_spatialdata_store,
    walk_store,
)
from classpose_tpu.io.zarrlite import ZarrGroup
from classpose_tpu.pipeline.outputs import create_spatialdata_output


def _mini_store(tmp_path, n_cells=3):
    cells = []
    for i in range(n_cells):
        cells.append(
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[i, 0], [i + 1, 0], [i + 1, 1], [i, 1], [i, 0]]
                    ],
                },
                "properties": {
                    "objectType": "annotation",
                    "classification": {"name": f"c{i % 2}",
                                       "color": [1, 2, 3]},
                    "measurements": [
                        {"name": "centroidX", "value": i + 0.5},
                        {"name": "centroidY", "value": 0.5},
                    ],
                },
            }
        )
    dens = pd.DataFrame(
        [
            {"region": "tissue", "cell_class": "c0", "count": 2,
             "density": 1.5},
            {"region": "tissue", "cell_class": "c1", "count": 1,
             "density": 0.5},
        ]
    )
    out = tmp_path / "store.zarr"
    create_spatialdata_output(
        out, cells, None, None, None, dens, {"slide": "mini", "mpp": 0.5}
    )
    return out


def test_validator_passes_conformant_store(tmp_path):
    store = _mini_store(tmp_path)
    summary = validate_spatialdata_store(store)
    assert summary["n_cells"] == 3
    assert summary["tables"] == ["tables/cellular_densities"]
    assert summary["n_arrays"] >= 8


def test_validator_decodes_values_independently(tmp_path):
    store = _mini_store(tmp_path)
    _, arrays = walk_store(store)
    X = arrays["tables/cellular_densities/X"]
    np.testing.assert_allclose(X, [[2, 1.5], [1, 0.5]])
    assert list(arrays["tables/cellular_densities/obs/region"]) == [
        "tissue", "tissue"
    ]
    assert list(arrays["points/cell_centroids/x"]) == [0.5, 1.5, 2.5]


def test_validator_rejects_truncated_chunk(tmp_path):
    store = _mini_store(tmp_path)
    chunk = store / "tables" / "cellular_densities" / "X" / "0.0"
    data = zlib.decompress(chunk.read_bytes())
    chunk.write_bytes(zlib.compress(data[:-8]))
    with pytest.raises(ZarrSpecError, match="bytes"):
        validate_spatialdata_store(store)


def test_validator_rejects_missing_required_field(tmp_path):
    store = _mini_store(tmp_path)
    za = store / "points" / "cell_centroids" / "x" / ".zarray"
    meta = json.loads(za.read_text())
    del meta["fill_value"]
    za.write_text(json.dumps(meta))
    with pytest.raises(ZarrSpecError, match="fill_value"):
        validate_spatialdata_store(store)


def test_validator_rejects_corrupt_vlen_header(tmp_path):
    store = _mini_store(tmp_path)
    arr = store / "points" / "cell_centroids" / "classification"
    buf = zlib.decompress((arr / "0").read_bytes())
    # overstate the item count by one
    (n,) = struct.unpack_from("<I", buf, 0)
    (arr / "0").write_bytes(
        zlib.compress(struct.pack("<I", n + 1) + buf[4:])
    )
    with pytest.raises(ZarrSpecError):
        validate_spatialdata_store(store)


def test_validator_rejects_centroid_count_mismatch(tmp_path):
    store = _mini_store(tmp_path)
    # rewrite x with one fewer point than the shapes blob claims
    pts = ZarrGroup(store).group("points").group("cell_centroids")
    pts.array("x", np.array([0.5, 1.5]))
    with pytest.raises(ZarrSpecError, match="count-mismatch"):
        validate_spatialdata_store(store)


def test_validator_rejects_anndata_missing_mapping_group(tmp_path):
    store = _mini_store(tmp_path)
    import shutil

    shutil.rmtree(store / "tables" / "cellular_densities" / "uns")
    with pytest.raises(ZarrSpecError, match="uns"):
        validate_spatialdata_store(store)


def test_read_array_edge_chunk_padding(tmp_path):
    """Edge chunks must be stored padded to the full chunk shape — the
    validator reassembles from the spec rules and must recover exactly."""
    g = ZarrGroup(tmp_path / "s.zarr")
    data = np.arange(10 * 7, dtype=np.int32).reshape(10, 7)
    g.array("a", data, chunks=(4, 4))
    got = read_array(tmp_path / "s.zarr" / "a")
    np.testing.assert_array_equal(got, data)

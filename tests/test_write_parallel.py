"""Parallel GeoJSON serialization (CLASSPOSE_WRITE_WORKERS) is
byte-identical to the serial writer — the projection in
tools/bench_slide.py divides export time by write workers, so the
parallel path must be a pure speedup, not a format variant."""

import json

import numpy as np

from classpose_tpu.pipeline.outputs import write_feature_collection


def _features(n: int) -> list[dict]:
    rng = np.random.default_rng(0)
    feats = []
    for i in range(n):
        ring = rng.uniform(0, 4096, size=(7, 2)).round(2).tolist()
        ring.append(ring[0])
        feats.append(
            {
                "type": "Feature",
                "id": f"cell-{i}",
                "geometry": {"type": "Polygon", "coordinates": [ring]},
                "properties": {
                    "objectType": "annotation",
                    "isLocked": False,
                    "classification": {"name": f"c{i % 5}",
                                       "color": [i % 255, 0, 0]},
                    "measurements": [
                        {"name": "area", "value": float(i)},
                        {"name": "centroidX", "value": float(i) + 0.5},
                    ],
                },
            }
        )
    return feats


def test_parallel_write_byte_identical(tmp_path):
    feats = _features(5003)  # >2 batches, non-multiple of batch size
    serial = tmp_path / "serial.geojson"
    par = tmp_path / "parallel.geojson"
    write_feature_collection(feats, serial, workers=0)
    write_feature_collection(feats, par, workers=3)
    assert serial.read_bytes() == par.read_bytes()
    fc = json.loads(par.read_text())
    assert fc["type"] == "FeatureCollection"
    assert len(fc["features"]) == 5003
    assert fc["features"][2500]["id"] == "cell-2500"


def test_parallel_write_single_batch(tmp_path):
    feats = _features(5)  # one batch: pool path must degrade cleanly
    serial = tmp_path / "s.geojson"
    par = tmp_path / "p.geojson"
    write_feature_collection(feats, serial, workers=0)
    write_feature_collection(feats, par, workers=4)
    assert serial.read_bytes() == par.read_bytes()


def test_empty_feature_collection(tmp_path):
    p = tmp_path / "empty.geojson"
    write_feature_collection([], p, workers=2)
    assert json.loads(p.read_text()) == {
        "type": "FeatureCollection",
        "features": [],
    }

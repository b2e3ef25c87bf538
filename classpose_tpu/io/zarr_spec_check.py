"""Independent zarr-v2 / AnnData conformance validator.

Validates a store against the PUBLISHED on-disk specifications —
deliberately NOT by importing :mod:`classpose_tpu.io.zarrlite` (whose
reader shares code with the writer and would self-validate):

- zarr v2 storage spec (zarr-specs v2: ``.zgroup``/``.zarray``/
  ``.zattrs`` JSON documents, required ``.zarray`` fields, C/F order,
  dot-separated chunk keys, edge chunks padded to full chunk shape);
- numcodecs ``VLenUTF8`` buffer format (header: uint32-LE item count,
  then per item uint32-LE byte length + UTF-8 payload);
- AnnData on-disk schema 0.1.0 (``encoding-type``/``encoding-version``
  attrs; ``X``; ``obs``/``var`` dataframe groups with ``_index`` +
  ``column-order`` and equal-length columns; ``obsm``/``varm``/``obsp``/
  ``varp``/``layers``/``uns`` dict groups) as written by anndata's zarr
  backend and consumed by spatialdata's TableModel (reference
  outputs.py:322-441).

Every check raises :class:`ZarrSpecError` with the offending path, so a
violation is diagnosable; :func:`validate_spatialdata_store` returns a
summary dict for reporting.
"""

from __future__ import annotations

import json
import struct
import zlib
from pathlib import Path

import numpy as np


class ZarrSpecError(AssertionError):
    pass


def _fail(path, msg):
    raise ZarrSpecError(f"{path}: {msg}")


def _read_json(p: Path):
    try:
        return json.loads(p.read_text())
    except Exception as exc:  # noqa: BLE001
        _fail(p, f"not valid JSON ({exc})")


def _decode_vlen_utf8(buf: bytes, path) -> list[str]:
    """numcodecs VLenUTF8 decode, reimplemented from the format spec."""
    if len(buf) < 4:
        _fail(path, "vlen-utf8 buffer shorter than its header")
    (n,) = struct.unpack_from("<I", buf, 0)
    off = 4
    out = []
    for i in range(n):
        if off + 4 > len(buf):
            _fail(path, f"vlen-utf8 item {i}: truncated length header")
        (ln,) = struct.unpack_from("<I", buf, off)
        off += 4
        if off + ln > len(buf):
            _fail(path, f"vlen-utf8 item {i}: payload overruns buffer")
        out.append(buf[off:off + ln].decode("utf-8"))
        off += ln
    if off != len(buf):
        _fail(path, f"{len(buf) - off} trailing bytes after vlen items")
    return out


_ZARRAY_REQUIRED = (
    "zarr_format", "shape", "chunks", "dtype", "compressor",
    "fill_value", "order", "filters",
)


def read_array(adir: Path):
    """Spec-driven array read: returns a numpy array (object dtype for
    vlen-utf8 strings). Raises ZarrSpecError on any violation."""
    zarray = adir / ".zarray"
    if not zarray.is_file():
        _fail(adir, "array directory without .zarray")
    meta = _read_json(zarray)
    for k in _ZARRAY_REQUIRED:
        if k not in meta:
            _fail(zarray, f"missing required .zarray field {k!r}")
    if meta["zarr_format"] != 2:
        _fail(zarray, f"zarr_format {meta['zarr_format']} != 2")
    if meta["order"] not in ("C", "F"):
        _fail(zarray, f"order {meta['order']!r} not in ('C', 'F')")
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    if len(shape) != len(chunks):
        _fail(zarray, "shape/chunks rank mismatch")
    comp = meta["compressor"]
    if comp is not None and comp.get("id") != "zlib":
        _fail(zarray, f"unsupported compressor {comp!r} (spec check "
                      "implements zlib + none only)")

    filters = meta["filters"] or []
    is_vlen = any(f.get("id") == "vlen-utf8" for f in filters)
    if is_vlen:
        if meta["dtype"] != "|O":
            _fail(zarray, "vlen-utf8 filter requires dtype '|O'")
        if len([f for f in filters if f.get("id") != "vlen-utf8"]):
            _fail(zarray, f"unsupported extra filters {filters!r}")
    else:
        if filters:
            _fail(zarray, f"unsupported filters {filters!r}")
        try:
            dt = np.dtype(meta["dtype"])
        except TypeError:
            _fail(zarray, f"dtype {meta['dtype']!r} not a valid zarr v2 "
                          "dtype string")
        if dt.byteorder == "|" and dt.itemsize > 1:
            _fail(zarray, "multi-byte dtype must declare endianness")

    # enumerate expected chunk keys (dot-separated grid indices)
    ngrid = [max(1, -(-s // c)) for s, c in zip(shape, chunks)] or [1]
    import itertools

    blocks = {}
    expected = set()
    for idx in itertools.product(*[range(n) for n in ngrid]):
        key = ".".join(str(i) for i in idx) if shape else "0"
        expected.add(key)
        cpath = adir / key
        if not cpath.is_file():
            if meta["fill_value"] is None:
                _fail(adir, f"chunk {key} missing with fill_value null")
            continue  # spec allows missing chunks == fill_value
        raw = cpath.read_bytes()
        buf = zlib.decompress(raw) if comp is not None else raw
        if is_vlen:
            items = _decode_vlen_utf8(buf, cpath)
            nchunk = int(np.prod(chunks)) if chunks else 1
            if len(items) != nchunk:
                _fail(cpath, f"vlen chunk holds {len(items)} items, "
                             f"chunk shape needs {nchunk} (edge chunks "
                             "must be padded to full chunk shape)")
            blocks[idx] = np.array(items, object).reshape(chunks)
        else:
            nbytes = int(np.prod(chunks)) * dt.itemsize
            if len(buf) != nbytes:
                _fail(cpath, f"chunk decodes to {len(buf)} bytes, spec "
                             f"requires full padded chunks = {nbytes}")
            blocks[idx] = np.frombuffer(buf, dt).reshape(
                chunks, order=meta["order"]
            )

    # stray chunk files?
    for f in adir.iterdir():
        if f.name.startswith("."):
            continue
        if f.name not in expected:
            _fail(f, "unexpected file in array directory")

    if not shape:
        return blocks.get((), np.zeros((), np.float64))[()]
    full = np.full(
        [n * c for n, c in zip(ngrid, chunks)],
        meta["fill_value"] if meta["fill_value"] is not None else 0,
        object if is_vlen else dt,
    )
    for idx, blk in blocks.items():
        sl = tuple(
            slice(i * c, (i + 1) * c) for i, c in zip(idx, chunks)
        )
        full[sl] = blk
    return full[tuple(slice(0, s) for s in shape)]


def walk_store(root: Path):
    """Validate every node under ``root``; returns
    (groups: {relpath: attrs}, arrays: {relpath: ndarray})."""
    root = Path(root)
    groups, arrays = {}, {}

    def visit(d: Path, rel: str):
        zg, za = d / ".zgroup", d / ".zarray"
        if za.is_file():
            if zg.is_file():
                _fail(d, "node is both group and array")
            arrays[rel] = read_array(d)
            attrs = d / ".zattrs"
            if attrs.is_file():
                _read_json(attrs)
            return
        if not zg.is_file():
            _fail(d, "directory is neither a zarr group nor an array")
        g = _read_json(zg)
        if g != {"zarr_format": 2}:
            _fail(zg, f"bad .zgroup content {g!r}")
        attrs = d / ".zattrs"
        groups[rel] = _read_json(attrs) if attrs.is_file() else {}
        for sub in sorted(d.iterdir()):
            if sub.is_dir():
                visit(sub, f"{rel}/{sub.name}" if rel else sub.name)

    visit(root, "")
    return groups, arrays


def validate_anndata_group(groups: dict, arrays: dict, rel: str):
    """AnnData on-disk 0.1.0 structural checks for the table at ``rel``."""
    attrs = groups.get(rel)
    if attrs is None:
        _fail(rel, "anndata table group missing")
    if attrs.get("encoding-type") != "anndata":
        _fail(rel, f"encoding-type {attrs.get('encoding-type')!r} != "
                   "'anndata'")
    if not str(attrs.get("encoding-version", "")).startswith("0.1"):
        _fail(rel, "encoding-version not 0.1.x")
    X = arrays.get(f"{rel}/X")
    if X is None:
        _fail(rel, "missing X array")
    n_obs, n_var = X.shape
    for frame, n in (("obs", n_obs), ("var", n_var)):
        fattrs = groups.get(f"{rel}/{frame}")
        if fattrs is None:
            _fail(rel, f"missing {frame} dataframe group")
        if fattrs.get("encoding-type") != "dataframe":
            _fail(rel, f"{frame} encoding-type != 'dataframe'")
        idx_col = fattrs.get("_index")
        if not idx_col:
            _fail(rel, f"{frame} missing '_index' attr")
        idx = arrays.get(f"{rel}/{frame}/{idx_col}")
        if idx is None or len(idx) != n:
            _fail(rel, f"{frame}/{idx_col} index missing or wrong length")
        for col in fattrs.get("column-order", []):
            arr = arrays.get(f"{rel}/{frame}/{col}")
            if arr is None or len(arr) != n:
                _fail(rel, f"{frame} column {col!r} missing or wrong "
                           f"length (want {n})")
    for sub in ("obsm", "varm", "obsp", "varp", "layers", "uns"):
        if f"{rel}/{sub}" not in groups:
            _fail(rel, f"missing mapping group {sub!r}")


def validate_spatialdata_store(path: str | Path) -> dict:
    """Full conformance pass over a pipeline SpatialData store; returns a
    summary {n_groups, n_arrays, n_cells, tables: [...]}."""
    root = Path(path)
    groups, arrays = walk_store(root)
    if "" not in groups:
        _fail(root, "store root is not a zarr group")
    meta = groups[""].get("metadata")
    if not isinstance(meta, dict):
        _fail(root, "root .zattrs missing 'metadata' dict")

    n_cells = 0
    if "shapes/cell_contours" in groups or \
            "shapes/cell_contours/geojson" in arrays:
        blob = arrays.get("shapes/cell_contours/geojson")
        if blob is None:
            _fail(root, "cell_contours group without geojson array")
        fc = json.loads(blob.ravel()[0])
        if fc.get("type") != "FeatureCollection":
            _fail(root, "cell_contours blob is not a FeatureCollection")
        n_cells = len(fc["features"])
        # centroids must exist and agree in count with the shapes
        x = arrays.get("points/cell_centroids/x")
        y = arrays.get("points/cell_centroids/y")
        if x is None or y is None or len(x) != n_cells or \
                len(y) != n_cells:
            _fail(root, "cell centroid points missing or count-mismatched "
                        f"(shapes {n_cells})")

    tables = [
        rel for rel, a in groups.items()
        if a.get("encoding-type") == "anndata"
    ]
    for rel in tables:
        validate_anndata_group(groups, arrays, rel)
    return {
        "n_groups": len(groups),
        "n_arrays": len(arrays),
        "n_cells": n_cells,
        "tables": tables,
    }

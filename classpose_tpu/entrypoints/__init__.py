"""Console entrypoints (CLI contract preserved from the reference —
the QuPath extension shells out to ``python -m
classpose.entrypoints.predict_wsi`` with these exact flags)."""

"""QuPath extension ↔ CLI contract tests (no JVM in this environment, so
the contract is checked at the source level): the Java action must
assemble exactly the reference extension's flag list (reference
ClassposePredictWSIAction.java:380-438), every flag it passes must exist
in our argparse surface, and the import filename conventions must match
the Python templates."""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
EXT = REPO / "qupath-extension-classpose-tpu" / "src" / "main" / "java" / \
    "qupath" / "ext" / "classpose"

# the exact flag list the reference extension assembles
REFERENCE_FLAGS = {
    "--model_config",
    "--slide_path",
    "--tissue_detection_model_path",
    "--artefact_detection_model_path",
    "--output_folder",
    "--output_type",
    "--roi_geojson",
    "--tta",
    "--precision",
    "--device",
    "--batch_size",
    "--tile_size",
    "--overlap",
    "--min_area",
}


def _java_flags(path: Path) -> set[str]:
    return set(re.findall(r'"(--[a-z_]+)"', path.read_text()))


def test_predict_action_assembles_reference_flag_list():
    flags = _java_flags(EXT / "actions" / "PredictWSIAction.java")
    missing = REFERENCE_FLAGS - flags
    assert not missing, f"action misses reference flags: {missing}"


def test_all_java_flags_exist_in_cli_parser():
    from classpose_tpu.entrypoints.predict_wsi import build_parser

    parser_flags = {
        opt for action in build_parser()._actions
        for opt in action.option_strings
    }
    flags = _java_flags(EXT / "actions" / "PredictWSIAction.java")
    unknown = flags - parser_flags
    assert not unknown, f"Java passes flags the CLI does not accept: {unknown}"


def test_import_conventions_match_python_templates():
    from classpose_tpu.utils import get_geojson_output_filename

    java = (EXT / "util" / "ImportConventions.java").read_text()
    for kind in ("cell_contours", "cell_centroids", "tissue_contours",
                 "artefact_contours"):
        expected = get_geojson_output_filename(kind, "BASE")
        suffix = expected.replace("BASE", "")
        assert f'"{suffix}"' in java, (kind, suffix)


def test_runner_has_reference_process_management():
    """PATH extension, interpreter resolution, stderr separation and
    forced kill — the reference PythonRunner behaviors
    (py/PythonRunner.java:36-150)."""
    src = (EXT / "py" / "PythonRunner.java").read_text()
    for needle in ("extendPath", "findOnPath", "destroyForcibly",
                   "getErrorStream", "redirectErrorStream(false)"):
        assert needle in src, needle


def test_stub_compile_inputs_exist():
    ext_root = EXT.parents[3]
    assert (ext_root.parents[1] / "compile_offline.sh").exists()
    stubs = ext_root.parents[1] / "stubs"
    # every qupath.lib import in our sources has a vendored stub
    imports = set()
    for f in EXT.rglob("*.java"):
        imports |= set(re.findall(r"import (qupath\.lib\.[\w.]+);",
                                  f.read_text()))
    for imp in imports:
        rel = Path(*imp.split(".")).with_suffix(".java")
        assert (stubs / rel).exists(), f"missing stub for {imp}"

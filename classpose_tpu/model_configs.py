"""Model configuration registry (pydantic) + YAML loader + download hooks.

Parity target: reference model_configs.py:20-177 — six built-in configs
(conic/consep/glysac/monusac/nucls/puma) with per-model training MPP and cell
type label lists, ``CLASSPOSE_MODEL_DIR`` env override, YAML file loading, and
URL/HuggingFace weight download. Weights for the TPU build are JAX pytree
checkpoints (``.npz``/orbax) converted from the published torch ``.pt`` files
via :mod:`classpose_tpu.nn.convert`; a ``.pt`` path is accepted and converted
on the fly when torch is available.
"""

from __future__ import annotations

import os
from pathlib import Path

import yaml
from pydantic import BaseModel

from classpose_tpu.log import get_logger
from classpose_tpu.utils import download_if_unavailable

logger = get_logger(__name__)

HOME = Path.home()
ROOT_MODEL_DIR = Path(os.getenv("CLASSPOSE_MODEL_DIR", HOME / ".classpose_models"))
REPO_ID = "classpose/classpose"

# Built-in model registry: (training MPP, cell-type labels). These values
# are the published model contract (per-model training resolution and label
# order) and must match the upstream releases exactly.
_BUILTIN_MODELS: dict[str, tuple[float, tuple[str, ...]]] = {
    "conic": (0.5, (
        "Neutrophil", "Epithelial", "Lymphocyte", "Plasma cell",
        "Eosinophil", "Connective",
    )),
    "consep": (0.25, (
        "Other", "Inflammatory", "Healthy epithelial",
        "Malignant epithelial", "Stroma", "Muscle",
    )),
    "glysac": (0.25, ("Other", "Lymphocyte", "Epithelial", "Ambiguous")),
    "monusac": (0.25, (
        "Epithelial", "Lymphocyte", "Macrophage", "Neutrophil",
    )),
    "nucls": (0.2, (
        "Tumor", "Stroma", "Lymphocyte", "Plasma cell", "Macrophage",
        "Other",
    )),
    "puma": (0.22, (
        "Apoptosis", "Tumor", "Endothelial", "Stroma", "Lymphocyte",
        "Histocyte", "Epithelial", "Melanophage", "Other",
    )),
}


def _builtin(name: str, mpp: float, cell_types: tuple[str, ...]) -> dict:
    return {
        "path": str(ROOT_MODEL_DIR / f"{name}.pt"),
        "mpp": mpp,
        "url": None,
        "hf": {"repo_id": REPO_ID, "filename": f"{name}.pt"},
        "cell_types": list(cell_types),
    }


DEFAULT_MODEL_CONFIGS: dict[str, dict] = {
    name: _builtin(name, mpp, types)
    for name, (mpp, types) in _BUILTIN_MODELS.items()
}


class HuggingFaceConfig(BaseModel):
    repo_id: str
    filename: str


class ModelConfig(BaseModel):
    """Classpose model configuration (reference model_configs.py:121-148)."""

    path: str
    mpp: float
    url: str | None = None
    hf: HuggingFaceConfig | None = None
    cell_types: list[str]

    @staticmethod
    def load_from_yaml(path: str) -> "ModelConfig":
        logger.info(f"Loading model config from {path}")
        with open(path) as o:
            config = yaml.safe_load(o)
        if "hf" in config and config["hf"] is not None:
            config["hf"] = HuggingFaceConfig(**config["hf"])
        return ModelConfig(**config)

    def download_if_necessary(self) -> None:
        if Path(self.path).exists():
            logger.info("Model weights already in %s", self.path)
            return
        logger.info("Downloading model weights to %s", self.path)
        if self.url is not None:
            download_if_unavailable(self.path, self.url)
        elif self.hf is not None:
            try:
                from huggingface_hub import hf_hub_download
            except ImportError as e:  # pragma: no cover
                raise RuntimeError(
                    "huggingface_hub is required to download model weights; "
                    f"place the weights manually at {self.path}"
                ) from e
            hf_token = os.getenv("HF_TOKEN", None)
            local_dir = str(Path(self.path).parent)
            kwargs = dict(
                repo_id=self.hf.repo_id,
                filename=self.hf.filename,
                local_dir=local_dir,
            )
            if hf_token is not None:
                kwargs["token"] = hf_token
            hf_hub_download(**kwargs)
        else:
            raise FileNotFoundError(
                f"Model weights not found at {self.path} and no download "
                "source is configured."
            )


def resolve_model_config(name_or_path: str) -> ModelConfig:
    """Resolve a built-in config name or a YAML file path into a ModelConfig."""
    if name_or_path in DEFAULT_MODEL_CONFIGS:
        return ModelConfig(**DEFAULT_MODEL_CONFIGS[name_or_path])
    if os.path.exists(name_or_path):
        return ModelConfig.load_from_yaml(name_or_path)
    raise ValueError(
        f"Unknown model config '{name_or_path}'. Built-ins: "
        f"{sorted(DEFAULT_MODEL_CONFIGS)} or pass a YAML path."
    )

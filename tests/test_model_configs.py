"""ModelConfig download plumbing (reference model_configs.py:121-177).

The real weights are network-gated; these tests exercise every branch of
``ModelConfig.download_if_necessary`` against mocks so the dispatch logic
(url vs HF hub vs no-source, token forwarding, local-dir placement) is
executed rather than merely present.
"""

import sys
import types

import pytest

from classpose_tpu import model_configs
from classpose_tpu.model_configs import (
    DEFAULT_MODEL_CONFIGS,
    HuggingFaceConfig,
    ModelConfig,
    resolve_model_config,
)


def _cfg(tmp_path, **kw):
    base = dict(
        path=str(tmp_path / "m.pt"), mpp=0.5, cell_types=["a", "b"]
    )
    base.update(kw)
    return ModelConfig(**base)


def test_existing_path_short_circuits(tmp_path, monkeypatch):
    cfg = _cfg(tmp_path)
    (tmp_path / "m.pt").write_bytes(b"x")

    def boom(*a, **k):
        raise AssertionError("must not download when weights exist")

    monkeypatch.setattr(model_configs, "download_if_unavailable", boom)
    cfg.download_if_necessary()


def test_url_branch_calls_streaming_download(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setattr(
        model_configs,
        "download_if_unavailable",
        lambda path, url: calls.append((path, url)),
    )
    cfg = _cfg(tmp_path, url="https://zenodo.example/m.pt")
    cfg.download_if_necessary()
    assert calls == [(cfg.path, "https://zenodo.example/m.pt")]


@pytest.mark.parametrize("with_token", [False, True])
def test_hf_branch_forwards_repo_and_token(
    tmp_path, monkeypatch, with_token
):
    seen = {}
    fake = types.ModuleType("huggingface_hub")
    fake.hf_hub_download = lambda **kw: seen.update(kw)
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)
    if with_token:
        monkeypatch.setenv("HF_TOKEN", "tok123")
    else:
        monkeypatch.delenv("HF_TOKEN", raising=False)

    cfg = _cfg(
        tmp_path,
        hf=HuggingFaceConfig(repo_id="org/classpose", filename="m.pt"),
    )
    cfg.download_if_necessary()
    assert seen["repo_id"] == "org/classpose"
    assert seen["filename"] == "m.pt"
    assert seen["local_dir"] == str(tmp_path)
    assert seen.get("token") == ("tok123" if with_token else None)


def test_no_source_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="no download"):
        _cfg(tmp_path).download_if_necessary()


def test_builtin_configs_resolve_with_hf_source():
    for name in DEFAULT_MODEL_CONFIGS:
        cfg = resolve_model_config(name)
        assert cfg.hf is not None and cfg.hf.filename == f"{name}.pt"
        assert cfg.mpp > 0 and len(cfg.cell_types) >= 4

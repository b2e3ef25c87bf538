"""Weight conversion: PyTorch Classpose/Cellpose-SAM checkpoints → JAX params.

The published model weights (cpsam + the six classpose configs,
reference model_configs.py:23-109) are torch state dicts for
``ClassTransformer``; this module maps them onto the flax parameter tree of
:class:`classpose_tpu.nn.ClassTransformer`, including:

- ``infer_structure``-style auto-detection of the class-head kind and class
  count from the checkpoint (mirror of reference predict_wsi.py:1377-1419:
  UNet head iff ``out_class.encoder_blocks*`` keys exist; n_classes from
  the W3 shape);
- verification that the W2/W3 readout kernels are the frozen identity
  pixel-shuffle (the JAX net implements them as a free reshape; a
  non-identity kernel would need the conv-transpose path and is rejected
  loudly);
- a native ``.npz`` flat-key format for converted weights so torch is not
  required at inference time.
"""

from __future__ import annotations

import numpy as np

from classpose_tpu.log import get_logger

logger = get_logger(__name__)


# ---------------------------------------------------------------- flat npz io

def flatten_params(tree, prefix="") -> dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_params(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(params: dict, path: str, cfg=None) -> None:
    """Save a flax param tree as a flat .npz (native checkpoint format).

    When ``cfg`` (a ClassTransformerConfig) is given, its fields are
    embedded as a ``__meta__`` JSON blob, making the checkpoint
    self-describing (architecture reconstructable without flags)."""
    flat = flatten_params(params)
    if cfg is not None:
        import dataclasses
        import json

        meta = (
            dict(cfg) if isinstance(cfg, dict)
            else dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg)
            else dict(cfg.__dict__)
        )
        for k, v in list(meta.items()):
            if isinstance(v, tuple):
                meta[k] = list(v)
        flat["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), np.uint8
        )
    np.savez_compressed(path, **flat)


def load_npz_params(path: str) -> dict:
    params, _ = load_npz_checkpoint(path)
    return params


def load_npz_checkpoint(path: str) -> tuple[dict, dict | None]:
    """Load (params, meta|None) from a native .npz checkpoint."""
    import json

    with np.load(path) as z:
        meta = None
        flat = {}
        for k in z.files:
            if k == "__meta__":
                meta = json.loads(bytes(z[k]).decode())
            else:
                flat[k] = z[k]
    return unflatten_params(flat), meta


# ------------------------------------------------------------ structure probe

def infer_structure(path: str) -> tuple[list[int] | None, int]:
    """Detect (feature_transformation_structure, n_classes) from a
    checkpoint (torch .pt or native .npz) — reference
    predict_wsi.py:1377-1419 behavior."""
    path = str(path)
    if path.endswith(".npz"):
        _, meta = load_npz_checkpoint(path)
        if meta is not None:
            s = meta.get("feature_transformation_structure")
            return (list(s) if s else None), int(
                meta.get("n_cell_classes", 1)
            )
        with np.load(path) as z:
            keys = list(z.files)
            unet_keys = [k for k in keys if "out_class/encoder_blocks" in k]
            ps = None
            pk = "params/encoder/patch_embed/kernel"
            if pk in keys:
                ps = int(z[pk].shape[0])
            n_classes = 1
            ock = "params/out_class/kernel"
            if ock in keys and ps:
                n_classes = int(z[ock].shape[-1]) // (ps * ps)
            structure = _unet_structure_from_keys(
                keys, "/", zingetter=lambda k: z[k]
            ) if unet_keys else None
            return structure, n_classes
    sd = _torch_load(path)
    keys = list(sd.keys())
    n_classes = int(sd["W3"].shape[1]) if "W3" in sd else 1
    unet = any(k.startswith("out_class.encoder_blocks") for k in keys)
    structure = (
        _unet_structure_from_keys(keys, ".", lambda k: sd[k]) if unet else None
    )
    return structure, n_classes


def infer_config_from_state_dict(sd: dict):
    """Infer the full ClassTransformerConfig from a torch ClassTransformer
    state dict's tensor shapes (patch size, bsize, depth, heads, neck
    width, class-head structure) — used to make converted checkpoints
    self-describing."""
    from classpose_tpu.nn import ClassTransformerConfig

    pe = sd["encoder.patch_embed.proj.weight"]  # (E, 3, ps, ps)
    embed_dim, ps = int(pe.shape[0]), int(pe.shape[2])
    thw = int(sd["encoder.pos_embed"].shape[1])
    head_dim = int(sd["encoder.blocks.0.attn.rel_pos_h"].shape[1])
    depth = 0
    while f"encoder.blocks.{depth}.norm1.weight" in sd:
        depth += 1
    neck_dim = int(sd["encoder.neck.0.weight"].shape[0])
    n_classes = int(sd["W3"].shape[1]) if "W3" in sd else 1
    unet = any(k.startswith("out_class.encoder_blocks") for k in sd)
    structure = (
        _unet_structure_from_keys(list(sd), ".", lambda k: sd[k])
        if unet else None
    )
    return ClassTransformerConfig(
        ps=ps,
        bsize=thw * ps,
        embed_dim=embed_dim,
        depth=depth,
        num_heads=max(1, embed_dim // head_dim),
        neck_dim=neck_dim,
        n_cell_classes=max(n_classes, 1),
        feature_transformation_structure=(
            tuple(structure) if structure else None
        ),
    )


def _unet_structure_from_keys(keys, sep, zingetter) -> list[int]:
    """Recover the UNet n_channels ladder from encoder conv shapes."""
    chans = []
    i = 0
    while True:
        k_t = f"out_class.encoder_blocks.{i}.block.conv1.weight"
        k_n = f"params/out_class/encoder_blocks_{i}/block/conv1/kernel"
        key = k_t if sep == "." else k_n
        if key not in keys:
            break
        w = np.asarray(zingetter(key))
        # torch conv (out, in, kh, kw); flax (kh, kw, in, out)
        chans.append(int(w.shape[0] if sep == "." else w.shape[-1]))
        i += 1
    return chans


def _torch_load(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {
        k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        for k, v in obj.items()
    }


# ------------------------------------------------------------- torch mapping

def _is_identity_pixel_shuffle(W: np.ndarray) -> bool:
    """True iff W (C·ps², C, ps, ps) is eye(C·ps²).reshape(...)."""
    n = W.shape[0]
    return bool(
        np.array_equal(W.reshape(n, n), np.eye(n, dtype=W.dtype))
    )


def _conv_t2f(w: np.ndarray) -> np.ndarray:
    """torch conv weight (out, in, kh, kw) → flax (kh, kw, in, out)."""
    return np.transpose(w, (2, 3, 1, 0))


def _convtrans_t2f(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (in, out, kh, kw) → flax ConvTranspose
    kernel (kh, kw, in, out). flax's ConvTranspose (transpose_kernel=False)
    applies the kernel mirrored relative to torch, so flip the spatial
    taps."""
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def _dense_t2f(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


# Keys a real cellpose/classpose checkpoint carries that have no JAX
# parameter: cellpose's Transformer registers diam_mean/diam_labels as
# requires_grad=False Parameters (training bookkeeping set at
# /root/reference/src/classpose/train.py:440; inference rescale is the
# fixed 30.0/diameter at models.py:634, so the values are not needed on
# the inference path). W2/W3 are verified identity and realized as a
# free pixel-shuffle reshape.
IGNORED_CHECKPOINT_KEYS = frozenset({"diam_mean", "diam_labels", "W2", "W3"})


def convert_state_dict(
    sd: dict[str, np.ndarray],
    depth: int = 24,
    strict_readout: bool = True,
    strict_consume: bool = True,
) -> dict:
    """Map a torch ClassTransformer state dict to the flax param tree.

    With ``strict_consume`` (default), raises if the checkpoint holds any
    tensor this converter did not map (beyond the known non-parameter
    buffers in ``IGNORED_CHECKPOINT_KEYS``) — a real published checkpoint
    with extra/renamed keys must fail loudly, not load a silently
    incomplete network.
    """
    consumed: set[str] = set()
    _sd = sd

    class _Tracking:
        def __getitem__(self, k):
            consumed.add(k)
            return _sd[k]

        def __contains__(self, k):
            return k in _sd

        def keys(self):
            return _sd.keys()

        def __iter__(self):
            return iter(_sd)

    sd = _Tracking()
    p: dict = {"encoder": {}}
    enc = p["encoder"]

    enc["patch_embed"] = {
        "kernel": _conv_t2f(sd["encoder.patch_embed.proj.weight"]),
        "bias": sd["encoder.patch_embed.proj.bias"],
    }
    enc["pos_embed"] = sd["encoder.pos_embed"]

    i = 0
    while f"encoder.blocks.{i}.norm1.weight" in sd:
        b = {}
        pre = f"encoder.blocks.{i}"
        b["norm1"] = {
            "scale": sd[f"{pre}.norm1.weight"],
            "bias": sd[f"{pre}.norm1.bias"],
        }
        b["norm2"] = {
            "scale": sd[f"{pre}.norm2.weight"],
            "bias": sd[f"{pre}.norm2.bias"],
        }
        b["attn"] = {
            "qkv": {
                "kernel": _dense_t2f(sd[f"{pre}.attn.qkv.weight"]),
                "bias": sd[f"{pre}.attn.qkv.bias"],
            },
            "proj": {
                "kernel": _dense_t2f(sd[f"{pre}.attn.proj.weight"]),
                "bias": sd[f"{pre}.attn.proj.bias"],
            },
            "rel_pos_h": sd[f"{pre}.attn.rel_pos_h"],
            "rel_pos_w": sd[f"{pre}.attn.rel_pos_w"],
        }
        b["mlp"] = {
            "lin1": {
                "kernel": _dense_t2f(sd[f"{pre}.mlp.lin1.weight"]),
                "bias": sd[f"{pre}.mlp.lin1.bias"],
            },
            "lin2": {
                "kernel": _dense_t2f(sd[f"{pre}.mlp.lin2.weight"]),
                "bias": sd[f"{pre}.mlp.lin2.bias"],
            },
        }
        enc[f"blocks_{i}"] = b
        i += 1

    enc["neck_conv1"] = {"kernel": _conv_t2f(sd["encoder.neck.0.weight"])}
    enc["neck_ln1"] = {
        "weight": sd["encoder.neck.1.weight"],
        "bias": sd["encoder.neck.1.bias"],
    }
    enc["neck_conv2"] = {"kernel": _conv_t2f(sd["encoder.neck.2.weight"])}
    enc["neck_ln2"] = {
        "weight": sd["encoder.neck.3.weight"],
        "bias": sd["encoder.neck.3.bias"],
    }

    p["out"] = {
        "kernel": _conv_t2f(sd["out.weight"]),
        "bias": sd["out.bias"],
    }

    for name in ("W2", "W3"):
        if name in sd and strict_readout:
            if not _is_identity_pixel_shuffle(sd[name]):
                raise ValueError(
                    f"checkpoint {name} is not the identity pixel-shuffle; "
                    "the JAX readout assumes the frozen identity kernel "
                    "(reference vit_sam.py:139-144)"
                )

    if "out_class.weight" in sd:  # 1x1 conv head
        p["out_class"] = {
            "kernel": _conv_t2f(sd["out_class.weight"]),
            "bias": sd["out_class.bias"],
        }
    elif any(k.startswith("out_class.") for k in sd):
        p["out_class"] = _convert_unet(sd, "out_class.")

    unconsumed = sorted(
        k for k in _sd
        if k not in consumed and k not in IGNORED_CHECKPOINT_KEYS
    )
    if unconsumed:
        msg = (
            f"checkpoint has {len(unconsumed)} tensor(s) the converter "
            f"did not map: {unconsumed[:12]}"
            + (" ..." if len(unconsumed) > 12 else "")
        )
        if strict_consume:
            raise ValueError(msg)
        logger.warning(msg)
    return {"params": p}


def _convert_unet(sd: dict[str, np.ndarray], prefix: str) -> dict:
    out: dict = {}

    def conv(name):
        return {
            "kernel": _conv_t2f(sd[f"{prefix}{name}.weight"]),
            "bias": sd[f"{prefix}{name}.bias"],
        }

    def convT(name):
        return {
            "kernel": _convtrans_t2f(sd[f"{prefix}{name}.weight"]),
            "bias": sd[f"{prefix}{name}.bias"],
        }

    def block(name):
        return {
            "conv1": conv(f"{name}.conv1"),
            "conv2": conv(f"{name}.conv2"),
        }

    i = 0
    while f"{prefix}encoder_blocks.{i}.block.conv1.weight" in sd:
        out[f"encoder_blocks_{i}"] = {
            "block": block(f"encoder_blocks.{i}.block"),
            "downconv": conv(f"encoder_blocks.{i}.downconv"),
        }
        i += 1
    i = 0
    while f"{prefix}decoder_blocks.{i}.block.conv1.weight" in sd:
        out[f"decoder_blocks_{i}"] = {
            "block": block(f"decoder_blocks.{i}.block"),
            "upconv": convT(f"decoder_blocks.{i}.upconv"),
        }
        i += 1
    out["bottleneck_down"] = {
        "block": block("bottleneck_down.block"),
        "downconv": conv("bottleneck_down.downconv"),
    }
    out["bottleneck_up"] = {
        "block": block("bottleneck_up.block"),
        "upconv": convT("bottleneck_up.upconv"),
    }
    return out


# ------------------------------------------------------------------- loading

def load_params(path: str, cfg=None) -> dict:
    """Load network params from .npz (native) or .pt (torch, converted)."""
    path = str(path)
    if path.endswith(".npz"):
        return load_npz_params(path)
    sd = _torch_load(path)
    params = convert_state_dict(sd)
    logger.info(
        "converted torch checkpoint %s (%d tensors)", path, len(sd)
    )
    return params


# ------------------------------------------------------- partial head load

def load_classification_head(params: dict, checkpoint_path: str) -> dict:
    """Graft the ``out`` / ``out_class`` heads from another checkpoint into
    an existing param tree (reference vit_sam.py:251-267
    ``load_classification_head`` — missing keys are allowed).

    Accepts native .npz or torch .pt checkpoints; returns a new tree.
    """
    import copy

    path = str(checkpoint_path)
    if path.endswith(".npz"):
        donor, _ = load_npz_checkpoint(path)
    else:
        donor = convert_state_dict(_torch_load(path))
    out = copy.deepcopy(params)
    for head in ("out", "out_class"):
        sub = donor.get("params", donor).get(head)
        if sub is not None:
            out.setdefault("params", {})[head] = sub
            logger.info("loaded %s head from %s", head, path)
    return out


def save_trainable_params(
    params: dict, path: str, freeze_labels: dict | None = None, cfg=None
) -> None:
    """Save only trainable params (reference save_model(
    save_only_trainable_params=True), vit_sam.py:269-285). ``freeze_labels``
    is a pytree of 'net'/'frozen' labels as built by the trainer's freeze
    masks; frozen leaves are dropped from the flat file."""
    flat = flatten_params(params)
    if freeze_labels:
        labels = flatten_params(freeze_labels)
        flat = {k: v for k, v in flat.items()
                if labels.get(k, "net") != "frozen"}
    tmp = dict(flat)
    if cfg is not None:
        import dataclasses
        import json

        meta = (
            dict(cfg) if isinstance(cfg, dict)
            else dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg)
            else dict(cfg.__dict__)
        )
        for k, v in list(meta.items()):
            if isinstance(v, tuple):
                meta[k] = list(v)
        tmp["__meta__"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    np.savez_compressed(path, **tmp)

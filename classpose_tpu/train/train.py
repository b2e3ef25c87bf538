"""Training loop: ``train_class_seg``.

Functional rebuild of the reference trainer (train.py:356-934) on
JAX/optax with single-controller data parallelism:

- AdamW (wd 0.1) with the reference's hand-built LR schedule
  (train.py:460-469): 10-epoch linear warmup → plateau → step-halving tail
  for long runs;
- three losses (seg / masked CE / focal Tversky) combined by the Kendall
  uncertainty aggregator whose log-variance params train with lr_scale 0.1
  (train.py:478-501); the seg loss is skipped when the seg head is frozen
  (train.py:482-489);
- data parallelism: the global batch is sharded over a ``Mesh`` data axis
  and params are replicated — XLA's psum replaces both DDP gradient
  buckets and the reference's manual aggregator grad sync
  (distributed.py:178-187);
- deterministic sharded sampling (DistributedEpochSampler), sparse
  validation schedule (epoch 5, every 10) or every epoch (train.py:352-353);
- checkpointing: inference weights as native ``.npz`` plus full train-state
  checkpoints (params/opt/aggregator/epoch/losses/config snapshot/PRNG
  keys + host RNG state) under ``checkpoint_last.train`` /
  ``checkpoint_best.train`` with full resume (train.py:284-349,571-602).
"""

from __future__ import annotations

import json
import time
from functools import partial
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from classpose_tpu.log import add_file_handler, get_logger
from classpose_tpu.train.losses import (
    aggregate_losses,
    loss_fn_class,
    loss_fn_seg,
    loss_fn_tversky,
    uncertainty_factors,
)
from classpose_tpu.train.samplers import (
    DistributedEpochSampler,
    SequentialDistributedSampler,
)

train_logger = get_logger(__name__)


def build_lr_schedule(learning_rate: float, n_epochs: int) -> np.ndarray:
    """Reference LR schedule (train.py:460-469)."""
    LR = np.linspace(0, learning_rate, 10)
    LR = np.append(LR, learning_rate * np.ones(max(0, n_epochs - 10)))
    if n_epochs > 300:
        LR = LR[:-100]
        for _ in range(10):
            LR = np.append(LR, LR[-1] / 2 * np.ones(10))
    elif n_epochs > 99:
        LR = LR[:-50]
        for _ in range(10):
            LR = np.append(LR, LR[-1] / 2 * np.ones(5))
    return LR[:n_epochs]


def _freeze_label_tree(params, freeze_backbone=False,
                       freeze_instance_classification=False,
                       freeze_neck=False):
    """Label each param leaf 'net' or 'frozen' following the reference
    freeze helpers (vit_sam.py:199-249)."""

    def label(path):
        names = [str(getattr(p, "key", getattr(p, "name", "")))
                 for p in path]
        # names[0] is "params", names[1] the top-level module; matching by
        # module (not substring) keeps the class-head UNet's own
        # encoder_blocks_* trainable under freeze_backbone
        top = names[1] if len(names) > 1 and names[0] == "params" \
            else names[0]
        if top == "encoder":
            is_neck = any(n.startswith("neck") for n in names)
            if is_neck:
                return "frozen" if freeze_neck else "net"
            return "frozen" if freeze_backbone else "net"
        if top == "out":
            return "frozen" if freeze_instance_classification else "net"
        return "net"

    return jax.tree_util.tree_map_with_path(
        lambda path, _: label(path), params
    )


def make_train_step(
    net,
    tx,
    n_classes: int,
    seg_trainable: bool = True,
    use_uncertainty_weighting: bool = False,
    class_weights=None,
    rdrop: bool = True,
):
    """Build the jitted train step.

    State: (params, log_var, opt_state, key). The step is written for a
    single logical device; sharding the batch over a mesh data axis makes
    XLA insert the gradient psum automatically.
    """
    cw = None if class_weights is None else jnp.asarray(class_weights)

    def loss_fn(trainable, X, lbl, key):
        params, log_var = trainable
        y, _ = net.apply(
            params, X, train=rdrop, rdrop_rng=key
        )
        y = y.astype(jnp.float32)
        losses = []
        seg = jnp.float32(0.0)
        if seg_trainable:
            seg = loss_fn_seg(lbl, y)
            losses.append(seg)
        ce = loss_fn_class(lbl, y, class_weights=cw)
        tv = loss_fn_tversky(lbl, y, n_classes, class_weights=cw)
        losses.extend([ce, tv])
        total = aggregate_losses(
            log_var, jnp.stack(losses), optimise=use_uncertainty_weighting
        )
        return total, (seg, ce, tv)

    # donate the train state: params + optimizer moments alone are ~3.6 GB
    # fp32 for ViT-L; without donation XLA double-buffers them across the
    # step (old and new live simultaneously), which halves the usable HBM
    # for activations. The trainer rebinds every donated argument from the
    # step's outputs, so the old buffers are never touched again.
    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def train_step(params, log_var, opt_state, key, X, lbl):
        key, sub = jax.random.split(key)
        (total, (seg, ce, tv)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )((params, log_var), X, lbl, sub)
        updates, opt_state = tx.update(
            grads, opt_state, (params, log_var)
        )
        params = optax.apply_updates(params, updates[0])
        log_var = optax.apply_updates(log_var, updates[1])
        metrics = {
            "seg": seg, "ce": ce, "tversky": tv, "total": total,
        }
        return params, log_var, opt_state, key, metrics

    return train_step


def _make_optimizer(
    lr_by_step: np.ndarray,
    weight_decay: float,
    params,
    freeze: dict | None,
    use_uncertainty_weighting: bool,
):
    lr_arr = jnp.asarray(lr_by_step, jnp.float32)

    def sched(step):
        return lr_arr[jnp.minimum(step, len(lr_by_step) - 1)]

    def sched_agg(step):
        return sched(step) * 0.1  # lr_scale 0.1 (reference train.py:491-501)

    net_tx = optax.adamw(learning_rate=sched, weight_decay=weight_decay)
    agg_tx = (
        optax.adamw(learning_rate=sched_agg, weight_decay=0.0)
        if use_uncertainty_weighting
        else optax.set_to_zero()
    )
    freeze = freeze or {}
    labels_net = _freeze_label_tree(
        params,
        freeze_backbone=freeze.get("backbone", False),
        freeze_instance_classification=freeze.get(
            "instance_classification", False
        ),
        freeze_neck=freeze.get("neck", False),
    )
    net_combined = optax.multi_transform(
        {"net": net_tx, "frozen": optax.set_to_zero()}, labels_net
    )

    def split_tx(inner_net, inner_agg):
        def init(trainable):
            p, lv = trainable
            return (inner_net.init(p), inner_agg.init(lv))

        def update(grads, state, trainable=None, **kw):
            gp, glv = grads
            p, lv = trainable if trainable is not None else (None, None)
            up, sp = inner_net.update(gp, state[0], p)
            ulv, slv = inner_agg.update(glv, state[1], lv)
            return (up, ulv), (sp, slv)

        return optax.GradientTransformation(init, update)

    return split_tx(net_combined, agg_tx)


def _gather_rng_states(host_rng: np.random.Generator) -> list:
    """Collect every rank's host RNG state (reference _gather_rng_states,
    train.py:274-281) so resume restores per-rank augmentation streams."""
    from classpose_tpu.parallel.distributed import allgather_object

    return allgather_object(host_rng.bit_generator.state)


def _tree_to_host(tree):
    """Materialize a (replicated) jax pytree as host numpy. Every leaf this
    trainer checkpoints — params, log_var, opt_state, key — is replicated
    (P()), so addressable shard 0 is the full value on every process."""

    def leaf(x):
        if isinstance(x, jax.Array):
            return np.asarray(x.addressable_data(0))
        return x

    return jax.tree_util.tree_map(leaf, tree)


def _save_checkpoint(
    path: Path,
    params,
    log_var,
    opt_state,
    key,
    epoch: int,
    best_val_loss: float,
    train_losses,
    test_losses,
    config_snapshot,
    host_rng: np.random.Generator | None,
    rng_state_by_rank: list | None = None,
):
    """Write a full train-state checkpoint.

    Multi-process semantics mirror the reference (train.py:274-311):
    per-rank RNG states are gathered by the caller and rank 0 alone
    writes, then everyone synchronizes — unconditional writes from every
    process would race on the shared path. Orbax handles the single-process
    state (its multihost save is collective, so the multi-process path
    serializes the host-materialized tree directly instead)."""
    from classpose_tpu.parallel.distributed import barrier, is_main_process

    path = Path(path).absolute()
    state = {
        "params": params,
        "log_var": log_var,
        "opt_state": opt_state,
        "key": key,
    }
    if is_main_process():
        if jax.process_count() > 1:
            import pickle

            path.mkdir(parents=True, exist_ok=True)
            with open(path / "state.pkl", "wb") as f:
                pickle.dump(_tree_to_host(state), f)
        else:
            import orbax.checkpoint as ocp

            ckptr = ocp.PyTreeCheckpointer()
            ckptr.save(str(path / "state"), state, force=True)
        meta = {
            "epoch": int(epoch),
            "best_val_loss": float(best_val_loss),
            "train_losses": np.asarray(train_losses).tolist(),
            "test_losses": np.asarray(test_losses).tolist(),
            "config_snapshot": config_snapshot,
        }
        if rng_state_by_rank is not None:
            meta["rng_state_by_rank"] = json.loads(
                json.dumps(rng_state_by_rank)
            )
        if host_rng is not None:
            meta["host_rng_state"] = json.loads(
                json.dumps(host_rng.bit_generator.state)
            )
        (path / "meta.json").write_text(json.dumps(meta, default=str))
    barrier("classpose_checkpoint")


def _load_checkpoint(path: Path, template):
    path = Path(path).absolute()
    if (path / "state.pkl").exists():
        import pickle

        with open(path / "state.pkl", "rb") as f:
            state = pickle.load(f)
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        state = ckptr.restore(str(path / "state"), item=template)
    meta = json.loads((path / "meta.json").read_text())
    return state, meta


def train_class_seg(
    model,
    train_dataset,
    train_probs: np.ndarray | None = None,
    test_dataset=None,
    batch_size: int = 1,
    learning_rate: float = 5e-5,
    n_epochs: int = 100,
    weight_decay: float = 0.1,
    save_path: str | None = None,
    save_every: int = 100,
    save_each: bool = False,
    nimg_per_epoch: int | None = None,
    model_name: str | None = None,
    class_weights=None,
    use_uncertainty_weighting: bool = False,
    validate_every_epoch: bool = False,
    log_file_path: str | None = None,
    random_seed: int = 42,
    resume_checkpoint: str | None = None,
    config_snapshot: dict[str, Any] | None = None,
    freeze: dict | None = None,
    mesh: Mesh | None = None,
    seg_trainable: bool = True,
):
    """Train the class+seg network. ``model`` is a ClassposeModel (or any
    object with .net (flax module), .params, .cfg).

    Returns (model_path, train_losses, test_losses) like the reference.
    """
    if log_file_path is not None:
        add_file_handler(train_logger, log_file_path)

    net = model.net
    params = model.params
    cfg = model.cfg
    n_classes = cfg.n_cell_classes

    # per-rank host RNG (reference seeds seed+rank, train.py:434); the jax
    # PRNG key stays identical on every process — single-controller SPMD
    # requires all processes to trace the same program with the same
    # replicated key
    host_rng = np.random.default_rng(random_seed + jax.process_index())
    key = jax.random.PRNGKey(random_seed)

    if hasattr(train_dataset, "diameter_array"):
        train_dataset.initialise_diameter_array_if_necessary()

    if class_weights is not None:
        class_weights = np.asarray(class_weights, np.float32)

    nimg = len(train_dataset)
    nimg_per_epoch = nimg if nimg_per_epoch is None else nimg_per_epoch

    # ---------------------------------------------------------------- mesh
    if mesh is None:
        devices = jax.devices()
        mesh = Mesh(np.array(devices), ("data",))
    global_batch = batch_size
    if global_batch % mesh.devices.size != 0:
        global_batch = int(
            mesh.devices.size * np.ceil(batch_size / mesh.devices.size)
        )
        train_logger.warning(
            "batch_size %d rounded up to %d for %d devices",
            batch_size, global_batch, mesh.devices.size,
        )
    batch_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    world = jax.process_count()
    if global_batch % world:
        global_batch = int(world * np.ceil(global_batch / world))
    per_rank_batch = global_batch // world

    LR = build_lr_schedule(learning_rate, n_epochs)
    sampler = DistributedEpochSampler(
        dataset_length=nimg,
        train_probs=train_probs,
        nimg_per_epoch=nimg_per_epoch,
        batch_size=per_rank_batch,
        rank=jax.process_index(),
        num_replicas=world,
        seed=random_seed,
    )
    steps_per_epoch = max(1, len(sampler) // per_rank_batch)
    lr_by_step = np.repeat(LR, steps_per_epoch)

    tx = _make_optimizer(
        lr_by_step, weight_decay, params, freeze, use_uncertainty_weighting
    )
    n_active = 2 + int(seg_trainable)
    log_var = jnp.zeros(n_active, jnp.float32)
    opt_state = tx.init((params, log_var))

    train_step = make_train_step(
        net, tx, n_classes,
        seg_trainable=seg_trainable,
        use_uncertainty_weighting=use_uncertainty_weighting,
        class_weights=class_weights,
        rdrop=cfg.rdrop > 0,
    )

    t0 = time.time()
    model_name = model_name or f"classpose_{int(t0)}"
    save_path = Path.cwd() if save_path is None else Path(save_path)
    model_dir = save_path / model_name
    model_dir.mkdir(parents=True, exist_ok=True)
    filename = model_dir / f"{model_name}.npz"
    checkpoint_last = model_dir / "checkpoint_last.train"
    checkpoint_best = model_dir / "checkpoint_best.train"

    train_losses = np.zeros(n_epochs)
    test_losses = np.zeros(n_epochs)
    best_val_loss = np.inf
    start_epoch = 0

    if resume_checkpoint is not None:
        template = {
            "params": params, "log_var": log_var,
            "opt_state": opt_state, "key": key,
        }
        state, meta = _load_checkpoint(Path(resume_checkpoint), template)
        params = state["params"]
        log_var = state["log_var"]
        opt_state = state["opt_state"]
        key = state["key"]
        start_epoch = meta["epoch"] + 1
        best_val_loss = meta["best_val_loss"]
        saved_tl = np.asarray(meta["train_losses"])
        train_losses[: len(saved_tl)] = saved_tl[:n_epochs]
        saved_vl = np.asarray(meta["test_losses"])
        test_losses[: len(saved_vl)] = saved_vl[:n_epochs]
        rng_by_rank = meta.get("rng_state_by_rank")
        if rng_by_rank and jax.process_index() < len(rng_by_rank):
            host_rng.bit_generator.state = rng_by_rank[jax.process_index()]
        elif "host_rng_state" in meta:
            host_rng.bit_generator.state = meta["host_rng_state"]
        if hasattr(train_dataset, "_rng"):
            train_dataset._rng = host_rng
        if start_epoch >= n_epochs:
            raise ValueError(
                f"Resume checkpoint already completed epoch "
                f"{start_epoch - 1}; requested n_epochs={n_epochs} leaves "
                "no training steps to run."
            )
        train_logger.info("Resumed from %s at epoch %d",
                          resume_checkpoint, start_epoch)

    params = jax.device_put(params, replicated)
    log_var = jax.device_put(log_var, replicated)

    val_sampler = (
        SequentialDistributedSampler(
            len(test_dataset),
            rank=jax.process_index(),
            num_replicas=jax.process_count(),
        )
        if test_dataset is not None
        else None
    )

    def _collect(dataset, indices):
        Xs, Ls = [], []
        for i in indices:
            x, l = dataset[int(i)]
            Xs.append(x)
            Ls.append(l)
        return np.stack(Xs), np.stack(Ls)

    def _val_loss(params, log_var, X, lbl):
        y, _ = net.apply(params, jnp.asarray(X))
        y = y.astype(jnp.float32)
        losses = []
        if seg_trainable:
            losses.append(loss_fn_seg(jnp.asarray(lbl), y))
        losses.append(loss_fn_class(jnp.asarray(lbl), y,
                                    class_weights=class_weights))
        losses.append(
            loss_fn_tversky(jnp.asarray(lbl), y, n_classes,
                            class_weights=class_weights)
        )
        return aggregate_losses(
            log_var, jnp.stack(losses), optimise=use_uncertainty_weighting
        )

    val_loss_fn = jax.jit(_val_loss)

    def _should_validate(iepoch):
        return validate_every_epoch or iepoch == 5 or iepoch % 10 == 0

    def _to_global(X_local):
        """Each process contributes its per-rank slice of the global batch
        (the jax-native form of DDP's per-rank batches; losses then reduce
        globally inside the jitted step, so the logged sums are already
        all-reduced — reference train.py:657-668)."""
        if world == 1:
            return jax.device_put(X_local, batch_sharding)
        return jax.make_array_from_process_local_data(
            batch_sharding, X_local
        )

    for iepoch in range(start_epoch, n_epochs):
        sampler.set_epoch(iepoch)
        local = sampler.local_indices()
        sums = {"seg": 0.0, "ce": 0.0, "tversky": 0.0, "total": 0.0}
        count = 0
        for s in range(0, len(local), per_rank_batch):
            idx = local[s : s + per_rank_batch]
            if len(idx) < per_rank_batch:
                break
            X, lbl = _collect(train_dataset, idx)
            X = _to_global(X)
            lbl = _to_global(lbl)
            params, log_var, opt_state, key, metrics = train_step(
                params, log_var, opt_state, key, X, lbl,
            )
            count += global_batch
            # metrics are global-batch means (XLA reduces over the sharded
            # batch axis), identical on every process
            for k in sums:
                sums[k] += float(metrics[k]) * global_batch
        train_losses[iepoch] = sums["total"] / max(count, 1)

        msg = (
            f"Epoch {iepoch}, Segmentation Loss: "
            f"{sums['seg']/max(count,1):.4f}, Classification CE Loss: "
            f"{sums['ce']/max(count,1):.4f}, Tversky Loss: "
            f"{sums['tversky']/max(count,1):.4f}, Total Loss: "
            f"{train_losses[iepoch]:.4f}, LR={LR[iepoch]:.6f}, "
            f"time {time.time()-t0:.2f}s"
        )
        train_logger.info(msg)
        if use_uncertainty_weighting:
            train_logger.info(
                "Uncertainty weights: %s",
                uncertainty_factors(log_var, seg_trainable),
            )

        if _should_validate(iepoch) and test_dataset is not None:
            vtotal, vcount = 0.0, 0
            # each rank validates its contiguous shard on LOCAL devices
            # (global params are host-materialized first — they are
            # replicated, so shard 0 is the full value)
            vparams, vlog_var = (
                (params, log_var) if world == 1
                else _tree_to_host((params, log_var))
            )
            for i in val_sampler.indices():
                x, l = test_dataset[int(i)]
                vtotal += float(
                    val_loss_fn(vparams, vlog_var, x[None], l[None])
                )
                vcount += 1
            # all-reduce the per-rank sums so every process logs (and
            # gates checkpoint-best on) the same global validation loss
            # (reference train.py:657-668)
            from classpose_tpu.parallel.distributed import all_reduce_sum

            reduced = all_reduce_sum(
                np.array([vtotal, float(vcount)], np.float64)
            )
            val = float(reduced[0]) / max(float(reduced[1]), 1.0)
            test_losses[iepoch] = val
            train_logger.info(f"Epoch {iepoch}, Validation Loss: {val:.4f}")
            if val < best_val_loss:
                best_val_loss = val
                _save_checkpoint(
                    checkpoint_best, params, log_var, opt_state, key,
                    iepoch, best_val_loss, train_losses, test_losses,
                    config_snapshot, host_rng, _gather_rng_states(host_rng),
                )

        _save_checkpoint(
            checkpoint_last, params, log_var, opt_state, key, iepoch,
            best_val_loss, train_losses, test_losses, config_snapshot,
            host_rng, _gather_rng_states(host_rng),
        )
        if save_each and iepoch % save_every == 0:
            _save_checkpoint(
                model_dir / f"checkpoint_epoch_{iepoch}.train",
                params, log_var, opt_state, key, iepoch, best_val_loss,
                train_losses, test_losses, config_snapshot, host_rng,
                _gather_rng_states(host_rng),
            )

    from classpose_tpu.nn.convert import save_params
    from classpose_tpu.parallel.distributed import barrier, is_main_process

    model.params = _tree_to_host(params)
    if is_main_process():
        save_params(model.params, str(filename), cfg)
        train_logger.info("saved final weights to %s", filename)
    barrier("classpose_final_weights")
    return str(filename), train_losses, test_losses

"""Multi-process (multi-host) runtime utilities.

JAX-native equivalents of the reference's torch.distributed helpers
(distributed.py:17-193): process-group setup becomes
``jax.distributed.initialize`` (ICI/DCN replaces NCCL), loss-logging
all-reduces become ``process_allgather``/device psums, and the manual
gradient sync for the loss aggregator is unnecessary — GSPMD inserts
gradient collectives from shardings.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np

from classpose_tpu.log import get_logger

logger = get_logger(__name__)

DEFAULT_TIMEOUT_S = 1800  # reference DDP timeout (distributed.py:14)


@dataclasses.dataclass
class DistributedContext:
    """Reference DistributedContext (distributed.py:17-25) equivalent."""

    distributed: bool
    rank: int
    local_rank: int
    world_size: int
    device: object


def setup_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> DistributedContext:
    """Initialize the multi-process JAX runtime when WORLD_SIZE > 1
    (reference setup_distributed, distributed.py:93-136; torchrun-style
    env vars are honored: WORLD_SIZE/RANK/MASTER_ADDR/MASTER_PORT)."""
    world = int(os.getenv("WORLD_SIZE", num_processes or 1))
    # must not call jax.process_count() before initialize — it would
    # initialize the XLA backend and make initialize() itself fail
    already = False
    try:
        from jax._src.distributed import global_state

        already = global_state.client is not None
    except Exception:
        already = jax.process_count() > 1
    if world > 1 and not already:
        coordinator_address = coordinator_address or (
            f"{os.getenv('MASTER_ADDR', 'localhost')}:"
            f"{os.getenv('MASTER_PORT', '12355')}"
        )
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=world,
            process_id=int(os.getenv("RANK", process_id or 0)),
        )
        logger.info(
            "initialized jax.distributed: %d processes via %s",
            jax.process_count(), coordinator_address,
        )
    devices = jax.local_devices()
    return DistributedContext(
        distributed=jax.process_count() > 1,
        rank=jax.process_index(),
        local_rank=0,
        world_size=jax.process_count(),
        device=devices[0] if devices else None,
    )


def is_distributed() -> bool:
    return jax.process_count() > 1


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_reduce_sum(x: np.ndarray) -> np.ndarray:
    """Global sum across processes (reference all_reduce_sum,
    distributed.py:139-155) — host values summed over the global device
    set."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(x))
    return np.sum(gathered, axis=0)


def all_reduce_mean(x: np.ndarray) -> np.ndarray:
    return all_reduce_sum(x) / jax.process_count()


def broadcast_object(obj, src: int = 0):
    """Broadcast a small python object from ``src`` (reference
    broadcast_object, distributed.py:170-175)."""
    if jax.process_count() == 1:
        return obj
    import pickle

    from jax.experimental import multihost_utils

    payload = pickle.dumps(obj) if jax.process_index() == src else b""
    # length-prefixed: one allgather for the size, one for the payload —
    # arbitrary object sizes (a fixed buffer would truncate large configs)
    lens = multihost_utils.process_allgather(
        np.array([len(payload)], np.int64)
    )
    total = int(np.asarray(lens).reshape(jax.process_count(), -1)[src][0])
    arr = np.zeros(max(total, 1), np.uint8)
    if jax.process_index() == src:
        arr[:total] = np.frombuffer(payload, np.uint8)
    gathered = multihost_utils.process_allgather(arr)
    return pickle.loads(bytes(np.asarray(gathered)[src][:total]))


def allgather_object(obj) -> list:
    """Gather one python object per process, ordered by rank (reference
    ``all_gather_object`` used to collect per-rank RNG states before
    checkpointing, train.py:274-281). Length-prefixed, any size."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = pickle.dumps(obj)
    lens = np.asarray(
        multihost_utils.process_allgather(
            np.array([len(payload)], np.int64)
        )
    ).reshape(jax.process_count(), -1)[:, 0]
    m = max(int(lens.max()), 1)
    arr = np.zeros(m, np.uint8)
    arr[: len(payload)] = np.frombuffer(payload, np.uint8)
    g = np.asarray(multihost_utils.process_allgather(arr))
    return [
        pickle.loads(bytes(g[r][: int(lens[r])]))
        for r in range(jax.process_count())
    ]


def barrier(name: str = "barrier") -> None:
    """Block until every process reaches this point (used to keep
    non-writing ranks from racing past a rank-0 checkpoint write)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def unwrap_model(model):
    """No wrapping exists in JAX land (reference unwrap_model strips
    DDP/compile wrappers, distributed.py:176-177)."""
    return model


def seed_worker(worker_id: int, base_seed: int = 0) -> np.random.Generator:
    """Per-worker RNG seeding (reference seed_worker, distributed.py:188+)."""
    return np.random.default_rng(base_seed + jax.process_index() * 10_000
                                 + worker_id)

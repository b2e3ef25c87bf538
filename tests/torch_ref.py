"""Test-facing re-export of the torch replica oracles.

The replicas live in :mod:`classpose_tpu.nn.torch_replica` because the
real-weight parity harness (entrypoints/parity_check.py) uses them at
runtime; tests keep importing them from here.
"""

from classpose_tpu.nn.torch_replica import *  # noqa: F401,F403
from classpose_tpu.nn.torch_replica import (  # noqa: F401
    RefAttention,
    RefBlock,
    RefClassTransformer,
    RefEncoder,
    RefMLP,
    RefSmpDecoderBlock,
    RefSmpUnetPlusPlusTail,
    RefUNet,
    euler_oracle,
    randomize_bn_stats,
)

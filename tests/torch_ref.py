"""Test-facing re-export of the PyTorch parity oracle.

The oracle models moved into the package (`r3m_tpu.torch_oracle`) so the
`python -m r3m_tpu.verify_parity` CLI can use them too; tests keep
importing from here. `torch_resnet` here pins the hand-rolled oracle
(prefer_torchvision=False) so test numerics don't change if a future
environment adds torchvision.
"""

import functools

from r3m_tpu.torch_oracle import (  # noqa: F401
    BasicBlock,
    Bottleneck,
    TorchLanguageReward,
    TorchResNet,
    conv1x1,
    conv3x3,
)
from r3m_tpu.torch_oracle import torch_resnet as _torch_resnet

torch_resnet = functools.partial(_torch_resnet, prefer_torchvision=False)

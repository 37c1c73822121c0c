"""Generate tests/data/torchvision_resnet_manifest.json.

The manifest is the key -> shape table of torchvision's resnet18/34/50
``state_dict()`` — the exact serialization layout the reference's published
snapshots use (``/root/reference/r3m/__init__.py:73`` loads a
torchvision-backed state dict; ``models_r3m.py:44-52`` builds the modules).
The parity tests assert both the hand-rolled torch oracle
(``r3m_tpu.torch_oracle.TorchResNet``) and the native exporter
(``r3m_tpu.convert.export_resnet``) reproduce it exactly, so a naming or
shape divergence from real torchvision cannot hide behind the oracle.

When torchvision IS importable this script emits the ground truth from the
real modules. In the offline image it falls back to a from-first-principles
construction of the published architecture (He et al. 2015 table 1 as
shipped by torchvision: stem conv7x7/64, stages [64,128,256,512], basic
blocks for 18/34, bottleneck x4 for 50, fc 1000) — written independently of
r3m_tpu so the vendored file is not circular with the code under test.

Usage: python scripts/gen_tv_manifest.py [--out tests/data/...json]
"""

from __future__ import annotations

import argparse
import json
import os

STAGE_PLANES = (64, 128, 256, 512)
LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}
BOTTLENECK = {18: False, 34: False, 50: True}


def _bn(sd, key, c):
    sd[f"{key}.weight"] = [c]
    sd[f"{key}.bias"] = [c]
    sd[f"{key}.running_mean"] = [c]
    sd[f"{key}.running_var"] = [c]
    sd[f"{key}.num_batches_tracked"] = []


def first_principles_manifest(size: int) -> dict:
    bottleneck = BOTTLENECK[size]
    expansion = 4 if bottleneck else 1
    sd: dict = {"conv1.weight": [64, 3, 7, 7]}
    _bn(sd, "bn1", 64)
    inplanes = 64
    for stage, blocks in enumerate(LAYERS[size]):
        planes = STAGE_PLANES[stage]
        stride = 1 if stage == 0 else 2
        for b in range(blocks):
            base = f"layer{stage + 1}.{b}"
            if bottleneck:
                sd[f"{base}.conv1.weight"] = [planes, inplanes, 1, 1]
                _bn(sd, f"{base}.bn1", planes)
                sd[f"{base}.conv2.weight"] = [planes, planes, 3, 3]
                _bn(sd, f"{base}.bn2", planes)
                sd[f"{base}.conv3.weight"] = [planes * 4, planes, 1, 1]
                _bn(sd, f"{base}.bn3", planes * 4)
            else:
                sd[f"{base}.conv1.weight"] = [planes, inplanes, 3, 3]
                _bn(sd, f"{base}.bn1", planes)
                sd[f"{base}.conv2.weight"] = [planes, planes, 3, 3]
                _bn(sd, f"{base}.bn2", planes)
            if b == 0 and (stride != 1 or inplanes != planes * expansion):
                sd[f"{base}.downsample.0.weight"] = [
                    planes * expansion, inplanes, 1, 1,
                ]
                _bn(sd, f"{base}.downsample.1", planes * expansion)
            inplanes = planes * expansion
    sd["fc.weight"] = [1000, 512 * expansion]
    sd["fc.bias"] = [1000]
    return sd


def torchvision_manifest(size: int) -> dict:
    from torchvision import models as tvm

    m = {18: tvm.resnet18, 34: tvm.resnet34, 50: tvm.resnet50}[size]()
    return {k: list(v.shape) for k, v in m.state_dict().items()}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    default_out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data", "torchvision_resnet_manifest.json",
    )
    p.add_argument("--out", default=default_out)
    a = p.parse_args(argv)
    try:
        sizes = {str(s): torchvision_manifest(s) for s in (18, 34, 50)}
        source = "torchvision"
    except ImportError:
        sizes = {str(s): first_principles_manifest(s) for s in (18, 34, 50)}
        source = "first-principles"
    manifest = {"source": source, **sizes}
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    n = {s: len(manifest[s]) for s in ("18", "34", "50")}
    print(f"wrote {a.out} ({manifest['source']}): {n} keys")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

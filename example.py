#!/usr/bin/env python
"""Minimal embedding example — counterpart of the reference's smoke script
(``/root/reference/r3m/example.py``): load the pretrained resnet50 R3M,
encode one random 500x500 image, print the [1, 2048] embedding shape.

Unlike the reference (host-side PIL Resize/CenterCrop/ToTensor), the full
preprocess — Resize(256) + CenterCrop(224) + normalize — runs on device
inside the jitted forward, so the raw [0, 255] image is passed directly.
On offline hosts without cached checkpoints this falls back to a randomly
initialized encoder so the API path is still exercised end to end.
"""

import numpy as np


def main():
    import jax

    from r3m_tpu.utils.misc import honor_jax_platforms_env

    # sitecustomize consumes JAX_PLATFORMS at interpreter start; re-apply
    # so `JAX_PLATFORMS=cpu python example.py` really runs on CPU.
    honor_jax_platforms_env()

    from r3m_tpu import R3MConfig, R3MEncoder, load_r3m
    from r3m_tpu.models.r3m import r3m_init

    try:
        r3m = load_r3m("resnet50")
        print("loaded pretrained resnet50")
    except Exception as e:  # zero-egress host without a populated ~/.r3m cache
        print(f"pretrained weights unavailable ({e}); using random init")
        cfg = R3MConfig(size=50, langweight=0)
        state = r3m_init(jax.random.PRNGKey(0), cfg)
        r3m = R3MEncoder(cfg, state["params"], state["batch_stats"])
    r3m.eval()

    image = np.random.randint(0, 255, (500, 500, 3), dtype=np.uint8)
    # NCHW in [0, 255], like the reference's `r3m(preprocessed_image * 255.0)`.
    embedding = r3m(image.transpose(2, 0, 1)[None].astype(np.float32))
    print(embedding.shape)  # [1, 2048]


if __name__ == "__main__":
    main()

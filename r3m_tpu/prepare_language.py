"""Prepare the frozen language stack for training with langweight > 0.

Converts HuggingFace ``distilbert-base-uncased`` (the reference's language
encoder, ``/root/reference/r3m/models/models_language.py:19-20``) into the
framework's artifacts:

    python -m r3m_tpu.prepare_language --out /path/to/lang
    python train_representation.py ... agent.langweight=1.0 \
        bert_weights=/path/to/lang/distilbert.npz \
        vocab_path=/path/to/lang/vocab.txt

Requires `transformers` with the model available (downloaded or cached);
on fully offline hosts copy the two artifacts from a machine that has it.
"""

from __future__ import annotations

import argparse
import os


def prepare(model_name: str, out_dir: str) -> None:
    from transformers import AutoModel, AutoTokenizer

    from r3m_tpu.checkpoint import save_snapshot
    from r3m_tpu.models.distilbert import (
        convert_distilbert,
        distilbert_config_from_state,
    )

    os.makedirs(out_dir, exist_ok=True)
    model = AutoModel.from_pretrained(model_name)
    sd = model.state_dict()
    # infer the architecture from the weights rather than assuming the
    # distilbert-base geometry — any DistilBertModel checkpoint converts;
    # n_heads isn't shape-recoverable, so take it from the HF config and
    # record the full architecture in the snapshot metadata for the loader
    import dataclasses

    cfg = distilbert_config_from_state(
        sd, n_heads=int(getattr(model.config, "n_heads", 12))
    )
    params = convert_distilbert(sd, cfg)
    npz = os.path.join(out_dir, "distilbert.npz")
    save_snapshot(
        npz, params, {"model": model_name, "bert_config": dataclasses.asdict(cfg)}
    )

    tok = AutoTokenizer.from_pretrained(model_name)
    vocab_path = os.path.join(out_dir, "vocab.txt")
    vocab = sorted(tok.get_vocab().items(), key=lambda kv: kv[1])
    with open(vocab_path, "w") as f:
        f.write("\n".join(t for t, _ in vocab) + "\n")
    print(f"wrote {npz} and {vocab_path}")


def main(argv=None):
    from r3m_tpu.utils.misc import honor_jax_platforms_env

    honor_jax_platforms_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="distilbert-base-uncased")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    prepare(args.model, args.out)


if __name__ == "__main__":
    main()

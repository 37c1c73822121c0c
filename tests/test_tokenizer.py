"""WordPiece tokenizer parity vs transformers.BertTokenizer on a shared vocab."""

import numpy as np
import pytest

from r3m_tpu.text.tokenizer import WordPieceTokenizer

VOCAB_TOKENS = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "a", "person", "open", "##s", "##ing", "open", "door",
    "pick", "##ed", "up", "cup", "c", "wip", "##es", "table", "with",
    "cloth", ",", ".", "'", "hand", "##les", "知", "re", "##move",
    "##mov", "##e", "un", "##k",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    # dedupe preserving order (BERT vocab files have unique entries)
    seen, toks = set(), []
    for t in VOCAB_TOKENS:
        if t not in seen:
            seen.add(t)
            toks.append(t)
    p.write_text("\n".join(toks) + "\n")
    return str(p)


SENTENCES = [
    "person opens the door",
    "Picked up a CUP.",
    "wipes table with cloth,",
    "C removes the 知 thing",  # unknowns + CJK + leading-C Ego4D style
    "",
    "the person's hand",
]


def test_matches_hf_bert_tokenizer(vocab_file):
    from transformers import BertTokenizer

    hf = BertTokenizer(vocab_file=vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer(vocab_file=vocab_file)

    for s in SENTENCES:
        assert ours.tokenize(s) == hf.tokenize(s), s
        assert ours.encode(s) == hf.encode(s), s


def test_batch_padding_fixed_and_dynamic(vocab_file):
    tok = WordPieceTokenizer(vocab_file=vocab_file)
    ids, mask = tok.encode_batch(SENTENCES[:3])
    assert ids.shape == mask.shape
    assert mask.dtype == np.int32
    # dynamic padding pads to batch max
    lens = mask.sum(-1)
    assert ids.shape[1] == lens.max()

    ids16, mask16 = tok.encode_batch(SENTENCES, max_len=16)
    assert ids16.shape == (len(SENTENCES), 16)
    # truncation keeps [SEP] last
    long = "the " * 40
    ids_t, mask_t = tok.encode_batch([long], max_len=8)
    assert ids_t[0, 7] == tok.sep_id
    assert mask_t[0].sum() == 8

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


def test_fuzz_matches_hf_on_random_unicode(tmp_path):
    """Seeded fuzz: 300 random mixed-unicode strings tokenize identically to
    the genuine transformers.BertTokenizer on a shared vocab (letters with
    ## continuations so WordPiece segmentation actually exercises, plus
    accents, CJK, punctuation, controls, emoji, and exotic whitespace)."""
    import random
    import string

    from transformers import BertTokenizer

    letters = list(string.ascii_lowercase)
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    toks += letters + [f"##{c}" for c in letters]
    toks += [f"##{a}{b}" for a in "aeist" for b in "nrse"]
    toks += ["the", "##ing", "##ed", "知", "道", ",", ".", "-"]
    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text("\n".join(dict.fromkeys(toks)) + "\n")

    hf = BertTokenizer(vocab_file=str(vocab_path), do_lower_case=True)
    ours = WordPieceTokenizer(vocab_file=str(vocab_path))

    pools = [
        string.ascii_letters,
        string.digits,
        string.punctuation,
        "éàüñÅçøÉİı",                    # latin accents (NFD strip paths)
        "知道水火山",                      # CJK (space-padded both sides)
        "αβГдشم",                        # greek/cyrillic/arabic (non-latin words)
        " \t\n  　",       # ascii + Zs unicode whitespace
        "\x01\x7f�",                # controls + replacement char
        "😀🤖✅",                          # emoji/symbols (So)
        "²½™μ",                          # numeric-ish/symbol oddballs
    ]
    rng = random.Random(1234)
    for case in range(300):
        s = "".join(
            rng.choice(rng.choice(pools))
            for _ in range(rng.randrange(0, 40))
        )
        assert ours.tokenize(s) == hf.tokenize(s), repr(s)
        assert ours.encode(s) == hf.encode(s), repr(s)

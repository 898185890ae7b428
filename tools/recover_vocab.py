"""Recover the numeric WordPiece vocab from the reference's committed
tokenized test pickle + CSV, and save it for the embedding pipeline.

This reproduces the exact HF bert-base-uncased token ids for the dataset's
numeric strings without any network access (see
data.tokenizer.recover_numeric_vocab; 600/601 committed rows byte-exact).

Usage:
  python tools/recover_vocab.py [--reference /root/reference] [--out vocab.json]
"""
import argparse
import csv
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default="recovered_vocab.json")
    args = ap.parse_args()

    from eeg_multimodal_tpu.data.tokenizer import recover_numeric_vocab

    texts = [
        r["EEG"]
        for r in csv.DictReader(open(f"{args.reference}/feature/test_EEG.csv"))
    ]
    with open(f"{args.reference}/feature/EEG/test_bert.pickle", "rb") as f:
        enc = pickle.load(f)
    ids = [list(e["input_ids"]) for e in enc]
    tok = recover_numeric_vocab(texts, ids)
    exact = sum(1 for t, ref in zip(texts, ids) if list(tok.encode(t)[0]) == ref)
    tok.save(args.out)
    print(
        f"wrote {args.out}: {len(tok.vocab)} pieces, {len(tok.word_memo)} "
        f"memoized words, {exact}/{len(texts)} rows byte-exact"
    )


if __name__ == "__main__":
    main()

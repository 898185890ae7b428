"""Convert an on-disk HF BERT checkpoint to this framework's pytree format.

The zero-egress environment cannot download weights, but a user migrating
from the reference will typically have `bert-base-uncased` on disk
(pytorch_model.bin or model.safetensors + vocab.txt). This tool converts:

  - the torch state dict -> our BERT params pytree (pickle), loadable via
    Trainer(..., bert_params=checkpoint.load_pytree(path)), matching the
    reference's BertModel.from_pretrained initialization (models.py:40);
  - vocab.txt -> a WordPiece json for data.tokenizer (exact HF token ids).

Usage:
  python tools/import_hf_bert.py <hf_dir_or_state_dict> out_params.pickle \
      [--vocab out_vocab.json]
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_state_dict(path):
    if os.path.isdir(path):
        for name in ("pytorch_model.bin", "model.safetensors"):
            p = os.path.join(path, name)
            if os.path.exists(p):
                path = p
                break
    if path.endswith(".safetensors"):
        from safetensors.torch import load_file

        return load_file(path)
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception:
        import torch

        return torch.load(path, map_location="cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="HF dir or state-dict file")
    ap.add_argument("out", help="output params pickle")
    ap.add_argument("--vocab", help="also write WordPiece json from vocab.txt")
    ap.add_argument("--prefix", default="", help="key prefix (e.g. 'bert.')")
    args = ap.parse_args()

    from eeg_multimodal_tpu.models import bert as B
    from eeg_multimodal_tpu.train.checkpoint import normalize_torch_keys, save_pytree

    sd = normalize_torch_keys(load_state_dict(args.src))
    vocab_size = None
    for k in sd:
        if k.endswith("word_embeddings.weight"):
            v = sd[k]
            vocab_size = v.shape[0]
            break
    cfg = B.BertConfig(vocab_size=int(vocab_size)) if vocab_size else B.BertConfig()
    params = B.from_torch_state_dict(sd, cfg, prefix=args.prefix)
    save_pytree(args.out, params)
    print(f"wrote {args.out} (vocab_size={cfg.vocab_size})")

    if args.vocab:
        from eeg_multimodal_tpu.data.tokenizer import WordPiece

        vocab_txt = (
            os.path.join(args.src, "vocab.txt") if os.path.isdir(args.src) else None
        )
        if not vocab_txt or not os.path.exists(vocab_txt):
            raise SystemExit("--vocab requires vocab.txt next to the checkpoint")
        WordPiece.from_vocab_txt(vocab_txt).save(args.vocab)
        print(f"wrote {args.vocab}")


if __name__ == "__main__":
    main()

from . import datasets, tokenizer, process

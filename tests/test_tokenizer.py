"""CLIP BPE tokenizer vs the transformers oracle on a constructed vocab."""

import json
import os

import pytest

from diffews_tpu.data.tokenizer import CLIPTokenizer, _bytes_to_unicode


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    """Build a small but real BPE vocab over the byte alphabet + merges."""
    d = tmp_path_factory.mktemp("tok")
    byte_vocab = list(_bytes_to_unicode().values())
    vocab = {}
    for ch in byte_vocab:
        vocab[ch] = len(vocab)
    for ch in byte_vocab:
        vocab[ch + "</w>"] = len(vocab)
    merges = [
        "t h", "th e</w>", "a n", "an d</w>", "i n", "in g</w>",
        "h e", "he l", "hel l", "hell o</w>", "c a", "ca t</w>",
    ]
    for m in merges:
        tok = m.replace(" ", "")
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n" + "\n".join(merges) + "\n")
    return str(d)


@pytest.fixture(scope="module")
def oracle(vocab_dir):
    from transformers import CLIPTokenizer as HFTok

    return HFTok(os.path.join(vocab_dir, "vocab.json"),
                 os.path.join(vocab_dir, "merges.txt"))


@pytest.mark.parametrize("text", [
    "", "hello", "the cat and the hat", "Hello, World!  123",
    "thing-in-the-box", "a   b\t c", "don't",
])
def test_matches_transformers(vocab_dir, oracle, text):
    mine = CLIPTokenizer.from_pretrained(vocab_dir)
    got = mine(text, padding="do_not_pad").input_ids[0].tolist()
    want = oracle(text, padding="do_not_pad").input_ids
    assert got == want, (text, got, want)


def test_empty_prompt_protocol(vocab_dir, oracle):
    """Eval protocol: '' with do_not_pad -> [bos, eos] (seq len 2); training
    protocol: padded to 77 with pad id 0."""
    mine = CLIPTokenizer.from_pretrained(vocab_dir)
    ids = mine("", padding="do_not_pad").input_ids[0]
    assert len(ids) == 2
    padded = mine("", padding="max_length", max_length=77).input_ids[0]
    assert len(padded) == 77
    assert padded[0] == mine.bos_token_id and padded[1] == mine.eos_token_id


def test_truncation(vocab_dir):
    mine = CLIPTokenizer.from_pretrained(vocab_dir)
    long = "cat " * 100
    ids = mine(long, max_length=10).input_ids[0]
    assert len(ids) == 10
    assert ids[-1] == mine.eos_token_id


def test_decode_roundtrip(vocab_dir):
    mine = CLIPTokenizer.from_pretrained(vocab_dir)
    ids = mine.encode("hello cat")
    assert mine.decode(ids) == "hello cat"

"""CLIP BPE tokenizer tests over a fabricated merge table + MAE mask path."""

import gzip

import numpy as np

from dreamvla_tpu.data.tokenizer import (CONTEXT_LENGTH, EOT, SOT,
                                         ClipBPETokenizer, HashTokenizer,
                                         bytes_to_unicode)


def make_vocab(tmp_path):
    # minimal merge table: enough merges to compose "cat</w>" and "hat</w>"
    merges = ["version-header",
              "c a", "ca t</w>", "h a", "ha t</w>", "t h", "th e</w>"]
    p = tmp_path / "bpe_tiny.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("\n".join(merges) + "\n")
    return str(p)


def test_bpe_merges_and_framing(tmp_path):
    tok = ClipBPETokenizer(make_vocab(tmp_path))
    ids = tok(["the cat"])
    assert ids.shape == (1, CONTEXT_LENGTH)
    assert ids[0, 0] == SOT
    row = ids[0][ids[0] != 0]
    assert row[-1] == EOT
    # 'the' and 'cat' both fully merge into single tokens
    assert tok._bpe("the") == "the</w>"
    assert tok._bpe("cat") == "cat</w>"
    assert len(row) == 4  # SOT the cat EOT


def test_bpe_unmerged_fallback(tmp_path):
    tok = ClipBPETokenizer(make_vocab(tmp_path))
    # 'dog' has no merges: byte-level symbols d o g</w>
    assert tok._bpe("dog") == "d o g</w>"
    ids = tok(["dog"])
    row = ids[0][ids[0] != 0]
    assert len(row) == 5  # SOT d o g</w> EOT


def test_bpe_cleanup_and_truncation(tmp_path):
    tok = ClipBPETokenizer(make_vocab(tmp_path))
    a = tok(["  The   CAT  "])
    b = tok(["the cat"])
    np.testing.assert_array_equal(a, b)  # lowercase + whitespace collapse
    long = tok(["cat " * 200])
    assert long.shape == (1, CONTEXT_LENGTH)
    assert long[0, -1] == EOT  # truncate keeps the EOT terminator


def test_byte_unicode_table_bijective():
    table = bytes_to_unicode()
    assert len(table) == 256 and len(set(table.values())) == 256


def test_hash_tokenizer_contract():
    ids = HashTokenizer()(["pick up the cup", "pick up the cup"])
    np.testing.assert_array_equal(ids[0], ids[1])
    assert ids[0, 0] == SOT and EOT in ids[0]

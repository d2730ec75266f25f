"""Pluggable tokenizers (pipeline/tokenizer.py, r13 — VERDICT r12
missing #1): hand-computed piece/count expectations, the
whitespace-equivalence pin (tokenizer=WhitespaceTokenizer() ==
tokenizer=None row-for-row), BPE vs the pure-Python reference apply,
threading through pack/chunk/mix/LM, and the wire forms (local == HTTP,
version-skew rejections)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blaze_spark import data
from blaze_spark.pipeline import (
    BPETokenizer,
    VocabTokenizer,
    WhitespaceTokenizer,
    chunk_documents,
    ngram_lm_logprob,
    pack_sequences,
    source_mix,
    temperature_source_mix,
    tokenizer_from_wire,
)

ROWS = [
    (1, "the quick brownfox jumps", "a"),
    (2, "hello unbelievable tokenization", "b"),
    (3, "the the the", "b"),
    (4, "x", "a"),
]


@pytest.fixture(scope="module")
def tdocs(spark):
    return data(ROWS, spark=spark,
                schema="doc_id bigint, text string, source string",
                name="tokdocs")


def test_vocab_tokenizer_hand_computed(spark, tdocs):
    vt = VocabTokenizer(["the", "quick", "jumps", "hello"],
                        fallback_chars=4)
    got = {r.doc_id: (r.n, r.p) for r in tdocs.df.select(
        "doc_id", vt.n_tokens(F.col("text")).alias("n"),
        vt.pieces(F.col("text")).alias("p")).collect()}
    # brownfox (8 chars, OOV) -> 2 four-char chunks; unbelievable (12)
    # -> 3; tokenization (12) -> 3; x (1, OOV) -> 1 chunk "x"
    assert got[1] == (5, ["the", "quick", "brow", "nfox", "jumps"])
    assert got[2] == (7, ["hello", "unbe", "liev", "able",
                          "toke", "niza", "tion"])
    assert got[3] == (3, ["the", "the", "the"])
    assert got[4] == (1, ["x"])
    # n_tokens (the fold) always equals size(pieces) (the transform)
    chk = tdocs.df.select(
        (vt.n_tokens(F.col("text"))
         == F.size(vt.pieces(F.col("text")))).alias("eq")).collect()
    assert all(r.eq for r in chk)


def test_bpe_tokenizer_matches_reference(spark, tdocs):
    merges = [("t", "h"), ("th", "e"), ("l", "o"), ("h", "e"),
              ("he", "llo")]
    bpe = BPETokenizer(merges)
    got = {r.doc_id: (r.n, r.p) for r in tdocs.df.select(
        "doc_id", bpe.n_tokens(F.col("text")).alias("n"),
        bpe.pieces(F.col("text")).alias("p")).collect()}
    ranks = {m: i for i, m in enumerate(merges)}
    for doc_id, text, _ in ROWS:
        want = []
        for w in text.split():
            want.extend(BPETokenizer._apply_word(w, ranks))
        assert got[doc_id] == (len(want), want), (doc_id, want)
    # the classic apply order: 'hello' merges l+o FIRST (rank 2 beats
    # rank 3 h+e at the same scan), then h+e -> [he, l, lo]; the
    # (he,llo) merge never fires because 'llo' is never a single part
    assert BPETokenizer._apply_word("hello", ranks) == ["he", "l", "lo"]
    # no merges == character tokenizer
    assert BPETokenizer._apply_word("abc", {}) == ["a", "b", "c"]


def test_whitespace_tokenizer_is_the_default(spark, tdocs):
    """tokenizer=WhitespaceTokenizer() reproduces tokenizer=None
    row-for-row on every threaded operator."""
    ws = WhitespaceTokenizer()
    a = pack_sequences(tdocs, budget=5).df
    b = pack_sequences(tdocs, budget=5, tokenizer=ws).df
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, b.collect()))
    a = chunk_documents(tdocs, max_tokens=2, overlap=1).df
    b = chunk_documents(tdocs, max_tokens=2, overlap=1,
                        tokenizer=ws).df
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, b.collect()))
    a = source_mix(tdocs)
    b = source_mix(tdocs, tokenizer=ws)
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, b.collect()))


def test_tokenized_pack_and_chunk(spark, tdocs):
    vt = VocabTokenizer(["the", "quick", "jumps", "hello"],
                        fallback_chars=4)
    got = {r.doc_id: (r.n_tokens, r.tok_start, r.shard)
           for r in pack_sequences(tdocs, budget=6,
                                   tokenizer=vt).df.collect()}
    # doc order 1,2,3,4 with counts 5,7,3,1: starts 0,5,12,15
    assert got == {1: (5, 0, 0), 2: (7, 5, 0), 3: (3, 12, 2),
                   4: (1, 15, 2)}
    ch = chunk_documents(tdocs, max_tokens=2, tokenizer=vt).df
    got = sorted((r.doc_id, r.chunk_id, r.chunk_text, r.chunk_tokens)
                 for r in ch.collect())
    assert got == [
        (1, 0, "the quick", 2), (1, 1, "brow nfox", 2),
        (1, 2, "jumps", 1),
        (2, 0, "hello unbe", 2), (2, 1, "liev able", 2),
        (2, 2, "toke niza", 2), (2, 3, "tion", 1),
        (3, 0, "the the", 2), (3, 1, "the", 1),
        (4, 0, "x", 1)]
    # overlap slides over PIECES (token-true windows)
    ov = chunk_documents(tdocs, max_tokens=2, overlap=1,
                         tokenizer=vt).df
    one = sorted((r.chunk_id, r.chunk_text) for r in ov.collect()
                 if r.doc_id == 3)
    # nch = ceil((3 - 1) / 1) = 2: the second window already reaches
    # the end of the piece array (the whitespace-path formula, reused)
    assert one == [(0, "the the"), (1, "the the")]


def test_tokenized_mix_accounting(spark, tdocs):
    vt = VocabTokenizer(["the", "quick", "jumps", "hello"],
                        fallback_chars=4)
    got = {r["source"]: r["total_tokens"]
           for r in source_mix(tdocs, tokenizer=vt).collect()}
    assert got == {"a": 5 + 1, "b": 7 + 3}
    got = {r["source"]: r["total_tokens"]
           for r in temperature_source_mix(tdocs, alpha=0.5,
                                           tokenizer=vt).collect()}
    assert got == {"a": 6, "b": 10}


def test_tokenized_lm_n_grams(spark, tdocs):
    vt = VocabTokenizer(["the", "quick", "jumps", "hello"],
                        fallback_chars=4)
    got = {r.doc_id: r.n_grams
           for r in ngram_lm_logprob(tdocs, n_buckets=64, n=2,
                                     tokenizer=vt).collect()}
    # n_grams over PIECES: counts 5,7,3,1 -> bigrams 4,6,2,0
    assert got == {1: 4, 2: 6, 3: 2, 4: 0}


def test_tokenizer_validation(spark):
    with pytest.raises(ValueError, match="fallback_chars"):
        VocabTokenizer(["a"], fallback_chars=0)
    with pytest.raises(ValueError, match="unknown tokenizer kind"):
        tokenizer_from_wire({"kind": "sentencepiece"})
    with pytest.raises(ValueError, match="unknown key"):
        tokenizer_from_wire({"kind": "whitespace", "evil": 1})
    with pytest.raises(ValueError, match="'kind'"):
        tokenizer_from_wire(["not", "a", "dict"])
    t = data([(1, "a b", "s")], spark=spark,
             schema="doc_id bigint, text string, source string",
             name="tokval")
    from blaze_spark.pipeline.tokenizer import _tokenizer_wire
    with pytest.raises(TypeError, match="Tokenizer"):
        _tokenizer_wire("whitespace")
    # round-trip identity for all three kinds
    for tok in (WhitespaceTokenizer(lowercase=True),
                VocabTokenizer(["a", "b"], fallback_chars=3),
                BPETokenizer([("a", "b")], lowercase=True)):
        back = tokenizer_from_wire(tok.to_wire())
        assert type(back) is type(tok)
        assert back.to_wire() == tok.to_wire()


def test_tokenizer_wire_roundtrip(spark, tdocs):
    """Every threaded operator computes the same result over blaze://
    with a tokenizer-carrying node; r12 trees without the keyword are
    untouched (default plans keep their form)."""
    from blaze_spark.interop import to_tree
    from blaze_spark.server import BlazeSparkServer

    vt = VocabTokenizer(["the", "quick", "jumps", "hello"],
                        fallback_chars=4)
    bpe = BPETokenizer([("t", "h"), ("th", "e")])
    srv = BlazeSparkServer({"tokdocs": tdocs}, spark)
    srv.start(port=0)
    try:
        rt = data(f"blaze://127.0.0.1:{srv.port}::tokdocs",
                  spark=spark)
        cases = [
            (pack_sequences(rt, budget=6, tokenizer=vt),
             pack_sequences(tdocs, budget=6, tokenizer=vt).df),
            (pack_sequences(rt, budget=6, tokenizer=bpe),
             pack_sequences(tdocs, budget=6, tokenizer=bpe).df),
            (chunk_documents(rt, max_tokens=2, tokenizer=vt),
             chunk_documents(tdocs, max_tokens=2, tokenizer=vt).df),
            (source_mix(rt, tokenizer=vt),
             source_mix(tdocs, tokenizer=vt)),
            (temperature_source_mix(rt, alpha=0.5, tokenizer=vt),
             temperature_source_mix(tdocs, alpha=0.5, tokenizer=vt)),
            (ngram_lm_logprob(rt, n_buckets=64, n=2, tokenizer=vt),
             ngram_lm_logprob(tdocs, n_buckets=64, n=2, tokenizer=vt)),
        ]
        for remote, local in cases:
            got = sorted(map(tuple, spark.createDataFrame(
                remote.compute(), schema=remote.df.schema).collect()))
            want = sorted(map(tuple, local.collect()))
            assert got == want and len(got) > 0
        # a default plan's node carries NO tokenizer key (r12 form)
        plain = to_tree(pack_sequences(rt, budget=6))
        assert "tokenizer" not in plain["args"][1]
    finally:
        srv.stop()


def test_tokenizer_wire_version_skew(spark, tdocs):
    """A hostile/newer tokenizer dict inside a node fails loudly at
    replay, never recounts in whitespace tokens."""
    from blaze_spark.interop import from_tree

    bad = {"op": "pack_sequences",
           "args": [{"op": "symbol", "args": ["tokdocs"]},
                    {"budget": 6, "text_col": "text",
                     "order_by": "doc_id", "partitions": None,
                     "tokenizer": {"kind": "sentencepiece"}}]}
    with pytest.raises(ValueError, match="unknown tokenizer kind"):
        from_tree(bad, spark=spark, datasets={"tokdocs": tdocs})
    bad["args"][1]["tokenizer"] = {"kind": "vocab", "vocab": ["a"],
                                   "fallback_chars": 4,
                                   "lowercase": False, "evil": 1}
    with pytest.raises(ValueError, match="unknown key"):
        from_tree(bad, spark=spark, datasets={"tokdocs": tdocs})


# ---- byte-level BPE + real-artifact import (r13, second half) ------


def test_bytes_to_unicode_table():
    """Pin the GPT-2 byte→unicode table: printable latin-1 maps to
    itself, space is Ġ (U+0120), newline Ċ (U+010A); 256 entries,
    injective (reversible)."""
    from blaze_spark.pipeline.tokenizer import _bytes_to_unicode

    b2u = _bytes_to_unicode()
    assert len(b2u) == 256
    assert len(set(b2u.values())) == 256
    assert b2u[ord("a")] == "a" and b2u[ord("!")] == "!"
    assert b2u[ord(" ")] == "Ġ"     # Ġ
    assert b2u[ord("\n")] == "Ċ"    # Ċ
    assert b2u[ord("\t")] == "ĉ"    # ĉ = 256 + 9


def test_gpt2_pretokenize_exact():
    """The scanner reproduces GPT-2's pre-tokenizer regex, including
    the contraction splits, leading-space gluing, digit/punct runs,
    and the whitespace-run backtracking subtlety."""
    from blaze_spark.pipeline.tokenizer import _gpt2_pretokenize as pt

    assert pt("Hello world") == ["Hello", " world"]
    assert pt("it's 2x") == ["it", "'s", " 2", "x"]
    assert pt("don't stop") == ["don", "'t", " stop"]
    assert pt("hello,world") == ["hello", ",", "world"]
    assert pt(" leading") == [" leading"]
    # ws-run before \S yields its first r−1 chars, the final literal
    # space glues onto the next token; \n never glues
    assert pt("a  b") == ["a", " ", " b"]
    assert pt("a\n\nb") == ["a", "\n", "\n", "b"]
    assert pt("a\nb") == ["a", "\n", "b"]
    assert pt("\tx") == ["\t", "x"]
    # trailing whitespace run is one token (\s+(?!\S))
    assert pt("hi  ") == ["hi", "  "]
    # " 's" → punct run takes the space+apostrophe, letter run the s
    assert pt("a 's") == ["a", " '", "s"]
    assert pt("v1.2") == ["v", "1", ".", "2"]
    assert pt("") == []


def test_byte_level_bpe_hand_computed(spark):
    """End-to-end GPT-2-style counting on a tiny merges table, every
    expectation hand-derived (Ġ = byte-level space)."""
    from blaze_spark import data

    G = "Ġ"
    merges = [(G, "t"), ("h", "e"), (G + "t", "he")]
    bpe = BPETokenizer(merges, byte_level=True)
    rows = [(1, "the the"), (2, "café"), (3, "a\n\nb"), (4, None),
            (5, "\n\n")]
    t = data(rows, spark=spark, schema="doc_id bigint, text string",
             name="bl_docs")
    got = {r.doc_id: (r.n, r.p) for r in t.df.select(
        "doc_id", bpe.n_tokens(F.col("text")).alias("n"),
        bpe.pieces(F.col("text")).alias("p")).collect()}
    # "the" → t|he (rank-1 h+e; Ġt needs a leading space);
    # " the" → Ġt|he → Ġthe (rank 0 then 2)
    assert got[1] == (3, ["t", "he", G + "the"])
    # é = 0xC3 0xA9 → Ã © ; no merges apply → c a f Ã ©
    assert got[2] == (5, ["c", "a", "f", "\xc3", "\xa9"])
    # pretokens a, \n, \n, b — byte-level COUNTS whitespace tokens
    assert got[3] == (4, ["a", "Ċ", "Ċ", "b"])
    assert got[4] == (0, [])
    assert got[5] == (2, ["Ċ", "Ċ"])
    # RoBERTa add_prefix_space: "the" scores as " the" → 1 token
    bpe2 = BPETokenizer(merges, byte_level=True,
                        add_prefix_space=True)
    got2 = t.df.select(bpe2.n_tokens(F.col("text")).alias("n")) \
        .where(F.col("doc_id") == 1).collect()
    assert got2[0].n == 2  # " the the" → Ġthe, Ġthe
    # add_prefix_space without byte_level is a construction error
    with pytest.raises(ValueError, match="byte_level"):
        BPETokenizer(merges, add_prefix_space=True)


def test_from_tokenizer_json(tmp_path):
    """HF tokenizer.json import: merges in both public shapes, the
    ByteLevel pre-tokenizer (bare or inside a Sequence) switching on
    the byte scheme + add_prefix_space; non-BPE models refuse."""
    import json

    G = "Ġ"
    spec = {"model": {"type": "BPE",
                      "vocab": {"t": 0, "he": 1},
                      "merges": [f"{G} t", "h e"]},
            "pre_tokenizer": {"type": "ByteLevel",
                              "add_prefix_space": True}}
    p = tmp_path / "tokenizer.json"
    p.write_text(json.dumps(spec))
    tok = BPETokenizer.from_tokenizer_json(str(p))
    assert tok.merges == [(G, "t"), ("h", "e")]
    assert tok.byte_level and tok.add_prefix_space

    # list-pair merges + Sequence pre-tokenizer chain
    spec["model"]["merges"] = [[G, "t"], ["h", "e"]]
    spec["pre_tokenizer"] = {
        "type": "Sequence",
        "pretokenizers": [{"type": "Digits"},
                          {"type": "ByteLevel",
                           "add_prefix_space": False}]}
    p.write_text(json.dumps(spec))
    tok = BPETokenizer.from_tokenizer_json(str(p))
    assert tok.merges == [(G, "t"), ("h", "e")]
    assert tok.byte_level and not tok.add_prefix_space

    # no pre_tokenizer → plain character BPE
    del spec["pre_tokenizer"]
    p.write_text(json.dumps(spec))
    assert not BPETokenizer.from_tokenizer_json(str(p)).byte_level

    spec["model"]["type"] = "WordPiece"
    p.write_text(json.dumps(spec))
    with pytest.raises(ValueError, match="WordPiece"):
        BPETokenizer.from_tokenizer_json(str(p))
    p.write_text(json.dumps({"no_model": 1}))
    with pytest.raises(ValueError, match="model"):
        BPETokenizer.from_tokenizer_json(str(p))


def test_from_merges_txt_and_vocab_file(tmp_path):
    import json

    G = "Ġ"
    m = tmp_path / "merges.txt"
    m.write_text(f"#version: 0.2\n{G} t\nh e\n{G}t he\n",
                 encoding="utf-8")
    tok = BPETokenizer.from_merges_txt(str(m))
    assert tok.merges == [(G, "t"), ("h", "e"), (G + "t", "he")]
    assert tok.byte_level  # GPT-2 merges.txt artifacts are byte-level
    m.write_text("ab\n", encoding="utf-8")
    with pytest.raises(ValueError, match="malformed"):
        BPETokenizer.from_merges_txt(str(m))
    m.write_text("a b c\n", encoding="utf-8")
    with pytest.raises(ValueError, match="malformed"):
        BPETokenizer.from_merges_txt(str(m))

    v = tmp_path / "vocab.txt"
    v.write_text("[PAD]\nthe\nquick\n##ing\n", encoding="utf-8")
    vt = VocabTokenizer.from_vocab_file(str(v))
    assert vt.vocab == ["[PAD]", "the", "quick", "##ing"]
    vj = tmp_path / "vocab.json"
    vj.write_text(json.dumps({"the": 0, "a": 1}))
    assert VocabTokenizer.from_vocab_file(str(vj)).vocab == ["the", "a"]
    vj.write_text(json.dumps(["x", "y"]))
    assert VocabTokenizer.from_vocab_file(str(vj)).vocab == ["x", "y"]
    vj.write_text(json.dumps(3))
    with pytest.raises(ValueError, match="dict or list"):
        VocabTokenizer.from_vocab_file(str(vj))


def test_byte_level_wire_roundtrip(spark):
    """byte_level/add_prefix_space ride the wire only when set (the
    default BPE node stays byte-identical to r13's first half), and
    rebuild to identical counts."""
    from blaze_spark import data
    from blaze_spark.pipeline.tokenizer import tokenizer_from_wire

    G = "Ġ"
    merges = [(G, "t"), ("h", "e"), (G + "t", "he")]
    plain = BPETokenizer(merges)
    assert "byte_level" not in plain.to_wire()
    assert "add_prefix_space" not in plain.to_wire()
    bl = BPETokenizer(merges, byte_level=True, add_prefix_space=True)
    enc = bl.to_wire()
    assert enc["byte_level"] is True and enc["add_prefix_space"] is True
    back = tokenizer_from_wire(enc)
    t = data([(1, "the the"), (2, "café time")], spark=spark,
             schema="doc_id bigint, text string", name="blw_docs")
    a = t.df.select(bl.n_tokens(F.col("text")).alias("n")).collect()
    b = t.df.select(back.n_tokens(F.col("text")).alias("n")).collect()
    assert [r.n for r in a] == [r.n for r in b]


def test_byte_level_udf_matches_module_reference(spark):
    """The UDF inlines the pre-tokenizer scanner BY VALUE (cloudpickle
    closure — executors never import blaze_spark); this pins the
    inlined copy against the module-level composition
    (_gpt2_pretokenize → byte map → _apply_word) on adversarial text,
    so the two can never drift silently."""
    from blaze_spark import data
    from blaze_spark.pipeline.tokenizer import (_bytes_to_unicode,
                                                _gpt2_pretokenize)

    G = "Ġ"
    merges = [(G, "t"), ("h", "e"), (G + "t", "he"), ("l", "l"),
              ("Ċ", "Ċ"), ("1", "2")]
    texts = [
        "the the", "it's 2x12", "don't  stop\nnow", "a\n\n\nb",
        "héllo wörld", "tabs\tand\nnewlines  ", "  lead", "v1.2,x;y",
        "'s's't", "ĠĊ literal unicode", "123 456", "\n\n",
    ]
    rows = [(i, s) for i, s in enumerate(texts)]
    t = data(rows, spark=spark, schema="doc_id bigint, text string",
             name="blsync_docs")
    bpe = BPETokenizer(merges, byte_level=True)
    got = {r.doc_id: list(r.p) for r in t.df.select(
        "doc_id", bpe.pieces(F.col("text")).alias("p")).collect()}

    b2u = _bytes_to_unicode()
    ranks = {m: i for i, m in enumerate(merges)}
    for i, s in enumerate(texts):
        want = []
        for u in _gpt2_pretokenize(s):
            mapped = "".join(b2u[b] for b in u.encode("utf-8"))
            want.extend(BPETokenizer._apply_word(mapped, ranks))
        assert got[i] == want, (s, got[i], want)


# ---- true WordPiece (BERT) -----------------------------------------


def test_wordpiece_hand_computed(spark):
    """The exact BERT algorithm: greedy longest-match-first, ##
    continuations, whole-word UNK on any unmatchable remainder, the
    max_input_chars_per_word guard."""
    from blaze_spark import data
    from blaze_spark.pipeline import WordPieceTokenizer

    vocab = ["un", "##aff", "##able", "runn", "##ing", "the",
             "a", "ab", "abc", "##c"]
    wp = WordPieceTokenizer(vocab)
    rows = [(1, "unaffable"), (2, "the running"), (3, "abc abcc"),
            (4, "abq"), (5, None), (6, "x" * 101)]
    t = data(rows, spark=spark, schema="doc_id bigint, text string",
             name="wp_docs")
    got = {r.doc_id: (r.n, list(r.p)) for r in t.df.select(
        "doc_id", wp.n_tokens(F.col("text")).alias("n"),
        wp.pieces(F.col("text")).alias("p")).collect()}
    assert got[1] == (3, ["un", "##aff", "##able"])
    assert got[2] == (3, ["the", "runn", "##ing"])
    # greedy longest match: "abc" is ONE piece, "abcc" = abc + ##c
    assert got[3] == (3, ["abc", "abc", "##c"])
    # any unmatchable remainder ('q') -> the WHOLE word is [UNK]
    assert got[4] == (1, ["[UNK]"])
    assert got[5] == (0, [])
    # over max_input_chars_per_word -> [UNK]
    assert got[6] == (1, ["[UNK]"])
    # sync pin: the module-level reference reproduces every Spark row
    # (the UDF runs an inlined-by-value copy of the same loop)
    for doc_id, text in rows:
        if text is None:
            continue
        want = []
        for w in text.split():
            want.extend(WordPieceTokenizer._apply_word(
                w, set(vocab), "[UNK]", 100))
        assert got[doc_id][1] == want, (text, want)


def test_wordpiece_from_vocab_file_and_wire(spark, tmp_path):
    import json

    from blaze_spark import data
    from blaze_spark.pipeline import WordPieceTokenizer, pack_sequences
    from blaze_spark.pipeline.tokenizer import tokenizer_from_wire

    v = tmp_path / "vocab.txt"
    v.write_text("[PAD]\n[UNK]\nthe\nun\n##aff\n##able\n",
                 encoding="utf-8")
    wp = WordPieceTokenizer.from_vocab_file(str(v))
    assert "##aff" in wp.vocab and wp.unk_token == "[UNK]"
    vj = tmp_path / "vocab.json"
    vj.write_text(json.dumps({"the": 0, "##s": 1}))
    assert WordPieceTokenizer.from_vocab_file(str(vj)).vocab == \
        ["the", "##s"]

    # wire round-trip to identical counts; unknown keys reject
    enc = wp.to_wire()
    assert enc["kind"] == "wordpiece"
    back = tokenizer_from_wire(json.loads(json.dumps(enc)))
    t = data([(1, "the unaffable thing")], spark=spark,
             schema="doc_id bigint, text string", name="wpw_docs")
    a = t.df.select(wp.n_tokens(F.col("text")).alias("n")).collect()
    b = t.df.select(back.n_tokens(F.col("text")).alias("n")).collect()
    assert [r.n for r in a] == [r.n for r in b] == [5]  # 1+3+UNK
    with pytest.raises(ValueError, match="unknown key"):
        tokenizer_from_wire({**enc, "evil": 1})

    # threads through the token-budget operators like any Tokenizer
    packed = pack_sequences(t, budget=4, tokenizer=wp).df.collect()
    assert packed[0].n_tokens == 5
    with pytest.raises(ValueError, match="max_input_chars"):
        WordPieceTokenizer(["a"], max_input_chars_per_word=0)


def test_tokenizer_json_normalizer_and_wordpiece_model(tmp_path):
    """A Lowercase (or BertNormalizer) normalizer in tokenizer.json
    sets lowercase unless overridden; model.type=WordPiece loads as a
    WordPieceTokenizer with the model's unk/max_chars; cross-model
    loads refuse with a pointer to the right loader."""
    import json

    from blaze_spark.pipeline import WordPieceTokenizer

    spec = {"model": {"type": "BPE", "vocab": {"t": 0},
                      "merges": ["h e"]},
            "normalizer": {"type": "Lowercase"}}
    p = tmp_path / "tokenizer.json"
    p.write_text(json.dumps(spec))
    assert BPETokenizer.from_tokenizer_json(str(p)).lowercase
    # explicit override beats the spec
    assert not BPETokenizer.from_tokenizer_json(
        str(p), lowercase=False).lowercase
    # BertNormalizer inside a Sequence, lowercase defaulting true
    spec["normalizer"] = {"type": "Sequence", "normalizers": [
        {"type": "NFD"}, {"type": "BertNormalizer"}]}
    p.write_text(json.dumps(spec))
    assert BPETokenizer.from_tokenizer_json(str(p)).lowercase
    spec["normalizer"] = {"type": "Sequence", "normalizers": [
        {"type": "BertNormalizer", "lowercase": False}]}
    p.write_text(json.dumps(spec))
    assert not BPETokenizer.from_tokenizer_json(str(p)).lowercase

    wspec = {"model": {"type": "WordPiece",
                       "vocab": {"the": 0, "##s": 1, "[UNK]": 2},
                       "unk_token": "[UNK]",
                       "max_input_chars_per_word": 50},
             "normalizer": {"type": "Lowercase"}}
    p.write_text(json.dumps(wspec))
    wp = WordPieceTokenizer.from_tokenizer_json(str(p))
    assert wp.vocab == ["the", "##s", "[UNK]"]
    assert wp.unk_token == "[UNK]"
    assert wp.max_input_chars_per_word == 50 and wp.lowercase
    # cross-model loads refuse, each naming the right loader
    p.write_text(json.dumps(spec))  # a BPE spec
    with pytest.raises(ValueError, match="BPETokenizer.from_tokenizer"):
        WordPieceTokenizer.from_tokenizer_json(str(p))
    p.write_text(json.dumps(wspec))  # a WordPiece spec
    with pytest.raises(ValueError, match="WordPieceTokenizer"):
        BPETokenizer.from_tokenizer_json(str(p))


def test_byte_level_chunk_text_roundtrips(spark):
    """chunk_documents with a byte-level tokenizer rebuilds each
    chunk's text EXACTLY (inverse byte map + concatenation) —
    whitespace runs included; a chunk boundary that splits a
    multi-byte codepoint decodes its dangling bytes as U+FFFD."""
    from blaze_spark import data
    from blaze_spark.pipeline import chunk_documents

    G = "Ġ"
    merges = [(G, "t"), ("h", "e"), (G + "t", "he")]
    bpe = BPETokenizer(merges, byte_level=True)
    texts = ["the the cat!", "a\n\n  b", "héllo wörld"]
    t = data([(i, s) for i, s in enumerate(texts)], spark=spark,
             schema="doc_id bigint, text string", name="bldetok")
    # one big chunk per doc: chunk_text == the original text verbatim
    one = chunk_documents(t, max_tokens=100, tokenizer=bpe).df
    got = {r.doc_id: r.chunk_text for r in one.collect()}
    assert got == {i: s for i, s in enumerate(texts)}
    # multi-chunk: the concatenation of chunk texts == the original
    many = chunk_documents(t, max_tokens=2, tokenizer=bpe).df
    rows = sorted((r.doc_id, r.chunk_id, r.chunk_text)
                  for r in many.collect())
    rebuilt = {}
    for d, _, txt in rows:
        rebuilt[d] = rebuilt.get(d, "") + txt
    # docs 0 and 1 split only at codepoint boundaries
    assert rebuilt[0] == texts[0] and rebuilt[1] == texts[1]
    # a chunk boundary INSIDE é/ö yields U+FFFD at the dangling
    # edges but the total piece budget stays exact
    tot = sum(r.chunk_tokens for r in many.collect()
              if r.doc_id == 2)
    n2 = t.df.filter(F.col("doc_id") == 2).select(
        bpe.n_tokens(F.col("text")).alias("n")).collect()[0].n
    assert tot == n2
    assert any("\ufffd" in txt for d, _, txt in rows if d == 2)
    # the word-unit tokenizers keep the lossy space join
    vt = VocabTokenizer(["the"], fallback_chars=4)
    ch = chunk_documents(t, max_tokens=100, tokenizer=vt).df
    got0 = [r.chunk_text for r in ch.collect() if r.doc_id == 0][0]
    assert got0 == "the the cat!"  # space-joined pieces ("cat!" = 1 chunk)

"""Pluggable tokenizers for token-true budgets (r13, VERDICT r12
missing #1): every token-budget operator in the package —
``pack_sequences``, ``chunk_documents``, the mixture accounting
(``source_mix``/``temperature_source_mix``) and the n-gram LM family —
counted WHITESPACE tokens.  Real training pipelines budget in
BPE/SentencePiece tokens, where whitespace counts are off 1.3-1.8× and
language-dependent.  These operators now accept ``tokenizer=``; the
default (``None``) keeps the whitespace split byte-identical.

Four engine profiles, one two-method contract (``pieces(col)`` →
``array<string>``, ``n_tokens(col)`` → ``long``):

- :class:`WhitespaceTokenizer` — the explicit form of the default.
  Pure codegen split.
- :class:`VocabTokenizer` — word-piece-shaped and fully
  ORACLE-EXPRESSIBLE: an in-vocabulary word is one piece, an OOV word
  falls back to fixed-width character chunks (the SentencePiece
  byte-fallback shape, bounded at ``fallback_chars`` per piece).  The
  vocabulary ships as a literal map (one ``try_element_at`` lookup per
  word inside the fold/transform lambda — the DSIR one-lookup-per-token
  shape that beat explode 7×, PLANS.md r10), so counting is a
  shuffle-free projection and DuckDB reproduces it exactly
  (``list_transform`` + ``list_contains``).
- :class:`BPETokenizer` — TRUE greedy byte-pair encoding (Sennrich et
  al. 2016: start from symbols, repeatedly apply the lowest-rank merge
  present), as an Arrow-batched pandas UDF with a per-batch unit memo
  (Zipf: a batch re-tokenizes few distinct words).  Two symbol
  schemes: whitespace-pre-split character BPE (default), or
  ``byte_level=True`` — the GPT-2 scheme (regex pre-tokenizer +
  byte→unicode mapping, Radford et al. 2019), so a REAL GPT-2/RoBERTa
  merges table counts exactly the tokens the trainer will see.  Load
  real artifacts with ``BPETokenizer.from_tokenizer_json`` (HF
  ``tokenizer.json``), ``BPETokenizer.from_merges_txt`` (GPT-2
  ``merges.txt``) or ``VocabTokenizer.from_vocab_file``
  (``vocab.txt``/``vocab.json``).  Not SQL-expressible — pinned by
  pytest against a pure-Python reference and hand-computed GPT-2
  tokenizations, and a rows-only registry entry instead of a DuckDB
  oracle.
- :class:`WordPieceTokenizer` — TRUE WordPiece (BERT, Devlin et al.
  2019): greedy longest-match-first with ``##`` continuations and the
  whole-word-UNK rule, so a real BERT ``vocab.txt`` counts
  trainer-true tokens.  Same Arrow-batched UDF shape as BPE;
  rows-only, pinned against hand-derived BERT tokenizations.

All three are wire-serializable (``to_wire``/:func:`tokenizer_from_wire`
— the ``model_weights`` bounded-literal-relation precedent): the vocab /
merges tables are bounded by ``_MAX_BUCKETS`` rows and ride inside the
operator node, so a remote packing service budgets in the same tokens
the trainer will see.  On an r12 server a tokenizer-carrying node
rejects loudly (unknown keyword) — version skew never silently
recounts in whitespace tokens.

100 TB notes: the vocab map literal and the merges closure are
driver-bounded (≤ 65 536 entries ≈ sub-MB); the BPE UDF is the only
Python in the family and is Arrow-batched with per-batch memoization;
everything else stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .selection import _MAX_BUCKETS

__all__ = ["Tokenizer", "WhitespaceTokenizer", "VocabTokenizer",
           "BPETokenizer", "WordPieceTokenizer", "UnigramTokenizer",
           "tokenizer_from_wire"]


class Tokenizer:
    """The two-method contract every token-budget operator threads."""

    lowercase: bool = False

    def _words(self, col: Column) -> Column:
        """Whitespace pre-split with the package's blank-text guard
        (empty/whitespace-only text → empty array, matching
        pack_sequences' 0-token convention)."""
        c = F.lower(col) if self.lowercase else col
        return F.when(F.length(F.trim(col)) == 0,
                      F.array().cast("array<string>")) \
            .otherwise(F.split(F.trim(c), r"\s+"))

    def pieces(self, col: Column) -> Column:  # pragma: no cover
        raise NotImplementedError

    def n_tokens(self, col: Column) -> Column:
        return F.size(self.pieces(col)).cast("long")

    def detokenize(self, pieces: Column) -> Column:
        """Rebuild text from a piece array.  The default (space join)
        is the standard LOSSY subword detokenization; byte-level BPE
        overrides it with the exact inverse (the byte map is a
        bijection and byte-level pieces concatenate)."""
        return F.array_join(pieces, " ")

    def to_wire(self) -> dict:  # pragma: no cover
        raise NotImplementedError


class WhitespaceTokenizer(Tokenizer):
    """The default counting scheme as an explicit object: one piece per
    whitespace word."""

    def __init__(self, lowercase: bool = False):
        self.lowercase = bool(lowercase)

    def pieces(self, col: Column) -> Column:
        return self._words(col)

    def to_wire(self) -> dict:
        return {"kind": "whitespace", "lowercase": self.lowercase}


class VocabTokenizer(Tokenizer):
    """Word-piece-shaped tokenizer: in-vocabulary words are single
    pieces, OOV words split into fixed-width character chunks of
    ``fallback_chars`` (so an OOV word of L chars costs
    ``floor((L + fallback_chars - 1) / fallback_chars)`` pieces —
    integer arithmetic, engine-portable).

    ``vocab`` is a list of strings or a single-column DataFrame,
    bounded at ``_MAX_BUCKETS`` entries (it becomes a literal map in
    the plan).  Everything stays JVM-side: membership is one map
    lookup per word inside the transform/fold lambda.
    """

    def __init__(self, vocab, fallback_chars: int = 4,
                 lowercase: bool = False):
        if fallback_chars < 1:
            raise ValueError(
                f"fallback_chars must be >= 1, got {fallback_chars}")
        if isinstance(vocab, DataFrame):
            if len(vocab.columns) != 1:
                raise ValueError(
                    "vocab DataFrame must have exactly one string "
                    f"column, got {vocab.columns}")
            rows = vocab.limit(_MAX_BUCKETS + 1).collect()
            vocab = [r[0] for r in rows if r[0] is not None]
        vocab = list(dict.fromkeys(str(w) for w in vocab))
        if len(vocab) > _MAX_BUCKETS:
            raise ValueError(
                f"vocab has more than {_MAX_BUCKETS} entries — the "
                "vocabulary ships as a bounded literal map; was a "
                "corpus-level relation passed instead of a vocabulary?")
        self.vocab = vocab
        self.fallback_chars = int(fallback_chars)
        self.lowercase = bool(lowercase)

    def _in_vocab(self, w: Column) -> Column:
        if not self.vocab:
            return F.lit(False)
        m = F.map_from_arrays(
            F.lit(self.vocab),
            F.lit([1] * len(self.vocab)))
        return F.try_element_at(m, w).isNotNull()

    def _cost(self, w: Column) -> Column:
        k = self.fallback_chars
        fallback = F.floor((F.length(w) + F.lit(k - 1)) / F.lit(k)) \
            .cast("long")
        return F.when(self._in_vocab(w), F.lit(1).cast("long")) \
            .otherwise(fallback)

    def n_tokens(self, col: Column) -> Column:
        """One fold over the word array — the cheap path packing and
        the mixture accounting use (no pieces materialized)."""
        return F.aggregate(self._words(col), F.lit(0).cast("long"),
                           lambda acc, w: acc + self._cost(w))

    def pieces(self, col: Column) -> Column:
        k = self.fallback_chars

        def explode_word(w):
            n_chunks = F.floor((F.length(w) + F.lit(k - 1)) / F.lit(k)) \
                .cast("int")
            chunks = F.transform(
                F.sequence(F.lit(1), n_chunks),
                lambda i: w.substr((i - F.lit(1)) * F.lit(k) + F.lit(1),
                                   F.lit(k)))
            return F.when(self._in_vocab(w), F.array(w)) \
                .otherwise(chunks)

        return F.flatten(F.transform(self._words(col), explode_word))

    def to_wire(self) -> dict:
        return {"kind": "vocab", "vocab": list(self.vocab),
                "fallback_chars": self.fallback_chars,
                "lowercase": self.lowercase}

    @classmethod
    def from_vocab_file(cls, path: str, fallback_chars: int = 4,
                        lowercase: bool = False):
        """Load a vocabulary artifact: a WordPiece-style ``vocab.txt``
        (one token per line) or a ``vocab.json`` (``{token: id}`` dict
        or a plain list).  ``[unused..]``/special bracket tokens and
        ``##``-continuation pieces are kept verbatim — membership is
        whole-word, so they simply never match and cost the OOV
        fallback, which is the honest budget for a word-level count."""
        if path.endswith(".json"):
            import json

            with open(path, encoding="utf-8") as f:
                spec = json.load(f)
            if isinstance(spec, dict):
                words = list(spec.keys())
            elif isinstance(spec, list):
                words = [str(w) for w in spec]
            else:
                raise ValueError(
                    f"{path}: vocab JSON must be a dict or list, got "
                    f"{type(spec).__name__}")
        else:
            with open(path, encoding="utf-8") as f:
                words = [ln.rstrip("\n") for ln in f]
            words = [w for w in words if w]
        return cls(words, fallback_chars=fallback_chars,
                   lowercase=lowercase)


def _bytes_to_unicode() -> dict:
    """GPT-2's public byte→printable-unicode table (Radford et al.
    2019 release, ``encoder.py``): printable latin-1 bytes map to
    themselves, the rest to U+0100.. in order — so arbitrary UTF-8
    becomes a reversible string of non-space symbols and byte-level
    merges tables (GPT-2 / RoBERTa ``merges.txt``) apply verbatim."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


_CONTRACTIONS = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")


def _gpt2_pretokenize(text: str) -> list:
    """GPT-2's pre-tokenizer regex
    ``'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|
    \\s+(?!\\S)|\\s+`` as an explicit scanner (Python ``re`` lacks
    ``\\p``; ``str.isalpha``/``isnumeric`` are the same L*/N*
    categories).  Exact semantics incl. the backtracking subtlety: a
    whitespace RUN before a non-space yields its first ``r−1`` chars
    (``\\s+(?!\\S)``), the LAST char then either glues onto the next
    token (a literal space, via the alternatives' ``' ?'``) or stands
    alone (``\\n`` etc., via ``\\s+``)."""
    out = []
    i, L = 0, len(text)
    while i < L:
        ch = text[i]
        hit = None
        if ch == "'":
            for c in _CONTRACTIONS:
                if text.startswith(c, i):
                    hit = c
                    break
        if hit is not None:
            out.append(hit)
            i += len(hit)
            continue
        j = i
        sp = ""
        if ch == " " and i + 1 < L and not text[i + 1].isspace():
            sp = " "
            j = i + 1
            ch = text[j]
        if ch.isalpha():
            k = j + 1
            while k < L and text[k].isalpha():
                k += 1
            out.append(sp + text[j:k])
            i = k
            continue
        if ch.isnumeric():
            k = j + 1
            while k < L and text[k].isnumeric():
                k += 1
            out.append(sp + text[j:k])
            i = k
            continue
        if not ch.isspace():
            k = j + 1
            while k < L and not (text[k].isspace() or text[k].isalpha()
                                 or text[k].isnumeric()):
                k += 1
            out.append(sp + text[j:k])
            i = k
            continue
        k = i + 1
        while k < L and text[k].isspace():
            k += 1
        if k == L:                      # trailing run: \s+(?!\S) whole
            out.append(text[i:k])
            i = k
        elif k - i == 1:                # single non-" " ws char: \s+
            out.append(ch)
            i = k
        else:                           # run before \S: first r−1 chars
            out.append(text[i:k - 1])
            i = k - 1
    return out


class BPETokenizer(Tokenizer):
    """Greedy byte-pair encoding (Sennrich et al. 2016): each unit
    starts as its symbol sequence and repeatedly applies the
    LOWEST-RANK merge pair present (``merges`` order is the rank),
    exactly the classic BPE apply loop.

    Two pre-tokenization modes:

    - default (``byte_level=False``): whitespace-pre-split words,
      character symbols, no end-of-word marker (document-level token
      budgets don't need one; a marker-trained merges table can encode
      it in its pairs).
    - ``byte_level=True``: the GPT-2 scheme (Radford et al. 2019) —
      the GPT-2 regex pre-tokenizer (leading spaces glue onto the next
      word, contractions and digit/punctuation runs split off,
      whitespace runs count), UTF-8 bytes mapped through the public
      byte→unicode table (space becomes ``Ġ``), so a real GPT-2 /
      RoBERTa ``merges.txt`` produces the SAME token counts the
      trainer's tokenizer will (pinned in pytest against hand-computed
      GPT-2 tokenizations).  ``add_prefix_space=True`` is the RoBERTa
      variant (prepend one space when the text doesn't start with
      whitespace).

    Runs as an Arrow-batched pandas UDF with a per-batch unit memo —
    the only Python in the tokenizer family; ``merges`` is bounded at
    ``_MAX_BUCKETS`` pairs and travels in the UDF closure (sub-MB).
    Load real artifacts with :meth:`from_tokenizer_json` (HuggingFace
    ``tokenizer.json``) or :meth:`from_merges_txt` (GPT-2-style
    ``merges.txt``).
    """

    def __init__(self, merges, lowercase: bool = False,
                 byte_level: bool = False,
                 add_prefix_space: bool = False,
                 space_marker: str = ""):
        merges = [(str(a), str(b)) for a, b in merges]
        if len(merges) > _MAX_BUCKETS:
            raise ValueError(
                f"merges has more than {_MAX_BUCKETS} pairs — BPE "
                "merge tables are bounded literal relations")
        if add_prefix_space and not byte_level:
            raise ValueError(
                "add_prefix_space is a byte-level (GPT-2/RoBERTa) "
                "pre-tokenizer option — pass byte_level=True")
        if space_marker and byte_level:
            raise ValueError(
                "space_marker is the SentencePiece word-marker scheme "
                "(char symbols) — mutually exclusive with the GPT-2 "
                "byte-level scheme")
        self.merges = merges
        self.lowercase = bool(lowercase)
        self.byte_level = bool(byte_level)
        self.add_prefix_space = bool(add_prefix_space)
        # SentencePiece convention (r14): each word applies as
        # marker+word (▁the) with the marker as an ordinary character
        # symbol, so an SP-BPE merge table applies VERBATIM — the
        # UnigramTokenizer.space_marker analogue
        self.space_marker = str(space_marker)

    @staticmethod
    def _apply_word(word: str, ranks: dict) -> list[str]:
        parts = list(word)
        while len(parts) > 1:
            best, bi = None, -1
            for i in range(len(parts) - 1):
                r = ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            parts[bi:bi + 2] = [parts[bi] + parts[bi + 1]]
        return parts

    def _udf(self, want_pieces: bool):
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        ranks = {pair: i for i, pair in enumerate(self.merges)}
        lower = self.lowercase
        byte_level = self.byte_level
        prefix_space = self.add_prefix_space
        marker = self.space_marker
        b2u = _bytes_to_unicode() if byte_level else None
        contractions = _CONTRACTIONS

        # inlined (not self._apply_word): cloudpickle then ships the
        # function BY VALUE, so executors don't need blaze_spark
        # importable to unpickle the UDF
        def apply_word(word, ranks=ranks):
            parts = list(word)
            while len(parts) > 1:
                best, bi = None, -1
                for i in range(len(parts) - 1):
                    r = ranks.get((parts[i], parts[i + 1]))
                    if r is not None and (best is None or r < best):
                        best, bi = r, i
                if best is None:
                    break
                parts[bi:bi + 2] = [parts[bi] + parts[bi + 1]]
            return parts

        def pretok(text, contractions=contractions):
            # _gpt2_pretokenize inlined by value (see apply_word note)
            out = []
            i, L = 0, len(text)
            while i < L:
                ch = text[i]
                hit = None
                if ch == "'":
                    for c in contractions:
                        if text.startswith(c, i):
                            hit = c
                            break
                if hit is not None:
                    out.append(hit)
                    i += len(hit)
                    continue
                j = i
                sp = ""
                if ch == " " and i + 1 < L and not text[i + 1].isspace():
                    sp = " "
                    j = i + 1
                    ch = text[j]
                if ch.isalpha():
                    k = j + 1
                    while k < L and text[k].isalpha():
                        k += 1
                    out.append(sp + text[j:k])
                    i = k
                    continue
                if ch.isnumeric():
                    k = j + 1
                    while k < L and text[k].isnumeric():
                        k += 1
                    out.append(sp + text[j:k])
                    i = k
                    continue
                if not ch.isspace():
                    k = j + 1
                    while k < L and not (text[k].isspace()
                                         or text[k].isalpha()
                                         or text[k].isnumeric()):
                        k += 1
                    out.append(sp + text[j:k])
                    i = k
                    continue
                k = i + 1
                while k < L and text[k].isspace():
                    k += 1
                if k == L:
                    out.append(text[i:k])
                    i = k
                elif k - i == 1:
                    out.append(ch)
                    i = k
                else:
                    out.append(text[i:k - 1])
                    i = k - 1
            return out

        def units_of(text, b2u=b2u):
            if byte_level:
                if prefix_space and text and not text[0].isspace():
                    text = " " + text
                return ["".join(b2u[b] for b in u.encode("utf-8"))
                        for u in pretok(text)]
            if marker:
                return [marker + w for w in text.split()]
            return text.split()

        def _tok(s):
            memo: dict = {}
            out = []
            for text in s:
                # byte-level counts whitespace-only text too (GPT-2
                # emits real tokens for "\n\n"); the word modes keep
                # the package's blank-text → 0-token convention
                if text is None or (not byte_level and not text.strip()) \
                        or not text:
                    out.append([] if want_pieces else 0)
                    continue
                t = text.lower() if lower else text
                if want_pieces:
                    acc = []
                    for w in units_of(t):
                        got = memo.get(w)
                        if got is None:
                            got = apply_word(w)
                            memo[w] = got
                        acc.extend(got)
                    out.append(acc)
                else:
                    n = 0
                    for w in units_of(t):
                        got = memo.get(w)
                        if got is None:
                            got = len(apply_word(w))
                            memo[w] = got
                        n += got
                    out.append(n)
            return pd.Series(out)

        _tok.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return pandas_udf(_tok, "array<string>" if want_pieces
                          else "long")

    def pieces(self, col: Column) -> Column:
        return self._udf(want_pieces=True)(col)

    def n_tokens(self, col: Column) -> Column:
        return self._udf(want_pieces=False)(col)

    def detokenize(self, pieces: Column) -> Column:
        """byte_level=True: EXACT inverse — concatenate pieces and map
        each symbol back through the byte table, so a chunk's text is
        the original byte span verbatim (whitespace runs included).  A
        chunk boundary can split a multi-byte codepoint (pieces are
        merge units over BYTES); such a dangling prefix/suffix decodes
        as U+FFFD, pinned in pytest.  Non-byte-level keeps the lossy
        space join."""
        if not self.byte_level:
            if self.space_marker:
                # the marker form is exactly invertible (the Unigram
                # detokenize scheme): concatenate, markers -> spaces
                return F.trim(F.replace(
                    F.array_join(pieces, ""),
                    F.lit(self.space_marker), F.lit(" ")))
            return super().detokenize(pieces)
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        inv = {c: b for b, c in _bytes_to_unicode().items()}

        def _detok(s):
            out = []
            for ps in s:
                if ps is None:
                    out.append(None)
                    continue
                joined = "".join(ps)
                out.append(bytes(inv[ch] for ch in joined)
                           .decode("utf-8", errors="replace"))
            return pd.Series(out)

        _detok.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return pandas_udf(_detok, "string")(pieces)

    def to_wire(self) -> dict:
        enc = {"kind": "bpe",
               "merges": [[a, b] for a, b in self.merges],
               "lowercase": self.lowercase}
        # emitted only when set: default plans keep the r13 wire form
        # byte-identical and a pre-byte-level server rejects loudly
        # instead of silently counting in character-BPE tokens
        if self.byte_level:
            enc["byte_level"] = True
        if self.add_prefix_space:
            enc["add_prefix_space"] = True
        if self.space_marker:
            # emitted only when set: pre-r14 servers reject loudly
            # instead of silently applying without the marker space
            enc["space_marker"] = self.space_marker
        return enc

    @classmethod
    def from_tokenizer_json(cls, path: str, lowercase: bool | None = None):
        """Load a HuggingFace ``tokenizer.json`` (the serialized
        ``tokenizers`` pipeline — a PUBLIC, documented format):
        ``model.type`` must be ``"BPE"``; ``model.merges`` supplies
        the ranks (either ``"a b"`` strings or ``["a", "b"]`` pairs);
        a ``ByteLevel`` pre-tokenizer anywhere in the
        ``pre_tokenizer`` chain switches on the GPT-2 byte scheme and
        carries ``add_prefix_space``; a ``Lowercase`` normalizer (or
        ``BertNormalizer`` with ``lowercase: true``) sets lowercase
        unless the argument overrides it.  Other counting-irrelevant
        components (strip/NFC normalizers, post-processor, decoder,
        added special tokens) are ignored — document budgets count
        content tokens."""
        import json

        with open(path) as f:
            spec = json.load(f)
        if not isinstance(spec, dict) or "model" not in spec:
            raise ValueError(
                f"{path} is not a tokenizer.json (no 'model' key)")
        if lowercase is None:
            lowercase = _spec_lowercase(spec)
        model = spec["model"]
        mtype = model.get("type")
        if mtype != "BPE":
            raise ValueError(
                f"{path}: model.type is {mtype!r} — only BPE merges "
                "tables apply here (WordPiece artifacts load as "
                "WordPieceTokenizer.from_tokenizer_json)")
        merges = []
        for m in model.get("merges", []):
            if isinstance(m, str):
                a, sep, b = m.partition(" ")
                if not sep:
                    raise ValueError(
                        f"{path}: malformed merge entry {m!r}")
                merges.append((a, b))
            else:
                if len(m) != 2:
                    raise ValueError(
                        f"{path}: malformed merge entry {m!r}")
                merges.append((m[0], m[1]))
        byte_level = False
        add_prefix_space = False
        pre = spec.get("pre_tokenizer") or {}
        chain = pre.get("pretokenizers", [pre]) \
            if pre.get("type") == "Sequence" else [pre]
        for p in chain:
            if isinstance(p, dict) and p.get("type") == "ByteLevel":
                byte_level = True
                add_prefix_space = bool(p.get("add_prefix_space",
                                              False))
        return cls(merges, lowercase=lowercase, byte_level=byte_level,
                   add_prefix_space=add_prefix_space)

    @classmethod
    def from_merges_txt(cls, path: str, lowercase: bool = False,
                        byte_level: bool = True,
                        add_prefix_space: bool = False):
        """Load a GPT-2-style ``merges.txt`` (the format of the
        original GPT-2 release and every HF ``save_pretrained`` BPE):
        one ``a b`` pair per line in rank order, ``#``-prefixed
        header/comment lines skipped.  These artifacts are byte-level
        in practice, so ``byte_level`` defaults True here."""
        merges = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                a, sep, b = line.partition(" ")
                if not sep or not a or not b or " " in b:
                    raise ValueError(
                        f"{path}: malformed merges line {line!r} — "
                        "expected exactly 'left right' per line")
                merges.append((a, b))
        return cls(merges, lowercase=lowercase, byte_level=byte_level,
                   add_prefix_space=add_prefix_space)

    @classmethod
    def from_sentencepiece(cls, path: str,
                           lowercase: bool | None = None):
        """Load a SentencePiece BPE ``.model`` (r14 — the companion of
        ``UnigramTokenizer.from_sentencepiece``; same hand-rolled
        ModelProto walker, no package dependency).  SP-BPE stores no
        explicit merge list — but it doesn't need to: the trainer
        appends each newly merged symbol to the piece table IN MERGE
        ORDER, so file order IS the merge ranking.  The merge list is
        reconstructed the way HF's converter does it: for each
        multi-char piece (in file order), the split into two earlier
        pieces with the lowest (left rank, right rank) is its merge.
        Exact whenever each merged piece has a unique split into two
        existing pieces (the overwhelmingly common case); an ambiguous
        piece resolves to the lowest-rank split, matching the public
        extractor.  O(Σ piece-length) splits tried — never O(V²).

        Pieces apply in SentencePiece marker space: each word segments
        as ``▁word`` with ``▁`` an ordinary character symbol
        (``space_marker`` mode), so the artifact's merges apply
        VERBATIM.  CONTROL/UNKNOWN/UNUSED/BYTE pieces never merge and
        are excluded from the reconstruction."""
        raw, model_type, norm_name = _parse_sentencepiece(path)
        if model_type != 2:
            names = {1: "UNIGRAM", 3: "WORD", 4: "CHAR"}
            got = names.get(model_type, model_type)
            hint = ("use UnigramTokenizer.from_sentencepiece"
                    if model_type == 1 else
                    "only UNIGRAM and BPE SentencePiece models load")
            raise ValueError(
                f"{path}: model_type is {got} — this is the BPE "
                f"importer ({hint})")
        rank: dict = {}
        for piece, _score, ptype in raw:
            if ptype in (1, 4) and piece not in rank:
                rank[piece] = len(rank)
        if not rank:
            raise ValueError(
                f"{path}: no NORMAL/USER_DEFINED pieces found — not a "
                "SentencePiece model?")
        merges = []
        for piece in rank:
            if len(piece) < 2:
                continue
            rp = rank[piece]
            best = None
            for i in range(1, len(piece)):
                left, right = piece[:i], piece[i:]
                rl, rr = rank.get(left), rank.get(right)
                if rl is None or rr is None:
                    continue
                # components must PRECEDE the merged symbol in file
                # order — a merge at training step t can only combine
                # symbols that already existed before t
                if rl >= rp or rr >= rp:
                    continue
                if best is None or (rl, rr) < best[:2]:
                    best = (rl, rr, left, right)
            if best is not None:
                merges.append((best[2], best[3]))
        marker = "▁" if any("▁" in p for p in rank) else ""
        if lowercase is None:
            lowercase = norm_name.endswith("_cf")
        return cls(merges, lowercase=bool(lowercase),
                   space_marker=marker)


def _spec_lowercase(spec: dict) -> bool:
    """Detect a lowercasing normalizer in a tokenizer.json spec: a
    bare/chained ``Lowercase``, or ``BertNormalizer`` with
    ``lowercase: true`` (its default)."""
    norm = spec.get("normalizer") or {}
    chain = norm.get("normalizers", [norm]) \
        if norm.get("type") == "Sequence" else [norm]
    for p in chain:
        if not isinstance(p, dict):
            continue
        if p.get("type") == "Lowercase":
            return True
        if p.get("type") == "BertNormalizer" and \
                bool(p.get("lowercase", True)):
            return True
    return False


def tokenizer_from_wire(enc) -> Tokenizer | None:
    """Rebuild a tokenizer from its wire dict; hostile/mis-shaped nodes
    fail the same way a bad local construction does."""
    if enc is None:
        return None
    if isinstance(enc, Tokenizer):
        return enc
    if not isinstance(enc, dict) or "kind" not in enc:
        raise ValueError(
            "tokenizer wire form must be a dict with a 'kind' key "
            f"(a Tokenizer.to_wire() result), got {type(enc).__name__}")
    kind = enc["kind"]
    lower = bool(enc.get("lowercase", False))
    if kind == "whitespace":
        _expect_keys(enc, {"kind", "lowercase"})
        return WhitespaceTokenizer(lowercase=lower)
    if kind == "vocab":
        _expect_keys(enc, {"kind", "vocab", "fallback_chars",
                           "lowercase"})
        return VocabTokenizer(enc["vocab"],
                              fallback_chars=int(enc["fallback_chars"]),
                              lowercase=lower)
    if kind == "wordpiece":
        _expect_keys(enc, {"kind", "vocab", "unk_token",
                           "max_input_chars_per_word", "lowercase"})
        return WordPieceTokenizer(
            enc["vocab"], unk_token=str(enc["unk_token"]),
            max_input_chars_per_word=int(
                enc["max_input_chars_per_word"]),
            lowercase=lower)
    if kind == "bpe":
        _expect_keys(enc, {"kind", "merges", "lowercase",
                           "byte_level", "add_prefix_space",
                           "space_marker"})
        return BPETokenizer(
            enc["merges"], lowercase=lower,
            byte_level=bool(enc.get("byte_level", False)),
            add_prefix_space=bool(enc.get("add_prefix_space", False)),
            space_marker=str(enc.get("space_marker", "")))
    if kind == "unigram":
        _expect_keys(enc, {"kind", "vocab", "lowercase", "unk_logp",
                           "space_marker"})
        return UnigramTokenizer(
            enc["vocab"], lowercase=lower,
            unk_logp=float(enc["unk_logp"]),
            space_marker=str(enc.get("space_marker", "")))
    raise ValueError(
        f"unknown tokenizer kind {kind!r} — re-serialize with a "
        "matching client version")


def _expect_keys(enc: dict, allowed: set):
    bad = set(enc) - allowed
    if bad:
        raise ValueError(
            f"tokenizer wire form carries unknown key(s) {sorted(bad)} "
            "— re-serialize with a matching client version")


def _tokenizer_wire(tok) -> dict | None:
    """Encode for a node's kwargs: None stays absent (default plans
    keep the r12 form — an old server rejects tokenizer-carrying nodes
    loudly instead of silently recounting in whitespace tokens)."""
    if tok is None:
        return None
    if not isinstance(tok, Tokenizer):
        raise TypeError(
            "tokenizer must be a blaze_spark Tokenizer (Whitespace/"
            f"Vocab/BPE), got {type(tok).__name__}")
    return tok.to_wire()


class WordPieceTokenizer(Tokenizer):
    """TRUE WordPiece (the BERT scheme, Devlin et al. 2019 /
    Wu et al. 2016): per whitespace word, greedy LONGEST-match-first
    over the vocabulary, continuation pieces carrying the ``##``
    prefix; a word with any unmatchable remainder (or longer than
    ``max_input_chars_per_word``) becomes one ``unk_token``.  This is
    the exact tokenization a BERT-family trainer applies, so a real
    ``vocab.txt`` counts trainer-true tokens — where
    :class:`VocabTokenizer` is the deliberately SQL-expressible
    whole-word-or-char-chunk APPROXIMATION of the same artifact.

    Same execution shape as BPE: an Arrow-batched pandas UDF with a
    per-batch word memo, the vocabulary as a by-value closure set
    (bounded at ``_MAX_BUCKETS`` entries); rows-only in the registry
    (the greedy loop is not SQL-expressible), pinned in pytest against
    hand-derived BERT tokenizations.
    """

    def __init__(self, vocab, unk_token: str = "[UNK]",
                 max_input_chars_per_word: int = 100,
                 lowercase: bool = False):
        if isinstance(vocab, DataFrame):
            if len(vocab.columns) != 1:
                raise ValueError(
                    "vocab DataFrame must have exactly one string "
                    f"column, got {vocab.columns}")
            rows = vocab.limit(_MAX_BUCKETS + 1).collect()
            vocab = [r[0] for r in rows if r[0] is not None]
        vocab = list(dict.fromkeys(str(w) for w in vocab))
        if len(vocab) > _MAX_BUCKETS:
            raise ValueError(
                f"vocab has more than {_MAX_BUCKETS} entries — "
                "vocabularies ship as bounded literal relations")
        if max_input_chars_per_word < 1:
            raise ValueError(
                "max_input_chars_per_word must be >= 1, got "
                f"{max_input_chars_per_word}")
        self.vocab = vocab
        self.unk_token = str(unk_token)
        self.max_input_chars_per_word = int(max_input_chars_per_word)
        self.lowercase = bool(lowercase)

    @staticmethod
    def _apply_word(word: str, vocab: set, unk: str,
                    max_chars: int) -> list:
        if len(word) > max_chars:
            return [unk]
        pieces, start, n = [], 0, len(word)
        while start < n:
            end = n
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [unk]      # BERT: ANY bad span -> whole-word UNK
            pieces.append(cur)
            start = end
        return pieces

    def _udf(self, want_pieces: bool):
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        vocab = set(self.vocab)
        unk = self.unk_token
        max_chars = self.max_input_chars_per_word
        lower = self.lowercase

        # inlined by value (the apply_word convention): executors
        # never import blaze_spark to unpickle the UDF; the sync pin
        # compares against the module-level _apply_word
        def apply_word(word, vocab=vocab, unk=unk,
                       max_chars=max_chars):
            if len(word) > max_chars:
                return [unk]
            pieces, start, n = [], 0, len(word)
            while start < n:
                end = n
                cur = None
                while start < end:
                    sub = word[start:end]
                    if start > 0:
                        sub = "##" + sub
                    if sub in vocab:
                        cur = sub
                        break
                    end -= 1
                if cur is None:
                    return [unk]
                pieces.append(cur)
                start = end
            return pieces

        def _tok(s):
            memo: dict = {}
            out = []
            for text in s:
                if text is None or not text.strip():
                    out.append([] if want_pieces else 0)
                    continue
                t = text.lower() if lower else text
                if want_pieces:
                    acc = []
                    for w in t.split():
                        got = memo.get(w)
                        if got is None:
                            got = apply_word(w)
                            memo[w] = got
                        acc.extend(got)
                    out.append(acc)
                else:
                    n = 0
                    for w in t.split():
                        got = memo.get(w)
                        if got is None:
                            got = len(apply_word(w))
                            memo[w] = got
                        n += got
                    out.append(n)
            return pd.Series(out)

        _tok.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return pandas_udf(_tok, "array<string>" if want_pieces
                          else "long")

    def pieces(self, col: Column) -> Column:
        return self._udf(want_pieces=True)(col)

    def n_tokens(self, col: Column) -> Column:
        return self._udf(want_pieces=False)(col)

    def to_wire(self) -> dict:
        return {"kind": "wordpiece", "vocab": list(self.vocab),
                "unk_token": self.unk_token,
                "max_input_chars_per_word":
                    self.max_input_chars_per_word,
                "lowercase": self.lowercase}

    @classmethod
    def from_vocab_file(cls, path: str, unk_token: str = "[UNK]",
                        max_input_chars_per_word: int = 100,
                        lowercase: bool = False):
        """Load a BERT ``vocab.txt`` (one token per line, ``##``
        continuations included) or a ``vocab.json`` dict/list — the
        same formats :meth:`VocabTokenizer.from_vocab_file` reads,
        applied with the TRUE WordPiece algorithm."""
        if path.endswith(".json"):
            import json

            with open(path, encoding="utf-8") as f:
                spec = json.load(f)
            if isinstance(spec, dict):
                words = list(spec.keys())
            elif isinstance(spec, list):
                words = [str(w) for w in spec]
            else:
                raise ValueError(
                    f"{path}: vocab JSON must be a dict or list, got "
                    f"{type(spec).__name__}")
        else:
            with open(path, encoding="utf-8") as f:
                words = [ln.rstrip("\n") for ln in f]
            words = [w for w in words if w]
        return cls(words, unk_token=unk_token,
                   max_input_chars_per_word=max_input_chars_per_word,
                   lowercase=lowercase)

    @classmethod
    def from_tokenizer_json(cls, path: str,
                            lowercase: bool | None = None):
        """Load a HuggingFace ``tokenizer.json`` whose ``model.type``
        is ``WordPiece`` (the BERT-family export): vocabulary,
        ``unk_token`` and ``max_input_chars_per_word`` come from the
        model block; a ``Lowercase``/``BertNormalizer`` normalizer
        sets lowercase unless the argument overrides it."""
        import json

        with open(path) as f:
            spec = json.load(f)
        if not isinstance(spec, dict) or "model" not in spec:
            raise ValueError(
                f"{path} is not a tokenizer.json (no 'model' key)")
        model = spec["model"]
        mtype = model.get("type")
        if mtype != "WordPiece":
            raise ValueError(
                f"{path}: model.type is {mtype!r} — BPE artifacts "
                "load as BPETokenizer.from_tokenizer_json")
        vocab = model.get("vocab")
        if not isinstance(vocab, dict) or not vocab:
            raise ValueError(
                f"{path}: WordPiece model carries no vocab dict")
        if lowercase is None:
            lowercase = _spec_lowercase(spec)
        return cls(list(vocab.keys()),
                   unk_token=str(model.get("unk_token", "[UNK]")),
                   max_input_chars_per_word=int(
                       model.get("max_input_chars_per_word", 100)),
                   lowercase=bool(lowercase))


class UnigramTokenizer(Tokenizer):
    """Unigram-LM tokenizer (Kudo 2018 — the SentencePiece default
    model): per whitespace word, the VITERBI segmentation maximizing
    the sum of per-piece log-probabilities.  ``vocab`` is
    ``{piece: logp}`` (or (piece, logp) pairs, logp ≤ 0).  A single
    character outside the vocabulary segments as itself at
    ``unk_logp`` (the char-level analogue of SentencePiece's
    byte-fallback), so every word is representable and nothing
    silently drops.  Ties prefer the LONGER piece at each boundary
    (deterministic, pinned).  Same Arrow-batched-UDF execution shape
    as BPE/WordPiece — rows-only in the registry (dynamic programming
    is not SQL-expressible); train one with
    ``tokenizer_train.train_unigram`` or load probabilities from any
    artifact.  Completes the big-three subword families
    (BPE / WordPiece / Unigram)."""

    def __init__(self, vocab, lowercase: bool = False,
                 unk_logp: float = -20.0, space_marker: str = ""):
        items = vocab.items() if isinstance(vocab, dict) else list(vocab)
        pieces: dict = {}
        for p, lp in items:
            p, lp = str(p), float(lp)
            if not p:
                raise ValueError("unigram vocab carries an empty piece")
            if lp > 0.0:
                raise ValueError(
                    f"piece log-probs must be <= 0, got {p!r}: {lp}")
            pieces.setdefault(p, lp)     # first occurrence wins
        if len(pieces) > _MAX_BUCKETS:
            raise ValueError(
                f"vocab has more than {_MAX_BUCKETS} pieces — "
                "vocabularies ship as bounded literal relations")
        if not float(unk_logp) < 0.0:
            raise ValueError(
                f"unk_logp must be < 0, got {unk_logp}")
        self.vocab = pieces
        self.lowercase = bool(lowercase)
        self.unk_logp = float(unk_logp)
        # SentencePiece convention: each word segments as marker+word
        # (▁the), so real SP/HF-Unigram vocabularies apply VERBATIM —
        # the analogue of byte-level BPE's Ġ space gluing
        self.space_marker = str(space_marker)
        self.max_piece_len = max((len(p) for p in pieces), default=1)

    @staticmethod
    def _apply_word(word: str, vocab: dict, unk_logp: float,
                    max_len: int) -> list:
        n = len(word)
        NEG = float("-inf")
        best = [0.0] + [NEG] * n
        back = [0] * (n + 1)          # start index of the best piece
        for e in range(1, n + 1):
            # s ascending ⇒ the LONGEST piece writes first; strict >
            # keeps it on ties (deterministic)
            for s in range(max(0, e - max_len), e):
                lp = vocab.get(word[s:e])
                if lp is None and e - s == 1:
                    lp = unk_logp
                if lp is None or best[s] == NEG:
                    continue
                cand = best[s] + lp
                if cand > best[e]:
                    best[e] = cand
                    back[e] = s
        out, e = [], n
        while e > 0:
            s = back[e]
            out.append(word[s:e])
            e = s
        out.reverse()
        return out

    def _udf(self, want_pieces: bool):
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        vocab = dict(self.vocab)
        unk = self.unk_logp
        max_len = max(self.max_piece_len, 1)
        lower = self.lowercase
        marker = self.space_marker
        NEG = float("-inf")

        # inlined by value (the apply_word convention): executors
        # never import blaze_spark to unpickle the UDF; the sync pin
        # compares against the module-level _apply_word
        def apply_word(word, vocab=vocab, unk=unk, max_len=max_len):
            n = len(word)
            best = [0.0] + [NEG] * n
            back = [0] * (n + 1)
            for e in range(1, n + 1):
                for s in range(max(0, e - max_len), e):
                    lp = vocab.get(word[s:e])
                    if lp is None and e - s == 1:
                        lp = unk
                    if lp is None or best[s] == NEG:
                        continue
                    cand = best[s] + lp
                    if cand > best[e]:
                        best[e] = cand
                        back[e] = s
            out, e = [], n
            while e > 0:
                s = back[e]
                out.append(word[s:e])
                e = s
            out.reverse()
            return out

        def _tok(s):
            memo: dict = {}
            out = []
            for text in s:
                if text is None or not text.strip():
                    out.append([] if want_pieces else 0)
                    continue
                t = text.lower() if lower else text
                if want_pieces:
                    acc = []
                    for w in t.split():
                        got = memo.get(w)
                        if got is None:
                            got = apply_word(marker + w)
                            memo[w] = got
                        acc.extend(got)
                    out.append(acc)
                else:
                    k = 0
                    for w in t.split():
                        got = memo.get(w)
                        if got is None:
                            got = len(apply_word(marker + w))
                            memo[w] = got
                        k += got
                    out.append(k)
            return pd.Series(out)

        _tok.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return pandas_udf(_tok, "array<string>" if want_pieces
                          else "long")

    def pieces(self, col: Column) -> Column:
        return self._udf(want_pieces=True)(col)

    def n_tokens(self, col: Column) -> Column:
        return self._udf(want_pieces=False)(col)

    def detokenize(self, pieces: Column) -> Column:
        if not self.space_marker:
            return F.array_join(pieces, " ")
        # the marker form is exactly invertible: concatenate, turn
        # markers back into spaces, trim the leading one
        return F.trim(F.replace(F.array_join(pieces, ""),
                                F.lit(self.space_marker), F.lit(" ")))

    def to_wire(self) -> dict:
        return {"kind": "unigram",
                "vocab": sorted([p, lp] for p, lp in self.vocab.items()),
                "lowercase": self.lowercase,
                "unk_logp": self.unk_logp,
                "space_marker": self.space_marker}

    @classmethod
    def from_tokenizer_json(cls, path: str,
                            lowercase: bool | None = None):
        """Load a HuggingFace ``tokenizer.json`` Unigram model (the
        SentencePiece family — T5 / XLM-R / mBART ship this):
        ``model.type`` must be ``"Unigram"``; ``model.vocab`` is the
        ``[piece, logp]`` list.  If any piece carries the
        SentencePiece word marker ``▁``, segmentation runs in marker
        space (each word as ``▁word``) so the artifact's pieces apply
        VERBATIM and counts are trainer-true.  The ``unk_id`` piece
        is excluded from matching (it is a control token) and its
        score — clamped below 0 — becomes the char-fallback
        ``unk_logp``.  Scores of 0 are kept (valid log-probs);
        normalizer handling matches the other importers."""
        import json

        with open(path) as f:
            spec = json.load(f)
        if not isinstance(spec, dict) or "model" not in spec:
            raise ValueError(
                f"{path} is not a tokenizer.json (no 'model' key)")
        model = spec["model"]
        mtype = model.get("type")
        if mtype != "Unigram":
            raise ValueError(
                f"{path}: model.type is {mtype!r} — BPE/WordPiece "
                "artifacts load through their own from_tokenizer_json")
        vocab = model.get("vocab")
        if not isinstance(vocab, list) or not vocab:
            raise ValueError(
                f"{path}: Unigram model carries no [piece, logp] "
                "vocab list")
        unk_id = model.get("unk_id")
        unk_logp = -20.0
        entries = []
        for idx, pair in enumerate(vocab):
            if not isinstance(pair, (list, tuple)) or len(pair) != 2:
                raise ValueError(
                    f"{path}: malformed vocab entry {pair!r}")
            p, lp = str(pair[0]), float(pair[1])
            if unk_id is not None and idx == int(unk_id):
                unk_logp = min(lp, -1e-9)
                continue
            entries.append((p, min(lp, 0.0)))
        marker = "▁" if any("▁" in p for p, _ in entries) else ""
        if lowercase is None:
            lowercase = _spec_lowercase(spec)
        return cls(entries, lowercase=bool(lowercase),
                   unk_logp=unk_logp, space_marker=marker)

    @classmethod
    def from_sentencepiece(cls, path: str,
                           lowercase: bool | None = None):
        """Load a SentencePiece ``.model`` file DIRECTLY (VERDICT r13
        missing #3) — the single most common tokenizer artifact for
        multilingual LMs (T5/XLM-R/mBART/Llama ship one).  The file is
        a serialized ``ModelProto`` (sentencepiece_model.proto, a
        stable public format); the container has neither the
        `sentencepiece` nor the `protobuf` package, so
        :func:`_pb_fields` walks the protobuf wire format by hand —
        varint keys, 32-bit floats, length-delimited submessages are
        the whole grammar this message needs.

        Field map (public proto): ModelProto.pieces = 1 (repeated
        SentencePiece{piece=1 string, score=2 float, type=3 enum}),
        trainer_spec = 2 (model_type = 3: UNIGRAM=1/BPE=2/WORD=3/
        CHAR=4), normalizer_spec = 3 (name = 1).  Only UNIGRAM models
        load (the SentencePiece default; SP-BPE encodes merges
        implicitly in scores and is a different algorithm).  Piece
        types: NORMAL(1) and USER_DEFINED(4) match verbatim;
        UNKNOWN(2)'s score (clamped < 0) becomes the char-fallback
        ``unk_logp``; CONTROL(3)/UNUSED(5)/BYTE(6) are not segmentable
        text pieces and are skipped (this tokenizer's fallback is
        char-level, the UnigramTokenizer contract).  ``lowercase``
        defaults to whether the normalizer name ends in ``_cf``
        (SentencePiece's NFKC + case-folding rules, e.g.
        ``nmt_nfkc_cf``).  The ``▁`` word marker is detected from the
        pieces exactly like the HF importer, so segmentation runs in
        marker space and the artifact applies VERBATIM."""
        raw, model_type, norm_name = _parse_sentencepiece(path)
        if model_type != 1:
            names = {2: "BPE", 3: "WORD", 4: "CHAR"}
            got = names.get(model_type, model_type)
            hint = ("use BPETokenizer.from_sentencepiece"
                    if model_type == 2 else
                    "only UNIGRAM and BPE SentencePiece models load")
            raise ValueError(
                f"{path}: model_type is {got} — this is the UNIGRAM "
                f"importer ({hint})")
        pieces: list = []
        unk_logp = -20.0
        for piece, score, ptype in raw:
            if ptype == 2:                       # UNKNOWN
                unk_logp = min(float(score), -1e-9)
            elif ptype in (1, 4):                # NORMAL, USER_DEFINED
                pieces.append((piece, min(float(score), 0.0)))
        if not pieces:
            raise ValueError(
                f"{path}: no NORMAL/USER_DEFINED pieces found — not a "
                "SentencePiece model?")
        marker = "▁" if any("▁" in p for p, _ in pieces) else ""
        if lowercase is None:
            lowercase = norm_name.endswith("_cf")
        return cls(pieces, lowercase=bool(lowercase),
                   unk_logp=unk_logp, space_marker=marker)


def _parse_sentencepiece(path: str) -> tuple:
    """Parse a SentencePiece ``.model`` (serialized ModelProto) with
    the hand-rolled protobuf walker: returns (pieces, model_type,
    normalizer_name) where pieces is the FILE-ORDER list of (piece,
    score, type) triples — file order IS merge/vocab order, which the
    BPE importer's merge reconstruction depends on.  Field map per the
    public sentencepiece_model.proto: ModelProto.pieces=1
    (SentencePiece{piece=1, score=2 float, type=3 enum: NORMAL=1,
    UNKNOWN=2, CONTROL=3, USER_DEFINED=4, UNUSED=5, BYTE=6}),
    trainer_spec=2 (model_type=3: UNIGRAM=1/BPE=2/WORD=3/CHAR=4),
    normalizer_spec=3 (name=1)."""
    import struct

    with open(path, "rb") as f:
        buf = f.read()
    pieces: list = []
    model_type = 1              # proto default: UNIGRAM
    norm_name = ""
    try:
        for fn, wt, v in _pb_fields(buf):
            if fn == 1 and wt == 2:              # SentencePiece
                piece = None
                score = 0.0
                ptype = 1                        # proto default NORMAL
                for f2, w2, v2 in _pb_fields(v):
                    if f2 == 1 and w2 == 2:
                        piece = v2.decode("utf-8")
                    elif f2 == 2 and w2 == 5:
                        score = struct.unpack("<f", v2)[0]
                    elif f2 == 3 and w2 == 0:
                        ptype = v2
                if piece is not None:
                    pieces.append((piece, float(score), ptype))
            elif fn == 2 and wt == 2:            # TrainerSpec
                for f2, w2, v2 in _pb_fields(v):
                    if f2 == 3 and w2 == 0:
                        model_type = v2
            elif fn == 3 and wt == 2:            # NormalizerSpec
                for f2, w2, v2 in _pb_fields(v):
                    if f2 == 1 and w2 == 2:
                        norm_name = v2.decode("utf-8", "replace")
    except (IndexError, UnicodeDecodeError, ValueError) as e:
        raise ValueError(
            f"{path} is not a SentencePiece model (truncated or "
            f"malformed protobuf: {e})") from None
    return pieces, model_type, norm_name


def _pb_varint(buf: bytes, i: int) -> tuple:
    """Decode one base-128 varint at offset ``i``; (value, next)."""
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7
        if shift > 63:
            raise ValueError("varint longer than 64 bits")


def _pb_fields(buf: bytes):
    """Iterate a protobuf message's (field_number, wire_type, value)
    triples — the three wire types this format uses: 0 = varint
    (value is the int), 2 = length-delimited (value is the bytes,
    recursively parseable for submessages), 5/1 = fixed 32/64 (value
    is the raw little-endian bytes).  Unknown fields pass through
    unharmed, exactly per protobuf's forward-compat contract."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _pb_varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _pb_varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _pb_varint(buf, i)
            if i + ln > n:
                raise IndexError("length-delimited field overruns")
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(
                f"unsupported protobuf wire type {wt} (group fields "
                "do not appear in sentencepiece_model.proto)")
        if wt in (1, 5) and len(v) != (8 if wt == 1 else 4):
            raise IndexError("fixed-width field overruns")
        yield fn, wt, v


def _pb_varint_enc(v: int) -> bytes:
    """Encode one base-128 varint (the writer half of _pb_varint)."""
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _pb_ld(field: int, payload: bytes) -> bytes:
    """One length-delimited protobuf field (wire type 2)."""
    return (_pb_varint_enc((field << 3) | 2)
            + _pb_varint_enc(len(payload)) + payload)


def _pb_f32(field: int, value: float) -> bytes:
    """One fixed-32 float field (wire type 5)."""
    import struct

    return _pb_varint_enc((field << 3) | 5) + struct.pack("<f", value)


def _pb_vi(field: int, value: int) -> bytes:
    """One varint field (wire type 0)."""
    return _pb_varint_enc((field << 3) | 0) + _pb_varint_enc(value)


def _write_sentencepiece(path: str, pieces, model_type: int,
                         lowercase: bool) -> None:
    """Serialize a ModelProto (the writer half of
    :func:`_parse_sentencepiece`; same public field map): ``pieces``
    is [(text, score, type), ...] in FILE ORDER — which is
    vocab/merge order, the property the importers' reconstruction
    depends on.  The normalizer name records case handling
    (``nmt_nfkc_cf`` ⇄ lowercase, the SentencePiece convention the
    importer auto-detects)."""
    buf = b""
    for text, score, ptype in pieces:
        sub = _pb_ld(1, text.encode("utf-8")) + _pb_f32(2, float(score))
        if ptype != 1:            # NORMAL is the proto default
            sub += _pb_vi(3, int(ptype))
        buf += _pb_ld(1, sub)
    buf += _pb_ld(2, _pb_vi(3, int(model_type)))          # TrainerSpec
    name = "nmt_nfkc_cf" if lowercase else "nmt_nfkc"
    buf += _pb_ld(3, _pb_ld(1, name.encode()))            # Normalizer
    with open(path, "wb") as f:
        f.write(buf)


def _unigram_to_sentencepiece(self, path: str) -> None:
    """Export this Unigram model as a SentencePiece ``.model`` (r14 —
    the import's inverse, closing the artifact loop for SP-ecosystem
    consumers): ``<unk>`` first carrying ``unk_logp`` as the UNKNOWN
    piece, then the vocabulary in deterministic (logp DESC, piece ASC)
    order with NORMAL type.  ``from_sentencepiece(to_sentencepiece(x))``
    rebuilds an equivalent tokenizer (pinned in pytest) — scores pass
    through the proto's FLOAT32, SentencePiece's own precision, so
    float64 log-probs quantize to f32 on the way out (segmentation is
    unaffected except on sub-f32 ties).  The ▁ marker
    needs no metadata — it lives in the pieces, exactly how real SP
    artifacts carry it."""
    pieces = [("<unk>", float(self.unk_logp), 2)]
    pieces += [(p, float(lp), 1)
               for p, lp in sorted(self.vocab.items(),
                                   key=lambda kv: (-kv[1], kv[0]))]
    _write_sentencepiece(path, pieces, model_type=1,
                         lowercase=self.lowercase)


UnigramTokenizer.to_sentencepiece = _unigram_to_sentencepiece


def _bpe_to_sentencepiece(self, path: str) -> None:
    """Export this BPE model as a SentencePiece BPE ``.model``:
    alphabet (every single character appearing in the merge table)
    first, then each MERGED symbol in merge creation order — the
    serialization shape SP-BPE itself writes and the importer's
    reconstruction assumes.  Byte-level (GPT-2) models refuse: SP has
    no byte-to-unicode mode, and a silent re-interpretation as
    character BPE would change every count."""
    if self.byte_level:
        raise ValueError(
            "to_sentencepiece: byte-level (GPT-2) BPE has no "
            "SentencePiece representation — export merges.txt / "
            "tokenizer.json instead")
    alphabet = sorted({c for a, b in self.merges for c in a + b})
    pieces = [("<unk>", 0.0, 2)]
    score = 0.0
    for c in alphabet:
        score -= 1.0
        pieces.append((c, score, 1))
    for a, b in self.merges:
        score -= 1.0
        pieces.append((a + b, score, 1))
    _write_sentencepiece(path, pieces, model_type=2,
                         lowercase=self.lowercase)


BPETokenizer.to_sentencepiece = _bpe_to_sentencepiece

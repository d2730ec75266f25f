"""Distributed tokenizer TRAINING (r13 second half): the tokenizer
family (``pipeline/tokenizer.py``) applies and imports BPE / WordPiece
/ vocab artifacts — this module learns them from a corpus, closing the
loop: train on the corpus → budget every pack/chunk/mix/LM operator in
the tokens the trained tokenizer counts.

The reference has no notion of tokens at all (green-field, like the
rest of the tokenizer family); the algorithms are the published ones —
BPE (Sennrich et al. 2016), the WordPiece likelihood criterion (Wu et
al. 2016, the HuggingFace trainer's ``score = freq(pair) /
(freq(left)·freq(right))`` form), GPT-2 byte-level pre-tokenization
(Radford et al. 2019).

100 TB design — the SPLIT is the point.  Every published subword
trainer runs its merge loop over a WORD-FREQUENCY table, not the raw
corpus (HF ``trainers::BpeTrainer`` counts words first, GPT-2's
original trainer did the same): the corpus-scale phase is exactly one
distributed word count, and the merge loop is driver-side arithmetic
over a bounded vocabulary.  So here:

- :func:`word_frequencies` is the distributed phase — one scan, one
  map-side-combinable groupBy on the pre-token string, top-``max_words``
  by ``(cnt DESC, word ASC)`` (a bounded TakeOrdered, never a full
  sort).  At 100 TB the distinct-word relation after combine is
  millions of rows regardless of corpus size (Heaps' law), and the
  top-65 536 cut keeps the driver table sub-MB while covering the
  overwhelming mass share (Zipf); the cut is the trainer's documented
  approximation, controlled by ``max_words=`` / ``min_count=``.
- the merge loops (:func:`train_bpe`, :func:`train_wordpiece`) are
  driver-side over that bounded table, with INCREMENTAL pair-count
  maintenance (only words containing the merged pair are revisited),
  deterministic tie-breaks, and a hard ``_MAX_BUCKETS`` bound on the
  learned table so the result is always a legal wire-serializable
  tokenizer.

Fit once per corpus snapshot, persist the word-frequency relation
(it IS the ``counts=`` of this family — re-train at a different
``num_merges`` without re-scanning the corpus), ship the trained
tokenizer to every budget operator via ``tokenizer=``.

Determinism contract (pinned in pytest): given the same word-frequency
table, training is bit-reproducible — candidate selection maximizes
``(score, pair-count)`` and breaks ties on the lexicographically
SMALLEST pair, and the word table iterates in sorted order.  (HF's
trainer breaks ties by insertion order of its hash maps; we do not
claim artifact-identical output to any specific trainer version, only
algorithm fidelity + determinism.)

Remote corpora (r13 second half): :func:`word_frequencies` is a wire
DIALECT node — the top-N aggregation runs server-side and only the
bounded relation crosses — while the trainers themselves stay
local-only for CORPUS inputs (eager driver fits; a remote ``t``
raises with guidance to route through ``word_freq=``).  A remote
``word_freq=`` is computed (≤ ``max_words`` rows by construction)
and validated like any local frame, so the full remote-training flow
is ``train_bpe(word_freq=word_frequencies(remote_corpus))``.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import Table
from .selection import _MAX_BUCKETS
from .tokenizer import (BPETokenizer, VocabTokenizer, WhitespaceTokenizer,
                        WordPieceTokenizer, _bytes_to_unicode,
                        _gpt2_pretokenize)

__all__ = ["word_frequencies", "train_bpe", "train_wordpiece",
           "train_vocab", "train_unigram", "tokenizer_stats"]


def _byte_units_udf(lowercase: bool):
    """GPT-2 pre-tokens of a text column, byte→unicode mapped — the
    EXACT unit identity BPETokenizer(byte_level=True) applies merges
    over (same scanner, same public byte map), so trained merges and
    applied merges meet on identical symbols.  Arrow-batched; training
    is once-per-snapshot so the one Python scan is the honest cost."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    b2u = _bytes_to_unicode()
    pretok = _gpt2_pretokenize

    def _units(s):
        out = []
        for text in s:
            if not text:
                out.append([])
                continue
            t = text.lower() if lowercase else text
            out.append(["".join(b2u[b] for b in u.encode("utf-8"))
                        for u in pretok(t)])
        return pd.Series(out)

    _units.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_units, "array<string>")


def _validate_wf_args(max_words: int, min_count: int) -> None:
    if not 1 <= max_words <= _MAX_BUCKETS:
        raise ValueError(
            f"max_words must be in [1, {_MAX_BUCKETS}], got "
            f"{max_words}: the word table is collected driver-side "
            "for the merge loop and must stay bounded")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")


def word_frequencies(t: Table, text_col: str = "text",
                     lowercase: bool = False, byte_level: bool = False,
                     max_words: int = _MAX_BUCKETS,
                     min_count: int = 1) -> DataFrame:
    """The distributed phase of tokenizer training: a ``(word STRING,
    cnt LONG)`` relation of the corpus' top-``max_words`` pre-token
    units by ``(cnt DESC, word ASC)`` — the deterministic total order
    makes the LIMIT boundary reproducible and the relation
    oracle-checkable.

    ``byte_level=False`` (default): whitespace words (the package's
    trim/split identity, blank text → no rows) — one codegen scan,
    groupBy with map-side combine, bounded TakeOrdered.  DuckDB
    reproduces it exactly.  ``byte_level=True``: GPT-2 pre-tokens in
    byte→unicode space (the Arrow-batched scanner above) — what a
    GPT-2-style :func:`train_bpe` consumes.

    Persist the result: it is this family's ``counts=`` — re-train at
    any ``num_merges`` without re-scanning the corpus.

    Wire-serializable (r13 second half): on a ``blaze://`` table the
    top-N aggregation runs SERVER-side and only the bounded relation
    crosses the wire — `train_*` then consume the computed result via
    ``word_freq=``, so a tokenizer trains against a remote corpus
    without the corpus ever moving."""
    _validate_wf_args(max_words, min_count)
    if byte_level:
        units = _byte_units_udf(lowercase)(F.col(text_col))
    else:
        units = WhitespaceTokenizer(lowercase).pieces(F.col(text_col))
    from .dedup import _spread

    # the tokenize + explode is per-row-heavy (byte/piece UDFs): spread
    # a small/single-file scan across the cores first (metadata-gated
    # no-op at scale; guide §2.5)
    words = _spread(t.df, text_col).select(F.explode(units).alias("word"))
    agg = (words.groupBy("word")
           .agg(F.count(F.lit(1)).cast(T.LongType()).alias("cnt")))
    if min_count > 1:
        agg = agg.filter(F.col("cnt") >= min_count)
    return (agg.orderBy(F.col("cnt").desc(), F.col("word").asc())
            .limit(max_words))


def _collect_word_freq(wf, fn_name: str) -> dict:
    """Bounded, validated driver-side collect of a word-frequency
    relation (duplicate words SUM — the additive counts-frame
    contract).  Accepts the :func:`word_frequencies` output or any
    user (word STRING, cnt integer) frame of ≤ ``_MAX_BUCKETS`` rows;
    mis-shaped or corpus-sized frames raise loudly."""
    if isinstance(wf, Table) and getattr(wf, "_client", None) is not None:
        # a remote word_frequencies relation: the top-N aggregation
        # already ran server-side; only the bounded table crosses
        pdf = wf.compute()
        if set(pdf.columns) != {"word", "cnt"}:
            raise ValueError(
                f"{fn_name}: word_freq must be a (word, cnt) relation "
                f"(word_frequencies output), got columns "
                f"{list(pdf.columns)}")
        if len(pdf) > _MAX_BUCKETS:
            raise ValueError(
                f"{fn_name}: word_freq has more than {_MAX_BUCKETS} "
                "rows — the trainer's word table is bounded by "
                "construction; was a raw token-level frame computed "
                "instead?")
        freq: dict = {}
        for w, c in zip(pdf["word"].tolist(), pdf["cnt"].tolist()):
            if not isinstance(w, str) or c is None or c != c \
                    or int(c) <= 0:
                raise ValueError(
                    f"{fn_name}: word_freq carries a NULL or "
                    f"non-positive row {(w, c)!r} — not a counts "
                    "relation")
            freq[w] = freq.get(w, 0) + int(c)
        return freq
    if isinstance(wf, Table):
        wf = wf.df
    if not isinstance(wf, DataFrame):
        raise TypeError(
            f"{fn_name}: word_freq must be a (word STRING, cnt) "
            f"DataFrame (word_frequencies output), got {type(wf)}")
    types = dict(wf.dtypes)
    integral = ("tinyint", "smallint", "int", "bigint")
    if types.get("word") != "string" or types.get("cnt") not in integral:
        raise ValueError(
            f"{fn_name}: word_freq must be a (word STRING, cnt "
            f"integer) relation (word_frequencies output), got "
            f"columns {wf.dtypes}")
    rows = wf.limit(_MAX_BUCKETS + 1).collect()
    if len(rows) > _MAX_BUCKETS:
        raise ValueError(
            f"{fn_name}: word_freq has more than {_MAX_BUCKETS} rows "
            "— the trainer's word table is bounded by construction "
            "(word_frequencies caps at max_words); was a raw "
            "token-level frame passed instead?")
    freq: dict = {}
    for r in rows:
        if r["word"] is None or r["cnt"] is None or r["cnt"] <= 0:
            raise ValueError(
                f"{fn_name}: word_freq carries a NULL or non-positive "
                f"row {tuple(r)} — not a counts relation")
        freq[r["word"]] = freq.get(r["word"], 0) + int(r["cnt"])
    return freq


def _wp_join(a: str, b: str) -> str:
    return a + (b[2:] if b.startswith("##") else b)


def _train_merges(freq: dict, to_symbols, num_merges: int,
                  min_pair_count: int, wordpiece: bool):
    """The shared incremental merge loop.  Returns ``(merges,
    sym_counts_final, alphabet)``; ``merges`` is a list of symbol
    pairs in learn order.

    Selection per round maximizes the published criterion — raw pair
    frequency for BPE, ``freq(pair)/(freq(a)·freq(b))`` for WordPiece
    (compared as cross-multiplied INTEGERS, no float ties) — then
    pair frequency, then the lexicographically smallest pair.  Only
    words containing the winning pair are revisited (their old/new
    adjacent-pair multisets diff against the global counters), so a
    round costs O(candidate pairs) for the argmax + O(touched words);
    with ≤ 65 536 word types both are driver-trivial."""
    seqs, freqs = [], []
    alphabet: set = set()
    for w in sorted(freq):
        s = to_symbols(w)
        if not s:
            continue
        seqs.append(s)
        freqs.append(freq[w])
        alphabet.update(s)
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    sym_counts: Counter = Counter()
    for idx, (s, c) in enumerate(zip(seqs, freqs)):
        for sym in s:
            sym_counts[sym] += c
        for p in zip(s, s[1:]):
            pair_counts[p] += c
            pair_words[p].add(idx)
    def beats(p, c, q, d):
        # does candidate pair p (count c) beat incumbent q (count d)?
        if wordpiece:
            # score c/(sym_a·sym_b) vs d/(sym_x·sym_y), compared
            # cross-multiplied in exact integer arithmetic
            lhs = c * sym_counts[q[0]] * sym_counts[q[1]]
            rhs = d * sym_counts[p[0]] * sym_counts[p[1]]
            if lhs != rhs:
                return lhs > rhs
        if c != d:
            return c > d
        return p < q

    merges = []
    for _ in range(num_merges):
        best, bc = None, 0
        for p, c in pair_counts.items():
            if c < min_pair_count:
                continue
            if best is None or beats(p, c, best, bc):
                best, bc = p, c
        if best is None:
            break
        merged = _wp_join(*best) if wordpiece else best[0] + best[1]
        merges.append(best)
        for idx in sorted(pair_words[best]):
            s, c = seqs[idx], freqs[idx]
            old_pairs = Counter(zip(s, s[1:]))
            ns, i = [], 0
            while i < len(s):
                if (i < len(s) - 1 and s[i] == best[0]
                        and s[i + 1] == best[1]):
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            n_merged = len(s) - len(ns)
            sym_counts[best[0]] -= n_merged * c
            sym_counts[best[1]] -= n_merged * c
            sym_counts[merged] += n_merged * c
            new_pairs = Counter(zip(ns, ns[1:]))
            for p in set(old_pairs) | set(new_pairs):
                d = new_pairs.get(p, 0) - old_pairs.get(p, 0)
                if d:
                    pair_counts[p] += d * c
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                if new_pairs.get(p, 0):
                    pair_words[p].add(idx)
                else:
                    pair_words[p].discard(idx)
            seqs[idx] = ns
        for k in (best[0], best[1], merged):
            if sym_counts.get(k) == 0:
                del sym_counts[k]
    return merges, sym_counts, alphabet


def _resolve_word_freq(t, word_freq, fn_name, text_col, lowercase,
                       byte_level, max_words, min_count) -> dict:
    if (t is None) == (word_freq is None):
        raise ValueError(
            f"{fn_name}: pass either a corpus table (count words "
            "here) or word_freq= (a persisted word_frequencies "
            "relation), not both / neither")
    if t is not None and getattr(t, "_client", None) is not None:
        raise TypeError(
            f"{fn_name} is outside the remote wire dialect for CORPUS "
            "inputs — the merge loop is an eager driver-side fit.  "
            "Count words SERVER-side with word_frequencies(remote) "
            "(a dialect node since r13) and pass that bounded "
            "relation as word_freq= instead.")
    if word_freq is None:
        word_freq = word_frequencies(t, text_col, lowercase,
                                     byte_level, max_words, min_count)
    return _collect_word_freq(word_freq, fn_name)


def train_bpe(t: Table | None = None, *, word_freq=None,
              num_merges: int = 512, text_col: str = "text",
              lowercase: bool = False, byte_level: bool = False,
              min_pair_count: int = 2,
              max_words: int = _MAX_BUCKETS,
              min_count: int = 1,
              add_prefix_space: bool = False) -> BPETokenizer:
    """Learn a BPE merges table (Sennrich et al. 2016: repeatedly merge
    the most frequent adjacent symbol pair, weighted by word
    frequency) and return the ready-to-apply :class:`BPETokenizer` —
    wire-serializable, so a trained tokenizer ships to remote packing
    services like any imported artifact.

    ``byte_level=True`` trains in GPT-2's byte→unicode symbol space
    over GPT-2 pre-tokens (the scheme GPT-2/RoBERTa artifacts use);
    default is whitespace-word character BPE.  ``word_freq=`` skips
    the corpus scan (the persisted :func:`word_frequencies` relation —
    it must have been built with the SAME ``lowercase``/``byte_level``,
    which the result stamps).  Training stops early when no pair
    reaches ``min_pair_count`` (the learned table is then shorter than
    ``num_merges`` — the standard trainer convention, not an error)."""
    if not 1 <= num_merges <= _MAX_BUCKETS:
        raise ValueError(
            f"num_merges must be in [1, {_MAX_BUCKETS}], got "
            f"{num_merges}: merges tables are bounded literal "
            "relations (BPETokenizer enforces the same cap)")
    if min_pair_count < 1:
        raise ValueError(
            f"min_pair_count must be >= 1, got {min_pair_count}")
    freq = _resolve_word_freq(t, word_freq, "train_bpe", text_col,
                              lowercase, byte_level, max_words,
                              min_count)
    merges, _, _ = _train_merges(freq, list, num_merges,
                                 min_pair_count, wordpiece=False)
    return BPETokenizer(merges, lowercase=lowercase,
                        byte_level=byte_level,
                        add_prefix_space=add_prefix_space)


def train_wordpiece(t: Table | None = None, *, word_freq=None,
                    vocab_size: int = 8192, text_col: str = "text",
                    lowercase: bool = False, min_pair_count: int = 2,
                    max_words: int = _MAX_BUCKETS,
                    min_count: int = 1,
                    unk_token: str = "[UNK]") -> WordPieceTokenizer:
    """Learn a WordPiece vocabulary (Wu et al. 2016 via the HF trainer
    formulation: merge the pair maximizing ``freq(pair) /
    (freq(left)·freq(right))`` — the unigram-LM likelihood gain) and
    return the ready-to-apply :class:`WordPieceTokenizer`.

    Words enter as ``[first-char, ##rest-chars...]`` (the BERT
    continuation scheme); the vocabulary is ``[unk_token]`` + the
    alphabet (sorted) + merged tokens in learn order, truncated at
    ``vocab_size``.  A ``vocab_size`` smaller than alphabet + 1 cannot
    represent the corpus and raises (fail-loud, not silent truncation
    of the alphabet).  The likelihood ratio is compared
    cross-multiplied in INTEGER arithmetic — no float ties, so
    training is bit-reproducible."""
    if not 1 <= vocab_size <= _MAX_BUCKETS:
        raise ValueError(
            f"vocab_size must be in [1, {_MAX_BUCKETS}], got "
            f"{vocab_size}: vocabularies are bounded literal "
            "relations (WordPieceTokenizer enforces the same cap)")
    if min_pair_count < 1:
        raise ValueError(
            f"min_pair_count must be >= 1, got {min_pair_count}")
    freq = _resolve_word_freq(t, word_freq, "train_wordpiece",
                              text_col, lowercase, False, max_words,
                              min_count)

    def to_symbols(w):
        return [w[0]] + ["##" + ch for ch in w[1:]]

    # alphabet must fit under vocab_size with room for the unk token
    alpha: set = set()
    for w in freq:
        alpha.update(to_symbols(w))
    base = len(alpha) + 1
    if vocab_size < base:
        raise ValueError(
            f"train_wordpiece: vocab_size={vocab_size} is smaller "
            f"than the corpus alphabet + unk ({base}) — every "
            "character must be representable; raise vocab_size")
    merges, _, _ = _train_merges(freq, to_symbols,
                                 vocab_size - base, min_pair_count,
                                 wordpiece=True)
    vocab = ([unk_token] + sorted(alpha)
             + [_wp_join(a, b) for a, b in merges])
    # merged tokens can collide with alphabet entries only if a word
    # was a single char (no pairs) — dict.fromkeys in the tokenizer
    # dedups; the size stays ≤ vocab_size by construction
    return WordPieceTokenizer(vocab, unk_token=unk_token,
                              lowercase=lowercase)


def train_vocab(t: Table | None = None, *, word_freq=None,
                vocab_size: int = 8192, text_col: str = "text",
                lowercase: bool = False, fallback_chars: int = 4,
                max_words: int = _MAX_BUCKETS,
                min_count: int = 1) -> VocabTokenizer:
    """The SQL-expressible member: top-``vocab_size`` words by
    ``(cnt DESC, word ASC)`` as a :class:`VocabTokenizer` (whole-word
    pieces, char-chunk OOV fallback) — the trained counterpart of
    ``VocabTokenizer.from_vocab_file``, and the one trainer whose
    output an engine-portable oracle can reproduce end-to-end."""
    if not 1 <= vocab_size <= _MAX_BUCKETS:
        raise ValueError(
            f"vocab_size must be in [1, {_MAX_BUCKETS}], got "
            f"{vocab_size}")
    freq = _resolve_word_freq(t, word_freq, "train_vocab", text_col,
                              lowercase, False, max_words, min_count)
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = [w for w, _ in top[:vocab_size]]
    return VocabTokenizer(vocab, fallback_chars=fallback_chars,
                          lowercase=lowercase)


# ---------------------------------------------------------------------------
# Unigram-LM training (Kudo 2018, the SentencePiece model) — the same
# split as BPE/WordPiece: word counts distributed, EM driver-side.

_NEG = float("-inf")


def _lse(xs):
    m = max(xs)
    if m == _NEG:
        return _NEG
    return m + math.log(sum(math.exp(x - m) for x in xs))


def _uni_em(words, freqs, lp, max_len, iters):
    """Plain EM over the segmentation lattice: E-step computes exact
    expected piece counts via forward-backward in log space (every
    segmentation of every word, weighted by its posterior), M-step is
    the MLE re-estimate.  (SentencePiece Bayesianifies the M-step
    with a digamma prior — a documented deviation; the lattice math
    is Kudo's exactly.)  Single chars keep a count floor so the model
    always segments."""
    for _ in range(iters):
        exp_c: Counter = Counter()
        for w, f in zip(words, freqs):
            n = len(w)
            fwd = [0.0] + [_NEG] * n
            for e in range(1, n + 1):
                cands = []
                for s in range(max(0, e - max_len), e):
                    p = lp.get(w[s:e])
                    if p is not None and fwd[s] != _NEG:
                        cands.append(fwd[s] + p)
                if cands:
                    fwd[e] = _lse(cands)
            if fwd[n] == _NEG:
                continue
            bwd = [_NEG] * n + [0.0]
            for s in range(n - 1, -1, -1):
                cands = []
                for e in range(s + 1, min(n, s + max_len) + 1):
                    p = lp.get(w[s:e])
                    if p is not None and bwd[e] != _NEG:
                        cands.append(p + bwd[e])
                if cands:
                    bwd[s] = _lse(cands)
            for s in range(n):
                if fwd[s] == _NEG:
                    continue
                for e in range(s + 1, min(n, s + max_len) + 1):
                    p = lp.get(w[s:e])
                    if p is None or bwd[e] == _NEG:
                        continue
                    exp_c[w[s:e]] += f * math.exp(
                        fwd[s] + p + bwd[e] - fwd[n])
        for piece in lp:
            if len(piece) == 1:
                exp_c[piece] = max(exp_c.get(piece, 0.0), 1e-9)
        total = sum(exp_c.values())
        # guard the RATIO, not the count: a denormal expected count
        # (a piece with vanishing posterior mass on a large corpus)
        # can underflow c/total to exactly 0.0 — such a piece is dead
        # weight and drops here rather than raising in log()
        lp = {}
        for p, c in exp_c.items():
            r = c / total
            if r > 0.0:
                lp[p] = math.log(r)
    return lp


def _uni_viterbi(w, lp, max_len, exclude=None):
    """Best segmentation SCORE of ``w`` (optionally pretending one
    piece does not exist — the pruning alternative)."""
    n = len(w)
    best = [0.0] + [_NEG] * n
    for e in range(1, n + 1):
        for s in range(max(0, e - max_len), e):
            piece = w[s:e]
            if piece == exclude:
                continue
            p = lp.get(piece)
            if p is None or best[s] == _NEG:
                continue
            if best[s] + p > best[e]:
                best[e] = best[s] + p
    return best[n]


def train_unigram(t: Table | None = None, *, word_freq=None,
                  vocab_size: int = 8192, text_col: str = "text",
                  lowercase: bool = False, max_piece_len: int = 8,
                  seed_multiplier: int = 4, em_iters: int = 2,
                  shrink: float = 0.75,
                  max_words: int = _MAX_BUCKETS, min_count: int = 1,
                  unk_logp: float = -20.0,
                  space_marker: str = "") -> "UnigramTokenizer":
    """Learn a unigram-LM vocabulary (Kudo 2018): seed with the
    highest-frequency substrings (every single character always
    included), run EM over the full segmentation lattice, then prune
    the lowest-utility pieces — utility = expected count × (own logp
    − best alternative segmentation score without the piece), the
    SentencePiece pruning criterion — in ``shrink`` rounds until
    ``vocab_size`` remains.  Returns the ready-to-apply
    :class:`UnigramTokenizer` (wire-serializable, final probabilities
    normalized).

    ``space_marker="▁"`` trains in SentencePiece's own convention —
    every word enters the lattice as ``marker+word``, so learned
    pieces carry the word boundary (``▁the``), the trained tokenizer
    detokenizes EXACTLY, and the artifact round-trips with
    ``UnigramTokenizer.from_tokenizer_json`` imports.

    Deviations from the SentencePiece trainer, documented: the M-step
    is plain MLE (no digamma prior), pre-tokenization is the
    package's whitespace identity, and characters fall back at
    ``unk_logp`` instead of byte pieces.  Determinism: seeding,
    pruning and ties all break on (score, piece) with the
    lexicographically smallest piece preferred — bit-reproducible
    given the same word-frequency table."""
    from .tokenizer import UnigramTokenizer

    if not 1 <= vocab_size <= _MAX_BUCKETS:
        raise ValueError(
            f"vocab_size must be in [1, {_MAX_BUCKETS}], got "
            f"{vocab_size}")
    if max_piece_len < 2:
        raise ValueError(
            f"max_piece_len must be >= 2, got {max_piece_len}")
    if em_iters < 1:
        raise ValueError(f"em_iters must be >= 1, got {em_iters}")
    if not 0.0 < shrink < 1.0:
        raise ValueError(f"shrink must be in (0, 1), got {shrink}")
    if seed_multiplier < 1:
        raise ValueError(
            f"seed_multiplier must be >= 1, got {seed_multiplier}")
    freq = _resolve_word_freq(t, word_freq, "train_unigram", text_col,
                              lowercase, False, max_words, min_count)
    if space_marker:
        # SentencePiece convention: the lattice sees marker+word, so
        # boundary-carrying pieces are learnable and apply verbatim
        freq = {space_marker + w: c for w, c in freq.items()}
    words = sorted(freq)
    freqs = [freq[w] for w in words]
    chars: Counter = Counter()
    subs: Counter = Counter()
    for w, f in zip(words, freqs):
        for ch in w:
            chars[ch] += f
        n = len(w)
        for s in range(n):
            for e in range(s + 2, min(n, s + max_piece_len) + 1):
                subs[w[s:e]] += f
    base = len(chars)
    if vocab_size < base + 1:
        raise ValueError(
            f"train_unigram: vocab_size={vocab_size} is smaller than "
            f"the corpus alphabet + 1 ({base + 1}) — every character "
            "must be representable; raise vocab_size")
    n_seed = max(vocab_size, seed_multiplier * vocab_size) - base
    seeded = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))
    seeded = seeded[:n_seed]
    total = float(sum(chars.values()) + sum(c for _, c in seeded))
    lp = {p: math.log(c / total) for p, c in chars.items()}
    lp.update({p: math.log(c / total) for p, c in seeded})

    while True:
        lp = _uni_em(words, freqs, lp, max_piece_len, em_iters)
        multis = [p for p in lp if len(p) > 1]
        if base + len(multis) <= vocab_size:
            break
        # utility: how much likelihood the piece buys over its own
        # best decomposition, weighted by how much it is used
        exp_like: dict = {}
        for p in multis:
            alt = _uni_viterbi(p, lp, max_piece_len, exclude=p)
            gain = lp[p] - alt if alt != _NEG else float("inf")
            exp_like[p] = math.exp(lp[p]) * gain
        # strictly < len(multis): the loop guard gives
        # len(multis) > vocab_size − base, and shrink < 1 floors below
        # len — every round makes progress
        keep_n = max(vocab_size - base,
                     int(len(multis) * shrink))
        ranked = sorted(multis,
                        key=lambda p: (-exp_like[p], p))[:keep_n]
        lp = {p: v for p, v in lp.items()
              if len(p) == 1 or p in set(ranked)}
    # normalize to a proper distribution for the applier
    z = _lse(list(lp.values()))
    final = {p: v - z for p, v in lp.items()}
    return UnigramTokenizer(final, lowercase=lowercase,
                            unk_logp=unk_logp,
                            space_marker=space_marker)


# ---------------------------------------------------------------------------
# Wire dialect: word_frequencies serializes (the unary literal-args
# pattern — interop._PIPE_WIRE); the trainers stay local-only for
# corpus inputs and consume remote word_freq= relations via compute().

import functools  # noqa: E402

from .selection import _client_of, _require_tree, _wire_result  # noqa: E402

_local_word_frequencies = word_frequencies


@functools.wraps(_local_word_frequencies)
def word_frequencies(t: Table, text_col: str = "text",
                     lowercase: bool = False, byte_level: bool = False,
                     max_words: int = _MAX_BUCKETS,
                     min_count: int = 1):
    if _client_of(t) is None:
        return _local_word_frequencies(t, text_col, lowercase,
                                       byte_level, max_words,
                                       min_count)
    _validate_wf_args(max_words, min_count)
    node = {"op": "word_frequencies",
            "args": [_require_tree(t, "word_frequencies"),
                     {"text_col": text_col,
                      "lowercase": bool(lowercase),
                      "byte_level": bool(byte_level),
                      "max_words": int(max_words),
                      "min_count": int(min_count)}]}
    spark = t.df.sparkSession
    empty = spark.createDataFrame([], "word string, cnt long")
    return _wire_result(t, empty, node)


def _local_tokenizer_stats(t: Table, tokenizer=None,
                           text_col: str = "text") -> DataFrame:
    """One-row corpus tokenization report — the numbers a tokenizer
    choice is judged by: ``(n_docs, total_words, total_tokens,
    fertility, avg_doc_tokens)`` with fertility = tokens per
    whitespace word (the standard multilingual-cost metric; ~1.0 for
    English under a good subword vocab, 1.3-1.8× under a mismatched
    one) and both ratios round-4.  ``tokenizer=None`` counts
    whitespace tokens (fertility exactly 1.0 — the baseline row).
    One scan, one map-side-combinable global aggregate."""
    tok = tokenizer if tokenizer is not None else WhitespaceTokenizer()
    words = WhitespaceTokenizer().n_tokens(F.col(text_col))
    toks = tok.n_tokens(F.col(text_col))
    from .dedup import _spread

    agg = _spread(t.df, text_col).agg(
        F.count(F.lit(1)).cast(T.LongType()).alias("n_docs"),
        F.sum(F.coalesce(words, F.lit(0))).cast(T.LongType())
        .alias("total_words"),
        F.sum(F.coalesce(toks, F.lit(0))).cast(T.LongType())
        .alias("total_tokens"))
    return agg.select(
        "n_docs", "total_words", "total_tokens",
        (F.round(F.col("total_tokens") / F.col("total_words"), 4)
         + F.lit(0.0)).alias("fertility"),
        (F.round(F.col("total_tokens") / F.col("n_docs"), 4)
         + F.lit(0.0)).alias("avg_doc_tokens"))


@functools.wraps(_local_tokenizer_stats)
def tokenizer_stats(t: Table, tokenizer=None, text_col: str = "text"):
    if _client_of(t) is None:
        return _local_tokenizer_stats(t, tokenizer, text_col)
    from .tokenizer import _tokenizer_wire
    kw = {"text_col": text_col}
    if tokenizer is not None:
        kw["tokenizer"] = _tokenizer_wire(tokenizer)
    node = {"op": "tokenizer_stats",
            "args": [_require_tree(t, "tokenizer_stats"), kw]}
    empty = t.df.sparkSession.createDataFrame(
        [], "n_docs long, total_words long, total_tokens long, "
            "fertility double, avg_doc_tokens double")
    return _wire_result(t, empty, node)

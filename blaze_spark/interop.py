"""Interop: JSON expression trees + result caching.

``from_tree``/``compute_tree`` reproduce the reference server's remote
expression execution format — nested ``{'op': ..., 'args': [...]}`` dicts
(blaze/server/server.py:411-477 ``to_tree``, 503-571 ``from_tree``, POSTed
to /compute).  The op-name -> handler table is an explicit whitelist, the
same hardening the reference applies with its trusted object hooks
(blaze/server/serialization/object_hook_trusted.py) — arbitrary callables
never resolve from the wire.

``CachedTable`` is the ``CachedDataset`` analogue (blaze/cached.py:17-58):
memoizes expr -> concrete result keyed by the DataFrame's semantic hash,
plus Spark-side ``persist`` for plan reuse.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .core import ColExpr, Reduction, Table, by, concat, join, summary
from .sources import data

__all__ = ["from_tree", "to_tree", "compute_tree", "CachedTable"]


def _expr(node: Any, t: Table) -> ColExpr:
    """Evaluate a scalar-expression subtree against table ``t``."""
    if isinstance(node, dict):
        op = node["op"]
        args = node.get("args", [])
        if op == "field":
            return t[args[0]]
        if op == "lit":
            return ColExpr(t, F.lit(args[0]), "lit")
        if op in _BINOPS:
            left, right = _expr_or_scalar(args[0], t), _expr_or_scalar(args[1], t)
            return _BINOPS[op](left, right)
        if op == "not":
            return ~_expr(args[0], t)
        if op == "isin":
            return _expr(args[0], t).isin(args[1])
        if op == "like":
            return _expr(args[0], t).like(args[1])
        if op == "coalesce":
            from .core import coalesce as _coalesce

            return _coalesce(*[_expr(p, t) for p in args[0]])
        if op == "shift":
            # args: [child, n, order_by keys, partition_by keys|None]
            return _expr(args[0], t).shift(args[1], args[2], args[3])
        if "." in op:
            return _method_call(op, args, t)
        raise ValueError(f"unknown expression op: {op}")
    raise ValueError(f"bad expression node: {node!r}")


def _method_whitelists():
    """The server's replay whitelist for accessor/math calls, built from
    the SAME classes that record the nodes (so the two can never drift).
    Reference parity: to_tree/from_tree are generic over every Expr class
    (blaze/server/server.py:411-477) — here every PUBLIC accessor method
    and math function is the dialect's scalar-call surface."""
    global _STR_METHODS, _DT_METHODS, _MATH_FNS
    if _STR_METHODS is None:
        from .functions.datetime import DtAccessor, TimedeltaAccessor
        from .functions.math import MATH_FNS
        from .functions.strings import StrAccessor

        def pub(cls):
            return {n for n, f in vars(cls).items()
                    if not n.startswith("_") and callable(f)}

        _STR_METHODS = pub(StrAccessor)
        _DT_METHODS = pub(DtAccessor) | pub(TimedeltaAccessor)
        _MATH_FNS = MATH_FNS
    return _STR_METHODS, _DT_METHODS, _MATH_FNS


_STR_METHODS = _DT_METHODS = _MATH_FNS = None


def _decode_arg(a, t: Table):
    """A dict is an expression subtree (scalars are never encoded as
    dicts — core._tree_arg); anything else is a literal."""
    return _expr(a, t) if isinstance(a, dict) else a


def _method_call(op: str, args: list, t: Table) -> ColExpr:
    """Replay ``{'op': 'family.method', 'args': [child, [pos], {kw}]}``.
    A ``None`` child means a table-first helper (row_number/rank/...) —
    it binds to the table under evaluation, like a field node."""
    strs, dts, maths = _method_whitelists()
    fam, meth = op.split(".", 1)
    pos = [_decode_arg(a, t) for a in (args[1] if len(args) > 1 else [])]
    kw = {k: _decode_arg(v, t)
          for k, v in (args[2] if len(args) > 2 else {}).items()}
    if fam == "win":
        from .functions.window import ROLLING_AGGS, WIN_FNS

        if meth not in WIN_FNS:
            raise ValueError(f"unknown expression op: {op}")
        if meth == "rolling_range":
            agg = kw.get("agg", pos[0] if pos else None)
            if agg not in ROLLING_AGGS:
                raise ValueError(
                    f"rolling_range aggregate {agg!r} is not in the "
                    "serializable whitelist")
        first = t if args[0] is None else _expr(args[0], t)
        return WIN_FNS[meth](first, *pos, **kw)
    child = _expr(args[0], t)
    if fam == "str" and meth in strs:
        return getattr(child.str, meth)(*pos, **kw)
    if fam == "dt" and meth in dts:
        # dtype gates pick DtAccessor vs TimedeltaAccessor, same as local
        return getattr(child.dt, meth)(*pos, **kw)
    if fam == "math" and meth in maths:
        return maths[meth](child, *pos, **kw)
    raise ValueError(f"unknown expression op: {op}")


def _expr_or_scalar(node: Any, t: Table):
    if isinstance(node, dict):
        return _expr(node, t)
    return node  # python scalar; scalar_coerce is Spark's lit()


_BINOPS = {
    "add": lambda a, b: a + b, "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b, "div": lambda a, b: a / b,
    "floordiv": lambda a, b: a // b, "mod": lambda a, b: a % b,
    "pow": lambda a, b: a ** b,
    "eq": lambda a, b: a == b, "ne": lambda a, b: a != b,
    "lt": lambda a, b: a < b, "le": lambda a, b: a <= b,
    "gt": lambda a, b: a > b, "ge": lambda a, b: a >= b,
    "and": lambda a, b: a & b, "or": lambda a, b: a | b,
}

_REDUCTIONS = {"sum", "min", "max", "mean", "var", "std", "count",
               "nunique", "nelements", "any", "all"}


def _reduction(node: dict, t: Table) -> Reduction:
    """A reduction subtree: a plain reduction op, or (r8) scalar algebra
    over reductions — arith nodes whose operands are reduction subtrees
    or numeric literals (Reduction._combine records them)."""
    op = node["op"]
    if op in _RED_ALGEBRA:
        a, b = node["args"]
        left = _reduction(a, t) if isinstance(a, dict) else a
        right = _reduction(b, t) if isinstance(b, dict) else b
        return _RED_ALGEBRA[op](left, right)
    if op == "percentile":
        return _expr(node["args"][0], t).percentile(node["args"][1])
    if op in ("var_samp", "std_samp"):
        # ddof=1 is a DISTINCT op (r9) so pre-r9 servers reject it
        # loudly instead of silently computing the population form
        return getattr(_expr(node["args"][0], t), op[:3])(unbiased=True)
    if node.get("unbiased"):
        # a tree from the short-lived early-r9 flag dialect — reject
        # rather than silently replay ddof=0 (the failure mode the
        # distinct-op rename exists to prevent)
        raise ValueError(
            f"reduction {op!r} carries the retired 'unbiased' field; "
            "re-serialize with the var_samp/std_samp ops")
    if op not in _REDUCTIONS:
        raise ValueError(f"unknown reduction: {op}")
    return getattr(_expr(node["args"][0], t), op)()


_RED_ALGEBRA = {
    "add": lambda a, b: a + b, "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b, "div": lambda a, b: a / b,
}


def from_tree(tree: dict, *, spark: SparkSession | None = None,
              datasets: dict[str, Table] | None = None,
              allow_data_uris: bool = True,
              stores: dict[str, str] | None = None) -> Table:
    """Rebuild a Table from a serialized expression tree.

    Leaves: ``{'op': 'data', 'args': [uri]}`` (resolved via sources.data),
    ``{'op': 'symbol', 'args': [name]}`` (resolved from ``datasets`` —
    the server's registered-dataset namespace), or (r14) a counts-store
    leaf ``{'op': 'read_lm_counts'|'read_bucket_counts', 'args': [name,
    {kw}]}`` resolved from ``stores`` — the server's registered
    counts-store namespace (name → store root), so a client can score
    against persisted server-side counts without literal-rows transfer
    (ROADMAP #11).

    ``allow_data_uris=False`` (the server-side default) rejects ``data``
    leaves: a deserialized tree may then only name pre-registered datasets,
    never read arbitrary local/remote URIs (round-1 advice — the op
    whitelist bounds which OPERATORS run, this bounds which RESOURCES are
    readable).  Store leaves follow the same posture: names resolve ONLY
    from the registry — a tree can never carry a raw filesystem path.
    """
    datasets = datasets or {}
    stores = stores or {}

    _TABLE_OPS = {"symbol", "data", "projection", "selection", "head",
                  "tail", "slice", "drop_field",
                  "sort", "distinct", "relabel", "transform", "by",
                  "summary", "join", "concat", "pivot", "unpivot",
                  "explode", "intersect", "except", "count_values",
                  "rollup", "cube", "grouping_sets", "merge",
                  "sample", "sample_by", "with_fk", "auto_join",
                  # text/curation projections (r6): table-in/table-out
                  # pure Column-expr ops, so they serialize as plain
                  # unary nodes — a server client can run the curation
                  # passes on registered datasets without shipping code
                  "language_id", "quality_features", "fingerprint",
                  "repetition_features", "pii_scrub", "token_stats",
                  "gopher_rules", "c4_clean", "hash_sample",
                  # model-based selection family (r11): the bounded
                  # model/counts relations ride as literal row lists
                  # inside the node; corpora ride as subtrees
                  "hashed_bucket_counts", "quality_classifier",
                  "dsir_log_weights", "weighted_sample",
                  # r14: in-engine classifier TRAINING — the label
                  # predicate rides as an expression subtree, the whole
                  # epoch loop runs where the corpus lives, and only
                  # the fitted ≤ n_buckets+1 row model crosses back
                  # (intercept at pseudo-bucket -1)
                  "train_quality_classifier",
                  # n-gram LM family (r11): same closure pattern — the
                  # ≤ 2·n_buckets fit relation rides as literal rows,
                  # the reference corpus as a same-server subtree
                  "ngram_lm_fit", "ngram_lm_logprob",
                  "perplexity_filter", "perplexity_buckets",
                  # mid-r11 literal-args table ops: dup-span
                  # scoring/scrub and the mixture-plan pair (weights
                  # as literal rows or a same-server subtree)
                  # r15: BM25 retrieval — corpus as a subtree, the
                  # bounded query side as literal [id, text] rows or a
                  # same-server subtree
                  "bm25_topk",
                  "cross_doc_dup_ngrams", "temperature_source_mix",
                  "unimax_source_mix",
                  "apply_source_mix",
                  # r12 sweep (VERDICT r11 #3/#4): the remaining
                  # literal-args pipeline ops — exact/normalized/line
                  # dedup, the curation reports, blocklists, cluster
                  # resolution, and decontamination (its test corpus
                  # rides as a same-server subtree).  The approximate
                  # generators (random planes, trained quantizers)
                  # stay deliberately non-serializable.
                  *_PIPE_WIRE, "hypertable_rollup",
                  # r13: trained-artifact APPLICATION — the codebooks
                  # and the bounded query block ride as literal
                  # relations, the code scan runs where the store
                  # lives.  Fits stay non-serializable (eager/random).
                  "pq_topk", "ivf_pq_topk", "assign_clusters",
                  # r14 (ROADMAP #11): store-fed counts leaves — a
                  # client names a REGISTERED server-side counts store
                  # and the bounded total relation materializes where
                  # the store lives (LM scoring / DSIR without
                  # literal-rows transfer)
                  "read_lm_counts", "read_bucket_counts",
                  # r15 (VERDICT r14 #5): the registered-store posture
                  # extended to the bloom and PQ/IVF store families —
                  # decontamination probes and ANN application resolve
                  # a server-side NAME instead of shipping packed
                  # filters / codebooks as literal rows
                  "bloom_contains", "bloom_contamination"}

    def walk(node: dict) -> Table:
        op, args = node["op"], node.get("args", [])
        if op not in _TABLE_OPS:
            # whitelist check BEFORE touching args: unknown ops fail fast
            raise ValueError(f"unknown table op: {op}")
        if op == "symbol":
            if args[0] not in datasets:
                raise KeyError(f"unknown dataset: {args[0]}")
            return datasets[args[0]]
        if op == "data":
            if not allow_data_uris:
                raise PermissionError(
                    "'data' leaves are disabled; reference registered "
                    "datasets by name ('symbol') instead")
            return data(args[0], spark=spark)
        if op in ("read_lm_counts", "read_bucket_counts"):
            return _store_leaf(op, args, spark, stores)
        child = walk(args[0])
        if op == "projection":
            return child[args[1]]
        if op == "selection":
            return child[_expr(args[1], child)]
        if op == "head":
            return child.head(args[1])
        if op == "tail":
            # args: [child, n, sort_keys, ascending-list]
            return child.tail(args[1], sort_keys=args[2], ascending=args[3])
        if op == "slice":
            # args: [child, start, stop, step]
            return child[slice(args[1], args[2], args[3])]
        if op == "sort":
            return child.sort(*args[1], ascending=args[2] if len(args) > 2 else True)
        if op == "distinct":
            return child.distinct(on=args[1] if len(args) > 1 else None)
        if op == "relabel":
            return child.relabel(**args[1])
        if op == "transform":
            cols = {k: _expr(v, child).col for k, v in args[1].items()}
            # _new, not a bare Table: keeps the FK registry so a
            # with_fk -> transform -> auto_join chain replays (r9 review)
            return child._new(child.df.withColumns(cols))
        if op == "drop_field":
            return child.drop_field(*args[1])
        if op == "merge":
            from .core import merge as _merge

            exprs = [_expr(tr, child).label(n) for n, tr in args[1]]
            return _merge(*exprs)
        if op == "with_fk":
            # args: [child, col, ref_tree, ref_key] — the FK hop's
            # referenced table is itself a tree (a registered dataset or
            # a further expression over one), per VERDICT r8 missing #1
            return child.with_fk(args[1], walk(args[2]), args[3])
        if op == "auto_join":
            # args: [child, [path, ...]] — child carries the with_fk nodes
            return child.auto_join(*args[1])
        if op == "intersect":
            return child.intersect(walk(args[1]))
        if op == "except":
            return child.except_(walk(args[1]), keep_duplicates=args[2])
        if op == "count_values":
            from .core import count_values

            col = _expr(args[1], child).label(args[2])
            return count_values(col, sort=args[3])
        if op in ("by", "rollup", "cube"):
            groupers = [_expr(g, child).label(n) for n, g in args[1]]
            reds = {n: _reduction(r, child) for n, r in args[2].items()}
            if op == "by":
                return by(groupers, **reds)
            from .core import cube as _cube
            from .core import rollup as _rollup

            return (_rollup if op == "rollup" else _cube)(groupers, **reds)
        if op == "grouping_sets":
            from .core import grouping_sets as _gsets

            sets = [[_expr(g, child).label(n) for n, g in s]
                    for s in args[1]]
            reds = {n: _reduction(r, child) for n, r in args[2].items()}
            return _gsets(sets, **reds)
        if op == "summary":
            reds = {n: _reduction(r, child) for n, r in args[1].items()}
            return summary(**reds)
        if op == "join":
            right = walk(args[1])
            return join(child, right, *args[2:])
        if op == "concat":
            return concat(child, walk(args[1]))
        if op == "pivot":
            # args: [child, index_cols, pivot_col, values, {name: red_tree}]
            reds = {n: _reduction(r, child) for n, r in args[4].items()}
            return child.pivot(args[1], args[2], args[3], **reds)
        if op == "unpivot":
            # args: [child, ids, value_cols, var_name, value_name]
            return child.unpivot(args[1], args[2], args[3], args[4])
        if op == "explode":
            # args: [child, col, alias, pos, outer]
            return child.explode(args[1], alias=args[2], pos=args[3],
                                 outer=args[4])
        if op == "sample":
            # args: [child, frac, n, seed] — only seeded samples serialize
            return child.sample(frac=args[1], n=args[2], seed=args[3])
        if op == "sample_by":
            # strata as [key, frac] pairs (r9 — carries non-string
            # scalar strata); dict form accepted for r8 trees
            strata = args[2]
            if not isinstance(strata, dict):
                strata = {k: v for k, v in strata}
            return child.sample_by(args[1], strata, seed=args[3])
        if op == "hash_sample":
            # args: [child, frac, on, salt?]
            return child.hash_sample(args[1], on=args[2],
                                     salt=args[3] if len(args) > 3 else 42)
        if op in ("hashed_bucket_counts", "quality_classifier",
                  "dsir_log_weights", "weighted_sample",
                  "train_quality_classifier"):
            return _selection_node(op, args, child, walk)
        if op in ("ngram_lm_fit", "ngram_lm_logprob",
                  "perplexity_filter", "perplexity_buckets"):
            return _lm_node(op, args, child, walk)
        if op in ("cross_doc_dup_ngrams", "temperature_source_mix",
                  "unimax_source_mix", "apply_source_mix"):
            return _mix_dedup_node(op, args, child, walk)
        if op == "bm25_topk":
            return _bm25_node(args, child, walk)
        if op in _PIPE_WIRE:
            return _pipeline_node(op, args, child, walk)
        if op == "pq_topk":
            return _pq_node(op, args, child, walk, stores)
        if op == "assign_clusters":
            # r14: trained-codebook APPLICATION (the pq_topk posture —
            # the k-means fit itself never serializes); args =
            # [docs_tree, embeddings_tree, centroids_enc, {kw}].
            # r15: centroids_enc may be the NAME of a registered
            # centroid store (the read_lm_counts posture)
            from .pipeline.similarity import assign_clusters as _ac

            _arity(op, args, 4)
            allowed = {"doc_id_col", "id_col", "vec_col"}
            kw = dict(args[3]) if len(args) > 3 and args[3] else {}
            bad = set(kw) - allowed
            if bad:
                raise ValueError(
                    f"{op} wire node carries unknown keyword(s) "
                    f"{sorted(bad)} — re-serialize with a matching "
                    "client version")
            return _ac(child, walk(args[1]),
                       centroids=_centroids_arg(args[2], stores,
                                                child), **kw)
        if op == "ivf_pq_topk":
            return _ivf_pq_node(op, args, child, walk, stores)
        if op in ("bloom_contains", "bloom_contamination"):
            return _bloom_node(op, args, child, stores)
        if op == "hypertable_rollup":
            # args: [child, ts_col, units, {name: reduction_tree}] —
            # the time-hierarchy continuous aggregate (late r12)
            _arity(op, args, 4)
            from .core import hypertable_rollup as _ht

            units = args[2]
            if (not isinstance(units, list)
                    or not all(isinstance(u, str) for u in units)):
                raise ValueError(
                    "hypertable_rollup wire node expects a list of "
                    "unit strings as args[2]")
            reds = {n: _reduction(r, child) for n, r in args[3].items()}
            return _ht(child, args[1], tuple(units), **reds)
        if op in ("language_id", "quality_features", "fingerprint",
                  "repetition_features", "pii_scrub", "token_stats",
                  "gopher_rules", "c4_clean"):
            from . import pipeline as _pl
            fn = getattr(_pl, op)
            # optional args[1] = text column name; pii_scrub also takes
            # args[2] = list of kinds; token_stats args[2] = group_col;
            # gopher_rules args[2] = its 9 thresholds, positional;
            # c4_clean args[2] = its 2 thresholds, positional
            kw = {}
            if len(args) > 1 and args[1]:
                kw["text_col"] = args[1]
            if op == "pii_scrub" and len(args) > 2 and args[2]:
                kw["kinds"] = tuple(args[2])
            if op == "token_stats" and len(args) > 2 and args[2]:
                kw["group_col"] = args[2]
            if op == "gopher_rules" and len(args) > 2 and args[2]:
                thr = args[2]
                if len(thr) != 9:
                    raise ValueError(
                        "gopher_rules wire node expects 9 thresholds")
                kw.update(zip(
                    ("min_words", "max_words", "min_mean_word_len",
                     "max_mean_word_len", "max_symbol_word_ratio",
                     "max_bullet_line_frac", "max_ellipsis_line_frac",
                     "min_alpha_word_frac", "min_stop_hits"), thr))
            if op == "c4_clean" and len(args) > 2 and args[2]:
                thr = args[2]
                if len(thr) != 2:
                    raise ValueError(
                        "c4_clean wire node expects 2 thresholds")
                kw.update(zip(("min_line_words", "min_sentences"), thr))
            return fn(child, **kw)
        raise ValueError(f"unknown table op: {op}")

    return walk(tree)


def _store_leaf(op: str, args: list, spark, stores: dict):
    """Resolve a counts-store leaf (r14): the name maps through the
    server's registered-store namespace ONLY (the symbol posture —
    trees never carry raw paths); keyword args re-validate through the
    local readers, which also enforce the store's format stamp, so a
    geometry/tokenizer mismatch fails exactly like a bad local read."""
    from .streaming.incremental_counts import (read_bucket_counts,
                                               read_lm_counts)

    _arity(op, args, 2)
    name = args[0] if args else None
    if not isinstance(name, str) or name not in stores:
        known = sorted(stores)
        raise KeyError(
            f"unknown counts store: {name!r} — store leaves resolve "
            f"only from the server's registered stores {known}")
    allowed = ({"n_buckets", "n", "unigrams", "tokenizer"}
               if op == "read_lm_counts" else {"n_buckets", "n"})
    kw = dict(args[1]) if len(args) > 1 and args[1] else {}
    bad = set(kw) - allowed
    if bad:
        raise ValueError(
            f"{op} wire node carries unknown keyword(s) {sorted(bad)} "
            "— re-serialize with a matching client version")
    if "tokenizer" in kw and kw["tokenizer"] is not None:
        from .pipeline.tokenizer import tokenizer_from_wire
        kw["tokenizer"] = tokenizer_from_wire(kw["tokenizer"])
    fn = read_lm_counts if op == "read_lm_counts" else read_bucket_counts
    return Table(fn(spark, stores[name], **kw), name)


def _arity(op: str, args: list, max_args: int):
    """Positional-args nodes carry a FIXED arity (new knobs ride in the
    kwargs dict, whose unknown keys already reject loudly) — so extra
    positional args from a newer client must fail the same way instead
    of being silently ignored (ADVICE r11)."""
    if len(args) > max_args:
        raise ValueError(
            f"{op} wire node carries {len(args)} args (expected at "
            f"most {max_args}) — re-serialize with a matching client "
            "version")


def _selection_node(op: str, args: list, child: Table, walk):
    """Replay a model-based selection node (r11).  The model/counts
    relations arrive as literal ``[[bucket, value], ...]`` row lists
    (BOUNDED — the client collects them under the ``_MAX_BUCKETS``
    guard before serializing) or, for counts, as a subtree over the
    registered datasets; keyword args are re-validated by the local
    entry points, so a hostile node fails the same way a bad local
    call does."""
    from .pipeline import (dsir_log_weights, hashed_bucket_counts,
                           quality_classifier, weighted_sample)

    spark = child.df.sparkSession

    def _counts_df(enc):
        if enc is None:
            return None
        if isinstance(enc, dict):
            return walk(enc).df
        return spark.createDataFrame(
            [(int(b), int(c)) for b, c in enc], "bucket long, cnt long")

    _SEL_KW = {
        "quality_classifier": {"text_col", "id_col", "n_buckets",
                               "intercept_milli", "threshold_milli",
                               "max_map_literal", "n"},
        "train_quality_classifier": {"text_col", "n_buckets", "n",
                                     "epochs", "lr", "persist",
                                     "init_intercept", "lr_decay"},
        "dsir_log_weights": {"text_col", "id_col", "n_buckets",
                             "smoothing", "n", "max_map_literal"},
        "weighted_sample": {"n", "key_threshold", "id_col",
                            "temperature", "seed", "max_n"},
    }

    def _kw(raw_kw: dict, which: str) -> dict:
        bad = set(raw_kw) - _SEL_KW[which]
        if bad:
            raise ValueError(
                f"{which} wire node carries unknown keyword(s) "
                f"{sorted(bad)} — re-serialize with a matching client "
                "version")
        return dict(raw_kw)

    def _tf(idx):
        # optional trailing target_filter expression subtree (r11
        # one-pass dual-count fit); absent in earlier r11 trees
        if len(args) <= idx or args[idx] is None:
            return None
        return _expr(args[idx], child)

    if op == "hashed_bucket_counts":
        # args: [child, text_col, n_buckets, n, (target_filter_expr)]
        _arity(op, args, 5)
        return Table(hashed_bucket_counts(child, args[1], args[2],
                                          args[3],
                                          target_filter=_tf(4)),
                     "bucket_counts")
    if op == "train_quality_classifier":
        # args: [child, label_expr_tree, {kw}] — the fit runs HERE
        # (eager epoch loop over the registered corpus); the result
        # relation is the bounded fitted model, intercept at -1
        _arity(op, args, 3)
        from .pipeline import train_quality_classifier as _tqc

        label = _expr(args[1], child)
        m = _tqc(child, label,
                 **_kw(args[2], "train_quality_classifier"))
        return Table(spark.createDataFrame(
            m.to_rows(), "bucket long, weight_milli long"),
            "trained_quality_model")
    if op == "quality_classifier":
        # args: [child, [[bucket, weight_milli], ...], {kw}]
        _arity(op, args, 3)
        wdf = spark.createDataFrame(
            [(int(b), int(w)) for b, w in args[1]],
            "bucket long, weight_milli long")
        return Table(quality_classifier(child, wdf,
                                        **_kw(args[2],
                                              "quality_classifier")),
                     "quality_classifier")
    if op == "dsir_log_weights":
        # args: [child, target_tree|None, raw_counts, target_counts,
        #        {kw}, (target_filter_expr)] — counts: None | literal
        #        rows | subtree
        _arity(op, args, 6)
        target = walk(args[1]) if args[1] is not None else None
        return Table(dsir_log_weights(
            child, target, raw_counts=_counts_df(args[2]),
            target_counts=_counts_df(args[3]),
            target_filter=_tf(5),
            **_kw(args[4], "dsir_log_weights")), "dsir_log_weights")
    # weighted_sample — args: [child, score_col, {kw}]
    _arity(op, args, 3)
    return Table(weighted_sample(child, args[1],
                                 **_kw(args[2], "weighted_sample")),
                 "weighted_sample")


def _lm_node(op: str, args: list, child: Table, walk):
    """Replay an n-gram LM node (r11).  The fit relation arrives as
    literal ``[[kind, bucket, cnt], ...]`` rows (BOUNDED — the client
    collects under the 2·_MAX_BUCKETS guard before serializing) or as
    a subtree over the registered datasets; the reference corpus as a
    subtree; keyword args re-validate through the local entry points,
    so a hostile node fails the same way a bad local call does."""
    from .pipeline import ngram_lm_fit, ngram_lm_logprob, \
        perplexity_buckets, perplexity_filter

    spark = child.df.sparkSession

    if op == "ngram_lm_fit":
        # args: [child, text_col, n_buckets, n,
        #        ({kw} — r12: unigrams; r13: tokenizer)]
        _arity(op, args, 5)
        kw = {}
        if len(args) > 4 and args[4]:
            bad = set(args[4]) - {"unigrams", "tokenizer",
                                  "continuations"}
            if bad:
                raise ValueError(
                    f"{op} wire node carries unknown keyword(s) "
                    f"{sorted(bad)} — re-serialize with a matching "
                    "client version")
            kw = dict(args[4])
            if "tokenizer" in kw:
                from .pipeline.tokenizer import tokenizer_from_wire
                kw["tokenizer"] = tokenizer_from_wire(kw["tokenizer"])
        return Table(ngram_lm_fit(child, args[1], args[2], args[3],
                                  **kw),
                     "ngram_lm_fit")

    # scoring ops — args: [child, ref_tree|None, counts_enc|None, {kw}]
    _arity(op, args, 4)
    reference = walk(args[1]) if args[1] is not None else None
    counts = None
    if args[2] is not None:
        if isinstance(args[2], dict):
            counts = walk(args[2]).df
        else:
            counts = spark.createDataFrame(
                [(str(k), int(b), int(c)) for k, b, c in args[2]],
                "kind string, bucket long, cnt long")
    allowed = {"text_col", "id_col", "n_buckets", "n", "smoothing",
               "backoff", "interpolate", "tokenizer", "kneser_ney"}
    allowed |= ({"prefer_literal"} if op == "ngram_lm_logprob"
                else {"quantiles", "labels", "by_col", "persist"}
                if op == "perplexity_buckets"
                else {"max_ppl", "min_ppl"})
    kw = dict(args[3])
    bad = set(kw) - allowed
    if bad:
        raise ValueError(
            f"{op} wire node carries unknown keyword(s) {sorted(bad)} "
            "— re-serialize with a matching client version")
    if "tokenizer" in kw:
        from .pipeline.tokenizer import tokenizer_from_wire
        kw["tokenizer"] = tokenizer_from_wire(kw["tokenizer"])
    if op == "perplexity_buckets":
        if "quantiles" in kw:
            kw["quantiles"] = tuple(kw["quantiles"])
        if "labels" in kw:
            kw["labels"] = tuple(kw["labels"])
        return Table(perplexity_buckets(child, reference, counts, **kw),
                     op)
    fn = (ngram_lm_logprob if op == "ngram_lm_logprob"
          else perplexity_filter)
    return Table(fn(child, reference, counts, **kw), op)


# r12 wire sweep (VERDICT r11 #3/#4): op -> (keyword whitelist, shape).
# Shapes: "unary" = [child, {kw}]; "binary" = [child, other_tree, {kw}]
# (the second table rides as a same-server subtree — decontamination's
# test corpus, canonical_docs' pair list); "terms" = [child, [str, ...],
# {kw}] (a literal KB-scale blocklist); "opt_tree" = [child,
# subtree|None, {kw}] (token_commonness' optional prebuilt vocabulary).
_PIPE_WIRE: dict[str, tuple[frozenset, str]] = {
    "exact_dedup": (frozenset({"text_col", "id_col"}), "unary"),
    "normalized_dedup": (frozenset({"text_col", "id_col"}), "unary"),
    "cross_doc_dup_lines": (
        frozenset({"text_col", "id_col", "min_chars", "scrub"}), "unary"),
    # r14: maximal duplicated spans (the auditor view of the
    # exact-substring family) — a pure literal-args lazy plan
    "cross_doc_dup_spans": (
        frozenset({"n", "min_docs", "text_col", "id_col"}), "unary"),
    "dup_span_popularity": (
        frozenset({"n", "text_col", "id_col"}), "unary"),
    # r15: winnowing (MOSS) — md5-hash fingerprints are portable, so
    # unlike the xxhash64 MinHash/SimHash generators these serialize
    "winnow_fingerprints": (
        frozenset({"k", "w", "text_col", "id_col"}), "unary"),
    "winnow_candidates": (
        frozenset({"k", "w", "min_shared", "max_bucket", "text_col",
                   "id_col"}), "unary"),
    "top_ngram_share": (frozenset({"n", "text_col", "id_col"}), "unary"),
    "source_mix": (
        frozenset({"text_col", "source_col", "tokenizer"}), "unary"),
    "extract_urls": (frozenset({"text_col"}), "unary"),
    "domain_mix": (frozenset({"text_col", "id_col"}), "unary"),
    "corpus_report": (frozenset({"text_col", "source_col"}), "unary"),
    "token_commonness": (
        frozenset({"text_col", "id_col", "vocab_size"}), "opt_tree"),
    "blocklist_filter": (frozenset({"text_col", "mode"}), "terms"),
    # tokenizer training's distributed phase (r13 second half): the
    # top-N word count runs server-side; the TRAINERS stay client-side
    # over the bounded computed relation
    "word_frequencies": (
        frozenset({"text_col", "lowercase", "byte_level", "max_words",
                   "min_count"}), "unary"),
    "tokenizer_stats": (frozenset({"text_col", "tokenizer"}), "unary"),
    "contamination_report": (
        frozenset({"n", "text_col", "id_col", "threshold"}), "binary"),
    "connected_components": (
        frozenset({"src", "dst", "max_iter"}), "unary"),
    "dedup_clusters": (frozenset({"left", "right", "max_iter"}), "unary"),
    "canonical_docs": (
        frozenset({"id_col", "left", "right", "max_iter"}), "binary"),
    # the packing family (late r12): split/chunk are pure projections,
    # pack_sequences runs its driver-frozen boundary sampling + bucket
    # offsets SERVER-side at replay (where the compute belongs)
    "train_val_test_split": (
        frozenset({"fractions", "on", "salt", "labels"}), "unary"),
    "pack_sequences": (
        frozenset({"budget", "text_col", "order_by", "partitions",
                   "tokenizer", "sep_tokens"}),
        "unary"),
    "chunk_documents": (
        frozenset({"max_tokens", "overlap", "text_col", "tokenizer"}),
        "unary"),
    # the extension operators (late r12): literal-kwargs lazy plans —
    # both join sides ride as same-server subtrees
    "asof_join": (
        frozenset({"on", "by", "right_cols", "suffix"}), "binary"),
    "salted_join": (
        frozenset({"on_left", "on_right", "salt", "how"}), "binary"),
    "range_join": (
        frozenset({"value_col", "lo_col", "hi_col", "how"}), "binary"),
    "bucketed_range_join": (
        frozenset({"value_col", "lo_col", "hi_col", "bucket_width"}),
        "binary"),
    "sessionize": (
        frozenset({"key", "order_by", "gap", "gap_col", "session_col"}),
        "unary"),
}

# extension ops resolve from their own modules, not blaze_spark.pipeline
_PIPE_MODULES = {
    "asof_join": "blaze_spark.operators.joins_ext",
    "salted_join": "blaze_spark.operators.joins_ext",
    "range_join": "blaze_spark.operators.range_join",
    "bucketed_range_join": "blaze_spark.operators.range_join",
    "sessionize": "blaze_spark.operators.sessionize",
}


def _pipeline_node(op: str, args: list, child: Table, walk):
    """Replay an r12 swept pipeline node.  Keyword args re-validate
    through the local entry points; unknown keywords and extra
    positional args reject loudly (the version-skew posture)."""
    from . import pipeline as _pl

    allowed, shape = _PIPE_WIRE[op]
    _arity(op, args, 2 if shape == "unary" else 3)
    raw_kw = args[-1] if len(args) > 1 and isinstance(args[-1], dict) \
        else {}
    bad = set(raw_kw) - allowed
    if bad:
        raise ValueError(
            f"{op} wire node carries unknown keyword(s) {sorted(bad)} "
            "— re-serialize with a matching client version")
    kw = dict(raw_kw)
    if "tokenizer" in kw:
        # r13: tokenizers ride as bounded wire dicts (vocab/merges are
        # literal relations); hostile forms fail in tokenizer_from_wire
        from .pipeline.tokenizer import tokenizer_from_wire
        kw["tokenizer"] = tokenizer_from_wire(kw["tokenizer"])
    pos = [child]
    if shape == "binary":
        pos.append(walk(args[1]))
    elif shape == "terms":
        if not isinstance(args[1], list) or \
                not all(isinstance(x, str) for x in args[1]):
            raise ValueError(
                f"{op} wire node expects a literal list of term "
                "strings as args[1]")
        pos.append(args[1])
    elif shape == "opt_tree":
        if args[1] is not None:
            kw["vocab"] = walk(args[1]).df
    if op in _PIPE_MODULES:
        import importlib

        fn = getattr(importlib.import_module(_PIPE_MODULES[op]), op)
    else:
        fn = getattr(_pl, op)
    out = fn(*pos, **kw)
    return out if isinstance(out, Table) else Table(out, op)


def _named_store(name: str, stores: dict, what: str) -> str:
    """Resolve a registered store NAME to its server-side path (the
    counts-store posture, r15 extended to bloom/codebook/centroid
    stores): trees never carry raw paths; the operator decides what
    is reachable."""
    if not isinstance(name, str) or name not in stores:
        known = sorted(stores)
        raise KeyError(
            f"unknown {what} store: {name!r} — trained-artifact "
            "leaves resolve only from the server's registered stores "
            f"{known}")
    return stores[name]


def _codebooks_arg(enc, stores: dict, child: Table):
    """A codebooks wire arg: either the bounded literal dict or (r15)
    the NAME of a registered codebook store, loaded where it lives
    (load_codebooks validates completeness via the self-described
    (m, ks) schema)."""
    from .pipeline.pq import codebooks_from_wire, load_codebooks

    if isinstance(enc, str):
        return load_codebooks(_named_store(enc, stores, "codebook"),
                              spark=child.df.sparkSession)
    return codebooks_from_wire(enc)


def _centroids_arg(enc, stores: dict, child: Table):
    """A coarse-centroids wire arg: literal dict or (r15) a registered
    centroid store name."""
    from .pipeline.ivf import load_centroids
    from .pipeline.pq import centroids_from_wire

    if isinstance(enc, str):
        return load_centroids(_named_store(enc, stores, "centroid"),
                              spark=child.df.sparkSession)
    return centroids_from_wire(enc)


def _bloom_node(op: str, args: list, child: Table, stores: dict):
    """Replay a bloom-store probe node (r15, VERDICT r14 #5): the
    packed filter NEVER rides the wire as rows — the node names a
    registered bloom store and the probe materializes where the store
    lives.  Two store kinds: 'saved' (save_bloom artifact —
    self-describing, geometry rides in reserved rows) and
    'incremental' (the streaming ingest store — the client passes the
    geometry, which read_bloom re-validates against the format
    stamp)."""
    from .pipeline.bloom import (bloom_contains, bloom_contamination,
                                 load_bloom)
    from .streaming.incremental_bloom import read_bloom

    spark = child.df.sparkSession
    if op == "bloom_contains":
        _arity(op, args, 4)          # [child, name, key_col, {kw}]
        kw = dict(args[3]) if len(args) > 3 and args[3] else {}
        allowed = {"out_col", "store", "m_bits", "k", "store_n"}
    else:
        _arity(op, args, 3)          # [child, name, {kw}]
        kw = dict(args[2]) if len(args) > 2 and args[2] else {}
        allowed = {"n", "text_col", "id_col", "threshold",
                   "store", "m_bits", "k", "store_n"}
    bad = set(kw) - allowed
    if bad:
        raise ValueError(
            f"{op} wire node carries unknown keyword(s) {sorted(bad)} "
            "— re-serialize with a matching client version")
    path = _named_store(args[1], stores, "bloom")
    kind = kw.pop("store", "saved")
    geom = {g: kw.pop(g) for g in ("m_bits", "k", "store_n")
            if g in kw}
    if kind == "saved":
        if geom:
            raise ValueError(
                f"{op}: {sorted(geom)} apply only to "
                "store='incremental' — a saved bloom artifact is "
                "self-describing")
        bloom = load_bloom(spark, path)
    elif kind == "incremental":
        bloom = read_bloom(
            spark, path, m_bits=int(geom.get("m_bits", 1 << 23)),
            k=int(geom.get("k", 7)),
            n=(None if geom.get("store_n") is None
               else int(geom["store_n"])))
    else:
        raise ValueError(
            f"{op}: unknown store kind {kind!r} — expected 'saved' "
            "or 'incremental'")
    if op == "bloom_contains":
        if not isinstance(args[2], str):
            raise ValueError(
                "bloom_contains wire node expects the key column "
                "name as args[2]")
        return Table(bloom_contains(child, bloom, args[2], **kw), op)
    return Table(bloom_contamination(child, bloom, **kw), op)


def _pq_node(op: str, args: list, child: Table, walk, stores: dict):
    """Replay a trained-PQ application node (r13): args = [codes_tree,
    codebooks_enc, queries_enc, {kw}].  The codebooks rebuild from
    their bounded literal dict or (r15) resolve from a registered
    codebook store by name; queries arrive as sorted literal
    (id, vector) rows or a same-server subtree; keyword args
    re-validate through the local entry point."""
    from .pipeline.pq import pq_topk

    _arity(op, args, 4)
    allowed = {"k", "id_col", "code_col", "vec_col", "round_to",
               "max_queries"}
    kw = dict(args[3]) if len(args) > 3 and args[3] else {}
    bad = set(kw) - allowed
    if bad:
        raise ValueError(
            f"{op} wire node carries unknown keyword(s) {sorted(bad)} "
            "— re-serialize with a matching client version")
    codebooks = _codebooks_arg(args[1], stores, child)
    if isinstance(args[2], dict):
        queries = walk(args[2])
    else:
        if not isinstance(args[2], list) or not args[2]:
            raise ValueError(
                f"{op} wire node expects literal (id, vector) query "
                "rows or a subtree as args[2]")
        spark = child.df.sparkSession
        id_col = kw.get("id_col", "vec_id")
        vec_col = kw.get("vec_col", "embedding")
        queries = Table(spark.createDataFrame(
            [(int(q), [float(x) for x in v]) for q, v in args[2]],
            f"{id_col} long, {vec_col} array<double>"), "queries")
    return pq_topk(child, queries, codebooks, **kw)


def _ivf_pq_node(op: str, args: list, child: Table, walk,
                 stores: dict):
    """Replay an IVF-PQ application node (r13 second half): args =
    [codes_tree, centroids_enc, codebooks_enc, queries_enc, {kw}].
    Same posture as _pq_node plus the coarse centroids as a second
    bounded literal — the nprobe-pruned isin filter then applies at
    THIS server's scan.  r15: either artifact may instead NAME a
    registered store."""
    from .pipeline.pq import ivf_pq_topk

    _arity(op, args, 5)
    allowed = {"k", "nprobe", "id_col", "code_col", "vec_col",
               "cell_col", "round_to", "max_queries"}
    kw = dict(args[4]) if len(args) > 4 and args[4] else {}
    bad = set(kw) - allowed
    if bad:
        raise ValueError(
            f"{op} wire node carries unknown keyword(s) {sorted(bad)} "
            "— re-serialize with a matching client version")
    centroids = _centroids_arg(args[1], stores, child)
    codebooks = _codebooks_arg(args[2], stores, child)
    if isinstance(args[3], dict):
        queries = walk(args[3])
    else:
        if not isinstance(args[3], list) or not args[3]:
            raise ValueError(
                f"{op} wire node expects literal (id, vector) query "
                "rows or a subtree as args[3]")
        spark = child.df.sparkSession
        id_col = kw.get("id_col", "vec_id")
        vec_col = kw.get("vec_col", "embedding")
        queries = Table(spark.createDataFrame(
            [(int(q), [float(x) for x in v]) for q, v in args[3]],
            f"{id_col} long, {vec_col} array<double>"), "queries")
    return ivf_pq_topk(child, queries, centroids, codebooks, **kw)


def _bm25_node(args: list, child: Table, walk):
    """Replay a BM25 retrieval node (r15): corpus as the walked child,
    the bounded query side as literal [query_id, query] rows or a
    same-server subtree.  Keyword args re-validate through the local
    entry point, so a hostile node fails like a bad local call."""
    from .pipeline import bm25_topk

    _arity("bm25_topk", args, 3)
    allowed = {"k", "k1", "b", "text_col", "id_col", "query_id_col",
               "query_text_col", "max_queries", "round_to", "persist"}
    kw = dict(args[2])
    bad = set(kw) - allowed
    if bad:
        raise ValueError(
            f"bm25_topk wire node carries unknown keyword(s) "
            f"{sorted(bad)} — re-serialize with a matching client "
            "version")
    if isinstance(args[1], dict):
        queries = walk(args[1])
    else:
        if (not isinstance(args[1], list) or not args[1]
                or not all(isinstance(p, list) and len(p) == 2
                           and isinstance(p[0], int)
                           and isinstance(p[1], str)
                           for p in args[1])):
            raise ValueError(
                "bm25_topk wire node expects literal [query_id, query] "
                "rows or a subtree as args[1]")
        spark = child.df.sparkSession
        qid = kw.get("query_id_col", "query_id")
        qtx = kw.get("query_text_col", "query")
        queries = spark.createDataFrame(
            [(int(i), q) for i, q in args[1]],
            T.StructType([T.StructField(qid, T.LongType()),
                          T.StructField(qtx, T.StringType())]))
    return bm25_topk(child, queries, **kw)


def _mix_dedup_node(op: str, args: list, child: Table, walk):
    """Replay a mid-r11 literal-args table node: dup-span
    scoring/scrub, temperature mixture weights, or mixture execution
    (weights as bounded literal rows or a same-server subtree)."""
    from .pipeline import (apply_source_mix, cross_doc_dup_ngrams,
                           temperature_source_mix, unimax_source_mix)

    def _kw(raw_kw: dict, allowed: set) -> dict:
        bad = set(raw_kw) - allowed
        if bad:
            raise ValueError(
                f"{op} wire node carries unknown keyword(s) "
                f"{sorted(bad)} — re-serialize with a matching client "
                "version")
        return dict(raw_kw)

    if op == "cross_doc_dup_ngrams":
        _arity(op, args, 2)
        kw = _kw(args[1], {"n", "min_docs", "text_col", "id_col",
                           "scrub"})
        return cross_doc_dup_ngrams(child, **kw)
    if op == "temperature_source_mix":
        _arity(op, args, 2)
        kw = _kw(args[1], {"alpha", "text_col", "source_col",
                           "allow_upsample", "tokenizer"})
        if "tokenizer" in kw:
            from .pipeline.tokenizer import tokenizer_from_wire
            kw["tokenizer"] = tokenizer_from_wire(kw["tokenizer"])
        return Table(temperature_source_mix(child, **kw),
                     "temperature_source_mix")
    if op == "unimax_source_mix":
        _arity(op, args, 2)
        kw = _kw(args[1], {"budget_tokens", "max_epochs", "text_col",
                           "source_col", "tokenizer"})
        if "budget_tokens" not in kw:
            raise ValueError(
                "unimax_source_mix wire node is missing the required "
                "budget_tokens keyword")
        if "tokenizer" in kw:
            from .pipeline.tokenizer import tokenizer_from_wire
            kw["tokenizer"] = tokenizer_from_wire(kw["tokenizer"])
        return Table(unimax_source_mix(child, **kw),
                     "unimax_source_mix")
    # apply_source_mix — args: [child, weights_enc, {kw}]
    _arity(op, args, 3)
    kw = _kw(args[2], {"source_col", "id_col", "seed",
                       "allow_upsample"})
    if isinstance(args[1], dict):
        weights = walk(args[1]).df
    else:
        spark = child.df.sparkSession
        src_col = kw.get("source_col", "source")
        weights = spark.createDataFrame(
            [(s, float(w)) for s, w in args[1]],
            T.StructType([T.StructField(src_col, T.StringType()),
                          T.StructField("sample_weight",
                                        T.DoubleType())]))
    return apply_source_mix(child, weights, **kw)


def compute_tree(tree: dict, *, spark: SparkSession | None = None,
                 datasets: dict[str, Table] | None = None):
    """The /compute endpoint semantics: rebuild, execute, return pandas."""
    return from_tree(tree, spark=spark, datasets=datasets).compute()


def to_tree(obj) -> dict:
    """Serialize an engine-built expression to the JSON dialect that
    ``from_tree`` evaluates (reference to_tree: blaze/server/server.py:
    411-477).  Recording covers the leaf + projection/selection/sort/head
    chain and scalar expressions; tables built by ops outside that set
    raise (their plan lives in Spark lineage, not the dialect)."""
    tree = getattr(obj, "_tree", None)
    if tree is None:
        raise ValueError(
            "expression is not serializable to the tree dialect "
            "(built from ops outside the recorded subset)")
    return tree


def sql(query: str, *, spark: SparkSession | None = None,
        **tables: Table) -> Table:
    """SQL entry point: register the given Tables as temp views and run the
    query through Spark SQL (the reference's SparkSQL backend compiled
    expressions INTO SQL strings, blaze/compute/sparksql.py:61-93; here SQL
    is simply a second front-end onto the same Catalyst plans)."""
    for name, t in tables.items():
        if getattr(t, "_client", None) is not None:
            raise TypeError(
                f"sql() table {name!r} is remote (blaze://): registering "
                "it as a temp view would query the empty schema-only "
                "frame.  compute() the remote expression first, or run "
                "the SQL on the server's own session.")
    spark = spark or SparkSession.getActiveSession()
    if spark is None and tables:
        spark = next(iter(tables.values())).df.sparkSession
    for name, t in tables.items():
        t.df.createOrReplaceTempView(name)
    return Table(spark.sql(query))


class CachedTable:
    """Memoizing wrapper (CachedDataset analogue, blaze/cached.py:17-58).

    ``compute(table)`` returns a cached pandas result when an identical
    plan (by Spark semantic hash) was computed before; ``persist=True``
    additionally caches the distributed data for plan reuse.

    The memo holds COLLECTED pandas results on the driver, so it is
    bounded (VERDICT r5 #5 — the reference's unbounded ``CachedDataset``
    would OOM the driver on a cached 100 GB projection): a single result
    larger than ``max_entry_bytes`` is returned but NOT memoized, and
    the memo as a whole evicts least-recently-used entries once it
    exceeds ``max_total_bytes``.  The 100 TB path for re-used
    intermediates is ``Table.persist`` (executor-side blocks), not this
    driver-side cache."""

    def __init__(self, persist: bool = False,
                 max_entry_bytes: int = 256 << 20,
                 max_total_bytes: int = 1 << 30):
        from collections import OrderedDict

        self._memo: "OrderedDict[int, Any]" = OrderedDict()
        self._bytes: dict[int, int] = {}
        self._persist = persist
        self.max_entry_bytes = max_entry_bytes
        self.max_total_bytes = max_total_bytes

    @staticmethod
    def _sizeof(result) -> int:
        try:
            return int(result.memory_usage(deep=True).sum())
        except Exception:
            return 0

    def compute(self, t: Table):
        key = t.df.semanticHash()
        if key in self._memo:
            self._memo.move_to_end(key)
            return self._memo[key]
        df = t.df
        if self._persist:
            df = df.persist()
        result = df.toPandas()
        size = self._sizeof(result)
        if size > self.max_entry_bytes:
            return result  # too big to memoize on the driver
        self._memo[key] = result
        self._bytes[key] = size
        total = sum(self._bytes.values())
        while total > self.max_total_bytes and len(self._memo) > 1:
            old_key, _ = self._memo.popitem(last=False)
            total -= self._bytes.pop(old_key)
        return result

    def __len__(self):
        return len(self._memo)

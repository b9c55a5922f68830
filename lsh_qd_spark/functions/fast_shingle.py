"""Fused text → shingle-set → signature kernels (the production hot path).

Why this exists: the JVM higher-order-function shingle expression
(functions/text.py) is *interpreted* by Catalyst — nested
``transform``/``slice``/``concat_ws`` lambdas fall out of whole-stage
codegen and cost ~3 ms/doc. This kernel does tokenize → k-gram → hash →
MinHash in ONE Arrow-batched pandas UDF at ~0.1 ms/doc:

- tokens: ``text.lower().split()`` — lowercase + any-whitespace split,
  deterministic per byte-identical text. NOT byte-identical to the JVM
  path: functions/text.py tokenizes on Java ``\\s+`` (ASCII whitespace
  only), while Python/Arrow split on all ~29 Unicode whitespace
  codepoints, so e.g. ``"a\\u00a0b"`` is one token on the JVM path and
  two here. The two hash FAMILIES already produce disjoint key spaces
  (crc32+poly vs xxhash64-of-string), so nothing may mix grams across
  families anyway — each family is self-consistent end-to-end (banding
  and verify both use this kernel on the fast path);
- token hash: zlib.crc32 (C speed, stable across processes/platforms);
- k-gram shingle id: rolling polynomial combine of k consecutive token
  hashes in uint64 wraparound arithmetic (golden-ratio odd multiplier) —
  vectorized over the whole document. The SIGNATURE path keeps duplicate
  shingles (MinHash is multiplicity-invariant, so the per-doc unique-sort
  is skipped — ``shingle_windows``); consumers needing true SET semantics
  (Jaccard verify, SimHash — the sets of /root/reference/lsh-qd.py:195)
  must use ``shingle_sets``/``shingle_set``, which dedup via
  ``np.unique``;
- MinHash: the per-hash 1-D loop of functions/minhash.py on the
  concatenated batch.

The intermediate shingle column never materializes for the full corpus:
signatures come straight from text, and the verify stage re-derives shingle
sets only for candidate-pair documents (a small fraction of the corpus).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lsh_qd_spark.config import HASH_M, MERSENNE_P
from lsh_qd_spark.functions.minhash import minhash_matrix, production_coefficients

_B = np.uint64(0x9E3779B97F4A7C15)  # odd 64-bit golden-ratio multiplier


def shingle_set(text: str | None, k: int) -> np.ndarray | None:
    """Distinct k-gram shingle ids (uint64) of one document; None if empty.

    Delegates to the object tokenizer rather than re-implementing the
    tokenize→crc32→rolling-combine invariant a third time: every copy of
    that loop must stay bit-identical for the scalar-vs-batch parity the
    module's tests pin, so there is exactly one scalar-path definition
    (``_shingle_windows_objects``)."""
    w = _shingle_windows_objects([text], k)[0]
    return None if w is None else np.unique(w)


def shingle_sets(texts, k: int) -> list:
    """Batched ``shingle_set`` over a whole Arrow batch — output-identical
    to ``[shingle_set(t, k) for t in texts]``, ~25% faster (measured on
    synth pages, 140 tokens/doc):

    - one flat token array for the batch; each UNIQUE token is crc32-hashed
      once (``pd.factorize``; web text is Zipfian — ~4% unique tokens per
      10k-doc batch) and integer codes map hashes back to positions;
    - the k-gram rolling hash runs ONCE over the concatenated hash array;
      windows that would cross a document boundary exist in the window
      array but are never sliced back out, so results are per-document
      exact;
    - per-doc ``np.unique`` keeps the set semantics (a global sort was
      measured slower).
    """
    return [
        None if w is None else np.unique(w) for w in shingle_windows(texts, k)
    ]


# Sentinel token for the batched-join tokenizer: NUL is not whitespace to
# either tokenizer (Python str.split or Arrow utf8_split_whitespace), so it
# survives the split as its own token and marks document boundaries. Any
# input that already CONTAINS a NUL routes to the object fallback.
_SEP = "\x00"
# One joined batch string must fit 32-bit Arrow string offsets (2 GiB of
# utf-8). 400M chars * 4 bytes/char worst case = 1.6 GiB, safely under;
# ordinary 10k-row Arrow batches of web text are tens of MB.
_MAX_JOIN_CHARS = 400_000_000


def shingle_windows(texts, k: int) -> list:
    """Per-document k-gram shingle ids WITHOUT the per-doc set dedup —
    raw rolling-hash windows (duplicates possible, unsorted). MinHash is
    invariant to duplicates (min over a multiset == min over the set), so
    the fused signature path consumes these directly and skips the per-doc
    ``np.unique`` sort, ~25% off the whole kernel (measured, 10k-doc
    batch). Anything needing true SET semantics (Jaccard verify, SimHash
    majorities) must go through ``shingle_sets``/``shingle_set``.

    Tokenization runs batch-at-once through Arrow C++ kernels (join all
    docs with a NUL sentinel → ONE Python ``str.lower()`` over the joined
    string → ``utf8_split_whitespace`` → ``dictionary_encode``), so no
    per-token Python object is ever created: 2-3x faster than the per-doc
    object path (measured, 10k-doc synth batches), output bit-identical.
    Safe because the two tokenizers agree exactly: the 29 codepoints
    Python ``str.split()`` treats as whitespace are precisely the ones
    Arrow splits on (full-range scan in tests/test_shingle.py), and
    ``lower()`` stays on the Python side (Arrow's ``utf8_lower`` is a
    simple case map — it would diverge on final sigma / dotted-I).
    Inputs the trick can't represent (a doc containing the sentinel, a
    batch whose join would overflow 32-bit Arrow offsets, non-string
    payloads) fall back to ``_shingle_windows_objects``."""
    tl = list(texts)
    n_docs = len(tl)
    if n_docs == 0:
        return []
    if (
        n_docs == 1
        or any(
            (t is not None and not isinstance(t, str)) or (t and _SEP in t)
            for t in tl
        )
        or sum(len(t) for t in tl if t) > _MAX_JOIN_CHARS
    ):
        return _shingle_windows_objects(tl, k)
    import pyarrow as pa
    import pyarrow.compute as pc

    out: list = [None] * n_docs
    low = (" " + _SEP + " ").join(t if t else "" for t in tl).lower()
    # .values of the 1-element split result = ALL tokens, one contiguous
    # Arrow string array (includes empty strings the splitter emits at
    # leading/trailing whitespace — dropped below by code, vectorized)
    vals = pc.utf8_split_whitespace(pa.array([low])).values
    dic = pc.dictionary_encode(vals)
    codes = dic.indices.to_numpy()  # int32, zero-copy
    uniq = dic.dictionary.to_pylist()
    uh = np.fromiter(
        (zlib.crc32(u.encode()) for u in uniq), np.uint64, count=len(uniq)
    )
    try:
        codes = codes[codes != uniq.index("")]
    except ValueError:
        pass  # no empty tokens in this batch
    c = uh[codes]
    total = len(codes)
    # document boundaries = positions of the sentinel token. The guard
    # above makes exactly n_docs-1 of them structurally certain: the join
    # inserts n_docs-1 sentinels, no input contains one, and neither
    # lower() nor the split can create or absorb one (NUL has no case
    # mapping and is not whitespace).
    try:
        sep_code = uniq.index(_SEP)
        bounds = np.nonzero(codes == sep_code)[0]
    except ValueError:
        bounds = None
    if bounds is None or len(bounds) != n_docs - 1:
        # Not an assert: executors may run with PYTHONOPTIMIZE, and a
        # miscount here (e.g. a future Arrow unicodedata bump reclassifying
        # some codepoint) would silently slice shingles across document
        # boundaries. Route the batch to the semantics oracle instead.
        import warnings

        warnings.warn(
            "shingle_windows: Arrow tokenizer found "
            f"{-1 if bounds is None else len(bounds)} sentinel tokens for "
            f"{n_docs} docs; falling back to the object tokenizer",
            RuntimeWarning,
        )
        return _shingle_windows_objects(tl, k)
    starts = np.empty(n_docs, np.int64)
    ends = np.empty(n_docs, np.int64)
    starts[0] = 0
    starts[1:] = bounds + 1
    ends[:-1] = bounds
    ends[-1] = total
    lens = ends - starts
    # rolling hash over the whole stream, sentinels included: windows that
    # contain a sentinel sit in the cross-boundary zone the per-doc slices
    # below never touch (same discard-by-slicing as the object path)
    if total >= k:
        acc = np.zeros(total - k + 1, dtype=np.uint64)
        for j in range(k):
            np.multiply(acc, _B, out=acc)
            np.add(acc, c[j : total - k + 1 + j], out=acc)
        for i in np.nonzero(lens >= k)[0]:
            s = starts[i]
            out[i] = acc[s : s + lens[i] - k + 1]
    # short documents (0 < n < k) take one shingle over all n tokens — the
    # scalar path's m = min(n, k) case, run per doc (rare in web text)
    for i in np.nonzero((lens > 0) & (lens < k))[0]:
        seg = c[starts[i] : ends[i]]
        a = np.zeros(1, dtype=np.uint64)
        for j in range(int(lens[i])):
            a = a * _B + seg[j : j + 1]
        out[i] = a
    return out


def _shingle_windows_objects(texts, k: int) -> list:
    """Per-doc Python-object tokenize path: the pre-Arrow implementation,
    kept as the semantics oracle and the fallback for inputs the joined-
    batch trick can't represent (see shingle_windows). Output-identity of
    the two paths is pinned in tests/test_shingle.py."""
    toks_list = [t.lower().split() if t else [] for t in texts]
    n_docs = len(toks_list)
    lens = np.fromiter((len(t) for t in toks_list), np.int64, count=n_docs)
    out: list = [None] * n_docs
    total = int(lens.sum())
    if total == 0:
        return out
    flat = np.empty(total, dtype=object)
    pos = 0
    for tk in toks_list:
        flat[pos : pos + len(tk)] = tk
        pos += len(tk)
    codes, uniq = pd.factorize(flat)
    uh = np.fromiter(
        (zlib.crc32(u.encode()) for u in uniq), np.uint64, count=len(uniq)
    )
    c = uh[codes]
    starts = np.zeros(n_docs, np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    if total >= k:
        acc = np.zeros(total - k + 1, dtype=np.uint64)
        for j in range(k):
            acc = acc * _B + c[j : total - k + 1 + j]
        for i in np.nonzero(lens >= k)[0]:
            s = starts[i]
            out[i] = acc[s : s + lens[i] - k + 1]
    # short documents (0 < n < k) take one shingle over all n tokens — the
    # scalar path's m = min(n, k) case, run per doc (rare in web text)
    for i in np.nonzero((lens > 0) & (lens < k))[0]:
        seg = c[starts[i] : starts[i] + lens[i]]
        a = np.zeros(1, dtype=np.uint64)
        for j in range(int(lens[i])):
            a = a * _B + seg[j : j + 1]
        out[i] = a
    return out


def make_text_minhash_udf(num_hashes: int, k: int, seed: int = 42):
    """text → MinHash signature array<long>; NULL for empty documents
    (the reference's empty-set skip, /root/reference/lsh-qd.py:196-197)."""
    a, b = production_coefficients(num_hashes, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def text_minhash(texts: pd.Series) -> pd.Series:
        # raw windows, not sets: MinHash is duplicate-invariant, so the
        # per-doc unique-sort is pure overhead here (shingle_windows doc)
        wins = shingle_windows(texts, k)
        arrays = [None if w is None else w.view(np.int64) for w in wins]
        mat = minhash_matrix(arrays, a, b, MERSENNE_P, HASH_M)
        return pd.Series(
            [
                None if w is None else row.tolist()
                for w, row in zip(wins, mat)
            ]
        )

    # NOTE: never put a `.where(...)` on this UDF's output column in a hot
    # path — Catalyst substitutes the UDF into the pushed-down predicate and
    # evaluates the kernel twice per row (plan_audit.py catches this as two
    # ArrowEvalPython nodes). Null signatures vanish at the banding
    # posexplode instead. (asNondeterministic() also blocks the
    # substitution, but measurably degrades downstream join planning.)
    return text_minhash


def make_text_shingles_udf(k: int):
    """text → array<long> of distinct shingle ids (for verify/simhash on
    candidate documents only)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def text_shingles(texts: pd.Series) -> pd.Series:
        sets = shingle_sets(texts, k)
        return pd.Series(
            [None if s is None else s.view(np.int64).tolist() for s in sets]
        )

    # see make_text_minhash_udf: no filters on this output in hot paths
    return text_shingles

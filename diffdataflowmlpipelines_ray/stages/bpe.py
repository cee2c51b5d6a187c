"""Distributed byte-level BPE tokenizer: corpus-scale training + actor-pool
encoding.

The reference counts tokens (count_vectorizer.rs) but never LEARNS a
subword vocabulary; for an LLM training-data pipeline the tokenizer itself
is a data product.  The classic BPE trainer (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; byte-level
alphabet as in GPT-2) factors cleanly onto Ray Data:

- **Word histogram is the only reduction** — a two-phase count over
  pre-tokenized segments (per-block ``Counter`` partials, one small
  ``groupby(word).sum``).  The corpus is touched ONCE, streaming; at
  100 TB the histogram of distinct word TYPES (Heap's law, further bounded
  by ``min_count`` / ``max_types``) is what reaches the driver, never the
  corpus.  This mirrors how production trainers (sentencepiece, HF
  tokenizers) operate: merge learning is inherently sequential in the
  merge rank, so it runs in one process over the bounded histogram.
- **Merge learning is incremental** — pair counts and a pair→word index
  are maintained across iterations (only words containing the merged pair
  are touched), not recounted from scratch; ties break deterministically
  (highest count, then lowest symbol-id pair) so training is
  partition-order independent.
- **Encoding is embarrassingly parallel** — ``EncodeBpe`` is an actor-pool
  ``map_batches`` stage: the merge table ships once per actor
  (constructor ``ray.put`` ref, not per batch) and a per-actor word→ids
  cache exploits Zipf (most segments repeat) so the greedy merge loop
  runs only on first sight of a word type.

Byte-level alphabet: initial vocab is the 256 byte values; merge ``i``
creates symbol id ``256 + i``.  Pre-tokenization splits into alternating
whitespace / non-whitespace runs (lossless: ``decode(encode(t)) == t``).
"""

from __future__ import annotations

import re
from typing import Mapping, Sequence

import numpy as np
import pyarrow as pa

__all__ = ["word_histogram", "train_bpe_from_histogram", "learn_bpe",
           "BpeModel", "EncodeBpe"]

_SEGMENT_RE = re.compile(r"\s+|\S+")


def _pretokenize(text: str) -> list[str]:
    """Lossless segmentation: alternating whitespace / non-whitespace runs
    (``"".join(segments) == text``).  Merges never cross segments."""
    return _SEGMENT_RE.findall(text)


def word_histogram(ds, col: str = "text", min_count: int = 1):
    """(word, n) Dataset of segment frequencies — the trainer's input.

    Two-phase: per-block ``Counter`` collapses repeats before the shuffle
    (a block's distinct segments ≪ its tokens), then one
    ``groupby(word).sum``.  ``min_count`` prunes AFTER the global sum
    (a word rare per block may be frequent globally)."""
    from collections import Counter

    def partial(tbl: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in tbl[col].to_pylist():
            if t:
                c.update(_pretokenize(t))
        if not c:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        words, ns = zip(*c.items())
        return pa.table({"word": pa.array(words, type=pa.string()),
                         "n": pa.array(ns, type=pa.int64())})

    hist = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("word").sum("n"))
    if min_count > 1:
        import pyarrow.compute as pc

        hist = hist.map_batches(
            lambda b: b.filter(pc.greater_equal(b["sum(n)"], min_count)),
            batch_format="pyarrow")
    return hist


def train_bpe_from_histogram(hist: Mapping[str, int], num_merges: int
                             ) -> list[tuple[int, int]]:
    """Learn ``num_merges`` merges from a word→count histogram.

    Incremental: pair counts and a pair→{word index} occurrence map are
    updated only for words containing the chosen pair.  Deterministic
    tie-break: max count, then the lexicographically SMALLEST (a, b) id
    pair — so the result is independent of dict/iteration order.  Stops
    early when no pair occurs twice (merging singletons is pointless and
    would make the result depend on histogram order)."""
    from collections import Counter, defaultdict

    words: list[list[int]] = []
    counts: list[int] = []
    for w, n in hist.items():
        if len(w) >= 1 and n > 0:
            words.append(list(w.encode("utf-8")))
            counts.append(int(n))

    pair_counts: Counter = Counter()
    occ: defaultdict = defaultdict(set)  # pair -> {word idx}
    for i, (seq, n) in enumerate(zip(words, counts)):
        for p in zip(seq, seq[1:]):
            pair_counts[p] += n
            occ[p].add(i)

    merges: list[tuple[int, int]] = []
    for m in range(num_merges):
        if not pair_counts:
            break
        best = max(pair_counts.items(), key=lambda kv: (kv[1], (-kv[0][0],
                                                                -kv[0][1])))
        (a, b), cnt = best
        if cnt < 2:
            break
        new_id = 256 + len(merges)
        merges.append((a, b))
        for i in list(occ[(a, b)]):
            seq, n = words[i], counts[i]
            # decrement ALL old pair counts of this word, re-merge, add new
            for p in zip(seq, seq[1:]):
                pair_counts[p] -= n
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                occ[p].discard(i)
            j, out = 0, []
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                    out.append(new_id)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            words[i] = out
            for p in zip(out, out[1:]):
                pair_counts[p] += n
                occ[p].add(i)
    return merges


class BpeModel:
    """Learned merge table + greedy encoder/decoder.

    ``encode`` applies merges in RANK order per segment (the standard
    greedy loop: repeatedly merge the lowest-rank adjacent pair present);
    ``decode`` concatenates each symbol's byte expansion — lossless."""

    def __init__(self, merges: Sequence[tuple[int, int]]):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {tuple(m): r for r, m in enumerate(self.merges)}
        # symbol id -> bytes
        self.vocab: list[bytes] = [bytes([i]) for i in range(256)]
        for a, b in self.merges:
            self.vocab.append(self.vocab[a] + self.vocab[b])
        self._cache: dict[str, list[int]] = {}

    def encode_word(self, word: str) -> list[int]:
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        seq = list(word.encode("utf-8"))
        while len(seq) >= 2:
            pairs = set(zip(seq, seq[1:]))
            ranked = [(self.ranks[p], p) for p in pairs if p in self.ranks]
            if not ranked:
                break
            rank, (a, b) = min(ranked)
            new_id, j, out = 256 + rank, 0, []
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                    out.append(new_id)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seq = out
        self._cache[word] = seq
        return seq

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        for seg in _pretokenize(text):
            ids.extend(self.encode_word(seg))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        return b"".join(self.vocab[i] for i in ids).decode("utf-8")


def learn_bpe(ds, col: str = "text", num_merges: int = 200,
              min_count: int = 1, max_types: int | None = None) -> BpeModel:
    """End-to-end trainer: streaming distributed histogram → bounded
    driver merge learning.

    ``max_types`` hard-caps driver state: keep the top-frequency word
    types (count desc, word asc — deterministic), mirroring the
    ``max_features`` control on ``CountVectorizer``.  The tail of a
    Zipfian corpus contributes negligibly to pair counts, so capping
    changes low-rank merges only."""
    rows = word_histogram(ds, col, min_count=min_count).take_all()
    hist = {r["word"]: r["sum(n)"] for r in rows}
    if max_types is not None and len(hist) > max_types:
        keep = sorted(hist.items(), key=lambda kv: (-kv[1], kv[0]))
        hist = dict(keep[:max_types])
    return BpeModel(train_bpe_from_histogram(hist, num_merges))


class EncodeBpe:
    """Actor-pool ``map_batches`` stage: text column → ``token_ids``
    (list<int32>) + ``n_bpe_tokens``.  The merge table ships ONCE per
    actor (``ray.put`` ref resolved in ``__init__``); the model's
    word→ids cache amortizes the greedy loop across repeated segments."""

    def __init__(self, merges_ref, col: str = "text"):
        import ray

        obj = ray.get(merges_ref) if not isinstance(merges_ref, list) \
            else merges_ref
        self.model = BpeModel(obj)
        self.col = col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        enc = self.model.encode
        ids = [enc(t) if t else [] for t in tbl[self.col].to_pylist()]
        n = np.fromiter((len(x) for x in ids), dtype=np.int64, count=len(ids))
        return tbl.append_column(
            "token_ids", pa.array(ids, type=pa.list_(pa.int32()))
        ).append_column("n_bpe_tokens", pa.array(n))

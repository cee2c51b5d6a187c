"""Fuzzy string-match join (entity resolution / record linkage): all pairs
within Levenshtein distance ``max_dist``, exactly.

The AllPairs/PPJoin-style plan (Bayardo et al. 2007; Xiao et al. 2008),
factored onto Ray Data:

1. **Prefix-filter blocking** — each string's DISTINCT character bigrams,
   globally ordered rarest-first (one tiny two-phase gram-frequency count,
   broadcast).  One edit changes at most ``q = 2`` distinct bigrams, so
   strings within distance ``k`` share all but ``k·q`` of either side's
   gram set; by the prefix-filter theorem the pair is then guaranteed to
   collide on at least one of the FIRST ``k·q + 1`` grams of each side
   under any common total order.  Emitting ≤ ``k·q+1`` gram rows per
   string bounds the blocking exchange at a small constant × corpus size,
   and rarest-first ordering keeps buckets small.
2. **One ``groupby(gram)`` shuffle** — candidates are generated where the
   gram rows land; a length-difference ≤ ``k`` filter prunes before any
   pair materializes.
3. **Batched verification** — candidate pairs are grouped by their exact
   (len_a, len_b) and the full Levenshtein DP runs VECTORIZED across all
   pairs of a shape group (``len_a × len_b`` vector steps over the whole
   pair batch — never a per-pair Python DP).  Matches DuckDB's
   ``levenshtein`` (unit costs) exactly, which is the SQL oracle.
4. **Pair dedup** — the same pair can collide on several grams; block-
   local ``drop_duplicates`` then one pair-bucket shuffle finishes the
   exact distinct without any driver structure.

Skew note: a corpus where thousands of strings share their 5 rarest grams
(near-identical keys) concentrates candidate generation; the documented
mitigation is raising ``q``/prefix length or salting verification — recall
is never affected, only balance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

__all__ = ["levenshtein_batch", "fuzzy_join"]

#: gram width.  q = 3 (trigrams): the q = 2 alphabet is tiny on
#: machine-formatted keys (digits + a constant template ⇒ ~10² live
#: bigrams), which let every string share its "rare" grams — measured
#: 123M candidate pairs on the sf0.1 customer corpus.  Trigrams push the
#: live alphabet to ~10³⁺ and the same corpus to ~10⁵ candidates; the
#: prefix-filter theorem is width-generic (one edit touches ≤ q distinct
#: grams ⇒ within distance k the first k·q+1 rarest grams must collide).
_Q = 3


def levenshtein_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Exact Levenshtein distance for each (a[i], b[i]) pair — vectorized
    across pairs (grouped by shape; the DP loop is over string POSITIONS,
    each step a whole-batch numpy op)."""
    n = len(a)
    la = np.fromiter((len(x) for x in a), dtype=np.int64, count=n)
    lb = np.fromiter((len(x) for x in b), dtype=np.int64, count=n)
    out = np.zeros(n, dtype=np.int64)
    shapes = {}
    for i in range(n):
        shapes.setdefault((la[i], lb[i]), []).append(i)
    for (m, p), idx in shapes.items():
        ix = np.asarray(idx, dtype=np.int64)
        if m == 0 or p == 0:
            out[ix] = max(m, p)
            continue
        am = np.frombuffer("".join(a[i] for i in idx).encode("utf-32-le"),
                           dtype=np.uint32).reshape(len(ix), m)
        bm = np.frombuffer("".join(b[i] for i in idx).encode("utf-32-le"),
                           dtype=np.uint32).reshape(len(ix), p)
        prev = np.broadcast_to(np.arange(p + 1, dtype=np.int64),
                               (len(ix), p + 1)).copy()
        for i in range(1, m + 1):
            cur = np.empty_like(prev)
            cur[:, 0] = i
            ai = am[:, i - 1][:, None]      # (P, 1)
            sub = prev[:, :-1] + (ai != bm)  # diagonal + mismatch cost
            dele = prev[:, 1:] + 1
            best = np.minimum(sub, dele)
            # insertion needs the just-computed left neighbour — a scan:
            # cur[j] = min(best[j], cur[j-1]+1).  The running minimum
            # telescopes, so one pass of np.minimum.accumulate over
            # (best[j] - j) gives it in vector form.
            shifted = np.minimum.accumulate(
                np.concatenate([cur[:, :1], best], axis=1)
                - np.arange(p + 1, dtype=np.int64), axis=1)
            cur[:, 1:] = (shifted + np.arange(p + 1, dtype=np.int64))[:, 1:]
            prev = cur
        out[ix] = prev[:, -1]
    return out


def _distinct_grams(s: str) -> set[str]:
    if len(s) < _Q:
        return {s} if s else set()
    return {s[i:i + _Q] for i in range(len(s) - _Q + 1)}


#: candidate-pair budget per verify task: gram groups whose expected cross
#: product exceeds this are SALTED — the bigger side hash-partitions into
#: ceil(pairs/target) subgroups, the smaller side replicates into each —
#: so no single task owns a hot gram's whole cross product (the
#: last-reducer fix; recall unaffected, every pair still co-located once).
_FUZZY_SALT_TARGET = 50_000


def _gram_code(g: str) -> int:
    """Exact int encoding of a ≤q-char gram (prefix grams are q-char
    grams, or the whole string / sentinel below length q) — injective
    for q ≤ 3: (0x110003)² · 1.14M < 2^63."""
    c0 = ord(g[0]) if len(g) > 0 else 0x10FFFF + 1
    c1 = ord(g[1]) if len(g) > 1 else 0x10FFFF + 2
    c2 = ord(g[2]) if len(g) > 2 else 0x10FFFF + 3
    return (c0 * 0x110003 + c1) * 0x110003 + c2


#: left-side row bound under which the join switches to the broadcast
#: count-filter plan (matrix ~ rows × live-grams booleans: 100k × ~50k
#: grams ≈ manageable broadcast; above it, the shuffle plan).
_FUZZY_BROADCAST_ROWS = 100_000


def _broadcast_fuzzy(left_tbl: pa.Table, right, left_on: str,
                     right_on: str, left_id: str, right_id: str,
                     max_dist: int):
    """Small-left tier: ship the probe side once (``ray.put``), stream the
    big side through ONE ``map_batches`` — zero shuffles.

    Per batch the q-gram COUNT FILTER (Gravano et al. 2001: dist ≤ k ⇒
    shared distinct q-grams ≥ max(|G(a)|,|G(b)|) − k·q) runs as a single
    boolean-membership matmul (probes × grams) @ (grams × batch) — any
    gram shared by a pair is in the probe vocabulary, so restricting the
    matrix to it loses nothing — then the exact vectorized DP verifies
    survivors.  Recall-lossless; the DP is the same oracle-exact kernel."""
    ids = left_tbl[left_id].to_numpy(zero_copy_only=False)
    names = left_tbl[left_on].to_pylist()
    gsets = [_distinct_grams(s or "") for s in names]
    vocab: dict[str, int] = {}
    for gs in gsets:
        for g in gs:
            vocab.setdefault(g, len(vocab))
    A = np.zeros((len(names), len(vocab)), dtype=np.float32)
    for i, gs in enumerate(gsets):
        for g in gs:
            A[i, vocab[g]] = 1.0
    ga = np.array([len(gs) for gs in gsets], dtype=np.int64)
    la = np.array([len(s or "") for s in names], dtype=np.int64)
    ref = ray.put((vocab, A, ids, names, ga, la))

    # plain tasks, not an actor pool: the probe matrix lives in the object
    # store (one zero-copy plasma read per worker process, cached in the
    # worker-global dict below) and the per-batch work is one small matmul
    # — actor-pool startup would cost more than the whole job at probe
    # scale.
    cache: dict = {}

    def verify(tbl: pa.Table) -> pa.Table:
        if "s" not in cache:
            cache["s"] = ray.get(ref)
        vocab, A, ids, names, ga, la = cache["s"]
        rids = tbl[right_id].to_numpy(zero_copy_only=False)
        rnames = tbl[right_on].to_pylist()
        B = np.zeros((len(rnames), len(vocab)), dtype=np.float32)
        gb = np.empty(len(rnames), dtype=np.int64)
        for j, s in enumerate(rnames):
            gs = _distinct_grams(s or "")
            gb[j] = len(gs)
            for g in gs:
                k = vocab.get(g)
                if k is not None:
                    B[j, k] = 1.0
        shared = A @ B.T  # (probes × batch) distinct-gram overlap
        lb = np.array([len(s or "") for s in rnames], dtype=np.int64)
        need = np.maximum(ga[:, None], gb[None, :]) - max_dist * _Q
        cand = (shared >= need) & (
            np.abs(la[:, None] - lb[None, :]) <= max_dist)
        li, ri = np.nonzero(cand)
        if not len(li):
            return pa.table({
                "lid": pa.array([], type=pa.int64()),
                "rid": pa.array([], type=pa.int64()),
                "dist": pa.array([], type=pa.int64())})
        d = levenshtein_batch([names[i] for i in li],
                              [rnames[j] for j in ri])
        keep = d <= max_dist
        return pa.table({
            "lid": pa.array(ids[li[keep]].astype(np.int64)),
            "rid": pa.array(rids[ri[keep]].astype(np.int64)),
            "dist": pa.array(d[keep])})

    return right.map_batches(verify, batch_format="pyarrow")


def fuzzy_join(left, right, left_on: str, right_on: str,
               left_id: str, right_id: str, max_dist: int = 2,
               buckets: int = 64, strategy: str = "auto"):
    """All (left, right) pairs with ``levenshtein ≤ max_dist`` →
    Dataset(left_id, right_id, dist).  Exact — the prefix filter is
    recall-lossless for edit distance (see module docstring).

    Size-tiered: a left side under ``_FUZZY_BROADCAST_ROWS`` takes the
    broadcast count-filter plan (``_broadcast_fuzzy`` — one map_batches,
    zero shuffles: the record-linkage shape, small dirty list × big
    corpus); big-big takes the shuffle plan below.  ``strategy`` forces
    a tier for tests.

    Shuffle plan: each pair is VERIFIED exactly once — rows carry their
    prefix-gram codes, and inside gram group ``g`` a pair runs the DP
    only when no rarer gram is shared by both prefixes (the pair's
    min-shared gram is its unique verification site) — without this, a
    pair sharing ``p`` prefix grams costs ``p`` DPs.  Hot gram groups
    are salted (see ``_FUZZY_SALT_TARGET``)."""
    if strategy != "shuffle":
        left = left.materialize()
        n_left = left.count()
        if strategy == "broadcast" or n_left <= _FUZZY_BROADCAST_ROWS:
            # Ray pads an empty dataset with zero-COLUMN blocks whose
            # schema differs from the typed ones — drop those before the
            # concat (tiny_sweep empty-domain contract)
            blocks = [t for t in ray.get(left.to_arrow_refs())
                      if t.num_columns]
            left_tbl = (pa.concat_tables(blocks).combine_chunks()
                        if blocks else pa.table({}))
            return _broadcast_fuzzy(left_tbl, right, left_on, right_on,
                                    left_id, right_id, max_dist)
    prefix_len = max_dist * _Q + 1

    # --- tiny PER-SIDE gram-frequency tables, broadcast (rank = total;
    # per-side counts size the salting)
    def gram_partial(tbl: pa.Table, col: str, side: str) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for s in tbl[col].to_pylist():
            c.update(_distinct_grams(s or ""))
        if not c:
            return pa.table({"g": pa.array([], type=pa.string()),
                             "side": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        g, nn = zip(*c.items())
        return pa.table({"g": pa.array(g),
                         "side": pa.array([side] * len(g),
                                          type=pa.string()),
                         "n": pa.array(nn, type=pa.int64())})

    freq_rows = (left.map_batches(
        lambda t: gram_partial(t, left_on, "l"), batch_format="pyarrow")
        .union(right.map_batches(
            lambda t: gram_partial(t, right_on, "r"),
            batch_format="pyarrow"))
        .groupby(["g", "side"]).sum("n").take_all())
    nl: dict = {}
    nr: dict = {}
    for r in freq_rows:
        (nl if r["side"] == "l" else nr)[r["g"]] = int(r["sum(n)"])
    rank = {g: (nl.get(g, 0) + nr.get(g, 0), g)
            for g in set(nl) | set(nr)}
    # prefix-count-based salting: replicate the smaller side of a hot gram
    salt: dict = {}
    for g in rank:
        pairs = nl.get(g, 0) * nr.get(g, 0)
        if pairs > _FUZZY_SALT_TARGET:
            s = int(-(-pairs // _FUZZY_SALT_TARGET))
            salt[g] = (s, "l" if nl.get(g, 0) <= nr.get(g, 0) else "r")
    rank_ref = ray.put((rank, salt))

    # --- prefix-gram rows: ≤ prefix_len (× salt replication) per string
    def emit(tbl: pa.Table, col: str, idc: str, side: str) -> pa.Table:
        rk, sl = ray.get(rank_ref)
        ids = tbl[idc].to_pylist()
        names = tbl[col].to_pylist()
        og, oid, onm, ocodes = [], [], [], []
        for i, s in zip(ids, names):
            grams = sorted(_distinct_grams(s or ""), key=lambda g: rk[g])
            # prefix-filter guarantee needs max(|G(a)|,|G(b)|) > k·q; a
            # pair where BOTH gram sets are ≤ k·q can intersect nowhere
            # (e.g. "aa" vs "bb" at k=2) — those rare degenerate strings
            # all block together on a sentinel gram instead.
            if len(grams) <= max_dist * _Q:
                grams = grams + ["\x00"]
            pref = grams[:prefix_len]
            codes = np.full(prefix_len, -1, dtype=np.int64)
            for j, g in enumerate(pref):
                codes[j] = _gram_code(g)
            cb = codes.tobytes()
            for g in pref:
                sg = sl.get(g)
                if sg is None:
                    keys = [g]
                elif sg[1] == side:   # this side replicates
                    keys = [f"{g}#{x}" for x in range(sg[0])]
                else:                 # this side hash-partitions
                    keys = [f"{g}#{hash((i,)) % sg[0]}"]
                for key in keys:
                    og.append(key)
                    oid.append(i)
                    onm.append(s)
                    ocodes.append(cb)
        return pa.table({"g": pa.array(og, type=pa.string()),
                         "id": pa.array(oid),
                         "nm": pa.array(onm, type=pa.string()),
                         "pc": pa.array(ocodes, type=pa.binary()),
                         "side": pa.array([side] * len(og),
                                          type=pa.string())})

    lg = left.map_batches(lambda t: emit(t, left_on, left_id, "l"),
                          batch_format="pyarrow")
    rg = right.map_batches(lambda t: emit(t, right_on, right_id, "r"),
                           batch_format="pyarrow")

    # --- one gram shuffle → candidates → batched verify inside the group
    def candidates(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"lid": pd.Series([], dtype="int64"),
                              "rid": pd.Series([], dtype="int64"),
                              "dist": pd.Series([], dtype="int64")})
        lt = pdf[pdf["side"] == "l"].reset_index(drop=True)
        rt = pdf[pdf["side"] == "r"].reset_index(drop=True)
        if lt.empty or rt.empty:
            return empty
        gram = pdf["g"].iloc[0].split("#", 1)[0]
        gcode = _gram_code(gram)
        P = prefix_len

        def mask_before(side_df: pd.DataFrame) -> np.ndarray:
            codes = np.frombuffer(
                b"".join(side_df["pc"]), dtype=np.int64
            ).reshape(len(side_df), P)
            pos = np.argmax(codes == gcode, axis=1)
            return np.where(np.arange(P)[None, :] < pos[:, None],
                            codes, -1)

        bl = mask_before(lt)
        br = mask_before(rt)
        li, ri = np.meshgrid(np.arange(len(lt)), np.arange(len(rt)),
                             indexing="ij")
        li, ri = li.ravel(), ri.ravel()
        ld = lt["nm"].str.len().to_numpy()[li]
        rd = rt["nm"].str.len().to_numpy()[ri]
        keep = np.abs(ld - rd) <= max_dist
        li, ri = li[keep], ri[keep]
        if not len(li):
            return empty
        # min-shared-gram rule: verify HERE only if no rarer gram is
        # shared by both prefixes (that group verifies the pair instead)
        A = bl[li]               # (P, prefix_len) grams rarer than g, -1 pad
        B = br[ri]
        dup = ((A[:, :, None] == B[:, None, :])
               & (A[:, :, None] != -1)).any(axis=(1, 2))
        li, ri = li[~dup], ri[~dup]
        if not len(li):
            return empty
        a = lt["nm"].to_numpy()[li]
        b = rt["nm"].to_numpy()[ri]
        d = levenshtein_batch(list(a), list(b))
        keep = d <= max_dist
        return pd.DataFrame({"lid": lt["id"].to_numpy()[li][keep],
                             "rid": rt["id"].to_numpy()[ri][keep],
                             "dist": d[keep]})

    verified = (lg.union(rg).groupby("g")
                .map_groups(candidates, batch_format="pandas"))

    # --- exact distinct pairs: block-local dedup, one pair-bucket shuffle
    def local(tbl: pa.Table) -> pa.Table:
        pdf = tbl.to_pandas().drop_duplicates(["lid", "rid"])
        h = pd.util.hash_pandas_object(pdf[["lid", "rid"]],
                                       index=False).to_numpy()
        pdf["__b"] = (h % np.uint64(buckets)).astype(np.int64)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        return (pdf.drop_duplicates(["lid", "rid"])
                [["lid", "rid", "dist"]])

    return (verified.map_batches(local, batch_format="pyarrow")
            .groupby("__b").map_groups(final, batch_format="pandas"))

"""Sharded, actor-held keyed state — the engine's "arrangement".

The reference keeps fitted state inside differential-dataflow arrangements,
hash-sharded across timely workers (SURVEY §3 "State residency").  Here state
lives in a pool of Ray actors (``StateShard``), each owning
``hash(key) % num_shards`` of the key space for every registered state table:

- **keyed aggregates**  name → {key: accumulator}   (monoids from
  ``state.aggregates``; ``apply_delta`` is ``plus_equals``, retraction is a
  negated accumulator — the DD ``count``-with-custom-diff pattern,
  standard_scaler.rs:81-86)
- **session windows**   name → {key: sorted interval list with accumulators}
- **join buffers**      name → {key: per-side row buffers with event times}

Deltas arrive pre-combined per key per epoch (the two-phase aggregation fix
for the reference's key=`1` hot spot); each ``apply_*`` call is **idempotent
per (table, epoch)** so a restarted driver can replay epochs blindly.
``dump``/``load`` serialize a shard for checkpointing; the applied-epoch set
is part of the snapshot, keeping idempotency across restarts.

Scale note: the driver relays only per-epoch *accumulator deltas* (bytes
O(#touched keys), never raw rows); raw data flows worker→worker through the
object store during the partial stage.  At 10^12-sequence scale raise
``num_shards`` so each shard's resident state fits its actor heap; shards are
independent and can live on any node.
"""

from __future__ import annotations

import hashlib
import math
import pickle
from typing import Any

import numpy as np

import ray

__all__ = ["StateShard", "ShardedStateStore", "shard_of", "rescale_blobs"]


def shard_of(key_bytes: bytes, num_shards: int) -> int:
    """Stable shard routing (md5 — independent of PYTHONHASHSEED)."""
    return int.from_bytes(hashlib.md5(key_bytes).digest()[:8], "big") % num_shards


def _dumps(obj) -> bytes:
    return pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)


def _register_values_differ(a, b) -> bool:
    """LWW register value inequality, safe for ARRAY-valued registers
    (embedding vectors ride UpsertToRetract as list<float> vals, whose
    pandas cells are numpy arrays — plain ``!=`` raises on those)."""
    if a is None or b is None:
        return (a is None) != (b is None)
    try:
        return bool(a != b)
    except ValueError:
        pass
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return any(not np.array_equal(x, y) for x, y in zip(a, b))
    return True


class StateShard:
    """One shard of every state table.  Runs as a Ray actor (see
    ``ShardedStateStore``); all methods take/return pickled payloads to keep
    actor-call overhead flat."""

    def __init__(self, shard_id: int, num_shards: int):
        self.shard_id = shard_id
        self.num_shards = num_shards
        # keyed aggregates
        self.aggs: dict[str, dict[bytes, Any]] = {}
        # session windows: name -> key -> sorted list of [start, end, acc]
        self.sessions: dict[str, dict[bytes, list[list]]] = {}
        # retractable sessions: name -> key -> {(ts, value): count}
        self.session_points: dict[str, dict[bytes, dict]] = {}
        # early-fired session snapshot: name -> key -> [session tuple…] —
        # the last speculative (open-session) state emitted per key; the
        # next emit diffs against it (a cross-epoch merge retracts BOTH
        # prior partial sessions).  O(live open sessions), same order as
        # the session state itself.
        self.session_early: dict[str, dict[bytes, list]] = {}
        # keys the current epoch's session apply touched (transient;
        # drained by emit_early_sessions, empty on replayed epochs)
        self._session_touched: dict[str, set] = {}
        # join buffers: name -> side -> key -> list[(ts, row_tuple)]
        self.joins: dict[str, dict[str, dict[bytes, list]]] = {}
        # per-join-name monotone left-row id counter (outer-join tracking)
        self._join_lid: dict[str, int] = {}
        self._join_rid: dict[str, int] = {}
        # as-of join buffers: name -> {"left": df, "right": df, lk, rk}
        # left carries __match_ts (ts of its current right version, NaN if
        # unmatched); right is the per-key version history
        self.asof: dict[str, dict[str, Any]] = {}
        # left-outer as-of: per-op unmatched-sweep high-water bound
        self._asof_um_bound: dict[str, float] = {}
        # CEP pattern buffers: name -> key -> {(ts, type): count}
        self.patterns: dict[str, dict[bytes, dict]] = {}
        # streaming near-dup: name -> band-bucket -> [(doc_id, sig bytes)]
        self.neardup: dict[str, dict[bytes, list]] = {}
        self.neardup_drops: dict[str, int] = {}
        # last emitted (epoch, blob) per op: a RETRIED distributed group
        # task re-calls the apply and must get the SAME pairs back, not an
        # empty replay — its first result died with the failed task
        # (transient; driver-level resume recomputes epochs fresh)
        self.neardup_last: dict[str, tuple] = {}
        # pane-mode sliding windows: name -> last emitted sweep bound
        self.pane_bounds: dict[str, float] = {}
        # incremental connected components: name -> union-find
        # {"parent": {}, "members": {}, "label": {}}
        self.graphs: dict[str, dict] = {}
        # idempotency: table name -> applied-epoch high-water mark (epochs
        # arrive in increasing order; a replay/retry re-sends an epoch ≤ the
        # mark).  An int, not a set — a 10^12-sequence stream has millions of
        # epochs and an ever-growing set would leak.
        self.applied: dict[str, int] = {}

    # ---------------------------------------------------------------- util
    def _seen(self, table: str, epoch: int) -> bool:
        if epoch <= self.applied.get(table, -1):
            return True
        self.applied[table] = epoch
        return False

    # ------------------------------------------------------- keyed aggregates
    def apply_delta(self, name: str, epoch: int, payload: bytes,
                    return_merged: bool = False) -> bytes | int:
        """payload = pickled list[(key_bytes, accumulator)].

        With ``return_merged`` the post-merge accumulators of the touched
        keys come back in the same round-trip (saves a separate ``collect``
        for small state like encoder meta).  Idempotent replays return the
        *current* values, so retried epochs still observe correct state.
        """
        items = pickle.loads(payload)
        store = self.aggs.setdefault(name, {})
        if not self._seen(f"agg:{name}", epoch):
            for key, acc in items:
                cur = store.get(key)
                if cur is None:
                    # a fresh partial that already nets to the identity
                    # (an insert and its retraction cancelled inside the
                    # epoch) must not enter the store: a stored identity
                    # is indistinguishable from "present with count 0" to
                    # state_table readers and would emit a spurious +1
                    # changelog row
                    if not (hasattr(acc, "is_identity")
                            and acc.is_identity()):
                        store[key] = acc
                else:
                    cur.merge(acc)
                    # delete only true identities: `is_zero` can hold while
                    # negative pending-retraction entries remain (out-of-order
                    # retraction buffered before its insert) — those must stay
                    if hasattr(cur, "is_identity") and cur.is_identity():
                        del store[key]
        if return_merged:
            return _dumps([(k, store.get(k)) for k, _ in items])
        return len(items)

    def apply_delta_changelog(self, name: str, epoch: int,
                              payload: bytes) -> bytes:
        """Changelog variant of ``apply_delta`` (DD's output changelog of a
        keyed fold): apply the epoch's partials and return ``(key_bytes,
        old_acc | None, new_acc | None)`` for every TOUCHED key — the
        caller finalizes both sides and emits ±1 delta rows whose running
        sum is the current grouped-aggregate table, turning any keyed
        aggregation into an upstream for further differential operators.
        ``new_acc`` is None when the merge reached the monoid identity (the
        key was deleted — pure retraction); a replayed epoch returns []
        (same ``agg:`` high-water mark as ``apply_delta``, so one op uses
        either surface consistently).  Deterministic: sorted key order."""
        if self._seen(f"agg:{name}", epoch):
            return _dumps([])
        store = self.aggs.setdefault(name, {})
        out = []
        for key, acc in sorted(pickle.loads(payload), key=lambda kv: kv[0]):
            cur = store.get(key)
            old = None if cur is None else (
                cur.copy() if hasattr(cur, "copy")
                else pickle.loads(pickle.dumps(cur)))
            if cur is None:
                # same fresh-identity guard as apply_delta: a cancelled
                # insert on a never-seen key stays absent (emits nothing)
                if not (hasattr(acc, "is_identity") and acc.is_identity()):
                    store[key] = acc
            else:
                cur.merge(acc)
                if hasattr(cur, "is_identity") and cur.is_identity():
                    del store[key]
            out.append((key, old, store.get(key)))
        return _dumps(out)

    def collect(self, name: str) -> bytes:
        """All (key, acc) pairs of this shard (snapshot read)."""
        return _dumps(sorted(self.aggs.get(name, {}).items()))

    def enrich_probe(self, name: str, payload: bytes) -> bytes:
        """Point lookup of LastValueAgg registers (EnrichJoin probe):
        payload = pickled list[key_bytes] → pickled list[(key_bytes,
        value-tuple | None)].  Tombstones (value None) read as misses."""
        keys = pickle.loads(payload)
        store = self.aggs.get(name, {})
        out = []
        for kb in keys:
            acc = store.get(kb)
            out.append((kb, None if acc is None else acc.value))
        return _dumps(out)

    def temporal_probe(self, name: str, payload: bytes) -> bytes:
        """AS-OF lookup of VersionedValueAgg registers (TemporalEnrichJoin
        probe): payload = pickled list[(key_bytes, ts_float)] → pickled
        list[((key_bytes, ts_float), value-tuple | None)].  Each pair reads
        the dim version with the largest stamp ≤ its event time; tombstone
        versions and never-seen keys read as misses."""
        pairs = pickle.loads(payload)
        store = self.aggs.get(name, {})
        out = []
        for kb, t in pairs:
            acc = store.get(kb)
            out.append(((kb, t), None if acc is None else acc.lookup(t)))
        return _dumps(out)

    def compact_version_registers(self, name: str, before_stamp: float) -> int:
        """Collapse VersionedValueAgg histories below the watermark horizon:
        of the versions with ``ts < before_stamp`` only the LATEST is still
        reachable by an in-contract probe (every probe time ≥ horizon lands
        on it or newer), so the older ones drop.  A key whose entire
        remaining history is that one tombstone drops outright (any probe
        reads a miss either way).  Returns the number of dropped versions —
        the sweep that bounds per-key state to O(versions inside the
        horizon) + 1 for slowly-changing dims with unbounded history."""
        store = self.aggs.get(name, {})
        dropped = 0
        for kb in list(store.keys()):
            versions = store[kb].versions
            old = sorted(s for s in versions if s[0] < before_stamp)
            for s in old[:-1]:
                del versions[s]
                dropped += 1
            if old and len(versions) == 1 and versions[old[-1]] is None:
                del store[kb]
                dropped += 1
        return dropped

    def dedup_filter(self, name: str, epoch: int, payload: bytes) -> bytes:
        """First-seen-wins claim for streaming dedup.

        payload = pickled list[(key_bytes, stamp)] — ONE offer per key (the
        caller pre-reduces to the per-key minimum ``(ts, tiebreak)`` stamp
        over the whole (shard, epoch) slice, so the outcome is independent
        of block order).  Unseen keys are claimed under this epoch and WIN;
        a claim from an earlier epoch makes the key a duplicate; a replay of
        the claiming epoch (same stamp) re-wins idempotently, so retried
        epochs emit the identical winner set into their existing manifests.
        Returns pickled list of winning key_bytes."""
        from ..state.aggregates import FirstSeenReg

        items = pickle.loads(payload)
        store = self.aggs.setdefault(name, {})
        winners = []
        for kb, stamp in items:
            cur = store.get(kb)
            if cur is None:
                store[kb] = FirstSeenReg(stamp, epoch)
                winners.append(kb)
            elif cur.epoch == epoch and cur.stamp == stamp:
                winners.append(kb)
        return _dumps(winners)

    def sweep_stale_registers(self, name: str, before_stamp: float) -> int:
        """Drop LastValueAgg registers (EnrichJoin dim state) whose stamp is
        older than ``before_stamp`` — the register-TTL sweep that bounds
        dim-side state for unbounded key spaces (stale keys re-enrich as
        misses, exactly like never-seen keys).  Tombstones age out the same
        way.  Returns the number of dropped registers."""
        store = self.aggs.get(name, {})
        dead = [k for k, acc in store.items()
                if getattr(acc, "stamp", None) is not None
                and acc.stamp[0] < before_stamp]
        for k in dead:
            del store[k]
        return len(dead)

    def sweep_closed_windows(self, name: str, close_before: float) -> bytes:
        """Emit & drop keys whose window end ≤ close_before.

        Keys of windowed aggregates are ``(..., window_start, window_end)``
        tuples (assigned in the partial stage); a window is final once the
        watermark passes ``end + allowed_lateness`` (driver passes the
        adjusted bound).  Emission-and-removal makes re-sweeps naturally
        idempotent.
        """
        store = self.aggs.get(name, {})
        emitted = []
        for key in list(store.keys()):
            k = pickle.loads(key)
            window_end = k[-1]
            if window_end <= close_before:
                emitted.append((key, store.pop(key)))
        emitted.sort()
        return _dumps(emitted)

    def sweep_sliding_panes(self, name: str, close_before: float,
                            size: float, slide: float) -> bytes:
        """Pane-mode sliding-window emission: state keys are
        ``(key…, pane_start, pane_end)`` tumbling panes of width ``slide``;
        a WINDOW [w, w+size) is emitted when its end lands in
        (last_bound, close_before], merging its size/slide panes.  Panes
        drop once their LAST containing window has been emitted, so state is
        O(keys × panes), not O(keys × windows-per-row).  Monotone
        ``last_bound`` (checkpointed) makes re-sweeps idempotent the same
        way emission-and-removal does for the replicated path.
        """
        import math as _math

        store = self.aggs.get(name, {})
        last = self.pane_bounds.get(name, -_math.inf)
        r = int(round(size / slide))
        groups: dict[tuple, list] = {}
        for kb in list(store.keys()):
            kt = pickle.loads(kb)
            groups.setdefault(kt[:-2], []).append((kt[-2], kb))
        emitted = []
        for base, panes in groups.items():
            panes.sort()
            ends = set()
            for ps, _ in panes:
                for j in range(r):
                    we = ps - j * slide + size
                    if last < we <= close_before:
                        ends.add(we)
            for we in sorted(ends):
                ws = we - size
                accs = [store[kb] for ps, kb in panes
                        if ws <= ps < we and kb in store]
                if not accs:
                    continue
                merged = accs[0].copy()
                for a in accs[1:]:
                    merged.merge(a)
                new_key = pickle.dumps(base + (ws, we),
                                       protocol=pickle.HIGHEST_PROTOCOL)
                emitted.append((new_key, merged))
            for ps, kb in panes:
                if ps + size <= close_before:
                    store.pop(kb, None)
        self.pane_bounds[name] = max(last, close_before)
        emitted.sort()
        return _dumps(emitted)

    # ------------------------------------------------------- session windows
    @staticmethod
    def build_sessions(points: list, gap: float) -> list[list]:
        """Sorted (ts, value) points → disjoint session list
        [start, end, [sum, count, min_ts, max_ts]]; end = last_ts + gap.
        Associative under merge_session_lists, so per-block local sessions
        compose exactly (the partial stage compresses raw rows to sessions
        before anything leaves the worker)."""
        sessions: list[list] = []
        for ts, value in sorted(points):
            if sessions and ts <= sessions[-1][1]:
                s = sessions[-1]
                s[1] = max(s[1], ts + gap)
                s[2][0] += float(value)
                s[2][1] += 1
                s[2][3] = max(s[2][3], ts)
            else:
                sessions.append([ts, ts + gap, [float(value), 1, ts, ts]])
        return sessions

    @staticmethod
    def merge_session_lists(a: list[list], b: list[list]) -> list[list]:
        merged: list[list] = []
        for s in sorted(a + b):
            if merged and s[0] <= merged[-1][1]:
                m = merged[-1]
                m[1] = max(m[1], s[1])
                m[2][0] += s[2][0]
                m[2][1] += s[2][1]
                m[2][2] = min(m[2][2], s[2][2])
                m[2][3] = max(m[2][3], s[2][3])
            else:
                merged.append([s[0], s[1], list(s[2])])
        return merged

    def apply_session_points(self, name: str, epoch: int, payload: bytes,
                             gap: float) -> int:
        """payload = pickled list[(key_bytes, sessions-or-points)].

        Entries may be pre-built session lists (from distributed block
        partials) or raw (ts, value) points; both coalesce by interval merge.
        Insert-only (the reference has no session construct at all; SURVEY
        §2.1 — sessions are part of our added windowing surface).
        """
        if self._seen(f"sess:{name}", epoch):
            return 0
        store = self.sessions.setdefault(name, {})
        touched = self._session_touched.setdefault(name, set())
        n = 0
        for key, items in pickle.loads(payload):
            n += len(items)
            if items and not isinstance(items[0], list):
                new_sessions = self.build_sessions(items, gap)
            else:
                new_sessions = items
            store[key] = self.merge_session_lists(store.get(key, []), new_sessions)
            touched.add(key)
        return n

    # -------------------------------------------- retractable session windows
    def apply_session_point_deltas(self, name: str, epoch: int,
                                   payload: bytes) -> int:
        """Retractable mode: state is the raw point multiset
        {(ts, value): net_count} per key; sessions are derived at sweep time,
        so retracting a bridging point correctly SPLITS a session.

        payload = pickled list[(key_bytes, [(ts, value, diff), ...])].
        """
        if self._seen(f"sessp:{name}", epoch):
            return 0
        store = self.session_points.setdefault(name, {})
        touched = self._session_touched.setdefault(name, set())
        n = 0
        for key, points in pickle.loads(payload):
            touched.add(key)
            pts = store.setdefault(key, {})
            for ts, value, diff in points:
                n += 1
                k = (float(ts), float(value))
                c = pts.get(k, 0) + int(diff)
                if c == 0:
                    pts.pop(k, None)
                else:
                    pts[k] = c
            if not pts:
                del store[key]
        return n

    # ------------------------------------------------ early-fired sessions
    @staticmethod
    def _session_tuple(s: list) -> tuple:
        """[start, end, [sum, count, mn, mx]] → hashable identity."""
        return (s[0], s[1], tuple(s[2]))

    def _live_sessions(self, name: str, key: bytes, gap: float,
                       retractable: bool) -> list[list]:
        """Current open sessions of one key, derived the same way the
        close sweep derives them (deterministic: build_sessions sorts)."""
        if not retractable:
            return self.sessions.get(name, {}).get(key, [])
        pts = self.session_points.get(name, {}).get(key, {})
        flat = []
        for (ts, value), c in pts.items():
            if c > 0:
                flat.extend([(ts, value)] * c)
        return self.build_sessions(flat, gap)

    def emit_early_sessions(self, name: str, gap: float,
                            retractable: bool) -> bytes:
        """Speculative per-epoch session changelog (Beam's accumulating-
        with-retractions early firing for MERGING windows): for every key
        this epoch's apply touched, diff the current open-session list
        against the last emitted snapshot — a point that bridges two
        sessions retracts BOTH prior partials (−1, −1) and adds the merged
        one (+1); in retractable mode a deleted bridge point retracts the
        joined session and adds the two halves.  Replayed epochs touch no
        keys and emit nothing; the side sink's exactly-once commit makes
        the call idempotent either way."""
        touched = self._session_touched.get(name)
        if touched:
            touched = sorted(touched)
            self._session_touched[name] = set()
        else:
            return _dumps([])
        snap = self.session_early.setdefault(name, {})
        rows = []
        for key in touched:
            cur = [self._session_tuple(s)
                   for s in self._live_sessions(name, key, gap, retractable)]
            prev = snap.get(key, [])
            prev_set, cur_set = set(prev), set(cur)
            for s in prev:
                if s not in cur_set:
                    rows.append((key, -1, s))
            for s in cur:
                if s not in prev_set:
                    rows.append((key, 1, s))
            if cur:
                snap[key] = cur
            else:
                snap.pop(key, None)
        if not snap:
            self.session_early.pop(name, None)
        rows.sort()
        return _dumps(rows)

    def _retract_closed_early(self, name: str, emitted: list) -> list:
        """Close sweep × early firing: every finally-emitted session leaves
        the speculative (open) set — emit its −1 in the early stream so
        main + early running sums stay one consistent sessionization."""
        snap = self.session_early.get(name)
        if not snap:
            return []
        rows = []
        for key, s in emitted:
            st = self._session_tuple(s)
            held = snap.get(key)
            if held and st in held:
                held.remove(st)
                rows.append((key, -1, st))
                if not held:
                    snap.pop(key, None)
        if not snap:
            self.session_early.pop(name, None)
        rows.sort()
        return rows

    def sweep_closed_retractable_sessions(self, name: str, watermark: float,
                                          gap: float,
                                          early: bool = False) -> bytes:
        """Derive sessions from the live point multiset; emit & drop the
        points of every session whose end (last ts + gap) ≤ watermark."""
        store = self.session_points.get(name, {})
        emitted = []
        for key in list(store.keys()):
            pts = store[key]
            flat = []
            for (ts, value), c in pts.items():
                if c > 0:
                    flat.extend([(ts, value)] * c)
            sessions = self.build_sessions(flat, gap)
            closed_bounds = []
            for s in sessions:
                if s[1] <= watermark:
                    emitted.append((key, s))
                    closed_bounds.append((s[0], s[2][3]))  # [start, last_ts]
            for lo, hi in closed_bounds:
                # keep negative-count entries (pending retraction of an
                # insert that hasn't arrived yet) even inside a closed range
                for k in [k for k in pts if lo <= k[0] <= hi and pts[k] > 0]:
                    del pts[k]
            if not pts:
                del store[key]
        emitted.sort()
        if early:
            return _dumps((emitted, self._retract_closed_early(name, emitted)))
        return _dumps(emitted)

    def sweep_closed_sessions(self, name: str, watermark: float, gap: float,
                              early: bool = False) -> bytes:
        """Emit & drop sessions whose end (last ts + gap) ≤ watermark."""
        store = self.sessions.get(name, {})
        emitted = []
        for key in list(store.keys()):
            remaining = []
            for s in store[key]:
                if s[1] <= watermark:
                    emitted.append((key, s))
                else:
                    remaining.append(s)
            if remaining:
                store[key] = remaining
            else:
                del store[key]
        emitted.sort()
        if early:
            return _dumps((emitted, self._retract_closed_early(name, emitted)))
        return _dumps(emitted)

    # ---------------------------------------------------------- CEP patterns
    def apply_pattern_points(self, name: str, epoch: int, payload: bytes) -> int:
        """payload = pickled list[(key_bytes, [(ts, type), ...])] — buffer
        per-key typed event points for watermark-driven pattern sweeps."""
        if self._seen(f"pat:{name}", epoch):
            return 0
        store = self.patterns.setdefault(name, {})
        n = 0
        for key, points in pickle.loads(payload):
            pts = store.setdefault(key, {})
            for ts, typ in points:
                n += 1
                k = (float(ts), typ)
                pts[k] = pts.get(k, 0) + 1
        return n

    def sweep_pattern_matches(self, name: str, watermark: float,
                              pattern: list, within: float) -> bytes:
        """Emit every ordered event-type chain matching ``pattern`` whose
        START is finalizable (start ts ≤ watermark − within: no future event
        can extend it), then drop those events.  All-combinations semantics
        (each strictly-increasing-ts chain is one match) — the same multiset
        a relational self-join oracle produces.  Cost per key is bounded by
        window occupancy; a hot key with E events in one window can emit
        O(E^len) chains, exactly like its SQL equivalent.
        """
        store = self.patterns.get(name, {})
        bound = watermark - within
        emitted = []
        for key in list(store.keys()):
            pts = store[key]
            events = sorted(
                (ts, typ) for (ts, typ), c in pts.items() for _ in range(c)
            )
            n = len(events)

            def extend(start_ts, prev_ts, pos, level, chain):
                if level == len(pattern):
                    emitted.append((key, tuple(chain)))
                    return
                for j in range(pos, n):
                    ts, typ = events[j]
                    if ts > start_ts + within:
                        break
                    if ts > prev_ts and typ == pattern[level]:
                        extend(start_ts, ts, j + 1, level + 1, chain + [ts])

            for i, (ts, typ) in enumerate(events):
                if typ == pattern[0] and ts <= bound:
                    extend(ts, ts, i + 1, 1, [ts])
            for k in [k for k in pts if k[0] <= bound]:
                del pts[k]
            if not pts:
                del store[key]
        emitted.sort()
        return _dumps(emitted)

    def sweep_absence(self, name: str, watermark: float, first: str,
                      absent: str, within: float) -> bytes:
        """Emit (key, ts) for every finalizable ``first`` event (ts ≤
        watermark − within) with NO ``absent`` event in (ts, ts + within],
        then drop events at or before the bound.  Multiset semantics: count
        copies emit count rows.  Shares the pattern point state — events
        arrive via ``apply_pattern_points`` under this op's name."""
        store = self.patterns.get(name, {})
        bound = watermark - within
        emitted = []
        for key in list(store.keys()):
            pts = store[key]
            absents = sorted(ts for (ts, typ), c in pts.items()
                             if typ == absent and c > 0)
            import bisect

            for (ts, typ), c in sorted(pts.items()):
                if typ != first or ts > bound:
                    continue
                # any canceller in (ts, ts + within]?
                i = bisect.bisect_right(absents, ts)
                if i < len(absents) and absents[i] <= ts + within:
                    continue
                emitted.extend([(key, float(ts))] * c)
            for k in [k for k in pts if k[0] <= bound]:
                del pts[k]
            if not pts:
                del store[key]
        emitted.sort()
        return _dumps(emitted)

    def apply_upsert_retract(self, name: str, epoch: int,
                             payload: bytes) -> bytes:
        """Upsert→retraction changelog (DD arrange + consolidate): payload =
        pickled list[(key_bytes, LastValueAgg)] — ONE offer per key (the
        same partial contract as ``apply_delta``: the caller pre-merges the
        (shard, epoch) slice to the per-key MAX ``(ts, tiebreak)`` stamp),
        so the outcome is independent of block order.  Each offer that
        BEATS the key's register emits the consolidated delta ``(+1, key,
        new_value)`` plus ``(−1, key, old_value)`` when one existed; a
        tombstone offer (``value is None``) emits only the retraction; a
        stale offer (stamp ≤ register) emits nothing but the register keeps
        the loser's stamp shadowed (LWW — late/out-of-order upserts cannot
        resurrect).  The emitted multiset's running sum IS the
        latest-value-per-key table.  Replay-idempotent via the epoch
        high-water mark (a replayed epoch returns an empty delta and the
        idempotent sink skips its commit).  Deterministic: offers apply in
        sorted key order."""
        if self._seen(f"upsert:{name}", epoch):
            return _dumps([])
        store = self.aggs.setdefault(name, {})
        deltas = []
        for kb, acc in sorted(pickle.loads(payload), key=lambda kv: kv[0]):
            cur = store.get(kb)
            if cur is None:
                store[kb] = acc
                if acc.value is not None:
                    deltas.append((1, kb, acc.value))
            elif acc.stamp > cur.stamp:
                if _register_values_differ(acc.value, cur.value):
                    if cur.value is not None:
                        deltas.append((-1, kb, cur.value))
                    if acc.value is not None:
                        deltas.append((1, kb, acc.value))
                cur.stamp, cur.value = acc.stamp, acc.value
        return _dumps(deltas)

    def apply_scd2(self, name: str, epoch: int, payload: bytes) -> bytes:
        """Incrementally-maintained SCD2 history (the lakehouse type-2
        dimension as a DIFFERENTIAL operator): same LWW offer contract as
        ``apply_upsert_retract``, but instead of a latest-value changelog
        the emitted deltas maintain a VERSION-HISTORY table ``(key, vals,
        valid_from, valid_to, version)``.  A winning offer whose value
        differs CLOSES the open version — retract ``(v_old, from, OPEN)``,
        add ``(v_old, from, new_ts)`` — and opens ``(v_new, new_ts, OPEN,
        version+1)``; a winning tombstone only closes; a same-value
        re-upsert refreshes the LWW stamp and emits nothing (no spurious
        versions).  Closed versions are immutable — per-key state is just
        ``[stamp, open_value, open_from, version]``, O(keys) regardless of
        history length, because only the open row can ever change.
        Replay-idempotent via the epoch high-water mark; offers apply in
        sorted key order (deterministic)."""
        if self._seen(f"scd2:{name}", epoch):
            return _dumps([])
        store = self.aggs.setdefault(name, {})
        deltas = []
        for kb, acc in sorted(pickle.loads(payload), key=lambda kv: kv[0]):
            cur = store.get(kb)
            ts = acc.stamp[0]
            if cur is None:
                if acc.value is None:
                    store[kb] = [acc.stamp, None, None, 0]
                else:
                    store[kb] = [acc.stamp, acc.value, ts, 1]
                    deltas.append((1, kb, (acc.value, ts, None, 1)))
            elif acc.stamp > cur[0]:
                if _register_values_differ(acc.value, cur[1]):
                    if cur[1] is not None:
                        deltas.append((-1, kb, (cur[1], cur[2], None,
                                                cur[3])))
                        deltas.append((1, kb, (cur[1], cur[2], ts,
                                               cur[3])))
                    if acc.value is not None:
                        ver = cur[3] + 1
                        deltas.append((1, kb, (acc.value, ts, None, ver)))
                        store[kb] = [acc.stamp, acc.value, ts, ver]
                    else:
                        store[kb] = [acc.stamp, None, None, cur[3]]
                else:
                    cur[0] = acc.stamp
        return _dumps(deltas)

    def vector_topk(self, name: str, payload: bytes) -> bytes:
        """Brute-force cosine top-k over THIS shard's live LWW registers —
        the probe side of a CDC-maintained vector index: the registers of
        an ``UpsertToRetract`` op whose value is an embedding (one
        list<float> val or d float vals) ARE the index partition; upserts,
        updates and tombstone deletes maintain it, this scans it.  payload
        = pickled (query_ids, Q float64 matrix, k, exclude_self); returns
        per-shard partial top-k rows (query_id, key_tuple, cos) — the
        caller merges shards × k rows, never the corpus."""
        qids, Q, k, exclude_self = pickle.loads(payload)
        store = self.aggs.get(name, {})
        keys, vecs = [], []
        for kb, acc in store.items():
            if acc.value is None:
                continue
            v = acc.value
            arr = (np.asarray(v[0], dtype=np.float64)
                   if len(v) == 1 and np.ndim(v[0]) == 1
                   else np.asarray(v, dtype=np.float64))
            keys.append(pickle.loads(kb))
            vecs.append(arr)
        if not keys:
            return _dumps([])
        V = np.vstack(vecs)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
        S = Qn @ Vn.T  # (q, n_shard)
        out = []
        kk = min(k + (1 if exclude_self else 0), S.shape[1])
        for qi, qid in enumerate(qids):
            idx = np.argpartition(-S[qi], kk - 1)[:kk] if kk < S.shape[1] \
                else np.arange(S.shape[1])
            for j in idx:
                key = keys[int(j)]
                if exclude_self and len(key) == 1 and key[0] == qid:
                    continue
                out.append((qid, key, float(S[qi, int(j)])))
        return _dumps(out)

    def sweep_kleene_matches(self, name: str, watermark: float, first: str,
                             mid: str, last: str, within: float) -> bytes:
        """Kleene-plus CEP (``A B+ C``): emit one row per (first, last) pair
        on the same key with ``first.ts < last.ts ≤ first.ts + within`` and
        AT LEAST ONE ``mid`` event strictly between them, carrying the
        aggregated middle count — MATCH_RECOGNIZE ``A B+ C`` with one row
        per (A, C) pair and ``count(B)`` as the measure (non-contiguous:
        other event types may interleave), the same multiset as the
        relational a-c join with an inner b-count.  Multiset semantics:
        duplicate a/c events multiply rows, duplicate b events add to the
        count.  A start is finalizable at ``first.ts <= watermark − within``;
        swept events drop (retention = ``within``, the PatternMatch
        contract).  Per-key cost is O(E log E + matches) via sorted arrays
        + prefix sums — no exponential subset enumeration (that is exactly
        why the middle is aggregated, not exploded: ``B+`` under
        all-subsets semantics emits 2^|B|−1 rows per pair)."""
        store = self.patterns.get(name, {})
        bound = watermark - within
        emitted = []
        for key in list(store.keys()):
            pts = store[key]
            a_l, b_l, c_l = [], [], []
            for (ts, typ), c in pts.items():
                if c <= 0:
                    continue
                if typ == first:
                    a_l.append((ts, c))
                elif typ == mid:
                    b_l.append((ts, c))
                elif typ == last:
                    c_l.append((ts, c))
            if a_l and b_l and c_l:
                b_l.sort()
                c_l.sort()
                b_ts = np.array([t for t, _ in b_l])
                b_cum = np.concatenate(
                    [[0], np.cumsum([c for _, c in b_l])])
                c_ts = np.array([t for t, _ in c_l])
                for a_t, a_c in sorted(a_l):
                    if a_t > bound:
                        break  # later starts are not finalizable yet
                    lo = int(np.searchsorted(c_ts, a_t, side="right"))
                    hi = int(np.searchsorted(c_ts, a_t + within,
                                             side="right"))
                    for j in range(lo, hi):
                        c_t, c_c = c_l[j]
                        nb = int(
                            b_cum[np.searchsorted(b_ts, c_t, side="left")]
                            - b_cum[np.searchsorted(b_ts, a_t,
                                                    side="right")])
                        if nb >= 1:
                            emitted.extend(
                                [(key, (float(a_t), float(c_t), nb))]
                                * (a_c * c_c))
            for k in [k for k in pts if k[0] <= bound]:
                del pts[k]
            if not pts:
                del store[key]
        emitted.sort()
        return _dumps(emitted)

    # --------------------------------------------- incremental iterate (CC)
    def apply_cc_edges(self, name: str, epoch: int, payload: bytes) -> bytes:
        """Incremental connected components — the DD ``iterate`` primitive
        maintained across epochs.  State is a union-find with min-id labels
        and per-root member lists (smaller-into-larger merges); each epoch's
        new edges produce a CONSOLIDATED multiset delta of label rows:
        ``(+1, id, new_label)`` / ``(−1, id, old_label)`` — the timestamped
        retraction stream whose running sum IS the current component table.
        Deterministic (edges applied in sorted order, deltas sorted) and
        replay-idempotent (epoch high-water mark; replays return an empty
        delta and the sink skips the already-committed epoch).

        One logical graph lives in ONE shard by design: union-find state is
        O(nodes-in-edge-stream), the candidate-bounded regime (verified
        dedup pairs, entity graphs) — the same bound as the batch driver
        tier (``_CC_DRIVER_MAX_PAIRS``); unbounded raw-corpus graphs belong
        to the batch ``connected_components_ds`` contraction path."""
        if self._seen(f"cc:{name}", epoch):
            return _dumps([])
        g = self.graphs.setdefault(
            name, {"parent": {}, "members": {}, "label": {}})
        parent, members, label = g["parent"], g["members"], g["label"]
        net: dict[tuple, int] = {}

        def emit(diff, node, lab):
            k = (node, lab)
            net[k] = net.get(k, 0) + diff
            if net[k] == 0:
                del net[k]

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for lo, hi in sorted(pickle.loads(payload)):
            for node in (int(lo), int(hi)):
                if node not in parent:
                    parent[node] = node
                    members[node] = [node]
                    label[node] = node
                    emit(1, node, node)
            ra, rb = find(int(lo)), find(int(hi))
            if ra == rb:
                continue
            if len(members[ra]) < len(members[rb]):
                ra, rb = rb, ra
            la, lb = label[ra], label[rb]
            new_label = min(la, lb)
            if la != new_label:
                for node in members[ra]:
                    emit(-1, node, la)
                    emit(1, node, new_label)
            if lb != new_label:
                for node in members[rb]:
                    emit(-1, node, lb)
                    emit(1, node, new_label)
            parent[rb] = ra
            members[ra].extend(members[rb])
            del members[rb]
            label[ra] = new_label
            del label[rb]
        out = sorted((node, lab, diff) for (node, lab), diff in net.items())
        return _dumps([(d, n, lb) for n, lb, d in out])

    def apply_neardup_offers(self, name: str, epoch: int,
                             payload: bytes, threshold: float,
                             cap: int) -> bytes:
        """Streaming MinHash-LSH near-dup: payload = pickled
        list[(band_bucket_bytes, [(doc_id, sig_bytes)…])].  Each bucket
        keeps its member list (doc id + full signature); a new doc joining
        a bucket compares signatures against the existing members
        (agreement fraction = Jaccard estimate) and every pair estimated
        ≥ ``threshold`` emits a candidate detection — the same pair can
        fire from several bands (and shards), so the output is a MULTISET;
        chain ``StreamDedup`` on (id_lo, id_hi) for exactly-once distinct
        pairs.  Buckets cap at ``cap`` members (hot boilerplate buckets):
        an overflow doc is still compared against the members but cannot
        be FOUND by later arrivals in that bucket — the batch star-cap
        contract, drops counted.  Deterministic (sorted buckets/offers)
        and replay-idempotent via the epoch high-water mark."""
        if self._seen(f"nd:{name}", epoch):
            cached = self.neardup_last.get(name)
            if cached is not None and cached[0] == epoch:
                return cached[1]
            return _dumps(([], 0))
        store = self.neardup.setdefault(name, {})
        drops = 0
        pairs = set()
        for bucket, offers in pickle.loads(payload):
            members = store.setdefault(bucket, [])
            have = {d for d, _ in members}
            # one (members × perms) matrix per bucket per call: each offer
            # compares against ALL members in one vectorized pass (hot
            # boilerplate buckets would otherwise pay a per-member loop)
            mat = (np.frombuffer(b"".join(s for _, s in members),
                                 dtype=np.uint64).reshape(len(members), -1)
                   if members else None)
            mids = [d for d, _ in members]
            for doc_id, sig in sorted(offers):
                if doc_id in have:
                    continue
                a = np.frombuffer(sig, dtype=np.uint64)
                if mat is not None and len(mat):
                    est = (mat == a[None, :]).mean(axis=1)
                    for j in np.nonzero(est >= threshold)[0]:
                        mid = mids[int(j)]
                        lo, hi = ((doc_id, mid) if doc_id < mid
                                  else (mid, doc_id))
                        pairs.add((lo, hi, float(est[int(j)])))
                if len(members) < cap:
                    members.append((doc_id, sig))
                    have.add(doc_id)
                    mat = (a[None, :] if mat is None
                           else np.vstack([mat, a[None, :]]))
                    mids.append(doc_id)
                else:
                    drops += 1
        self.neardup_drops[name] = self.neardup_drops.get(name, 0) + drops
        blob = _dumps((sorted(pairs), drops))
        self.neardup_last[name] = (epoch, blob)
        return blob

    def apply_reach_edges(self, name: str, epoch: int, payload: bytes,
                          sources: tuple) -> bytes:
        """Incremental multi-source reachability WITH retraction — the
        semi-naive DD iterate on a directed graph: state is the live edge
        multiset in the op's designated shard; each epoch applies ±diff
        edge deltas and recomputes the closure from the STATIC source set
        (one O(V+E) sweep — the candidate-bounded regime shared by the CC
        and PageRank incremental ops), emitting the consolidated set
        delta ``(+1, id)`` / ``(−1, id)`` whose running sum IS the
        current reachable set.  Deterministic and replay-idempotent."""
        if self._seen(f"re:{name}", epoch):
            return _dumps([])
        g = self.graphs.setdefault(name, {"re_edges": {}, "re_set": set()})
        edges, old = g["re_edges"], g["re_set"]
        for u, v, d in sorted(pickle.loads(payload)):
            k = (int(u), int(v))
            c = edges.get(k, 0) + int(d)
            if c == 0:
                edges.pop(k, None)
            else:
                edges[k] = c
        adj: dict[int, list] = {}
        for (u, v), c in edges.items():
            if c > 0:
                adj.setdefault(u, []).append(v)
        new: set[int] = set()
        stack = sorted(sources)
        while stack:
            x = stack.pop()
            if x in new:
                continue
            new.add(x)
            stack.extend(adj.get(x, ()))
        deltas = ([(1, i) for i in sorted(new - old)]
                  + [(-1, i) for i in sorted(old - new)])
        g["re_set"] = new
        return _dumps(deltas)

    def apply_pagerank_edges(self, name: str, epoch: int, payload: bytes,
                             damping: float, tol: float, max_iters: int,
                             emit_tol: float) -> bytes:
        """Incremental PageRank — the second ``iterate`` op maintained
        ACROSS epochs, WITH retraction (the capability union-find CC cannot
        offer: union is monotone, rank recomputation is not).  State is the
        live directed edge multiset plus the current rank vector in ONE
        designated shard (candidate-bounded regime, the CC contract); each
        epoch applies ±diff edge deltas and WARM-STARTS the power iteration
        from the previous ranks — a small delta converges in a few sweeps
        instead of a from-scratch run.  Same update rule as the batch
        ``pagerank`` (uniform dangling redistribution, multi-edges weight
        by multiplicity).  Emits the consolidated changelog
        ``(−1, id, old_rank)`` / ``(+1, id, new_rank)`` for nodes whose
        rank moved > ``emit_tol`` plus node arrivals/departures; stored
        state keeps the EMITTED value for silent nodes so the changelog's
        running sum equals the stored rank table exactly (staleness is
        bounded by emit_tol vs the current fixpoint).  Deterministic and
        replay-idempotent; raises if max_iters doesn't converge."""
        if self._seen(f"pr:{name}", epoch):
            return _dumps([])
        g = self.graphs.setdefault(name, {"pr_edges": {}, "pr_ranks": {}})
        edges, ranks = g["pr_edges"], g["pr_ranks"]
        for u, v, d in sorted(pickle.loads(payload)):
            k = (int(u), int(v))
            c = edges.get(k, 0) + int(d)
            if c == 0:
                edges.pop(k, None)
            else:
                edges[k] = c
        old = dict(ranks)
        live = [(u, v, c) for (u, v), c in edges.items() if c > 0]
        if not live:
            ranks.clear()
            return _dumps([(-1, i, r) for i, r in sorted(old.items())])
        src = np.array([u for u, _, _ in live], dtype=np.int64)
        dst = np.array([v for _, v, _ in live], dtype=np.int64)
        w = np.array([c for _, _, c in live], dtype=np.float64)
        ids = np.unique(np.concatenate([src, dst]))
        n = len(ids)
        si = np.searchsorted(ids, src)
        di = np.searchsorted(ids, dst)
        outw = np.zeros(n)
        np.add.at(outw, si, w)
        r = np.array([old.get(int(i), 1.0 / n) for i in ids])
        r /= r.sum()
        safe_out = np.where(outw > 0, outw, 1.0)
        for _ in range(max_iters):
            dangling = float(r[outw == 0].sum())
            contrib = np.zeros(n)
            np.add.at(contrib, di, r[si] * w / safe_out[si])
            r_new = ((1.0 - damping) / n + damping * dangling / n
                     + damping * contrib)
            done = np.abs(r_new - r).max() < tol
            r = r_new
            if done:
                break
        else:
            raise RuntimeError(
                f"IncrementalPageRank({name}) did not converge within "
                f"{max_iters} iterations at tol={tol}")
        new = dict(zip((int(i) for i in ids), r.tolist()))
        deltas = []
        for i in sorted(set(old) | set(new)):
            o, nv = old.get(i), new.get(i)
            if o is None:
                deltas.append((1, i, nv))
                ranks[i] = nv
            elif nv is None:
                deltas.append((-1, i, o))
                ranks.pop(i, None)
            elif abs(nv - o) > emit_tol:
                deltas.append((-1, i, o))
                deltas.append((1, i, nv))
                ranks[i] = nv
            # else: silent — stored state keeps the emitted value, so the
            # changelog running sum stays exactly the rank table
        return _dumps(deltas)

    # ------------------------------------------------------- stream-stream join
    def join_insert_probe(self, name: str, epoch: int, payload: bytes) -> bytes:
        """Symmetric hash join step for this shard — fully vectorized.

        payload = pickled dict with ``left``/``right`` pandas DataFrames (the
        shard's hash-partition of this epoch's rows; key cols + output cols +
        ``__ts``) and ``left_key``/``right_key`` column lists.  Matches are
        emitted exactly once per pair:
        new_left × (old_right ∪ new_right)  ∪  old_left × new_right,
        each computed as one pandas hash merge (C speed, no per-row Python).
        Returns a pickled DataFrame of matched rows.
        """
        import pandas as pd

        sides = pickle.loads(payload)
        lk, rk = list(sides["left_key"]), list(sides["right_key"])
        mdt = sides.get("max_dt")
        if self._seen(f"join:{name}", epoch):
            return _dumps(None)
        buf = self.joins.setdefault(name, {"left": None, "right": None})
        # remember the key columns in the checkpointed buffer: rescale-on-
        # resume re-partitions buffered rows by hash(key cols) % new_shards
        buf["lk"], buf["rk"] = lk, rk
        nl = sides.get("left")
        nr = sides.get("right")
        # per-left-row identity + matched flag: the outer-join sweep
        # (``sweep_join_unmatched``) emits never-matched lefts once their
        # window closes.  Tracked only when the op needs it
        # (emit_unmatched → payload["track"]): the lid set + isin over the
        # left buffer is per-epoch work an inner join shouldn't pay.
        # Buffers from older checkpoints backfill below.
        track = sides.get("track", True)
        track_r = sides.get("track_right", False)
        if track and nl is not None and len(nl):
            n0 = self._join_lid.get(name, 0)
            nl = nl.assign(
                __lid=np.arange(n0, n0 + len(nl), dtype=np.int64),
                __matched=False)
            self._join_lid[name] = n0 + len(nl)
        if track_r and nr is not None and len(nr):
            n0 = self._join_rid.get(name, 0)
            nr = nr.assign(
                __rid=np.arange(n0, n0 + len(nr), dtype=np.int64),
                __matched_r=False)
            self._join_rid[name] = n0 + len(nr)
        old_left = buf["left"]
        if track and old_left is not None and "__lid" not in old_left.columns:
            old_left = old_left.assign(
                __lid=np.arange(-len(old_left), 0, dtype=np.int64),
                __matched=False)
            buf["left"] = old_left
        old_right = buf["right"]
        if track_r and old_right is not None \
                and "__rid" not in old_right.columns:
            old_right = old_right.assign(
                __rid=np.arange(-len(old_right), 0, dtype=np.int64),
                __matched_r=False)
            buf["right"] = old_right
        outs = []
        matched_lids: set = set()
        matched_rids: set = set()

        def merge(a, b, a_is_left=True):
            res = a.merge(b, left_on=lk, right_on=rk,
                          suffixes=("", "__r"))
            if mdt is not None and len(res):
                keep = (res["__ts_left"] - res["__ts_right"]).abs() <= mdt
                res = res[keep].reset_index(drop=True)
            if track and len(res):
                matched_lids.update(res["__lid"].tolist())
            if track_r and len(res):
                matched_rids.update(res["__rid"].tolist())
            return res.drop(
                columns=["__lid", "__matched", "__rid", "__matched_r"],
                errors="ignore")

        if nr is not None and buf["left"] is not None:
            outs.append(merge(buf["left"], nr))
        if nl is not None and buf["right"] is not None:
            outs.append(merge(nl, buf["right"]))
        if nl is not None and nr is not None:
            outs.append(merge(nl, nr))
        for side, new in (("left", nl), ("right", nr)):
            if new is not None:
                buf[side] = new if buf[side] is None else pd.concat(
                    [buf[side], new], ignore_index=True
                )
        if track and matched_lids and buf["left"] is not None:
            hit = buf["left"]["__lid"].isin(matched_lids)
            if hit.any():
                buf["left"] = buf["left"].assign(
                    __matched=buf["left"]["__matched"] | hit)
        if track_r and matched_rids and buf["right"] is not None:
            hit = buf["right"]["__rid"].isin(matched_rids)
            if hit.any():
                buf["right"] = buf["right"].assign(
                    __matched_r=buf["right"]["__matched_r"] | hit)
        if not outs:
            return _dumps(None)
        return _dumps(pd.concat(outs, ignore_index=True))

    def sweep_join_unmatched(self, name: str, bound: float,
                             side: str = "left") -> bytes:
        """Outer-join finalization: emit buffered rows of ``side`` with
        event time ≤ ``bound`` (watermark − max_dt: their join window is
        closed) that never matched, then drop ALL of that side's rows
        at/below the bound (matched or not — nothing on-time can pair with
        them anymore).  Deleting the swept rows makes re-sweeps naturally
        idempotent."""
        idc, flagc = (("__lid", "__matched") if side == "left"
                      else ("__rid", "__matched_r"))
        buf = self.joins.get(name)
        if buf is None or buf.get(side) is None:
            return _dumps(None)
        df = buf[side]
        if idc not in df.columns:
            return _dumps(None)
        closed = df[f"__ts_{side}"] <= bound
        out = df[closed & ~df[flagc]].drop(
            columns=[idc, flagc]).reset_index(drop=True)
        kept = df[~closed]
        buf[side] = kept.reset_index(drop=True) if len(kept) else None
        return _dumps(out if len(out) else None)

    def join_expire(self, name: str, expire_before: float) -> int:
        """Drop buffered rows with event time < expire_before (watermark −
        retention).  Bounds state for unbounded streams."""
        buf = self.joins.get(name)
        if buf is None:
            return 0
        dropped = 0
        for side in ("left", "right"):
            df = buf.get(side)
            if df is None:
                continue
            ts_col = f"__ts_{side}"
            kept = df[df[ts_col] >= expire_before]
            dropped += len(df) - len(kept)
            buf[side] = kept.reset_index(drop=True) if len(kept) else None
        return dropped

    # ------------------------------------------------------------ checkpoint
    def asof_insert_probe(self, name: str, epoch: int,
                          payload: bytes) -> bytes:
        """Incremental AS-OF join step for this shard — the differential
        temporal join: each left row is matched to the LATEST right version
        with ``ts ≤ left_ts`` over the rows that have ARRIVED, and a
        later-arriving better version (still ≤ left_ts) retracts the old
        pair (diff −1) and emits the new one (diff +1) — the accumulated
        multiset always equals the batch ASOF JOIN of every arrived row.

        payload = pickled dict: ``left``/``right`` pandas frames (key cols +
        output cols + ``__ts_left``/``__ts_right`` + ``__diff_*``),
        ``key`` (same column names both sides — the AsofStreamJoin
        contract), ``out_names``.  Fully vectorized: ``pd.merge_asof``
        per epoch for match and re-match, hash merges for retraction
        value lookup and multiset subtraction.  Right-side (key, ts)
        pairs must be unique; a replayed duplicate deduplicates
        last-wins.

        BILINEAR: a diff = −1 RIGHT row deletes that version — every left
        currently matched to it retracts its pair (−1) and re-matches to
        the next-older surviving version (+1 if one exists); a diff = −1
        LEFT row removes one buffered instance (multiset subtraction) and
        retracts its current pair.  Within an epoch the order is right
        inserts → right retractions → left inserts → left retractions.
        Retracting a version or left row not in the buffer raises (a
        retraction must arrive before its target ages past retention)."""
        import pandas as pd

        sides = pickle.loads(payload)
        lk = list(sides["key"])
        out_names = list(sides["out_names"])
        right_cols = list(sides["right_cols"])
        if self._seen(f"asof:{name}", epoch):
            return _dumps(None)
        buf = self.asof.setdefault(name, {"left": None, "right": None})
        buf["lk"] = buf["rk"] = lk

        def split(df, side):
            dc = f"__diff_{side}"
            if df is None or not len(df):
                return None, None
            if dc in df.columns:
                d = df[dc].to_numpy()
                if not np.isin(d, (1, -1)).all():
                    raise ValueError("AsofStreamJoin diff must be ±1 "
                                     f"(got {sorted(set(d.tolist()))})")
                ins = df[d == 1].drop(columns=[dc]).reset_index(drop=True)
                ret = df[d == -1].drop(columns=[dc]).reset_index(drop=True)
                return ((ins if len(ins) else None),
                        (ret if len(ret) else None))
            return df.reset_index(drop=True), None

        nl, nl_ret = split(sides.get("left"), "left")
        nr, nr_ret = split(sides.get("right"), "right")
        outs: list[pd.DataFrame] = []
        track_um = bool(sides.get("track_unmatched"))
        tol = sides.get("tolerance")
        um_outs: list[pd.DataFrame] = []
        um_bound = self._asof_um_bound.get(name, -math.inf)
        left_names = [c for c in out_names if c not in right_cols]
        rd_src = nr if nr is not None else buf.get("right")
        rdtypes = ({c: rd_src[c].dtype for c in right_cols}
                   if rd_src is not None else {})

        def emit_um(df: pd.DataFrame, sign: int) -> None:
            out = df[left_names + ["__ts_left"]].copy()
            out["diff"] = np.int64(sign)
            um_outs.append(out)

        def emit(df: pd.DataFrame, sign: int) -> None:
            out = df[out_names].copy()
            # merge_asof NaN-promotes right columns to float64 when SOME
            # lefts miss; the filtered all-matched emission must restore
            # the true dtypes or sink epoch parts disagree on schema
            for c, dt in rdtypes.items():
                if c in out.columns and out[c].dtype != dt:
                    out[c] = out[c].astype(dt)
            out["diff"] = np.int64(sign)
            outs.append(out)

        def val_lookup(right_tbl):
            return right_tbl[lk + right_cols + ["__ts_right"]].rename(
                columns={"__ts_right": "__match_ts"})

        old = buf["left"]
        right_all = buf["right"]
        if nr is not None and len(nr):
            nr = nr.reset_index(drop=True)
            # re-match buffered lefts against the NEW versions only: a left
            # improves iff some new version lands in (match_ts, left_ts]
            if old is not None and len(old):
                nrs = nr.sort_values("__ts_right", kind="mergesort",
                                     ignore_index=True)
                olds = old.assign(__row=np.arange(len(old))).sort_values(
                    "__ts_left", kind="mergesort", ignore_index=True)
                best = pd.merge_asof(
                    olds, nrs, left_on="__ts_left", right_on="__ts_right",
                    by=lk, suffixes=("", "__r"), tolerance=tol)
                imp = best["__ts_right"].notna() & (
                    olds["__match_ts"].isna()
                    | (best["__ts_right"] > olds["__match_ts"]))
                if imp.any():
                    hit = best[imp.to_numpy()]
                    had = hit[hit["__match_ts"].notna()]
                    if len(had):
                        # old pair's right values: the matched version row
                        # still lives in the buffer (expiry keeps any
                        # version that is some live left's current match).
                        # Strip the NEW version's right columns first so
                        # the lookup's OLD values are the ones emitted.
                        lookup = right_all[
                            lk + right_cols + ["__ts_right"]
                        ].rename(columns={"__ts_right": "__match_ts"})
                        left_part = had.drop(
                            columns=[c for c in had.columns
                                     if c in right_cols
                                     or c.endswith("__r")
                                     or c == "__ts_right"])
                        prev = left_part.merge(lookup,
                                               on=lk + ["__match_ts"])
                        emit(prev, -1)
                    emit(hit, +1)
                    old = old.copy()
                    rows = hit["__row"].to_numpy()
                    old.iloc[
                        rows, old.columns.get_loc("__match_ts")
                    ] = hit["__ts_right"].to_numpy()
                    if track_um and "__um" in old.columns:
                        # a swept-unmatched left just gained a match:
                        # retract its outstanding unmatched row
                        was = old["__um"].to_numpy()[rows]
                        if was.any():
                            emit_um(old.iloc[rows[was]], -1)
                            old.iloc[rows[was],
                                     old.columns.get_loc("__um")] = False
                    buf["left"] = old
            right_all = (nr if right_all is None
                         else pd.concat([right_all, nr],
                                        ignore_index=True))
            right_all = (right_all
                         .sort_values("__ts_right", kind="mergesort",
                                      ignore_index=True)
                         .drop_duplicates(subset=lk + ["__ts_right"],
                                          keep="last", ignore_index=True))
            buf["right"] = right_all

        if nr_ret is not None and len(nr_ret):
            rset = nr_ret[lk + ["__ts_right"]].drop_duplicates()
            if right_all is None or len(right_all) == 0:
                raise ValueError("asof: retracting version(s) from an "
                                 "empty history")
            chk = rset.merge(right_all[lk + ["__ts_right"]],
                             on=lk + ["__ts_right"], how="left",
                             indicator=True)
            if (chk["_merge"] != "both").any():
                raise ValueError(
                    "asof: retraction of unknown right version(s) — "
                    "retractions must arrive before their target ages "
                    "past retention")
            L = buf["left"]
            aff = None
            if L is not None and len(L):
                aff = L.reset_index().merge(
                    rset.rename(columns={"__ts_right": "__match_ts"}),
                    on=lk + ["__match_ts"])
                if len(aff):
                    # retract the dying pairs with the OLD version values
                    emit(aff.merge(val_lookup(right_all),
                                   on=lk + ["__match_ts"]), -1)
            right_all = right_all.merge(rset, on=lk + ["__ts_right"],
                                        how="left", indicator=True)
            right_all = right_all[
                right_all.pop("_merge") == "left_only"
            ].reset_index(drop=True)
            if not len(right_all):
                right_all = None
            buf["right"] = right_all
            if aff is not None and len(aff):
                # re-match the orphaned lefts to the next-older survivor
                idx = aff["index"].to_numpy()
                L = L.copy()
                L.loc[idx, "__match_ts"] = np.nan
                if right_all is not None and len(right_all):
                    sub = L.loc[idx].assign(__row=idx).sort_values(
                        "__ts_left", kind="mergesort", ignore_index=True)
                    m = pd.merge_asof(
                        sub, right_all, left_on="__ts_left",
                        right_on="__ts_right", by=lk, suffixes=("", "__r"), tolerance=tol)
                    got = m["__ts_right"].notna()
                    if got.any():
                        hit = m[got.to_numpy()]
                        emit(hit, +1)
                        L.loc[hit["__row"].to_numpy(), "__match_ts"] = \
                            hit["__ts_right"].to_numpy()
                if track_um and "__um" in L.columns:
                    # finalized lefts that lost their match with no
                    # survivor become unmatched NOW (+1 to the side)
                    now_um = (L["__match_ts"].isna()
                              & ~L["__um"].astype(bool)
                              & (L["__ts_left"] <= um_bound))
                    now_um.loc[~L.index.isin(idx)] = False
                    if now_um.any():
                        emit_um(L[now_um], +1)
                        L.loc[now_um, "__um"] = True
                buf["left"] = L

        if nl is not None and len(nl):
            nl = nl.reset_index(drop=True)
            nl["__match_ts"] = np.nan
            if track_um:
                nl["__um"] = False
            if right_all is not None and len(right_all):
                nls = nl.assign(__row=np.arange(len(nl))).sort_values(
                    "__ts_left", kind="mergesort", ignore_index=True)
                m = pd.merge_asof(
                    nls, right_all, left_on="__ts_left",
                    right_on="__ts_right", by=lk, suffixes=("", "__r"), tolerance=tol)
                got = m["__ts_right"].notna()
                if got.any():
                    hit = m[got.to_numpy()]
                    emit(hit, +1)
                    nl.iloc[
                        hit["__row"].to_numpy(),
                        nl.columns.get_loc("__match_ts")
                    ] = hit["__ts_right"].to_numpy()
            buf["left"] = (nl if buf["left"] is None
                           else pd.concat([buf["left"], nl],
                                          ignore_index=True))

        if nl_ret is not None and len(nl_ret):
            L = buf["left"]
            if L is None or not len(L):
                raise ValueError("asof: retracting left row(s) from an "
                                 "empty buffer")
            idc = [c for c in nl_ret.columns
                   if c not in ("__um",)]  # full row identity
            # multiset subtraction: pair the i-th duplicate of each
            # identity on both sides (deterministic, vectorized)
            Lr = L.reset_index()
            Lr["__cc"] = Lr.groupby(idc).cumcount()
            rr = nl_ret.copy()
            rr["__cc"] = rr.groupby(idc).cumcount()
            hit = Lr.merge(rr, on=idc + ["__cc"])
            if len(hit) != len(rr):
                raise ValueError(
                    "asof: retraction of unknown left row(s) — "
                    "retractions must arrive before their target ages "
                    "past retention")
            had = hit[hit["__match_ts"].notna()]
            if len(had):
                emit(had.merge(val_lookup(right_all),
                               on=lk + ["__match_ts"]), -1)
            if track_um and "__um" in hit.columns:
                umhit = hit[hit["__um"].astype(bool)]
                if len(umhit):  # retracting a swept-unmatched left
                    emit_um(umhit, -1)
            keep = L.drop(index=hit["index"].to_numpy())
            buf["left"] = (keep.reset_index(drop=True) if len(keep)
                           else None)
        if track_um:
            return _dumps({
                "m": (pd.concat(outs, ignore_index=True) if outs
                      else None),
                "u": (pd.concat(um_outs, ignore_index=True) if um_outs
                      else None)})
        if not outs:
            return _dumps(None)
        return _dumps(pd.concat(outs, ignore_index=True))

    def asof_sweep_unmatched(self, name: str, bound: float) -> bytes:
        """Left-outer as-of finalization: emit (+1) every buffered left
        with event time ≤ ``bound`` that has no current match and no
        outstanding unmatched emission, and flag it — a later version
        that matches it retracts the row (−1) differentially, so the
        side sink's net multiset is always {finalized lefts with no
        current match}.  Monotone bound; re-sweeps emit nothing."""
        import pandas as pd  # noqa: F401  (frame ops below)

        self._asof_um_bound[name] = max(
            self._asof_um_bound.get(name, -math.inf), float(bound))
        bound = self._asof_um_bound[name]
        buf = self.asof.get(name)
        if buf is None:
            return _dumps(None)
        L = buf.get("left")
        if L is None or not len(L) or "__um" not in L.columns:
            return _dumps(None)
        take = (L["__match_ts"].isna() & ~L["__um"].astype(bool)
                & (L["__ts_left"] <= bound))
        if not take.any():
            return _dumps(None)
        out = L[take].drop(columns=["__match_ts", "__um"])
        L = L.copy()
        L.loc[take, "__um"] = True
        buf["left"] = L
        return _dumps(out)

    def asof_expire(self, name: str, before: float) -> int:
        """Bound as-of state by event time: drop left rows below the
        horizon (their match is final — the sink holds it), and COMPACT
        the right version history (the TemporalEnrichJoin rule): a version
        below the horizon drops only when a NEWER version at/below the
        horizon supersedes it, so the latest-at-horizon version stays
        probe-able and every surviving left's current match survives
        (lefts keep ts ≥ horizon after their own sweep, and their match is
        the newest version ≤ their ts)."""
        import pandas as pd

        buf = self.asof.get(name)
        if buf is None:
            return 0
        dropped = 0
        L = buf.get("left")
        if L is not None and len(L):
            kept = L[L["__ts_left"] >= before]
            dropped += len(L) - len(kept)
            buf["left"] = (kept.reset_index(drop=True) if len(kept)
                           else None)
        R = buf.get("right")
        if R is not None and len(R):
            below = (R["__ts_right"] < before).to_numpy()
            if below.any():
                latest_below = R[below].groupby(
                    buf["rk"], sort=False).tail(1)
                kept = pd.concat([latest_below, R[~below]]).sort_values(
                    "__ts_right", kind="mergesort", ignore_index=True)
                dropped += len(R) - len(kept)
                buf["right"] = kept if len(kept) else None
        return dropped

    def dump(self) -> bytes:
        return _dumps(
            {
                "shard_id": self.shard_id,
                "aggs": self.aggs,
                "sessions": self.sessions,
                "session_points": self.session_points,
                "session_early": self.session_early,
                "joins": self.joins,
                "asof": self.asof,
                "asof_um_bound": self._asof_um_bound,
                "join_lid": self._join_lid,
                "join_rid": self._join_rid,
                "patterns": self.patterns,
                "neardup": self.neardup,
                "neardup_drops": self.neardup_drops,
                "pane_bounds": self.pane_bounds,
                "graphs": self.graphs,
                "applied": self.applied,
            }
        )

    def load(self, blob: bytes) -> None:
        st = pickle.loads(blob)
        self.aggs = st["aggs"]
        self.sessions = st["sessions"]
        self.session_points = st.get("session_points", {})
        self.session_early = st.get("session_early", {})
        self._session_touched = {}
        self.joins = st["joins"]
        self.asof = st.get("asof", {})
        self._asof_um_bound = st.get("asof_um_bound", {})
        self._join_lid = st.get("join_lid", {})
        self._join_rid = st.get("join_rid", {})
        for jn, sides in self.joins.items():  # pre-lid snapshots: resume the
            left = sides.get("left")          # counter above any live id
            if left is not None and "__lid" in getattr(left, "columns", ()):
                if len(left):
                    self._join_lid[jn] = max(
                        self._join_lid.get(jn, 0),
                        int(left["__lid"].max()) + 1)
            right = sides.get("right")
            if right is not None and "__rid" in getattr(right, "columns", ()):
                if len(right):
                    self._join_rid[jn] = max(
                        self._join_rid.get(jn, 0),
                        int(right["__rid"].max()) + 1)
        self.patterns = st.get("patterns", {})
        self.neardup = st.get("neardup", {})
        self.neardup_drops = st.get("neardup_drops", {})
        self.neardup_last = {}  # cache is per-lifetime; state just rewound
        self.pane_bounds = st.get("pane_bounds", {})
        self.graphs = st.get("graphs", {})
        applied = st["applied"]
        # tolerate snapshots from the earlier set-based format
        self.applied = {
            k: (max(v) if isinstance(v, set) and v else v if isinstance(v, int)
                else -1)
            for k, v in applied.items()
        }

    def stats(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "agg_keys": {n: len(d) for n, d in self.aggs.items()},
            "session_keys": {n: len(d) for n, d in self.sessions.items()},
            "pattern_keys": {n: len(d) for n, d in self.patterns.items()},
            "join_keys": {
                n: {s: len(sides[s]) for s in ("left", "right")
                    if sides.get(s) is not None}
                for n, sides in self.joins.items()
            },
            "asof_keys": {
                n: {s: len(sides[s]) for s in ("left", "right")
                    if sides.get(s) is not None}
                for n, sides in self.asof.items()
            },
        }


class ShardedStateStore:
    """Driver-side handle on the actor pool; scatters per-shard payloads and
    gathers results.  All remote calls for one step are issued concurrently
    (one round-trip per step, not per shard)."""

    def __init__(self, num_shards: int = 8, num_cpus_per_shard: float = 0.25):
        self.num_shards = num_shards
        actor_cls = ray.remote(num_cpus=num_cpus_per_shard)(StateShard)
        self.shards = [actor_cls.remote(i, num_shards) for i in range(num_shards)]
        #: in-flight apply refs when the session pipelines epochs (writes
        #: are submitted without blocking; per-actor submission order keeps
        #: them serialized).  Every READ surface fences first.
        self._pending: list = []

    def fence(self) -> None:
        """Block until all pipelined applies have executed on their shards."""
        if self._pending:
            ray.get(self._pending)
            self._pending = []

    # --------------------------------------------------------------- routing
    def _scatter(self, items: list[tuple[bytes, Any]]) -> dict[int, list]:
        by_shard: dict[int, list] = {}
        for key, val in items:
            by_shard.setdefault(shard_of(key, self.num_shards), []).append((key, val))
        return by_shard

    # --------------------------------------------------------------- aggregates
    def apply_deltas(self, name: str, epoch: int, merged: dict[bytes, Any],
                     return_merged: bool = False, wait: bool = True):
        by_shard = self._scatter(sorted(merged.items()))
        refs = [
            self.shards[sid].apply_delta.remote(name, epoch, _dumps(items),
                                                return_merged)
            for sid, items in by_shard.items()
        ]
        if not return_merged:
            if not wait:  # pipelined: reads fence later
                self._pending.extend(refs)
                return None
            return sum(ray.get(refs)) if refs else 0
        out: list = []
        for b in ray.get(refs):
            out.extend(pickle.loads(b))
        return out

    def collect(self, name: str) -> list[tuple[bytes, Any]]:
        self.fence()
        blobs = ray.get([s.collect.remote(name) for s in self.shards])
        out: list[tuple[bytes, Any]] = []
        for b in blobs:
            out.extend(pickle.loads(b))
        out.sort(key=lambda kv: kv[0])
        return out

    def sweep_stale_registers(self, name: str, before_stamp: float) -> int:
        self.fence()
        return sum(ray.get([
            s.sweep_stale_registers.remote(name, before_stamp)
            for s in self.shards
        ]))

    def compact_version_registers(self, name: str, before_stamp: float) -> int:
        self.fence()
        return sum(ray.get([
            s.compact_version_registers.remote(name, before_stamp)
            for s in self.shards
        ]))

    def dedup_filter(self, name: str, epoch: int,
                     shard_items: dict[int, list]) -> set:
        """Driver-path dedup claim: {shard_id: [(key_bytes, stamp)]} → the
        set of winning key_bytes across shards (see StateShard.dedup_filter)."""
        self.fence()
        refs = [self.shards[sid].dedup_filter.remote(name, epoch, _dumps(items))
                for sid, items in shard_items.items()]
        out: set = set()
        for blob in ray.get(refs):
            out.update(pickle.loads(blob))
        return out

    def sweep_closed_windows(self, name: str, close_before: float) -> list:
        self.fence()
        blobs = ray.get(
            [s.sweep_closed_windows.remote(name, close_before) for s in self.shards]
        )
        out = []
        for b in blobs:
            out.extend(pickle.loads(b))
        out.sort(key=lambda kv: kv[0])
        return out

    def sweep_sliding_panes(self, name: str, close_before: float,
                            size: float, slide: float) -> list:
        """Pane sweep + cross-shard window merge.

        A base key's PANES hash to different shards (state keys include the
        pane bounds), so each shard emits per-window PARTIAL accumulators;
        they merge here by window key — O(emitted windows), which the driver
        already collects for the sink commit.  Deterministic merge order via
        (key, accumulator-bytes) sort."""
        self.fence()
        blobs = ray.get([
            s.sweep_sliding_panes.remote(name, close_before, size, slide)
            for s in self.shards
        ])
        parts: list = []
        for b in blobs:
            parts.extend(pickle.loads(b))
        parts.sort(key=lambda kv: (kv[0], _dumps(kv[1])))
        merged: dict[bytes, Any] = {}
        for k, acc in parts:
            if k in merged:
                merged[k].merge(acc)
            else:
                merged[k] = acc
        return sorted(merged.items())

    # --------------------------------------------------------------- sessions
    def apply_session_points(self, name: str, epoch: int,
                             per_key: dict[bytes, list], gap: float,
                             wait: bool = True):
        by_shard = self._scatter(sorted(per_key.items()))
        refs = [
            self.shards[sid].apply_session_points.remote(name, epoch, _dumps(items), gap)
            for sid, items in by_shard.items()
        ]
        if not wait:
            self._pending.extend(refs)
            return None
        return sum(ray.get(refs)) if refs else 0

    def sweep_closed_sessions(self, name: str, watermark: float, gap: float,
                              early: bool = False):
        self.fence()
        blobs = ray.get(
            [s.sweep_closed_sessions.remote(name, watermark, gap, early)
             for s in self.shards]
        )
        return self._collect_session_sweep(blobs, early)

    @staticmethod
    def _collect_session_sweep(blobs: list, early: bool):
        out = []
        rets = []
        for b in blobs:
            part = pickle.loads(b)
            if early:
                out.extend(part[0])
                rets.extend(part[1])
            else:
                out.extend(part)
        out.sort(key=lambda kv: (kv[0], kv[1]))
        if early:
            rets.sort()
            return out, rets
        return out

    def emit_early_sessions(self, name: str, gap: float,
                            retractable: bool) -> list:
        """Per-epoch speculative session changelog across all shards —
        ordered after the epoch's applies (fence) so diffs see them."""
        self.fence()
        blobs = ray.get(
            [s.emit_early_sessions.remote(name, gap, retractable)
             for s in self.shards]
        )
        rows = []
        for b in blobs:
            rows.extend(pickle.loads(b))
        rows.sort()
        return rows

    def apply_session_point_deltas(self, name: str, epoch: int,
                                   per_key: dict[bytes, list],
                                   wait: bool = True):
        by_shard = self._scatter(sorted(per_key.items()))
        refs = [
            self.shards[sid].apply_session_point_deltas.remote(
                name, epoch, _dumps(items)
            )
            for sid, items in by_shard.items()
        ]
        if not wait:
            self._pending.extend(refs)
            return None
        return sum(ray.get(refs)) if refs else 0

    def sweep_closed_retractable_sessions(self, name: str, watermark: float,
                                          gap: float, early: bool = False):
        self.fence()
        blobs = ray.get(
            [s.sweep_closed_retractable_sessions.remote(
                name, watermark, gap, early)
             for s in self.shards]
        )
        return self._collect_session_sweep(blobs, early)

    # --------------------------------------------------------------- patterns
    def apply_pattern_points(self, name: str, epoch: int,
                             per_key: dict[bytes, list],
                             wait: bool = True):
        by_shard = self._scatter(sorted(per_key.items()))
        refs = [
            self.shards[sid].apply_pattern_points.remote(name, epoch,
                                                         _dumps(items))
            for sid, items in by_shard.items()
        ]
        if not wait:
            self._pending.extend(refs)
            return None
        return sum(ray.get(refs)) if refs else 0

    def sweep_pattern_matches(self, name: str, watermark: float,
                              pattern: list, within: float) -> list:
        self.fence()
        blobs = ray.get([
            s.sweep_pattern_matches.remote(name, watermark, list(pattern),
                                           within)
            for s in self.shards
        ])
        out = []
        for b in blobs:
            out.extend(pickle.loads(b))
        out.sort(key=lambda kv: (kv[0], kv[1]))
        return out

    def apply_delta_changelog(self, name: str, epoch: int,
                              merged: dict[bytes, Any]) -> list:
        """Scatter the epoch's partials, gather ``(key_bytes, old_acc,
        new_acc)`` for every touched key (sorted by key)."""
        self.fence()
        by_shard = self._scatter(sorted(merged.items()))
        refs = [
            self.shards[sid].apply_delta_changelog.remote(
                name, epoch, _dumps(items))
            for sid, items in by_shard.items()
        ]
        out: list = []
        for b in ray.get(refs):
            out.extend(pickle.loads(b))
        out.sort(key=lambda kv: kv[0])
        return out

    def apply_upsert_retract(self, name: str, epoch: int,
                             merged: dict[bytes, Any]) -> list:
        """Scatter per-key LWW offers to their shards, gather the emitted
        consolidated deltas ``(diff, key_bytes, value)`` (retraction before
        addition per key; sorted by key for a deterministic table)."""
        self.fence()
        by_shard = self._scatter(sorted(merged.items()))
        refs = [
            self.shards[sid].apply_upsert_retract.remote(
                name, epoch, _dumps(items))
            for sid, items in by_shard.items()
        ]
        out: list = []
        for b in ray.get(refs):
            out.extend(pickle.loads(b))
        out.sort(key=lambda d: (d[1], d[0]))
        return out

    def apply_scd2(self, name: str, epoch: int,
                   merged: dict[bytes, Any]) -> list:
        """Scatter per-key LWW offers to their shards, gather the emitted
        SCD2 version-history deltas ``(diff, key_bytes, (vals, valid_from,
        valid_to, version))`` — retraction before additions per key; the
        stable sort keeps each key's (close-old, open-new) emission
        order."""
        self.fence()
        by_shard = self._scatter(sorted(merged.items()))
        refs = [
            self.shards[sid].apply_scd2.remote(name, epoch, _dumps(items))
            for sid, items in by_shard.items()
        ]
        out: list = []
        for b in ray.get(refs):
            out.extend(pickle.loads(b))
        out.sort(key=lambda d: (d[1], d[0]))
        return out

    def vector_topk(self, name: str, query_ids, Q, k: int,
                    exclude_self: bool = True) -> list:
        """Probe the CDC-maintained vector index: per-shard brute-force
        cosine partial top-k over live registers, merged here to the global
        top-k per query with a (−cos, key) total order.  Driver traffic =
        shards × queries × k rows; the corpus never moves."""
        self.fence()
        Q = np.asarray(Q, dtype=np.float64)
        payload = _dumps((list(query_ids), Q, int(k), bool(exclude_self)))
        blobs = ray.get(
            [s.vector_topk.remote(name, payload) for s in self.shards]
        )
        per_q: dict = {}
        for b in blobs:
            for qid, key, cos in pickle.loads(b):
                per_q.setdefault(qid, []).append((-cos, key))
        out = []
        for qid in query_ids:
            cand = sorted(per_q.get(qid, []))[:k]
            for rank, (neg, key) in enumerate(cand, start=1):
                out.append((qid, key, -neg, rank))
        return out

    def apply_cc_edges(self, name: str, epoch: int, edges: list) -> list:
        """Route the epoch's edge delta to the op's single designated shard
        (union-find is one logical graph; see StateShard.apply_cc_edges)."""
        self.fence()
        sid = shard_of(name.encode(), self.num_shards)
        blob = ray.get(self.shards[sid].apply_cc_edges.remote(
            name, epoch, _dumps(sorted(map(tuple, edges)))))
        return pickle.loads(blob)

    def apply_neardup(self, name: str, epoch: int,
                      per_bucket: dict[bytes, list], threshold: float,
                      cap: int) -> tuple[list, int]:
        """Scatter band-bucket offers to their shards (buckets are the
        partition unit — horizontal state like every keyed table), gather
        the emitted candidate pairs and the star-cap drop count."""
        self.fence()
        by_shard = self._scatter(sorted(per_bucket.items()))
        refs = [
            self.shards[sid].apply_neardup_offers.remote(
                name, epoch, _dumps(items), threshold, cap)
            for sid, items in by_shard.items()
        ]
        pairs: list = []
        drops = 0
        for b in ray.get(refs):
            p, d = pickle.loads(b)
            pairs.extend(p)
            drops += d
        pairs.sort()
        return pairs, drops

    def apply_reach_edges(self, name: str, epoch: int, edges: list,
                          sources: tuple) -> list:
        """Route the epoch's ±diff edge delta to the op's designated shard
        (one logical graph; see StateShard.apply_reach_edges)."""
        self.fence()
        sid = shard_of(name.encode(), self.num_shards)
        blob = ray.get(self.shards[sid].apply_reach_edges.remote(
            name, epoch, _dumps(sorted(map(tuple, edges))),
            tuple(sorted(sources))))
        return pickle.loads(blob)

    def apply_pagerank_edges(self, name: str, epoch: int, edges: list,
                             damping: float, tol: float, max_iters: int,
                             emit_tol: float) -> list:
        """Route the epoch's ±diff edge delta to the op's designated shard
        (one logical graph; see StateShard.apply_pagerank_edges)."""
        self.fence()
        sid = shard_of(name.encode(), self.num_shards)
        blob = ray.get(self.shards[sid].apply_pagerank_edges.remote(
            name, epoch, _dumps(sorted(map(tuple, edges))),
            damping, tol, max_iters, emit_tol))
        return pickle.loads(blob)

    def sweep_kleene_matches(self, name: str, watermark: float, first: str,
                             mid: str, last: str, within: float) -> list:
        self.fence()
        blobs = ray.get([
            s.sweep_kleene_matches.remote(name, watermark, first, mid, last,
                                          within)
            for s in self.shards
        ])
        out = []
        for b in blobs:
            out.extend(pickle.loads(b))
        out.sort(key=lambda kv: (kv[0], kv[1]))
        return out

    def sweep_absence(self, name: str, watermark: float, first: str,
                      absent: str, within: float) -> list:
        self.fence()
        blobs = ray.get([
            s.sweep_absence.remote(name, watermark, first, absent, within)
            for s in self.shards
        ])
        out = []
        for b in blobs:
            out.extend(pickle.loads(b))
        out.sort(key=lambda kv: (kv[0], kv[1]))
        return out

    # --------------------------------------------------------------- join
    def join_insert_probe(self, name: str, epoch: int,
                          per_shard: dict[int, dict]) -> list:
        """per_shard: sid → {"left": DataFrame|None, "right": DataFrame|None,
        "left_key": [...], "right_key": [...]} → list of matched DataFrames."""
        self.fence()
        refs = [
            self.shards[sid].join_insert_probe.remote(name, epoch, _dumps(payload))
            for sid, payload in sorted(per_shard.items())
        ]
        out = []
        for b in ray.get(refs):
            df = pickle.loads(b)
            if df is not None and len(df):
                out.append(df)
        return out

    def join_expire(self, name: str, expire_before: float) -> int:
        return sum(ray.get([s.join_expire.remote(name, expire_before) for s in self.shards]))

    def asof_insert_probe(self, name: str, epoch: int,
                          per_shard: dict[int, dict]) -> dict:
        """per_shard: sid → {"left"/"right": DataFrame|None, "key": [...],
        "out_names": [...], "right_cols": [...]} → {"m": match-emission
        frames, "u": unmatched-delta frames} (``u`` populated only when
        the payload sets ``track_unmatched``)."""
        self.fence()
        refs = [
            self.shards[sid].asof_insert_probe.remote(
                name, epoch, _dumps(payload))
            for sid, payload in sorted(per_shard.items())
        ]
        out: dict[str, list] = {"m": [], "u": []}
        for b in ray.get(refs):
            r = pickle.loads(b)
            if r is None:
                continue
            if isinstance(r, dict):
                for k in ("m", "u"):
                    if r.get(k) is not None and len(r[k]):
                        out[k].append(r[k])
            elif len(r):
                out["m"].append(r)
        return out

    def asof_sweep_unmatched(self, name: str, bound: float) -> list:
        self.fence()
        out = []
        for b in ray.get([s.asof_sweep_unmatched.remote(name, bound)
                          for s in self.shards]):
            df = pickle.loads(b)
            if df is not None and len(df):
                out.append(df)
        return out

    def asof_expire(self, name: str, before: float) -> int:
        return sum(ray.get([s.asof_expire.remote(name, before)
                            for s in self.shards]))

    def sweep_join_unmatched(self, name: str, bound: float,
                             side: str = "left") -> list:
        """Finalized never-matched rows of ``side`` from every shard."""
        self.fence()
        out = []
        for b in ray.get([s.sweep_join_unmatched.remote(name, bound, side)
                          for s in self.shards]):
            df = pickle.loads(b)
            if df is not None and len(df):
                out.append(df)
        return out

    # --------------------------------------------------------------- checkpoint
    def dump_all(self) -> dict[int, bytes]:
        self.fence()
        blobs = ray.get([s.dump.remote() for s in self.shards])
        return dict(enumerate(blobs))

    def load_all(self, blobs: dict[int, bytes]) -> None:
        ray.get([self.shards[sid].load.remote(blob) for sid, blob in blobs.items()])

    def stats(self) -> list[dict]:
        self.fence()
        return ray.get([s.stats.remote() for s in self.shards])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s, no_restart=True)
        self.shards = []


# --------------------------------------------------------------- rescale
def _applied_mark(v) -> int:
    """Normalize an applied-epoch entry (older set format tolerated)."""
    if isinstance(v, int):
        return v
    if isinstance(v, set) and v:
        return max(v)
    return -1


def rescale_blobs(blobs: dict[int, bytes], new_num_shards: int) -> dict[int, bytes]:
    """Re-partition checkpointed shard state to a DIFFERENT shard count.

    The savepoint-rescale operation (Flink's ``savepoint --rescale``, the
    "run at N and 4N nodes" contract of the north rule applied to STATE):
    a checkpoint taken with N shards loads into a session built with M
    shards by re-bucketing every keyed family with the same routing rule a
    fresh M-shard run would use — so post-resume traffic finds each key's
    accumulator exactly where the scatter will send its next delta:

    - ``aggs`` / ``sessions`` / ``session_points`` / ``session_early`` /
      ``patterns``: key_bytes → ``shard_of(key, M)`` (the `_scatter` rule)
    - ``neardup``: band-bucket bytes → ``shard_of(bucket, M)``; bucket
      member lists move whole (arrival-order semantics preserved)
    - join buffers: rows re-split by ``hash_pandas_object(key cols) % M``
      (the ``shard_payloads`` rule); the key columns ride in the
      checkpointed buffer (``lk``/``rk``).  Per-row outer-join identity
      tags (``__lid``/``__rid``) are renumbered per target shard — they
      are opaque uniqueness tags, only the ``__matched`` flags carry
      semantics — and the shard counters resume above them
    - ``graphs`` (incremental CC / PageRank): whole graph to its
      designated shard ``shard_of(name, M)``
    - ``applied`` high-water marks: per-table max across sources,
      replicated to every target shard (replays below the resume floor
      are no-ops against the sink's committed manifests anyway)
    - ``pane_bounds``: per-name max, replicated (sweeps broadcast the
      same bound to all shards in a fresh run)

    Pure function over blob bytes — no actors touched; the caller loads
    the result with ``ShardedStateStore.load_all``.
    """
    import pandas as pd

    m = new_num_shards
    states = [pickle.loads(b) for _, b in sorted(blobs.items())]
    out: list[dict] = [
        {
            "shard_id": i,
            "aggs": {}, "sessions": {}, "session_points": {},
            "session_early": {}, "joins": {}, "asof": {},
            "join_lid": {},
            "join_rid": {}, "patterns": {}, "neardup": {},
            "neardup_drops": {}, "pane_bounds": {}, "graphs": {},
            "applied": {},
        }
        for i in range(m)
    ]

    for fam in ("aggs", "sessions", "session_points", "session_early",
                "patterns", "neardup"):
        for st in states:
            for name, d in (st.get(fam) or {}).items():
                for k, v in d.items():
                    out[shard_of(k, m)][fam].setdefault(name, {})[k] = v

    # graphs: one logical graph per name on its designated shard
    for st in states:
        for name, g in (st.get("graphs") or {}).items():
            if g:
                out[shard_of(name.encode(), m)]["graphs"][name] = g

    # scalar families: max / sum, replicated or designated
    applied: dict[str, int] = {}
    panes: dict[str, float] = {}
    drops: dict[str, int] = {}
    for st in states:
        for t, v in (st.get("applied") or {}).items():
            applied[t] = max(applied.get(t, -1), _applied_mark(v))
        for t, v in (st.get("pane_bounds") or {}).items():
            panes[t] = max(panes.get(t, -float("inf")), v)
        for t, v in (st.get("neardup_drops") or {}).items():
            drops[t] = drops.get(t, 0) + int(v)
    for o in out:
        o["applied"] = dict(applied)
        o["pane_bounds"] = dict(panes)
    for t, v in drops.items():
        out[shard_of(t.encode(), m)]["neardup_drops"][t] = v

    # as-of buffers: same row re-split rule as joins (hash of key cols);
    # no id counters — the buffers carry only __ts/__match_ts metadata
    for st in states:
        for name, buf in (st.get("asof") or {}).items():
            keys = buf.get("lk")
            for side in ("left", "right"):
                df = buf.get(side)
                if df is None or not len(df):
                    continue
                if not keys:
                    raise ValueError(
                        f"cannot rescale asof join '{name}': checkpoint "
                        "is missing its key columns")
                h = pd.util.hash_pandas_object(
                    df[list(keys)], index=False).to_numpy()
                sid = (h % np.uint64(m)).astype(np.int64)
                for s in np.unique(sid):
                    tbuf = out[int(s)]["asof"].setdefault(
                        name, {"left": None, "right": None,
                               "lk": keys, "rk": keys})
                    part = df[sid == s]
                    tbuf[side] = (part.reset_index(drop=True)
                                  if tbuf[side] is None
                                  else pd.concat([tbuf[side], part],
                                                 ignore_index=True))
    for o in out:
        for name, buf in o["asof"].items():
            R = buf.get("right")
            if R is not None and len(R):
                buf["right"] = R.sort_values(
                    "__ts_right", kind="mergesort", ignore_index=True)
    # unmatched-sweep bounds: per-name max, replicated to every shard
    umb: dict[str, float] = {}
    for st in states:
        for t, v in (st.get("asof_um_bound") or {}).items():
            umb[t] = max(umb.get(t, -float("inf")), float(v))
    for o in out:
        o["asof_um_bound"] = dict(umb)

    # join buffers: re-split rows by the shard_payloads hash rule
    for st in states:
        for name, buf in (st.get("joins") or {}).items():
            keys_of = {"left": buf.get("lk"), "right": buf.get("rk")}
            for side in ("left", "right"):
                df = buf.get(side)
                if df is None or not len(df):
                    continue
                keys = keys_of[side]
                if not keys:
                    raise ValueError(
                        f"cannot rescale join '{name}': checkpoint predates "
                        "key-column tracking (re-checkpoint at the old shard "
                        "count first)")
                h = pd.util.hash_pandas_object(
                    df[list(keys)], index=False).to_numpy()
                sid = (h % np.uint64(m)).astype(np.int64)
                for s in np.unique(sid):
                    tbuf = out[int(s)]["joins"].setdefault(
                        name, {"left": None, "right": None,
                               "lk": buf.get("lk"), "rk": buf.get("rk")})
                    part = df[sid == s]
                    tbuf[side] = (part if tbuf[side] is None
                                  else pd.concat([tbuf[side], part]))
    for o in out:
        for name, buf in o["joins"].items():
            for side, idc, ctr in (("left", "__lid", "join_lid"),
                                   ("right", "__rid", "join_rid")):
                df = buf.get(side)
                if df is None:
                    continue
                df = df.reset_index(drop=True)
                if idc in df.columns:
                    # deterministic order, then fresh contiguous ids: the
                    # tags only need uniqueness within (shard, name)
                    df = df.sort_values(
                        [f"__ts_{side}", idc], kind="stable"
                    ).reset_index(drop=True)
                    df[idc] = np.arange(len(df), dtype=np.int64)
                    o[ctr][name] = len(df)
                buf[side] = df

    return {i: _dumps(o) for i, o in enumerate(out)}

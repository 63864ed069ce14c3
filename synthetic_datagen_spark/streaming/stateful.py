"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.13): per-series online running statistics — the streaming
form of the W4 rolling-volatility / A1 moment operators, and the state
pattern an online G6/G7 generator would use.

State per event_type: Welford (n, mean, M2) + EWMA of squared deltas.
Bounded: O(1) per key, keys bounded by distinct event types; timeouts
off (aggregation state, not session state).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
        T.StructField("ewma_var", T.DoubleType()),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("std", T.DoubleType()),
        T.StructField("ewma_vol", T.DoubleType()),
    ]
)


def stream_running_stats(events: DataFrame, alpha: float = 0.06) -> DataFrame:
    """groupBy(event_type).applyInPandasWithState — emits one updated
    stats row per key per micro-batch. Welford merge is exact across
    batches; EWMA variance uses the batch's values in event order."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, mean, m2, ewma = state.get
        else:
            n, mean, m2, ewma = 0, 0.0, 0.0, 0.0
        for pdf in pdfs:
            for v in pdf["value"].astype(float):
                n += 1
                d = v - mean
                mean += d / n
                m2 += d * (v - mean)
                ewma = (1 - alpha) * ewma + alpha * d * d
        state.update((n, mean, m2, ewma))
        std = (m2 / (n - 1)) ** 0.5 if n > 1 else 0.0
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n": [n],
                "mean": [mean],
                "std": [std],
                "ewma_vol": [ewma**0.5],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------
# Online generator — the G6/G7 sequential sampler as a streaming
# stateful operator (SURVEY §2.13: "applyInPandasWithState for the
# sequential generators in online mode"). Each input row is a tick
# request for one series; state carries (prev_return, sigma2, regime,
# step) so the AR(1)+GARCH recursion continues exactly across
# micro-batches. Determinism: the rng re-derives from
# splitmix64(seed, series_id, step) per tick — replaying the same ticks
# yields the same path regardless of micro-batch boundaries.
# ---------------------------------------------------------------------

GEN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("step", T.LongType()),
        T.StructField("prev_r", T.DoubleType()),
        T.StructField("sig2", T.DoubleType()),
        T.StructField("regime", T.IntegerType()),
        T.StructField("log_price", T.DoubleType()),
    ]
)

GEN_OUT_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.LongType()),
        T.StructField("step", T.LongType()),
        T.StructField("regime", T.IntegerType()),
        T.StructField("price", T.DoubleType()),
    ]
)


def _online_init_state(
    sid: int, start_cum, stats: dict, seed: int, p0: float
) -> tuple:
    """Fresh per-series state (step, prev_r, sig2, regime, log_price) —
    shared by the streaming operator's first micro-batch and the batch
    twin, so both paths start from the identical recursion state."""
    import math

    import numpy as np

    from ..generators.seeds import counter_uniforms

    k = len(start_cum)
    # same counter convention as the tick kernel: step 0, slot 2
    u0 = float(counter_uniforms(seed, sid, 0, 2))
    regime = min(int(np.searchsorted(start_cum, u0, side="right")), k - 1)
    st0 = stats.get(regime, {"sigma": 1e-3})
    return 0, 0.0, float(st0["sigma"]) ** 2, regime, math.log(p0)


def _online_ticks(
    sid: int,
    n_ticks: int,
    state: tuple,
    trans_cum,
    stats: dict,
    garch: dict,
    seed: int,
) -> tuple[dict, tuple]:
    """Advance one series' AR(1)+GARCH recursion by ``n_ticks`` from
    ``state``. THE single tick kernel: the streaming update function
    and the batch twin both call this, so stream/batch parity holds by
    construction — any drift breaks stream_regime_generate_parity.

    Randomness is COUNTER-BASED: each tick's draws are pure functions of
    (seed, series_id, step, slot) via vectorized splitmix64
    (seeds.splitmix64_vec), batch-drawn for the whole span in two array
    passes — so the path is invariant to micro-batch boundaries (the
    original contract) without constructing a Generator per tick (the
    original cost: ~µs/tick of default_rng() setup dominating the
    arithmetic at realistic tick volumes). Returns (columns dict,
    new state)."""
    import math

    import numpy as np

    from ..generators.seeds import counter_normals, counter_uniforms

    k = len(trans_cum)
    step, prev_r, sig2, regime, log_price = state
    steps = np.arange(step + 1, step + 1 + n_ticks, dtype=np.uint64)
    # slot 2 = regime-transition uniform; slots 0/1 = Box-Muller normal
    u_reg = counter_uniforms(seed, sid, steps, 2)
    z_ret = counter_normals(seed, sid, steps)
    regimes = np.empty(n_ticks, dtype=np.int64)
    prices = np.empty(n_ticks, dtype=np.float64)
    for i in range(n_ticks):
        regime = min(
            int(np.searchsorted(trans_cum[regime], u_reg[i], side="right")), k - 1
        )
        st = stats.get(regime, {"mu": 0.0, "sigma": 1e-3, "ar1": 0.0})
        g = garch.get(regime)
        if g is not None:
            sig2 = g["omega"] + g["alpha"] * prev_r * prev_r + g["beta"] * sig2
            vol = math.sqrt(max(sig2, 1e-18))
        else:
            vol = max(st["sigma"], 1e-9)
        r = st["mu"] + st["ar1"] * (prev_r - st["mu"]) + vol * z_ret[i]
        prev_r = r
        log_price = min(max(log_price + r, -600.0), 600.0)
        regimes[i] = regime
        prices[i] = math.exp(log_price)
    step += n_ticks
    out = {
        "series_id": np.full(n_ticks, sid, dtype=np.int64),
        "step": np.arange(step - n_ticks + 1, step + 1, dtype=np.int64),
        "regime": regimes.astype(np.int32),
        "price": prices,
    }
    return out, (step, prev_r, sig2, int(regime), log_price)


def stream_online_generator(
    ticks: DataFrame,
    trans_cum,
    start_cum,
    stats: dict,
    garch: dict,
    seed: int = 42,
    p0: float = 100.0,
):
    """ticks: streaming DataFrame with a ``series_id`` column; one
    output row per tick continues that series' AR(1)+GARCH path."""

    def update(key: tuple, pdfs, state: GroupState):
        sid = int(key[0])
        if state.exists:
            st = state.get
        else:
            st = _online_init_state(sid, start_cum, stats, seed, p0)
        n_ticks = sum(len(p) for p in pdfs)
        out, st = _online_ticks(sid, n_ticks, st, trans_cum, stats, garch, seed)
        state.update(st)
        yield pd.DataFrame(out)

    return ticks.groupBy("series_id").applyInPandasWithState(
        update,
        outputStructType=GEN_OUT_SCHEMA,
        stateStructType=GEN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def online_generate_batch(
    spark,
    n_series: int,
    n_samples: int,
    trans_cum,
    start_cum,
    stats: dict,
    garch: dict,
    seed: int = 42,
    p0: float = 100.0,
) -> DataFrame:
    """Batch twin of stream_online_generator: per-series applyInPandas
    running the SAME tick kernel from the same fresh state — the G6/G7
    online recursion without a stream. Distributed across series like
    RegimeGenerator.generate."""
    from pyspark.sql import functions as F  # noqa: F401

    def walk(pdf: pd.DataFrame):
        frames = []
        for sid in pdf["id"]:
            sid = int(sid)
            st = _online_init_state(sid, start_cum, stats, seed, p0)
            out, _ = _online_ticks(sid, n_samples, st, trans_cum, stats, garch, seed)
            frames.append(pd.DataFrame(out))
        return (
            pd.concat(frames)
            if frames
            else pd.DataFrame(columns=["series_id", "step", "regime", "price"])
        )

    return (
        spark.range(n_series)
        .repartition(max(1, min(n_series, 64)), "id")
        .groupBy("id")
        .applyInPandas(walk, GEN_OUT_SCHEMA)
    )


# ---------------------------------------------------------------------
# Streaming funnel — per-user view -> click -> purchase stage machine
# (SURVEY §2.13 custom stateful operator; batch twin:
# operators/event_queries.funnel_view_click_purchase)
#
# ORDER-INDEPENDENT by construction (r9): the update is a pure set
# merge, so any partitioning of the event stream into micro-batches —
# shuffled files, late arrivals, replays — converges to the exact
# batch answer. The math that keeps state small:
#   * first_view = min(view ts) only ever DECREASES as data arrives.
#   * a click c > first_view that is not the minimum such click is
#     dominated FOREVER (the smaller eligible click stays eligible as
#     first_view decreases), so only the minimum eligible click is
#     kept; clicks c <= first_view may become eligible if a later,
#     earlier view lowers first_view below them, so they buffer.
#   * first_click is therefore non-increasing too, and purchases
#     follow the identical rule relative to it.
# Buffers hold only same-user events BELOW the current stage anchor —
# empty for in-order delivery, tiny under bounded disorder — and a
# watermark prunes them to nothing once the anchors are final.

_FUNNEL_STATE = (
    "first_view LONG, first_click LONG, first_purchase LONG, "
    "clicks_buf ARRAY<LONG>, purch_buf ARRAY<LONG>, n_events LONG"
)
_FUNNEL_OUT = (
    "user_id LONG, first_view LONG, first_click LONG, first_purchase LONG, "
    "emit_seq LONG"
)

FunnelState = tuple[int, int, int, list[int], list[int]]


def funnel_merge(
    state: FunnelState,
    views: list[int],
    clicks: list[int],
    purchases: list[int],
) -> FunnelState:
    """Merge a micro-batch of one user's event timestamps into funnel
    state, as a pure order-independent set operation (-1 = unreached).

    Semantics match the batch SQL exactly: first_view = min view ts,
    first_click = min click ts strictly greater than first_view,
    first_purchase = min purchase ts strictly greater than first_click.
    merge(merge(s, A), B) == merge(s, A ∪ B) — proven by the domination
    argument in the module comment and pinned by the shuffled-replay
    property test in tests/test_streaming.py."""
    mv, fc, fp, cbuf, pbuf = state
    if views:
        nv = min(views)
        mv = nv if mv < 0 else min(mv, nv)
    cand = set(cbuf)
    cand.update(clicks)
    if fc >= 0:
        cand.add(fc)
    if mv >= 0:
        elig = [c for c in cand if c > mv]
        fc = min(elig) if elig else -1
        cbuf = sorted(c for c in cand if c <= mv)
    else:
        fc = -1
        cbuf = sorted(cand)
    pcand = set(pbuf)
    pcand.update(purchases)
    if fp >= 0:
        pcand.add(fp)
    if fc >= 0:
        pelig = [p for p in pcand if p > fc]
        fp = min(pelig) if pelig else -1
        pbuf = sorted(p for p in pcand if p <= fc)
    else:
        fp = -1
        pbuf = sorted(pcand)
    return mv, fc, fp, cbuf, pbuf


def funnel_prune(state: FunnelState, watermark_us: int) -> FunnelState:
    """Drop buffered candidates the watermark has made unreachable.

    Once watermark >= first_view no earlier view can arrive, so
    first_view is final and every buffered click (all <= first_view)
    is dead; once additionally watermark >= first_click the same holds
    for buffered purchases. State is then O(1) per user again — the
    disorder window, not the stream length, bounds the buffers."""
    mv, fc, fp, cbuf, pbuf = state
    if watermark_us <= 0:
        return state
    if 0 <= mv <= watermark_us:
        cbuf = []
        if 0 <= fc <= watermark_us:
            pbuf = []
    return mv, fc, fp, cbuf, pbuf


def stream_funnel_stages(events: DataFrame) -> DataFrame:
    """groupBy(user_id).applyInPandasWithState funnel state machine
    over the order-independent funnel_merge kernel. Exact under
    arbitrary micro-batch order and late arrivals; emit_seq (events
    processed so far for the user) strictly increases per emission, so
    the consumer picks each user's final row with max_by(emit_seq) —
    stage anchors may legitimately DECREASE across emissions as
    earlier events arrive, so 'latest', not 'max', is the reduction."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            mv, fc, fp, cbuf, pbuf, n = state.get
            st: FunnelState = (mv, fc, fp, list(cbuf), list(pbuf))
        else:
            st, n = (-1, -1, -1, [], []), 0
        views: list[int] = []
        clicks: list[int] = []
        purchases: list[int] = []
        sink = {"view": views, "click": clicks, "purchase": purchases}
        for pdf in pdfs:
            n += len(pdf)
            for et, ts in zip(pdf["event_type"], pdf["ts_us"].astype(int)):
                lst = sink.get(et)
                if lst is not None:
                    lst.append(int(ts))
        st = funnel_merge(st, views, clicks, purchases)
        try:
            wm = int(state.getCurrentWatermarkMs()) * 1000
        except Exception:  # noqa: BLE001 — no watermark in this query
            wm = 0
        st = funnel_prune(st, wm)
        mv, fc, fp, cbuf, pbuf = st
        state.update((mv, fc, fp, list(cbuf), list(pbuf), n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "first_view": [mv],
                "first_click": [fc],
                "first_purchase": [fp],
                "emit_seq": [n],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_FUNNEL_OUT,
        stateStructType=_FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---- streaming hot-gram positions (span-dedup's stateful stage) ----

HOT_GRAM_STATE_SCHEMA = T.StructType(
    [
        # one state row per BUCKET of grams, not per gram: the blob is
        # a pickled dict {gram: (count, buffered_doc, buffered_pos)}.
        # applyInPandasWithState invokes python once per KEY per batch,
        # so keying by raw gram costs O(distinct grams) python calls a
        # trigger (measured: 52 s at sf0.1, the whole catalog's worst
        # query); 256 buckets cut that to O(256) calls with identical
        # semantics — per-gram logic just runs vectorized inside the
        # bucket's update.
        T.StructField("blob", T.BinaryType()),
    ]
)

HOT_GRAM_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("pos", T.LongType()),
    ]
)

HOT_GRAM_BUCKETS = 256


def stream_hot_gram_positions(
    grams: DataFrame, ttl_triggers: int | None = None
) -> DataFrame:
    """Stateful stage of the streaming repeated-ngram span detector:
    input is a stream of (g, doc_id, pos) gram occurrences; emit every
    position whose gram occurs MORE THAN ONCE corpus-wide — exactly
    the batch count-window predicate, incrementally.

    Order/batch-split-invariant by construction: each (doc_id, pos)
    is emitted exactly once (the first occurrence is buffered in state
    until its gram turns hot, then flushed with the triggering batch;
    the flush clears the buffer, so nothing can re-emit), and the
    downstream span assembly consumes the emitted position SET with
    order-insensitive islands — so any micro-batch partitioning of
    the corpus yields the same final spans. State is bucketed
    (HOT_GRAM_BUCKETS rows, each a pickled (trigger_no, {gram:
    (count, buffered row, last_seen_trigger)}) blob): per-gram
    entries are O(1), total state is O(distinct grams) bytes either
    way, but the python-call count per trigger drops from O(distinct
    grams) to O(buckets).

    ``ttl_triggers`` (r11 VERDICT item 4) bounds state for a
    CONTINUOUS feed: after each trigger, every gram not seen within
    the bucket's last ``ttl_triggers`` triggers is evicted — state
    becomes O(grams active in the horizon), not O(distinct grams
    ever). Eviction is SAFE but lossy in exactly one direction: a
    (doc_id, pos) is still NEVER emitted twice (eviction only deletes
    entries; an entry must exist to flush its buffer, and a flushed
    buffer is already None), but a gram whose recurrence gap exceeds
    the horizon is re-seen as a fresh singleton, so its pre-gap
    occurrences are MISSED (pinned in tests: TTL emissions ⊆ exact
    emissions, with equality whenever all recurrence gaps fit the
    horizon). That is the standard production trade — the bounded
    parity harness keeps it off (None). Buckets age on their own
    trigger counter (a bucket with no rows in a trigger isn't
    invoked, so its entries age later — the safe direction).

    Scale note (r11 VERDICT item 4): each occupied bucket's ENTIRE
    blob is deserialized/rewritten per trigger — fine at 256 buckets,
    but the per-trigger commit is O(state), the driver bench's worst
    row. The structural fix is per-gram state rows on the RocksDB
    state store (spark.sql.streaming.stateStore.providerClass=
    RocksDBStateStoreProvider + changelog checkpointing): RocksDB
    commits incrementally (only touched keys), turning the commit
    cost from O(state) to O(batch); the python-call cost that forced
    bucketing would move JVM-side with transformWithState's per-key
    handles once that API is the baseline. Kept as documented
    design, not code: applyInPandasWithState can't mix per-gram
    keying with O(buckets) python calls today."""
    import pickle

    def update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        # vectorized over the batch (r12): the original per-gram
        # groupby loop built one pandas sub-frame per DISTINCT gram —
        # ~1 sub-frame per row on a mostly-singleton stream, the
        # python floor of the whole parity harness. Here the emit
        # decision is two Series.map passes; python touches each
        # distinct gram only for the dict state get/set.
        rows = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            trig, seen = pickle.loads(state.get[0])
        else:
            trig, seen = 0, {}
        trig += 1
        g = rows["g"]
        batch_cnt_by_g = g.value_counts()  # gram -> rows in this batch
        prev_by_g = {
            x: seen.get(x, (0, None, 0))[0] for x in batch_cnt_by_g.index
        }
        total_row = g.map(batch_cnt_by_g) + g.map(prev_by_g)
        emitted = rows.loc[total_row > 1, ["doc_id", "pos"]]

        out_docs: list[int] = []
        out_pos: list[int] = []
        # flush buffered first occurrences of grams that turn hot now
        for x, cnt in batch_cnt_by_g.items():
            n = prev_by_g[x]
            if n == 1 and cnt >= 1:
                buf = seen[x][1]
                out_docs.append(buf[0])
                out_pos.append(buf[1])
            seen[x] = (n + int(cnt), None, trig)
        # re-buffer fresh singletons (exactly one occurrence ever)
        fresh = total_row == 1
        if fresh.any():
            for x, d, p in zip(
                g[fresh], rows["doc_id"][fresh], rows["pos"][fresh]
            ):
                seen[x] = (1, (int(d), int(p)), trig)
        if ttl_triggers is not None:
            seen = {
                x: e for x, e in seen.items() if trig - e[2] <= ttl_triggers
            }
        state.update((pickle.dumps((trig, seen), protocol=4),))
        yield pd.DataFrame(
            {
                "doc_id": out_docs + emitted["doc_id"].tolist(),
                "pos": out_pos + emitted["pos"].tolist(),
            }
        )

    from pyspark.sql import functions as F

    bucketed = grams.withColumn(
        "_bkt", F.pmod(F.xxhash64("g"), F.lit(HOT_GRAM_BUCKETS))
    )
    return bucketed.groupBy("_bkt").applyInPandasWithState(
        update,
        outputStructType=HOT_GRAM_OUT_SCHEMA,
        stateStructType=HOT_GRAM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---- streaming CEP pattern match (event_pattern_match's twin) ----

CEP_STATE_SCHEMA = T.StructType(
    [
        # one state row per BUCKET of users: pickled
        # {user_id: (phase, tv, n, k, x, seq)} — six ints per user.
        # Keying by raw user_id costs O(distinct users) python calls
        # per trigger (the hot-gram lesson: measured 150k users x 3
        # triggers = 450k interpreter round-trips at the 100x events
        # fixture); 256 buckets cut that to O(256) calls with
        # identical semantics.
        T.StructField("blob", T.BinaryType()),
    ]
)

CEP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_matches", T.LongType()),
        T.StructField("n_error_kills", T.LongType()),
        T.StructField("n_expired", T.LongType()),
        T.StructField("emit_seq", T.LongType()),
    ]
)

CEP_BUCKETS = 256


def cep_fold(
    evs, st: tuple[int, int, int, int, int], window_us: int
) -> tuple[int, int, int, int, int]:
    """The 3-state NFA transition fold — identical to the batch
    query's F.aggregate lambda (operators/event_queries.py) and the
    recursive-CTE oracle; evs are packed ts_us*8+code BIGINTs in
    event-time order."""
    ph, tv, n, k, x = st
    for ev in evs:
        ts, c = ev >> 3, ev & 7
        if c == 4:
            if ph > 0:
                k += 1
            ph = 0
        elif ph == 0 and c == 1:
            ph, tv = 1, ts
        elif ph == 1 and c == 2:
            ph = 2
        elif ph == 2 and c == 3:
            if ts - tv <= window_us:
                n += 1
            else:
                x += 1
            ph = 0
    return ph, tv, n, k, x


def stream_cep_pattern(events: DataFrame, window_us: int) -> DataFrame:
    """Bucketed applyInPandasWithState CEP NFA — the streaming twin of
    ``event_pattern_match`` and the shape that actually scales: state
    is six ints per user regardless of history length (the batch form
    materializes each user's full event array), and state rows are
    keyed by 256 hash BUCKETS of users, not raw user_id, so a trigger
    costs O(256) python invocations however many users it touches.

    Unlike the funnel/session twins, a CEP NFA is ORDER-DEFINED — its
    transitions consume the per-key event sequence in event-time
    order, so exactness requires per-key in-order delivery ACROSS
    triggers (the Kafka-partition-per-key ordering contract every
    production CEP engine assumes; Flink CEP buffers until the
    watermark for the same reason). Within a trigger no order is
    assumed: each micro-batch's rows lexsort on (user_id, packed
    ts*8+code) before the fold, so intra-trigger disorder is exercised
    by the parity harness while cross-trigger order is provided by its
    time-ranged feed files.

    ``events`` needs columns (user_id, ev) with ev = ts_us*8+code
    packed exactly as the batch query packs them."""
    import pickle

    import numpy as np

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        states: dict[int, tuple[int, int, int, int, int, int]] = (
            pickle.loads(state.get[0]) if state.exists else {}
        )
        uids_l: list = []
        evs_l: list = []
        for pdf in pdfs:
            uids_l.append(pdf["user_id"].to_numpy(dtype=np.int64))
            evs_l.append(pdf["ev"].to_numpy(dtype=np.int64))
        uid = np.concatenate(uids_l) if uids_l else np.empty(0, np.int64)
        ev = np.concatenate(evs_l) if evs_l else np.empty(0, np.int64)
        order = np.lexsort((ev, uid))
        uid, ev = uid[order], ev[order]
        bounds = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        out: dict[str, list[int]] = {
            "user_id": [], "n_matches": [], "n_error_kills": [],
            "n_expired": [], "emit_seq": [],
        }
        for a, b in zip(bounds, np.r_[bounds[1:], len(uid)]):
            u = int(uid[a])
            ph, tv, n, k, x, seq = states.get(u, (0, 0, 0, 0, 0, 0))
            ph, tv, n, k, x = cep_fold(
                (int(v) for v in ev[a:b]), (ph, tv, n, k, x), window_us
            )
            seq += int(b - a)
            states[u] = (ph, tv, n, k, x, seq)
            out["user_id"].append(u)
            out["n_matches"].append(n)
            out["n_error_kills"].append(k)
            out["n_expired"].append(x)
            out["emit_seq"].append(seq)
        state.update((pickle.dumps(states, protocol=4),))
        yield pd.DataFrame(out)

    from pyspark.sql import functions as F

    bucketed = events.withColumn(
        "_bkt", F.pmod(F.xxhash64("user_id"), F.lit(CEP_BUCKETS))
    )
    return bucketed.groupBy("_bkt").applyInPandasWithState(
        update,
        outputStructType=CEP_OUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

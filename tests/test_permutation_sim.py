"""Exhaustive-permutation simulation tests, the reference's Simulator
pattern (/root/reference/tests/sim.py:56-137: a SequenceGenerator walks
every permutation of an event alphabet and compares the real operator
against a hand-written model after every event).

Spark-idiomatic reformulation: every permutation of the alphabet becomes
its own ``key`` in ONE DataFrame, so the whole permutation space runs as
a single job (one shuffle, per-key state) instead of 120 sequential
mini-pipelines — which is also exactly the shape that proves per-key
state isolation. Each alphabet runs in two timestamp modes: strictly
increasing, and pairwise-colliding (adjacent events share a timestamp)
to exercise the equal-ts priority rules (gate.py:50-54 control-first;
srlatch seq order).
"""

from __future__ import annotations

from datetime import datetime, timezone
from itertools import permutations

from pyspark.sql import functions as F

from streamtasks_spark.operators.stateful import gate, sr_latch, switch


def ms(x: int) -> datetime:
    return datetime.fromtimestamp(x / 1000.0, tz=timezone.utc).replace(tzinfo=None)


def perm_rows(alphabet):
    """(key, seq, ts_ms, event) rows for every permutation × 2 ts modes."""
    rows = []
    for pi, perm in enumerate(permutations(range(len(alphabet)))):
        for mode, ts_of in (("inc", lambda i: 1_000_000 + 1000 * i),
                            ("col", lambda i: 1_000_000 + 1000 * (i // 2))):
            key = f"p{pi}_{mode}"
            for i, ev_idx in enumerate(perm):
                rows.append(
                    {"key": key, "seq": i, "ts_ms": ts_of(i),
                     **alphabet[ev_idx]}
                )
    return rows


def to_df(spark, rows):
    return spark.createDataFrame(
        [{k: v for k, v in r.items() if k != "ts_ms"} | {"ts": ms(r["ts_ms"])}
         for r in rows]
    )


def latest_ctl(ctl_rows, key, ts_ms):
    """Model of last_value_join with control_first=True: the latest
    control with ts <= the row's ts, ordered by (ts, seq)."""
    cands = [c for c in ctl_rows if c["key"] == key and c["ts_ms"] <= ts_ms]
    if not cands:
        return None
    return max(cands, key=lambda c: (c["ts_ms"], c["seq"]))["value"]


# ------------------------------------------------------------------ gate


def test_gate_all_permutations(spark):
    alphabet = [
        {"src": "data", "value": 0.0},
        {"src": "data", "value": 1.0},
        {"src": "ctl", "value": 1.0},
        {"src": "ctl", "value": 0.0},
        {"src": "ctl", "value": 0.51},
    ]
    rows = perm_rows(alphabet)
    data = [r for r in rows if r["src"] == "data"]
    ctl = [r for r in rows if r["src"] == "ctl"]
    df = to_df(spark, rows)
    out = gate(
        df.filter(F.col("src") == "data").drop("src"),
        df.filter(F.col("src") == "ctl").drop("src"),
        keys=["key"],
        seq_col="seq",
    ).collect()

    expected = {
        (d["key"], d["seq"])
        for d in data
        if (lambda c: c is not None and c > 0.5)(
            latest_ctl(ctl, d["key"], d["ts_ms"])
        )
    }
    got = {(r["key"], r["seq"]) for r in out}
    assert got == expected
    assert expected  # the alphabet must actually open some gates


# ---------------------------------------------------------------- switch


def test_switch_all_permutations(spark):
    alphabet = [
        {"src": "d0", "value": 10.0},
        {"src": "d1", "value": 20.0},
        {"src": "c0", "value": 1.0},
        {"src": "c0", "value": 0.0},
        {"src": "c1", "value": 0.6},
    ]
    rows = perm_rows(alphabet)
    df = to_df(spark, rows)

    def part(src):
        return df.filter(F.col("src") == src).drop("src")

    out = switch(
        [(part("d0"), part("c0")), (part("d1"), part("c1"))],
        keys=["key"],
        seq_col="seq",
    ).collect()

    c0 = [r for r in rows if r["src"] == "c0"]
    c1 = [r for r in rows if r["src"] == "c1"]
    expected = set()
    for d in rows:
        if d["src"] not in ("d0", "d1"):
            continue
        pair = 0 if d["src"] == "d0" else 1
        s0 = latest_ctl(c0, d["key"], d["ts_ms"])
        s1 = latest_ctl(c1, d["key"], d["ts_ms"])
        if s0 is None and s1 is None:
            continue  # no control yet: dropped
        mx = max(v for v in (s0, s1) if v is not None)
        selected = 0 if s0 == mx else 1  # lowest index wins ties
        if pair == selected:
            expected.add((d["key"], d["seq"]))
    got = {(r["key"], r["seq"]) for r in out}
    assert got == expected
    assert expected


# ------------------------------------------------------ message_detector


def test_message_detector_all_gap_permutations(spark):
    """Every permutation of a gap alphabet (within/at/over the timeout)
    becomes one key; the batch detector's up/down transitions must match
    the model: up at the first event or after a gap > timeout, down at
    prev_ts + timeout when a gap exceeds the timeout (and after the last
    event)."""
    from streamtasks_spark.operators.stateful import message_detector

    timeout = 1000
    gaps = (1, 500, 1000, 1001, 3000)  # deltas between consecutive events
    rows = []
    expected = {}
    for pi, perm in enumerate(permutations(gaps)):
        key = f"g{pi}"
        ts = 1_000_000
        times = [ts]
        for g in perm:
            ts += g
            times.append(ts)
        for t in times:
            rows.append({"key": key, "ts_ms": t})
        # model
        trans = []
        prev = None
        for t in times:
            if prev is None or t - prev > timeout:
                if prev is not None:
                    trans.append((prev + timeout, 0.0))
                trans.append((t, 1.0))
            prev = t
        trans.append((prev + timeout, 0.0))
        expected[key] = sorted(trans)

    df = spark.createDataFrame(
        [{"key": r["key"], "ts": ms(r["ts_ms"])} for r in rows]
    )
    out = message_detector(df, keys=["key"], timeout_ms=timeout)
    got: dict[str, list] = {}
    for r in out.collect():
        t = int(r["ts"].replace(tzinfo=timezone.utc).timestamp() * 1000)
        got.setdefault(r["key"], []).append((t, r["value"]))
    for key in got:
        got[key].sort()
    assert got == expected
    # the alphabet must produce both merged runs and split runs
    assert {len(v) for v in expected.values()} != {2}


# -------------------------------------------------------------- sr_latch


def test_sr_latch_all_permutations(spark):
    alphabet = [
        {"src": "set", "value": 1.0},
        {"src": "set", "value": 0.0},
        {"src": "reset", "value": 1.0},
        {"src": "reset", "value": 0.0},
        {"src": "set", "value": 0.51},
    ]
    rows = perm_rows(alphabet)
    df = to_df(spark, rows)
    out = sr_latch(
        df.filter(F.col("src") == "set").drop("src"),
        df.filter(F.col("src") == "reset").drop("src"),
        keys=["key"],
        seq_col="seq",
    ).collect()

    # model: replay each key's events in (ts, seq) order, tracking the
    # latest set/reset booleans; latched flips when exactly one is true
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r)
    expected: dict[str, list] = {}
    for key, evs in by_key.items():
        evs.sort(key=lambda r: (r["ts_ms"], r["seq"]))
        set_b = reset_b = False
        latched = 0.0
        vals = []
        for r in evs:
            if r["src"] == "set":
                set_b = r["value"] > 0.5
            else:
                reset_b = r["value"] > 0.5
            if set_b != reset_b:
                latched = 1.0 if set_b else 0.0
            vals.append((r["ts_ms"], latched))
        expected[key] = sorted(vals)

    got: dict[str, list] = {}
    for r in out:
        t = int(r["ts"].replace(tzinfo=timezone.utc).timestamp() * 1000)
        got.setdefault(r["key"], []).append((t, r["value"]))
    for key in got:
        got[key].sort()
    assert got == expected


def test_gate_fail_modes_all_permutations(spark):
    """Reference GateFailMode parity (tests/tasks/test_gate.py:135-136):
    an invalid control (NULL value = NumberMessage validation error)
    never updates the latch; fail "closed" additionally forces the gate
    shut while the MOST RECENT control row is invalid; fail "open"
    ignores it entirely."""
    alphabet = [
        {"src": "data", "value": 1337.0},
        {"src": "ctl", "value": 1.0},
        {"src": "ctl", "value": 0.0},
        {"src": "ctl", "value": None},  # invalid control message
        {"src": "data", "value": 7.0},
    ]
    rows = perm_rows(alphabet)
    data = [r for r in rows if r["src"] == "data"]
    ctl = [r for r in rows if r["src"] == "ctl"]
    df = to_df(spark, rows)

    def model(key, ts_ms, fail):
        cands = [c for c in ctl if c["key"] == key and c["ts_ms"] <= ts_ms]
        valid = [c for c in cands if c["value"] is not None]
        latch = (
            max(valid, key=lambda c: (c["ts_ms"], c["seq"]))["value"]
            if valid else None
        )
        is_open = latch is not None and latch > 0.5
        if fail == "closed" and cands:
            newest = max(cands, key=lambda c: (c["ts_ms"], c["seq"]))
            if newest["value"] is None:
                is_open = False
        return is_open

    for fail in ("open", "closed"):
        out = gate(
            df.filter(F.col("src") == "data").drop("src"),
            df.filter(F.col("src") == "ctl").drop("src"),
            keys=["key"],
            seq_col="seq",
            fail_mode=fail,
        ).collect()
        expected = {
            (d["key"], d["seq"])
            for d in data
            if model(d["key"], d["ts_ms"], fail)
        }
        got = {(r["key"], r["seq"]) for r in out}
        assert got == expected, fail
        assert expected
    # the two modes must actually differ somewhere in the space
    open_only = {
        (d["key"], d["seq"]) for d in data
        if model(d["key"], d["ts_ms"], "open")
        and not model(d["key"], d["ts_ms"], "closed")
    }
    assert open_only
